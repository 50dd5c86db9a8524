#!/bin/bash
# Round-5 TPU-scale curriculum: detector -> speaker -> listener -> joint RL v2
# (multi-ref CIDEr + XE anchor), then stage evals.  Stage weights hand off via
# prepare_weights (the reference's stage-wise pretrained/*.pth flow,
# scripts/train.py:288-326 there).  Runs sequentially on the one chip.
set -x
cd "$(dirname "$0")/.."

DET_STEPS=${DET_STEPS:-576}
SPK_STEPS=${SPK_STEPS:-128}
LIS_STEPS=${LIS_STEPS:-128}
JOINT_STEPS=${JOINT_STEPS:-48}

python scripts/train.py --config conf/det_converge.yaml \
    --folder det_converge_r5 --max_steps "$DET_STEPS" || exit 1
python scripts/prepare_weights.py --folder outputs/det_converge_r5 \
    --name det_converge --which best || exit 1

python scripts/train.py --config conf/spk_converge.yaml \
    --folder spk_converge_r5 --max_steps "$SPK_STEPS" || exit 1
python scripts/eval.py --folder outputs/spk_converge_r5 --task captioning
python scripts/prepare_weights.py --folder outputs/spk_converge_r5 \
    --name spk_converge --which best || exit 1

python scripts/train.py --config conf/lis_converge.yaml \
    --folder lis_converge_r5 --max_steps "$LIS_STEPS" || exit 1
python scripts/eval.py --folder outputs/lis_converge_r5 --task grounding
python scripts/prepare_weights.py --folder outputs/lis_converge_r5 \
    --name lis_converge --which best || exit 1

python scripts/train.py --config conf/joint_converge.yaml \
    --folder joint_converge_r5 --max_steps "$JOINT_STEPS" || exit 1
python scripts/eval.py --folder outputs/joint_converge_r5 --task captioning
python scripts/eval.py --folder outputs/joint_converge_r5 --task grounding
echo CURRICULUM DONE
