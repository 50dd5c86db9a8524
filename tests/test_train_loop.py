import pytest


def test_migrate_legacy_block_names():
    from d3net_tpu.train.migrate import migrate_legacy_block_names as mig

    legacy = {
        "unet": {
            "CheckpointResidualBlock_0": {"k": 0},
            "CheckpointResidualBlock_1": {"k": 1},
            "CheckpointResidualBlock_2": {"k": 2},
            "CheckpointResidualBlock_3": {"k": 3},
            "UBlock_0": {
                "ResidualBlock_0": {"k": 4},
                "ResidualBlock_1": {"k": 5},
            },
            "SubmConv_0": {"kernel": 9},
        }
    }
    got = mig(legacy)
    u = got["unet"]
    assert u["blk0"] == {"k": 0} and u["blk1"] == {"k": 1}
    assert u["tail0"] == {"k": 2} and u["tail1"] == {"k": 3}
    # deepest level (no nested UBlock): all head reps
    assert u["UBlock_0"]["blk0"] == {"k": 4}
    assert u["UBlock_0"]["blk1"] == {"k": 5}
    assert u["SubmConv_0"] == {"kernel": 9}
    # idempotent on migrated trees
    assert mig(got) == got


@pytest.mark.slow
def test_scan_trainer_augment_variants(tmp_path):
    """run_detector_training_scan with augmentation ON: pre-built epoch
    variants differ (real augmentation) and two dispatches train with
    finite metrics (VERDICT r2 #4: the reference never trains unaugmented,
    ``lib/dataset/pipeline.py:679-697``)."""
    import json
    import os

    import numpy as np

    from d3net_tpu.config import load

    cfg = load("conf/debug/tiny_converge.yaml")
    cfg.general.output_root = str(tmp_path)
    cfg.data.transform.jitter = True
    cfg.data.transform.flip = True
    cfg.data.transform.rot = True
    cfg.data.elastic = True
    cfg.tpu.steps_per_dispatch = 2
    cfg.tpu.augment_variants = 2
    run_dir = os.path.join(str(tmp_path), "scan_run")

    from d3net_tpu.train.loop import run_detector_training_scan
    run_detector_training_scan(cfg, run_dir, max_steps=4)

    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    train = [r for r in recs if "train/total_loss" in r]
    assert len(train) >= 2  # two dispatches
    for r in train:
        assert np.isfinite(r["train/total_loss"])

    # the two epoch variants must be genuinely different augmentations
    from d3net_tpu.train.loop import make_dataloaders, spec_from_cfg
    spec = spec_from_cfg(cfg)
    it, _ = make_dataloaders(cfg, spec)
    it.augment = True
    it.epoch = 0
    b0 = next(iter(it))
    it.epoch = 1
    b1 = next(iter(it))
    assert not np.allclose(b0["point_feats"], b1["point_feats"])


@pytest.mark.slow
def test_nonscan_trainer_cycles_augment_variants(tmp_path):
    """run_detector_training with cache_batches + augmentation: the first
    N epochs cache independent augmented copies, later epochs cycle them."""
    import json
    import os

    import numpy as np

    from d3net_tpu.config import load

    cfg = load("conf/debug/tiny_converge.yaml")
    cfg.general.output_root = str(tmp_path)
    cfg.data.transform.jitter = True
    cfg.data.transform.flip = True
    cfg.data.transform.rot = True
    cfg.tpu.cache_batches = True
    cfg.tpu.augment_variants = 2
    cfg.train.epochs = 3
    cfg.train.log_every_n_steps = 1
    run_dir = os.path.join(str(tmp_path), "cached_aug_run")

    from d3net_tpu.train.loop import run_detector_training
    run_detector_training(cfg, run_dir, max_steps=12)

    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    train = [r for r in recs if "train/total_loss" in r]
    assert len(train) >= 3
    assert all(np.isfinite(r["train/total_loss"]) for r in train)

def test_augment_transforms_instance_bboxes():
    """Rot/flip augmentation must carry the GT boxes with the points —
    otherwise grounding targets (ref_box_corner_label) and spatial-relation
    descriptions are built in raw space against augmented geometry (the
    round-3 joint-RL zero-IoU bug; ref rotates aligned boxes with the
    points, lib/dataset/pipeline.py)."""
    import numpy as np
    from d3net_tpu.data.dataset import augment_scene
    from d3net_tpu.data.language import lang_chunk_for_scene
    from d3net_tpu.data.synthetic import make_scene
    from d3net_tpu.data.vocab import Vocabulary
    from d3net_tpu.data.language import base_corpus
    from d3net_tpu.utils.bbox import box_corners

    scene = make_scene(seed=3, num_instances=3)
    rng = np.random.default_rng(0)
    aug = augment_scene(scene, rng, jitter=False, flip=True, rot=True)

    def iou_aabb(lo1, hi1, lo2, hi2):
        inter = np.prod(np.maximum(np.minimum(hi1, hi2) - np.maximum(lo1, lo2), 0))
        v1, v2 = np.prod(hi1 - lo1), np.prod(hi2 - lo2)
        return inter / (v1 + v2 - inter + 1e-9)

    for s in (scene, aug):  # box/point consistency must survive augmentation
        for row in s.instance_bboxes:
            inst = int(row[7])
            pts = s.xyz[s.instance_ids == inst]
            lo, hi = pts.min(0), pts.max(0)
            c, d = row[:3], row[3:6]
            iou = iou_aabb(lo, hi, c - d / 2, c + d / 2)
            assert iou > 0.5, (s is aug, inst, iou)

    # lang targets are built from the (augmented) scene's boxes
    vocab = Vocabulary.build(base_corpus())
    chunk = lang_chunk_for_scene(aug, vocab, 4, 10, rng, 8)
    for c in range(4):
        if chunk["annotated"][c] < 1:
            continue
        inst = int(np.argmax(chunk["ref_box_label"][c]))
        row = aug.instance_bboxes[
            np.where(aug.instance_bboxes[:, 7] == inst)[0][0]]
        np.testing.assert_allclose(
            chunk["ref_box_corner_label"][c],
            box_corners(row[:3], row[3:6]), atol=1e-5)
