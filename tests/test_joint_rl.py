"""Joint RL step on the CPU in-graph io_callback path (VERDICT r2 #7).

The tunneled axon TPU rejects host callbacks, so production uses the
two-phase sample->host-score->teacher-force path; the in-graph
``io_callback`` path (the reference's single-dispatch semantics,
``lib/captioning/loss_helper.py:15-96``) only ever runs on CPU.  This test
pins it so it cannot silently bitrot.
"""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (r4 VERDICT #9)


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="in-graph io_callback path is CPU-only")
def test_joint_rl_one_step_in_graph_callbacks(tmp_path):
    from d3net_tpu.config import load
    from d3net_tpu.train import pipeline_loop as pl

    # CPU default: io_callback in-graph, no two-phase split
    assert pl.use_two_phase_rl() is False

    cfg = load("conf/debug/tiny_joint.yaml")
    cfg.general.output_root = str(tmp_path)
    cfg.train.epochs = 2
    # exercise the cached-augmented-variant path of the pipeline loop too
    cfg.tpu.cache_batches = True
    cfg.tpu.augment_variants = 2
    cfg.data.transform.jitter = True
    run_dir = os.path.join(str(tmp_path), "joint_run")
    pl.run_pipeline_training(cfg, run_dir, max_steps=2)

    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    train_recs = [r for r in recs if "train/loss" in r]
    assert train_recs, f"no train metrics logged: {recs[:3]}"
    rec = train_recs[-1]
    assert np.isfinite(rec["train/loss"])
    # the reward plumbing ran in-graph: ttl_rwd logged and finite
    rwd_keys = [k for k in rec if "rwd" in k or "reward" in k]
    assert rwd_keys, f"no reward metric in {sorted(rec)}"
    for k in rwd_keys:
        assert np.isfinite(rec[k]), (k, rec[k])


def test_caption_reward_symmetry():
    """Self-critical contract: identical sampled and baseline captions
    produce exactly zero reward (CIDEr delta cancels)."""
    from d3net_tpu.data.language import base_corpus
    from d3net_tpu.data.vocab import Vocabulary
    from d3net_tpu.train.pipeline_loop import make_caption_reward_fn

    vocab = Vocabulary.build(base_corpus())
    fn = make_caption_reward_fn(vocab, 1.0, 0.0)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, min(30, len(vocab.itos) if hasattr(vocab, "itos")
                              else 30), size=(6, 8)).astype(np.int32)
    gt = ids.copy()
    ann = np.ones((6,), np.float32)
    s = np.asarray(fn(ids, gt, ann))
    b = np.asarray(fn(ids, gt, ann))
    np.testing.assert_allclose(s - b, 0.0, atol=1e-7)
    assert np.isfinite(s).all()


def test_caption_reward_multi_reference():
    """(N, R, T) gt_refs: a candidate matching ANY annotation of the object
    scores high (ref scores against every entry of organized_data
    [scene][object], ``lib/captioning/loss_helper.py:58-67``)."""
    from d3net_tpu.data.language import base_corpus
    from d3net_tpu.data.vocab import Vocabulary
    from d3net_tpu.train.pipeline_loop import make_caption_reward_fn

    vocab = Vocabulary.build(base_corpus())
    fn = make_caption_reward_fn(vocab, 1.0, 0.0)
    enc = lambda words: vocab.encode(words, 8)

    ref_a = enc("the small chair near the table".split())
    ref_b = enc("the tall chair left of the door".split())
    cand = np.stack([ref_b, ref_b]).astype(np.int32)      # matches ref 2 only
    # row 0: both refs; row 1: only ref_a (ref 2 slot is all-zero padding)
    zeros = np.zeros_like(ref_a)
    gt3 = np.stack([
        np.stack([ref_a, ref_b]),
        np.stack([ref_a, zeros]),
    ]).astype(np.int32)                                   # (2, 2, T)
    ann = np.ones((2,), np.float32)
    multi = np.asarray(fn(cand, gt3, ann))
    assert multi[0] > multi[1], multi
    assert multi[0] > 0.5, multi
    # 2-D gt still works (backward compatible)
    single = np.asarray(fn(cand, gt3[:, 0], ann))
    assert np.isfinite(single).all()


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="in-graph io_callback path is CPU-only")
def test_joint_rl_step_with_xe_anchor_and_multi_refs(tmp_path):
    """rl_xe_weight > 0 adds a finite XE anchor term and gt_refs flow
    through the reward path (collapse guard for the joint stage)."""
    from d3net_tpu.config import load
    from d3net_tpu.train import pipeline_loop as pl

    cfg = load("conf/debug/tiny_joint.yaml")
    cfg.general.output_root = str(tmp_path)
    cfg.train.epochs = 1
    cfg.train.rl_xe_weight = 0.2
    cfg.train.num_caption_refs = 3
    run_dir = os.path.join(str(tmp_path), "joint_xe_run")
    pl.run_pipeline_training(cfg, run_dir, max_steps=1)

    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    train_recs = [r for r in recs if "train/loss" in r]
    assert train_recs, f"no train metrics logged: {recs[:3]}"
    rec = train_recs[-1]
    assert "train/cap_xe_loss" in rec, sorted(rec)
    assert np.isfinite(rec["train/cap_xe_loss"])
    assert np.isfinite(rec["train/loss"])
