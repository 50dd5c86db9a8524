"""Eval-protocol gap coverage: contrastive loss, unique/multiple/others
grounding breakdowns, random-crop augmentation wiring."""

import numpy as np
import jax.numpy as jnp

from d3net_tpu.data.dataset import crop_scene
from d3net_tpu.data.language import lang_chunk_for_scene
from d3net_tpu.data.synthetic import make_scene
from d3net_tpu.data.vocab import Vocabulary
from d3net_tpu.data.language import base_corpus
from d3net_tpu.eval.grounding_eval import GroundingEvaluator
from d3net_tpu.train.losses_slt import contrastive_loss, grounding_loss
from d3net_tpu.utils.bbox import box_corners


def test_contrastive_loss_oracle():
    """Matches the reference formula run per row (lib/grounding/loss.py:27-40)."""
    rng = np.random.default_rng(0)
    preds = rng.standard_normal((5, 8)).astype(np.float32)
    targets = np.zeros((5, 8), np.float32)
    targets[np.arange(5), rng.integers(0, 8, 5)] = 1.0

    got = np.asarray(contrastive_loss(jnp.asarray(preds), jnp.asarray(targets),
                                      reduce=False))
    for i in range(5):
        score = preds[i] * 5.0
        sim = (score * targets[i]).sum()
        neg = score * (1.0 - targets[i])
        neg_sim = np.log(np.exp(neg).sum())
        want = max(neg_sim - sim + 0.2, 0.0)
        assert np.isclose(got[i], want, atol=1e-5), (i, got[i], want)


def test_contrastive_loss_separates():
    """Strongly-correct predictions give (near-)zero loss; wrong ones don't."""
    t = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    good = t * 10.0
    bad = jnp.roll(t, 1, axis=1) * 10.0
    assert float(contrastive_loss(good, t)) < 0.01
    assert float(contrastive_loss(bad, t)) > 10.0


def test_grounding_loss_loss_type_switch():
    rng = np.random.default_rng(1)
    pred_corners = np.stack([
        np.stack([box_corners(np.array([j, 0, 0.]), np.ones(3)) for j in range(4)])
        for _ in range(3)
    ])
    ref = pred_corners[:, 1]
    conf = jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32))
    l_ce, _ = grounding_loss(conf, jnp.asarray(pred_corners), jnp.asarray(ref))
    l_con, _ = grounding_loss(conf, jnp.asarray(pred_corners), jnp.asarray(ref),
                              loss_type="contrastive")
    assert np.isfinite(float(l_ce)) and np.isfinite(float(l_con))
    assert not np.isclose(float(l_ce), float(l_con))


def test_grounding_evaluator_breakdowns():
    ev = GroundingEvaluator()
    p = 4
    corners = np.stack([box_corners(np.array([j, 0, 0.]), np.ones(3))
                        for j in range(p)])[None].repeat(4, 0)
    conf = np.zeros((4, p), np.float32)
    conf[np.arange(4), [0, 0, 1, 1]] = 1.0  # picks
    refs = np.stack([corners[0, 0], corners[0, 1],   # hit, miss
                     corners[0, 1], corners[0, 0]])  # hit, miss
    ev.add(conf, corners, np.ones((4, p)), refs, np.ones(4),
           unique_multiple=np.array([0, 0, 1, 1.0]),
           object_cat=np.array([3, 17, 3, 17]))
    out = ev.compute()
    assert np.isclose(out["acc@0.5"], 0.5)
    assert np.isclose(out["unique_acc@0.5"], 0.5)
    assert np.isclose(out["multiple_acc@0.5"], 0.5)
    assert np.isclose(out["others_acc@0.5"], 0.0)
    assert np.isclose(out["not_others_acc@0.5"], 1.0)


def test_unique_multiple_label():
    scene = make_scene(seed=3, num_instances=8)
    vocab = Vocabulary.build(base_corpus())
    rng = np.random.default_rng(0)
    chunk = lang_chunk_for_scene(scene, vocab, 8, 10, rng, 16)
    cls = scene.instance_bboxes[:, 6].astype(int)
    counts = np.bincount(cls, minlength=20)
    # every annotated row's unique_multiple must match the scene class counts
    ann = chunk["annotated"] > 0
    assert ann.any()
    for c in np.where(ann)[0]:
        cat = chunk["ref_cat_label"][c]
        # recover the NYU class: cat==17 can be sem 0,1,19 — skip ambiguity
        nyu = cat + 2
        if counts[nyu] > 0:
            assert chunk["unique_multiple"][c] == float(counts[nyu] > 1)


def test_crop_scene_bounds_points():
    scene = make_scene(seed=0, num_instances=10, points_per_instance=4000,
                       floor_points=20000)
    n0 = len(scene.xyz)
    cap = n0 // 2
    rng = np.random.default_rng(0)
    out = crop_scene(scene, cap, 50.0, 512.0, rng)
    assert len(out.xyz) <= cap
    assert len(out.xyz) > 0
    assert len(out.sem_labels) == len(out.xyz) == len(out.instance_ids)
    # crop keeps a spatially-contiguous window, not the head of the array
    assert not np.array_equal(out.xyz, scene.xyz[: len(out.xyz)])
    # small caps still terminate
    tiny = crop_scene(scene, 1000, 50.0, 512.0, rng)
    assert len(tiny.xyz) <= 1000
