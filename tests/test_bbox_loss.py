"""VoteNet bbox loss for the pred_bbox head, vs a direct numpy oracle that
mirrors the reference's per-scene loop (``lib/utils/loss.py:93-196``)."""

import jax.numpy as jnp
import numpy as np

from d3net_tpu.train.losses import bbox_loss

B, P, I, NS = 2, 5, 4, 6


def _softmax_ce(logits, label):
    x = logits - logits.max()
    logp = x - np.log(np.exp(x).sum())
    return -logp[label]


def _huber(x, delta=1.0):
    ax = np.abs(x)
    q = np.minimum(ax, delta)
    return 0.5 * q * q + delta * (ax - q)


def _oracle(out, batch, mean_size):
    tot = {k: 0.0 for k in ("center", "hcls", "hreg", "scls", "sreg", "sem")}
    for b in range(B):
        pm = out["cluster_mask_all"][b] > 0
        gm = batch["gt_box_mask"][b] > 0
        pidx = np.where(pm)[0]
        gidx = np.where(gm)[0]
        pc = out["pred_center"][b][pidx]
        gc = batch["center_label"][b][gidx]
        d = ((pc[:, None] - gc[None]) ** 2).sum(-1)
        d1, ind1 = d.min(1), d.argmin(1)
        d2 = d.min(0)
        n, m = len(pidx), len(gidx)
        tot["center"] += d1.sum() / (n + 1e-6) + d2.sum() / (m + 1e-6)
        assign = gidx[ind1]
        cls_at = batch["sem_cls_label"][b][assign]
        hs = out["heading_scores"][b][pidx]
        tot["hcls"] += np.mean([_softmax_ce(hs[i], 0) for i in range(n)])
        hr = out["heading_residuals_normalized"][b][pidx, 0]
        tot["hreg"] += _huber(hr).sum() / (n + 1e-6)
        ss = out["size_scores"][b][pidx]
        tot["scls"] += np.mean(
            [_softmax_ce(ss[i], cls_at[i]) for i in range(n)])
        srn = out["size_residuals_normalized"][b][pidx]
        pred_res = srn[np.arange(n), cls_at]
        gt_size = batch["size_label"][b][assign]
        res_label = (gt_size - mean_size[cls_at]) / mean_size[cls_at]
        tot["sreg"] += _huber(pred_res - res_label).mean(-1).sum() / (n + 1e-6)
        sem = out["sem_cls_scores"][b][pidx]
        tot["sem"] += np.mean(
            [_softmax_ce(sem[i], cls_at[i]) for i in range(n)])
    for k in tot:
        tot[k] /= B
    tot["bbox"] = (tot["center"] + 0.1 * tot["hcls"] + tot["hreg"]
                   + 0.1 * tot["scls"] + tot["sreg"])
    return tot


def test_bbox_loss_matches_reference_loop():
    rng = np.random.default_rng(0)
    out = {
        "pred_center": rng.normal(size=(B, P, 3)).astype(np.float32),
        "cluster_mask_all": np.array(
            [[1, 1, 1, 0, 0], [1, 1, 1, 1, 0]], np.float32),
        "heading_scores": rng.normal(size=(B, P, 1)).astype(np.float32),
        "heading_residuals_normalized": rng.normal(size=(B, P, 1)).astype(
            np.float32),
        "size_scores": rng.normal(size=(B, P, NS)).astype(np.float32),
        "size_residuals_normalized": rng.normal(size=(B, P, NS, 3)).astype(
            np.float32),
        "sem_cls_scores": rng.normal(size=(B, P, NS)).astype(np.float32),
    }
    batch = {
        "center_label": rng.normal(size=(B, I, 3)).astype(np.float32),
        "size_label": rng.uniform(0.3, 1.5, (B, I, 3)).astype(np.float32),
        "sem_cls_label": rng.integers(0, NS, (B, I)).astype(np.int32),
        "gt_box_mask": np.array([[1, 1, 0, 0], [1, 1, 1, 1]], np.float32),
    }
    mean_size = rng.uniform(0.5, 1.2, (NS, 3)).astype(np.float32)

    got = bbox_loss(
        {k: jnp.asarray(v) for k, v in out.items()},
        {k: jnp.asarray(v) for k, v in batch.items()},
        mean_size_arr=mean_size,
    )
    want = _oracle(out, batch, mean_size)
    np.testing.assert_allclose(float(got["center_loss"]), want["center"], rtol=1e-5)
    np.testing.assert_allclose(float(got["heading_cls_loss"]), want["hcls"], rtol=1e-5)
    np.testing.assert_allclose(float(got["heading_reg_loss"]), want["hreg"], rtol=1e-5)
    np.testing.assert_allclose(float(got["size_cls_loss"]), want["scls"], rtol=1e-5)
    np.testing.assert_allclose(float(got["size_reg_loss"]), want["sreg"], rtol=1e-5)
    np.testing.assert_allclose(float(got["bbox_sem_cls_loss"]), want["sem"], rtol=1e-5)
    np.testing.assert_allclose(float(got["bbox_loss"]), want["bbox"], rtol=1e-5)
    # heading CE over a single bin is exactly 0 (degenerate softmax)
    np.testing.assert_allclose(float(got["heading_cls_loss"]), 0.0, atol=1e-7)


def test_bbox_loss_empty_gt_scene_is_finite():
    rng = np.random.default_rng(1)
    out = {
        "pred_center": rng.normal(size=(1, P, 3)).astype(np.float32),
        "cluster_mask_all": np.ones((1, P), np.float32),
        "heading_scores": rng.normal(size=(1, P, 1)).astype(np.float32),
        "heading_residuals_normalized": rng.normal(size=(1, P, 1)).astype(
            np.float32),
        "size_scores": rng.normal(size=(1, P, NS)).astype(np.float32),
        "size_residuals_normalized": rng.normal(size=(1, P, NS, 3)).astype(
            np.float32),
        "sem_cls_scores": rng.normal(size=(1, P, NS)).astype(np.float32),
    }
    batch = {
        "center_label": np.zeros((1, I, 3), np.float32),
        "size_label": np.zeros((1, I, 3), np.float32),
        "sem_cls_label": np.zeros((1, I), np.int32),
        "gt_box_mask": np.zeros((1, I), np.float32),
    }
    got = bbox_loss({k: jnp.asarray(v) for k, v in out.items()},
                    {k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(got["bbox_loss"]))
    np.testing.assert_allclose(float(got["bbox_loss"]), 0.0, atol=1e-6)
