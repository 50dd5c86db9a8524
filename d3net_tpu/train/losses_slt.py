"""Speaker (captioning) and listener (grounding) losses.

Parity targets:
- caption XE + accuracy over good-bbox entries with pad ignore
  (``lib/captioning/loss_helper.py:178-215``),
- 6-bin relative-orientation CE over graph edges
  (``compute_node_orientation_loss`` :244-307),
- SoftmaxRankingLoss grounding with argmax-IoU one-hot labels + Acc@kIoU
  metrics (``lib/grounding/loss_helper.py:130-214``, ``loss.py:6-25``),
- language-to-object classification CE (``get_lobjcls_loss`` :231-302).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from d3net_tpu.utils.bbox import aabb_iou_corners


def caption_loss(pred_logits, lang_ids, good_bbox_masks, pad_id: int = 0):
    """pred_logits (N, T-1, V); lang_ids (N, T); targets are words 1..T-1."""
    targets = lang_ids[:, 1:]
    token_mask = (targets != pad_id) & good_bbox_masks[:, None]
    logp = jax.nn.log_softmax(pred_logits, -1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    w = token_mask.astype(nll.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    loss = (nll * w).sum() / denom
    pred_ids = jnp.argmax(pred_logits, -1)
    acc = ((pred_ids == targets) * w).sum() / denom
    any_good = good_bbox_masks.sum() > 0
    return jnp.where(any_good, loss, 0.0), jnp.where(any_good, acc, 0.0)


def radian_to_label(radians, num_bins: int = 6):
    """Bucketize [0, pi) rotation angles into num_bins classes."""
    width = jnp.pi / num_bins
    return jnp.clip((radians // width).astype(jnp.int32), 0, num_bins - 1)


def orientation_loss(
    edge_orientations,   # (B, P, L, num_bins)
    local_ids,           # (B, P, L)
    local_mask,          # (B, P, L)
    object_assignment,   # (B, P)
    rotations,           # (B, I, 3, 3)
    rotation_masks,      # (B, I)
    num_bins: int = 6,
):
    """Relative-rotation-bin CE over graph edges (src=i, tgt=local)."""
    rot = jnp.take_along_axis(
        rotations, object_assignment[..., None, None], axis=1
    )  # (B, P, 3, 3)
    rmask = jnp.take_along_axis(rotation_masks, object_assignment, axis=1)

    src_rot = rot[:, :, None]                                    # (B, P, 1, 3, 3)
    tgt_rot = jnp.take_along_axis(
        rot, local_ids.reshape(rot.shape[0], -1)[..., None, None], axis=1
    ).reshape(local_ids.shape + (3, 3))                          # (B, P, L, 3, 3)
    rel = jnp.matmul(src_rot, jnp.swapaxes(tgt_rot, -1, -2))
    tr = jnp.trace(rel, axis1=-2, axis2=-1)
    ang = jnp.arccos(jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0))      # (B, P, L)
    labels = radian_to_label(ang, num_bins)

    src_m = rmask[:, :, None]
    tgt_m = jnp.take_along_axis(
        rmask, local_ids.reshape(rmask.shape[0], -1), axis=1
    ).reshape(local_ids.shape)
    w = (src_m * tgt_m * local_mask).astype(edge_orientations.dtype)

    logp = jax.nn.log_softmax(edge_orientations, -1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    denom = w.sum() + 1e-8
    loss = (nll * w).sum() / denom
    acc = ((jnp.argmax(edge_orientations, -1) == labels) * w).sum() / denom
    return loss, acc


def softmax_ranking_loss(preds, targets, reduce: bool = True):
    """-sum(target * log softmax(pred)) (ref ``SoftmaxRankingLoss``)."""
    probs = jax.nn.softmax(preds + 1e-8, axis=1)
    loss = -jnp.sum(jnp.log(probs + 1e-8) * targets, axis=1)
    return loss.mean() if reduce else loss


def contrastive_loss(preds, targets, margin: float = 0.2, gamma: float = 5.0,
                     reduce: bool = True):
    """Per-row contrastive ranking loss (ref ``ContrastiveLoss``,
    ``lib/grounding/loss.py:27-40``; called once per batch row with
    margin=0.2, gamma=5 in ``loss_helper.py:93,165``).

    loss_i = max(0, logsumexp_j(gamma*pred_ij*(1-t_ij)) - sum_j(gamma*pred_ij*t_ij) + margin)

    Negatives are zeroed (not -inf-masked) inside the logsumexp, exactly as
    the reference multiplies by ``label.logical_not()``.
    """
    score = preds * gamma
    sim = (score * targets).sum(axis=1)
    neg_sim = jax.nn.logsumexp(score * (1.0 - targets), axis=1)
    loss = jnp.maximum(neg_sim - sim + margin, 0.0)
    return loss.mean() if reduce else loss


def grounding_labels(pred_corners, ref_corner_label):
    """One-hot argmax-IoU labels (ref :148-158).

    pred_corners (N, P, 8, 3); ref_corner_label (N, 8, 3) -> (N, P)."""
    ious = aabb_iou_corners(pred_corners, ref_corner_label[:, None])
    return jax.nn.one_hot(jnp.argmax(ious, -1), ious.shape[-1]), ious


def grounding_loss(
    cluster_ref,        # (N, P) confidences
    pred_corners,       # (N, P, 8, 3)
    ref_corner_label,   # (N, 8, 3)
    annotated=None,     # (N,) optional mask over description rows
    reduce: bool = True,
    loss_type: str = "cross_entropy",
) -> Tuple[jnp.ndarray, Dict]:
    labels, ious = grounding_labels(pred_corners, ref_corner_label)
    if loss_type == "contrastive":
        per_row = contrastive_loss(cluster_ref, labels, reduce=False)
    else:
        per_row = softmax_ranking_loss(cluster_ref, labels, reduce=False)
    if annotated is not None:
        w = annotated.astype(per_row.dtype)
        loss = (per_row * w).sum() / jnp.maximum(w.sum(), 1.0)
    else:
        w = jnp.ones_like(per_row)
        loss = per_row.mean()

    pred_idx = jnp.argmax(cluster_ref, -1)
    label_idx = jnp.argmax(labels, -1)
    chosen_iou = jnp.take_along_axis(ious, pred_idx[:, None], axis=1)[:, 0]
    best_iou = jnp.take_along_axis(ious, label_idx[:, None], axis=1)[:, 0]
    denom = jnp.maximum(w.sum(), 1.0)
    metrics = {
        "ref_acc_mean": ((pred_idx == label_idx) * w).sum() / denom,
        "ref_iou_mean": (chosen_iou * w).sum() / denom,
        "best_ious_mean": (best_iou * w).sum() / denom,
        "ref_iou_rate_0.25": ((chosen_iou >= 0.25) * w).sum() / denom,
        "ref_iou_rate_0.5": ((chosen_iou >= 0.5) * w).sum() / denom,
    }
    if reduce:
        return loss, metrics
    return per_row, metrics


def lang_cls_loss(lang_scores, ref_cat_label, annotated=None, reduce: bool = True):
    """Language object-class CE (ref ``get_lobjcls_loss``)."""
    logp = jax.nn.log_softmax(lang_scores, -1)
    nll = -jnp.take_along_axis(logp, ref_cat_label[:, None], axis=-1)[:, 0]
    w = annotated.astype(nll.dtype) if annotated is not None else jnp.ones_like(nll)
    denom = jnp.maximum(w.sum(), 1.0)
    loss = (nll * w).sum() / denom
    acc = ((jnp.argmax(lang_scores, -1) == ref_cat_label) * w).sum() / denom
    if reduce:
        return loss, acc
    return nll, acc
