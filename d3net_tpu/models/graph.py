"""Relational graph over proposals (parity: ``model/graph_module.py``).

TPU-first redesign: the reference builds per-scene PyG sparse graphs on CPU
(scipy coo -> edge_index) and loops over the batch; here the graph is a
dense masked (B, P, P) adjacency and EdgeConv is two batched matmuls —
messages for all pairs, masked aggregation.  P = 128 proposals, so the
dense form is tiny and lives entirely on the MXU.

Semantics preserved:
- adjacency row i = top-``num_locals`` nearest valid proposals of i by
  min corner-to-center distance, excluding boxes with IoU >= 0.5 and self
  (``_query_locals`` / ``_create_adjacent_mat``).
- EdgeConv message (src s -> tgt t) = MLP([x_t, x_s - x_t]), sum-aggregated
  at t; node output = map_input(x) + gcn stack (skip connection).
- edge_feature[b, i, k] = last-layer message for edge (i -> k-th local of
  i, ascending proposal index) plus a 6-bin orientation + distance head.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from d3net_tpu.utils.bbox import aabb_iou_corners

_BIG = 1e30


def query_locals(corners, centers, target_ids, object_masks, num_locals: int,
                 include_self: bool = True, overlay_threshold: float = 0.5):
    """Per-target local-context mask (vectorized ``_query_locals``).

    corners (B,P,8,3), centers (B,P,3), target_ids (B,) -> (B,P) 0/1 mask.
    """
    b, p = object_masks.shape
    tc = jnp.take_along_axis(corners, target_ids[:, None, None, None], axis=1)  # (B,1,8,3)
    # min over the 8 target corners of distance to each proposal center
    d = jnp.sqrt(((tc[:, 0][:, :, None, :] - centers[:, None, :, :]) ** 2).sum(-1) + 1e-8)
    dist = d.min(axis=1)  # (B, P)
    dist = jnp.where(object_masks > 0, dist, _BIG)
    iou = aabb_iou_corners(jnp.broadcast_to(tc, corners.shape), corners)
    dist = jnp.where(iou >= overlay_threshold, _BIG, dist)
    self_onehot = jax.nn.one_hot(target_ids, p, dtype=dist.dtype)
    dist = jnp.where(self_onehot > 0, 0.0 if include_self else _BIG, dist)
    _, topk = jax.lax.top_k(-dist, num_locals)
    mask = jnp.zeros((b, p), dist.dtype)
    mask = jax.vmap(lambda m, ids: m.at[ids].set(1.0))(mask, topk)
    # drop picks that were at infinite distance (fewer than k valid locals)
    picked_d = jnp.take_along_axis(dist, topk, axis=1)
    mask = jax.vmap(lambda m, ids, dd: m.at[ids].min(jnp.where(dd >= _BIG / 2, 0.0, 1.0)))(
        mask, topk, picked_d
    )
    return mask


def adjacency_matrix(corners, centers, object_masks, num_locals: int,
                     overlay_threshold: float = 0.5):
    """(B, P, P) adjacency: row i = locals of proposal i (self excluded)."""
    b, p = object_masks.shape

    def per_target(i):
        ids = jnp.full((b,), i, jnp.int32)
        return query_locals(corners, centers, ids, object_masks, num_locals,
                            include_self=False,
                            overlay_threshold=overlay_threshold)

    rows = jax.vmap(per_target, out_axes=1)(jnp.arange(p, dtype=jnp.int32))
    # rows: (B, P, P) with rows[b, i] = locals mask of i
    valid = object_masks[:, :, None] * object_masks[:, None, :]
    return rows * valid


class EdgeMLP(nn.Module):
    out_size: int

    @nn.compact
    def __call__(self, tgt, src):
        """Message MLP([x_tgt, x_src - x_tgt]) for all (src, tgt) pairs.

        tgt/src: (..., C) broadcastable; returns (..., out_size).
        """
        tgt, src = jnp.broadcast_arrays(tgt, src)
        e = jnp.concatenate([tgt, src - tgt], axis=-1)
        e = nn.Dense(self.out_size)(e)
        e = nn.relu(e)
        return nn.Dense(self.out_size)(e)


class GraphModule(nn.Module):
    out_size: int = 128
    num_layers: int = 2
    num_locals: int = 10
    num_bins: int = 6
    return_orientation: bool = True

    @nn.compact
    def __call__(self, data: Dict) -> Dict:
        obj_feats = data["proposal_feats_batched"]       # (B, P, in)
        masks = data["proposal_batch_mask"]              # (B, P)
        corners = data["proposal_bbox_batched"]          # (B, P, 8, 3)
        centers = (corners.min(axis=2) + corners.max(axis=2)) * 0.5

        b, p, _ = obj_feats.shape
        x = nn.Dense(self.out_size, name="map_input")(obj_feats)
        adj = adjacency_matrix(corners, centers, masks, self.num_locals)  # (B,P,P)
        adj = jax.lax.stop_gradient(adj)

        def edge_conv(layer: EdgeMLP, x):
            # messages[b, s, t] for src s, tgt t
            msg = layer(x[:, None, :, :], x[:, :, None, :])  # (B, P, P, C)
            agg = jnp.einsum("bst,bstc->btc", adj, msg)
            return agg, msg

        h = x
        msg = None
        for li in range(self.num_layers):
            h, msg = edge_conv(EdgeMLP(self.out_size, name=f"gc_{li}"), h)

        new_feats = (x + h) * masks[..., None]

        # k-th local of i by ascending proposal index (PyG coo col order)
        idx = jnp.broadcast_to(jnp.arange(p), (b, p, p))
        order_key = jnp.where(adj > 0, idx, p)
        local_ids = jnp.sort(order_key, axis=-1)[..., : self.num_locals]  # (B,P,L)
        local_mask = (local_ids < p).astype(obj_feats.dtype)
        local_ids = jnp.minimum(local_ids, p - 1)

        out = dict(data)
        out["bbox_feature"] = new_feats
        out["adjacent_mat"] = adj
        out["local_ids"] = local_ids
        out["local_mask"] = local_mask
        # last-layer messages gathered per (i, k-th local)
        gather_msg = jnp.take_along_axis(
            msg, local_ids[..., None], axis=2
        )  # (B, P, L, C)
        out["edge_feature"] = gather_msg * local_mask[..., None]

        if self.return_orientation:
            _, msg_o = edge_conv(EdgeMLP(self.out_size, name="edge_layer"), new_feats)
            edge_pred = nn.Dense(self.num_bins + 1, name="edge_predict")(
                jnp.take_along_axis(msg_o, local_ids[..., None], axis=2)
            )  # (B, P, L, 7)
            out["edge_orientations"] = edge_pred[..., : self.num_bins]
            out["edge_distances"] = edge_pred[..., self.num_bins]
        return out
