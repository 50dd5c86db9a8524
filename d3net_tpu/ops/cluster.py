"""Device-side instance clustering (PointGroup grouping, TPU-native).

Replaces the reference's GPU ball-query + CPU BFS connected components
(``lib/pointgroup_ops/src/bfs_cluster/bfs_cluster.cu`` + ``.cpp``) — and its
GPU<->CPU round-trip — with a fully on-device, fixed-shape algorithm:

1. Quantize (already voxel-deduplicated) points into grid cells of size
   ``cell_size`` and fold the semantic label into the cell key, restricting
   connectivity to same-label points exactly like ``bfs_cluster.cpp:28-112``.
2. Lexicographically sort cells (``lax.sort`` with two int32 keys — int64 is
   avoided on TPU), dedup via boundary flags.
3. Build a static (C, K) neighbor-cell table over a Chebyshev ring
   (K = 3^3-1 or 5^3-1 offsets) with a vectorized lexicographic binary
   search, optionally gated by a cell-centroid distance test.
4. Connected components by iterative min-label propagation with pointer
   jumping — O(ring * log(diameter)) fixed iterations, jit-compatible.

Radius semantics: with ``cell_size = radius/2`` and ring=2 every pair within
``radius`` is connected (per-axis separation <= 2 cells); the centroid gate
(<= radius + cell diagonal) prunes spurious long links.  This brackets the
reference's radius graph (which itself subsamples edges via meanActive caps).

Everything is per-scene; callers ``jax.vmap`` over the batch.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

# cell coords are clamped to [0, GRID-1]; GRID=1024 covers 15m+ scenes at
# 1.5cm cells. hi key = sem * GRID + cx < 2^15 for sem < 32.
_GRID = 1024


def _ring_offsets(ring: int):
    r = range(-ring, ring + 1)
    offs = [(dx, dy, dz) for dx in r for dy in r for dz in r]
    return offs


def _pair_less(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def pair_searchsorted(sorted_hi, sorted_lo, qhi, qlo):
    """Leftmost index i with (sorted_hi[i], sorted_lo[i]) >= (qhi, qlo).

    Vectorized lexicographic binary search; sorted_* are (M,), q* any shape.
    """
    n = sorted_hi.shape[0]
    iters = max(1, math.ceil(math.log2(max(n, 2))) + 1)

    def body(_, lh):
        low, high = lh
        cont = low < high
        mid = (low + high) // 2
        midc = jnp.minimum(mid, n - 1)
        less = _pair_less(sorted_hi[midc], sorted_lo[midc], qhi, qlo)
        low = jnp.where(cont & less, mid + 1, low)
        high = jnp.where(cont & ~less, mid, high)
        return low, high

    low = jnp.zeros(qhi.shape, jnp.int32)
    high = jnp.full(qhi.shape, n, jnp.int32)
    low, _ = jax.lax.fori_loop(0, iters, body, (low, high))
    return low


@functools.partial(
    jax.jit,
    static_argnames=("cell_size", "ring", "num_iters", "use_centroid_gate"),
)
def grid_cluster(
    coords,
    sem_labels,
    valid,
    weights=None,
    *,
    cell_size: float = 0.015,
    ring: int = 2,
    num_iters: int = 8,
    use_centroid_gate: bool = True,
    radius: float = 0.03,
):
    """Connected components of the same-label radius graph.

    Args:
        coords: (M, 3) float point/voxel coords (meters).
        sem_labels: (M,) int32 semantic label per point; connectivity is
            restricted to equal labels.
        valid: (M,) bool — points to cluster (others get root -1).
        weights: optional (M,) float point multiplicity (for voxel-level
            clustering, = points per voxel); used only for centroids.

    Returns:
        root: (M,) int32 — component root index in [0, M) for valid points,
            -1 for invalid. Points with equal root are one cluster.
    """
    m = coords.shape[0]
    if weights is None:
        weights = jnp.ones((m,), coords.dtype)

    # --- cell quantization, label folded into the key ---
    origin = jnp.min(jnp.where(valid[:, None], coords, jnp.inf), axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    cell = jnp.clip(
        jnp.floor((coords - origin) / cell_size).astype(jnp.int32), 0, _GRID - 1
    )
    sem = jnp.clip(sem_labels.astype(jnp.int32), 0, 31)
    hi = sem * _GRID + cell[:, 0]
    lo = cell[:, 1] * _GRID + cell[:, 2]
    # isolate invalid points: unique sentinel cells, never matched as neighbors
    idx = jnp.arange(m, dtype=jnp.int32)
    hi = jnp.where(valid, hi, 32 * _GRID + idx)
    lo = jnp.where(valid, lo, 0)

    # --- lexicographic sort + cell dedup ---
    s_hi, s_lo, perm = jax.lax.sort((hi, lo, idx), num_keys=2)
    new_cell = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1]),
        ]
    )
    # cell id per sorted point; C <= M cells, padded arrays sized M
    cell_of_sorted = jnp.cumsum(new_cell.astype(jnp.int32)) - 1
    cell_of_point = jnp.zeros((m,), jnp.int32).at[perm].set(cell_of_sorted)

    num_cells = cell_of_sorted[-1] + 1  # dynamic, <= m
    cell_slot = jnp.arange(m, dtype=jnp.int32)
    cell_valid_pt = valid[perm]
    # representative (first-in-sort) keys per cell
    cell_hi = jnp.full((m,), jnp.int32(32 * _GRID + _GRID)).at[cell_of_sorted].min(s_hi)
    cell_lo = jnp.zeros((m,), jnp.int32).at[cell_of_sorted].max(s_lo)
    cell_lo = jnp.where(cell_slot < num_cells, cell_lo, 0)
    cell_valid = (
        jnp.zeros((m,), bool).at[cell_of_sorted].max(cell_valid_pt)
        & (cell_slot < num_cells)
    )

    # cell centroids (weighted by point multiplicity), coordinate-major
    # (3, M): a (…, 3) layout pads the 3-wide lane dim 42.7x on TPU — at
    # K*M gather width that alone was 15.5GB of padding.
    w = jnp.where(valid, weights, 0.0)
    cw = jnp.maximum(jnp.zeros((m,), coords.dtype).at[cell_of_point].add(w), 1e-8)
    cxyz_t = jnp.stack(
        [
            jnp.zeros((m,), coords.dtype).at[cell_of_point].add(coords[:, a] * w)
            for a in range(3)
        ]
    ) / cw[None, :]                                     # (3, M)

    # --- neighbor-cell table via one batched lexicographic binary search ---
    offs = jnp.asarray(
        [o for o in _ring_offsets(ring) if o != (0, 0, 0)], jnp.int32
    )  # (K, 3)
    c_sem = cell_hi // _GRID
    c_x = cell_hi % _GRID
    c_y = cell_lo // _GRID
    c_z = cell_lo % _GRID
    gate2 = (radius + cell_size * math.sqrt(3.0)) ** 2
    nx = c_x[None, :] + offs[:, 0:1]  # (K, M)
    ny = c_y[None, :] + offs[:, 1:2]
    nz = c_z[None, :] + offs[:, 2:3]
    in_bounds = (
        (nx >= 0) & (nx < _GRID) & (ny >= 0) & (ny < _GRID)
        & (nz >= 0) & (nz < _GRID)
    )
    qhi = c_sem[None, :] * _GRID + nx
    qlo = ny * _GRID + nz
    pos = pair_searchsorted(s_hi, s_lo, qhi, qlo)  # (K, M)
    posc = jnp.minimum(pos, m - 1)
    hit = (s_hi[posc] == qhi) & (s_lo[posc] == qlo) & (pos < m)
    ncell = cell_of_sorted[posc]
    ncell_c = jnp.minimum(ncell, m - 1)
    ok = in_bounds & hit & cell_valid[None, :] & cell_valid[ncell_c]
    if use_centroid_gate:
        # strictly 1-D gathers per coordinate: any (…, 3)-sliced gather
        # materializes a 42.7x lane-padded buffer at K*M width
        d2 = jnp.zeros(ncell_c.shape, coords.dtype)
        for a in range(3):
            ca = cxyz_t[a]
            diff = ca[None, :] - ca[ncell_c]            # (K, M)
            d2 = d2 + diff * diff
        ok = ok & (d2 <= gate2)
    nbr = jnp.where(ok, ncell, cell_slot[None, :]).T  # (M, K); miss -> self

    # --- min-label propagation with pointer jumping ---
    label = cell_slot

    def body(_, lbl):
        nl = jnp.min(lbl[nbr], axis=1)
        lbl = jnp.minimum(lbl, nl)
        lbl = lbl[lbl]
        lbl = lbl[lbl]
        return lbl

    label = jax.lax.fori_loop(0, num_iters, body, label)

    # --- per-point roots: root = index (in point space) of the min point of
    # the component's root cell.  Use each cell's first sorted point as rep.
    first_pt_of_cell = (
        jnp.full((m,), m - 1, jnp.int32).at[cell_of_sorted].min(perm.astype(jnp.int32))
    )
    root_cell = label[cell_of_point]
    root = first_pt_of_cell[root_cell]
    return jnp.where(valid, root, -1)


def compact_clusters(
    root,
    weights,
    valid,
    *,
    max_clusters: int,
    min_points: float,
):
    """Select the top-K clusters by point count, produce dense membership.

    Mirrors the reference's npoint threshold (``cluster_npoint_thre``) and
    the downstream truncation to ``max_num_proposal``
    (``model/pointgroup.py:223-263``) — but selection is by descending size
    rather than arbitrary CPU-BFS order, which is strictly more stable.

    Args:
        root: (M,) int32 component root per point (-1 = not clustered).
        weights: (M,) float point multiplicity (points-per-voxel).
        valid: (M,) bool.
        max_clusters: static K.
        min_points: clusters smaller than this are dropped.

    Returns:
        member: (M,) int32 in [0, K) or -1 — cluster slot per point.
        cluster_mask: (K,) bool — slot occupied.
        cluster_npoint: (K,) float — point count per slot.
    """
    m = root.shape[0]
    ok = valid & (root >= 0)
    safe_root = jnp.where(ok, root, 0)
    npoint = jnp.zeros((m,), weights.dtype).at[safe_root].add(
        jnp.where(ok, weights, 0.0)
    )
    is_root = ok & (root == jnp.arange(m, dtype=root.dtype))
    size_of_root = jnp.where(is_root & (npoint >= min_points), npoint, -1.0)
    top_size, top_idx = jax.lax.top_k(size_of_root, max_clusters)
    cluster_mask = top_size > 0
    # inverse map root index -> slot
    inv = jnp.full((m + 1,), -1, jnp.int32)
    slots = jnp.arange(max_clusters, dtype=jnp.int32)
    inv = inv.at[jnp.where(cluster_mask, top_idx, m)].set(slots)
    member = jnp.where(ok, inv[jnp.minimum(safe_root, m)], -1)
    cluster_npoint = jnp.where(cluster_mask, top_size, 0.0)
    return member, cluster_mask, cluster_npoint
