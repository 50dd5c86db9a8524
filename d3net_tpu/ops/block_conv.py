"""Block-dense sparse convolution (TPU-native backbone, round 2).

The gather-matmul sparse conv (:mod:`d3net_tpu.ops.sparse_conv`) issues ~27
random HBM row-gathers per output voxel; at 10^5 voxels that is
latency-bound (~2.3s of the flagship forward, docs/perf_notes.md).  This
module re-lays sparse voxels into dense 8^3 spatial blocks (host tables:
``ops.voxelize.build_block_maps``) and computes convolution with plain XLA
conv3d over haloed block tiles:

- all random HBM access happens at whole-block granularity (26 neighbor
  -block gathers of 512*C contiguous floats each — bandwidth-bound);
- the convolution itself is dense 3^3 / 2^3 conv on the MXU (measured
  >100x faster than table gathers on the ScoreNet lattice);
- submanifold semantics are preserved by masking every conv output to the
  voxel occupancy pattern (empty cells hold zeros, so they contribute
  nothing to neighbors — exactly the gather conv's sum over occupied
  neighbors).

Reference parity: same math as MinkowskiEngine's subm/stride-2/transposed
convs used via ``model/common.py:73-118``; numerics vs the gather conv are
oracle-tested in tests/test_block_conv.py.

All functions are per-scene; callers vmap over the batch.  ``dense``
feature layout: (NB+1, 512, C) with block index NB the all-zero pad block
(INVALID target of every table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from d3net_tpu.ops.voxelize import BLOCK, BLOCK_CELLS

_OFFS3 = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
          for dz in (-1, 0, 1)]
_OFFS2 = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


def rows_to_blocks(feats, vox2cell, valid, nbcap: int):
    """(cap, C) voxel-row feats -> (NB+1, 512, C) block-dense (pad block 0)."""
    c = feats.shape[-1]
    safe = jnp.where(valid[:, None], feats, 0.0).astype(feats.dtype)
    dense = jnp.zeros(((nbcap + 1) * BLOCK_CELLS, c), feats.dtype)
    dense = dense.at[vox2cell].set(safe)
    return dense.reshape(nbcap + 1, BLOCK_CELLS, c)


def blocks_to_rows(dense, vox2cell):
    """(NB+1, 512, C) -> (cap, C) voxel-row gather (INVALID rows read pad)."""
    return dense.reshape(-1, dense.shape[-1])[vox2cell]


def block_occupancy(vox2cell, valid, nbcap: int):
    """(cap,) tables -> (NB+1, 512) float occupancy; pad block all zero."""
    occ = jnp.zeros(((nbcap + 1) * BLOCK_CELLS,), jnp.float32)
    occ = occ.at[vox2cell].set(valid.astype(jnp.float32))
    occ = occ.at[nbcap * BLOCK_CELLS].set(0.0)  # INVALID rows land here
    return occ.reshape(nbcap + 1, BLOCK_CELLS)


def _halo_ranges(o: int):
    """Per-axis (dst_start, dst_stop, src_start, src_stop) in the 10^3 halo."""
    if o == -1:
        return 0, 1, BLOCK - 1, BLOCK
    if o == 0:
        return 1, 1 + BLOCK, 0, BLOCK
    return 1 + BLOCK, 2 + BLOCK, 0, 1


@functools.lru_cache(maxsize=None)
def _face_cells(ox: int, oy: int, oz: int) -> np.ndarray:
    """Static linear cell ids a neighbor at offset (ox,oy,oz) contributes.

    Only the facing plane/edge/corner of a neighbor block enters the halo
    (64/8/1 cells); pre-slicing before the block gather cuts the random HBM
    traffic ~27x vs gathering whole 512-cell blocks.
    """
    axes = []
    for o in (ox, oy, oz):
        _, _, s0, s1 = _halo_ranges(o)
        axes.append(list(range(s0, s1)))
    return np.asarray(
        [(x * BLOCK + y) * BLOCK + z
         for x in axes[0] for y in axes[1] for z in axes[2]],
        np.int32,
    )


def _conv3d(x, w, strides):
    """NDHWC conv, VALID, f32 accumulation, output in x.dtype."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=strides, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def subm_conv(dense, occ, block_nbr, w):
    """Submanifold 3^3 conv: (NB+1, 512, Cin) -> (NB+1, 512, Cout).

    w: (27, Cin, Cout) — same parameter layout (and offset order,
    ``_offsets(3)`` row-major) as the gather conv, so weights are
    interchangeable between implementations.
    """
    nbcap = dense.shape[0] - 1
    cin = dense.shape[-1]
    cout = w.shape[-1]
    d = dense.reshape(nbcap + 1, BLOCK, BLOCK, BLOCK, cin)
    halo = jnp.zeros((nbcap, BLOCK + 2, BLOCK + 2, BLOCK + 2, cin),
                     dense.dtype)
    for k, (ox, oy, oz) in enumerate(_OFFS3):
        dx0, dx1, sx0, sx1 = _halo_ranges(ox)
        dy0, dy1, sy0, sy1 = _halo_ranges(oy)
        dz0, dz1, sz0, sz1 = _halo_ranges(oz)
        if (ox, oy, oz) == (0, 0, 0):
            src = d[:nbcap, sx0:sx1, sy0:sy1, sz0:sz1]
        else:
            # pre-slice the facing cells, then gather: the random HBM
            # access moves only the face/edge/corner (64/8/1 cells), not
            # whole 512-cell blocks
            cells = jnp.asarray(_face_cells(ox, oy, oz))
            pre = dense[:, cells, :]                 # (NB+1, n_k, C)
            src = pre[block_nbr[:, k]].reshape(
                nbcap, dx1 - dx0, dy1 - dy0, dz1 - dz0, cin
            )
        halo = halo.at[:, dx0:dx1, dy0:dy1, dz0:dz1].set(src)
    out = _conv3d(halo, w.reshape(3, 3, 3, cin, cout), (1, 1, 1))
    out = out.reshape(nbcap, BLOCK_CELLS, cout) * occ[:nbcap][..., None]
    return jnp.concatenate(
        [out, jnp.zeros((1, BLOCK_CELLS, cout), out.dtype)], axis=0
    )


def down_conv(dense_f, block_child, occ_c, w):
    """Stride-2 kernel-2 conv: fine blocks -> coarse blocks.

    block_child: (NBc, 8) fine-block ids at 2*bc + {0,1}^3 (INVALID = NBf).
    w: (8, Cin, Cout), offset order ``_offsets(2)``.
    """
    nbf = dense_f.shape[0] - 1
    nbc = block_child.shape[0]
    cin = dense_f.shape[-1]
    cout = w.shape[-1]
    d = dense_f.reshape(nbf + 1, BLOCK, BLOCK, BLOCK, cin)
    vol = jnp.zeros((nbc, 2 * BLOCK, 2 * BLOCK, 2 * BLOCK, cin),
                    dense_f.dtype)
    for k, (ox, oy, oz) in enumerate(_OFFS2):
        vol = vol.at[
            :, ox * BLOCK:(ox + 1) * BLOCK, oy * BLOCK:(oy + 1) * BLOCK,
            oz * BLOCK:(oz + 1) * BLOCK,
        ].set(d[block_child[:, k]])
    out = _conv3d(vol, w.reshape(2, 2, 2, cin, cout), (2, 2, 2))
    out = out.reshape(nbc, BLOCK_CELLS, cout) * occ_c[:nbc][..., None]
    return jnp.concatenate(
        [out, jnp.zeros((1, BLOCK_CELLS, cout), out.dtype)], axis=0
    )


@functools.lru_cache(maxsize=None)
def _quad_cells() -> np.ndarray:
    """(8, 64) linear cell ids of each (4,4,4) quadrant of an 8^3 block."""
    h = BLOCK // 2
    out = np.empty((8, h * h * h), np.int32)
    for q in range(8):
        qx, qy, qz = (q >> 2) & 1, (q >> 1) & 1, q & 1
        idx = []
        for i in range(h):
            for j in range(h):
                for k in range(h):
                    x, y, z = qx * h + i, qy * h + j, qz * h + k
                    idx.append((x * BLOCK + y) * BLOCK + z)
        out[q] = idx
    return out


def up_conv(dense_c, block_parent, block_quad, occ_f, w):
    """Transposed stride-2 kernel-2 conv: coarse blocks -> fine blocks.

    Each fine block reads the (4,4,4) quadrant of its parent coarse block
    and expands it 2x; out[2p + o] = in[p] @ w[o] (matches the row-space
    ``upsample_table`` semantics: fine voxel f reads parent f>>1 under
    kernel offset f mod 2).
    """
    nbf = block_parent.shape[0]
    cin = dense_c.shape[-1]
    cout = w.shape[-1]
    h = BLOCK // 2
    par = dense_c[block_parent]                       # (NBf, 512, Cin)
    cells = jnp.asarray(_quad_cells())[block_quad]    # (NBf, 64)
    sub = jnp.take_along_axis(par, cells[..., None], axis=1)
    sub = sub.reshape(nbf, h, h, h, cin)
    # conv_transpose applies the kernel spatially flipped; pre-flip so
    # out[2p + o] = in[p] @ w[o] (the upsample_table semantics)
    wk = w.reshape(2, 2, 2, cin, cout)[::-1, ::-1, ::-1]
    out = jax.lax.conv_transpose(
        sub, wk.astype(sub.dtype),
        strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ).astype(dense_c.dtype)
    out = out.reshape(nbf, BLOCK_CELLS, cout) * occ_f[:nbf][..., None]
    return jnp.concatenate(
        [out, jnp.zeros((1, BLOCK_CELLS, cout), out.dtype)], axis=0
    )


def one_by_one(dense, occ, w):
    """1x1x1 conv (channel projection) masked to occupancy."""
    cout = w.shape[-1]
    out = jnp.einsum(
        "bmc,cd->bmd", dense[:-1], w[0].astype(dense.dtype),
        preferred_element_type=jnp.float32,
    ).astype(dense.dtype) * occ[:-1][..., None]
    return jnp.concatenate(
        [out, jnp.zeros((1, BLOCK_CELLS, cout), out.dtype)], axis=0
    )
