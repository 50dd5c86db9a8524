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
    dense = dense.reshape(nbcap + 1, BLOCK_CELLS, c)
    # voxels whose block overflowed nb_caps carry vox2cell == nbcap*512 even
    # when valid; their scatter would leave garbage in the pad block that
    # every INVALID gather then reads — keep the pad block all-zero
    return dense.at[nbcap].set(0.0)


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


# Blocks processed per sequential chunk of the subm/down/up convs.  A
# flagship level-0 halo at full width is (6554, 10^3, C) — multiplied by
# B under vmap that alone OOMs 16GB HBM at compile; chunking bounds every
# transient to ~chunk * 10^3 * C while the face pre-slices (computed once
# per conv) stay whole.
_BCHUNK = 512


def _pad_rows_to(a, mult, fill):
    pad = (-a.shape[0]) % mult
    if pad == 0:
        return a, 0
    filler = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a, filler], axis=0), pad


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
    # face pre-slices once per conv: the random HBM access then moves only
    # the facing plane/edge/corner (64/8/1 cells), not whole 512-cell blocks
    faces = []
    for k, (ox, oy, oz) in enumerate(_OFFS3):
        if (ox, oy, oz) == (0, 0, 0):
            faces.append(None)
        else:
            cells = jnp.asarray(_face_cells(ox, oy, oz))
            faces.append(dense[:, cells, :])         # (NB+1, n_k, C)
    wk = w.reshape(3, 3, 3, cin, cout)

    def chunk_fn(args):
        nbr_c, d_c, occ_c = args                     # (CH,27), (CH,8^3...), (CH,512)
        ch = nbr_c.shape[0]
        halo = jnp.zeros((ch, BLOCK + 2, BLOCK + 2, BLOCK + 2, cin),
                         dense.dtype)
        for k, (ox, oy, oz) in enumerate(_OFFS3):
            dx0, dx1, sx0, sx1 = _halo_ranges(ox)
            dy0, dy1, sy0, sy1 = _halo_ranges(oy)
            dz0, dz1, sz0, sz1 = _halo_ranges(oz)
            if (ox, oy, oz) == (0, 0, 0):
                src = d_c[:, sx0:sx1, sy0:sy1, sz0:sz1]
            else:
                src = faces[k][nbr_c[:, k]].reshape(
                    ch, dx1 - dx0, dy1 - dy0, dz1 - dz0, cin
                )
            halo = halo.at[:, dx0:dx1, dy0:dy1, dz0:dz1].set(src)
        out = _conv3d(halo, wk, (1, 1, 1))
        return out.reshape(ch, BLOCK_CELLS, cout) * occ_c[..., None]

    nbr_p, pad = _pad_rows_to(block_nbr, _BCHUNK, nbcap)
    d_p, _ = _pad_rows_to(d[:nbcap], _BCHUNK, 0)
    occ_p, _ = _pad_rows_to(occ[:nbcap], _BCHUNK, 0)
    n_chunks = nbr_p.shape[0] // _BCHUNK

    def reshape_c(a):
        return a.reshape((n_chunks, _BCHUNK) + a.shape[1:])

    # remat per chunk: the backward of a plain lax.map saves every chunk's
    # conv residuals (the full halo again) — recompute them instead
    out = jax.lax.map(
        jax.checkpoint(chunk_fn),
        (reshape_c(nbr_p), reshape_c(d_p), reshape_c(occ_p))
    ).reshape(nbcap + pad, BLOCK_CELLS, cout)[:nbcap]
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
    wk = w.reshape(2, 2, 2, cin, cout)

    def chunk_fn(args):
        child_c, occ_cc = args
        ch = child_c.shape[0]
        vol = jnp.zeros((ch, 2 * BLOCK, 2 * BLOCK, 2 * BLOCK, cin),
                        dense_f.dtype)
        for k, (ox, oy, oz) in enumerate(_OFFS2):
            vol = vol.at[
                :, ox * BLOCK:(ox + 1) * BLOCK, oy * BLOCK:(oy + 1) * BLOCK,
                oz * BLOCK:(oz + 1) * BLOCK,
            ].set(d[child_c[:, k]])
        out = _conv3d(vol, wk, (2, 2, 2))
        return out.reshape(ch, BLOCK_CELLS, cout) * occ_cc[..., None]

    child_p, pad = _pad_rows_to(block_child, _BCHUNK, nbf)
    occ_p, _ = _pad_rows_to(occ_c[:nbc], _BCHUNK, 0)
    n_chunks = child_p.shape[0] // _BCHUNK
    out = jax.lax.map(
        jax.checkpoint(chunk_fn),
        (child_p.reshape(n_chunks, _BCHUNK, 8),
         occ_p.reshape(n_chunks, _BCHUNK, BLOCK_CELLS)),
    ).reshape(nbc + pad, BLOCK_CELLS, cout)[:nbc]
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
    # conv_transpose applies the kernel spatially flipped; pre-flip so
    # out[2p + o] = in[p] @ w[o] (the upsample_table semantics)
    wk = w.reshape(2, 2, 2, cin, cout)[::-1, ::-1, ::-1]
    quad_cells = jnp.asarray(_quad_cells())

    def chunk_fn(args):
        parent_c, quad_c, occ_c = args
        ch = parent_c.shape[0]
        par = dense_c[parent_c]                        # (CH, 512, Cin)
        cells = quad_cells[quad_c]                     # (CH, 64)
        sub = jnp.take_along_axis(par, cells[..., None], axis=1)
        sub = sub.reshape(ch, h, h, h, cin)
        out = jax.lax.conv_transpose(
            sub, wk.astype(sub.dtype),
            strides=(2, 2, 2), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).astype(dense_c.dtype)
        return out.reshape(ch, BLOCK_CELLS, cout) * occ_c[..., None]

    nbcap_c = dense_c.shape[0] - 1
    parent_p, pad = _pad_rows_to(block_parent, _BCHUNK, nbcap_c)
    quad_p, _ = _pad_rows_to(block_quad, _BCHUNK, 0)
    occ_p, _ = _pad_rows_to(occ_f[:nbf], _BCHUNK, 0)
    n_chunks = parent_p.shape[0] // _BCHUNK
    out = jax.lax.map(
        jax.checkpoint(chunk_fn),
        (parent_p.reshape(n_chunks, _BCHUNK),
         quad_p.reshape(n_chunks, _BCHUNK),
         occ_p.reshape(n_chunks, _BCHUNK, BLOCK_CELLS)),
    ).reshape(nbf + pad, BLOCK_CELLS, cout)[:nbf]
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


# ---------------------------------------------------------------------------
# Row-space ops with custom VJPs (round 3).
#
# Autodiff through the halo/gather machinery above materializes full-size
# block-dense cotangents (scatter-add chains over (NB+1, 512, C) tensors and
# their face pre-slices) — at flagship caps the U-Net backward wanted ~35GB
# (docs/perf_notes.md).  These wrappers expose each conv as a pure
# rows -> rows function whose VJP is hand-written:
#
# - residuals saved for backward are ROW-space (cap, C) only — block-dense
#   form exists strictly transiently inside fwd and bwd;
# - dx reuses the forward kernels: a submanifold conv is self-transpose
#   under kernel mirroring (w_hat[k] = w[26-k]^T — the block_nbr table is
#   symmetric by construction), and down/up stride-2 convs are exact
#   transposes of each other (out[2p+o] = in[p] w[o]  <->
#   out[p] = sum_o in[2p+o] w[o]);
# - dw is computed by the same block-chunked halo walk with per-offset
#   einsums on the MXU (f32 accumulation).
#
# Reference parity: replaces torch autograd through MinkowskiEngine's
# gather/scatter conv (model/common.py:73-118) with the same math.
# ---------------------------------------------------------------------------

# input-channel slice width for the wide (e.g. 134-dim) input conv: bounds
# every block-dense transient to ~_CCHUNK channels (sum of convs == conv)
_CCHUNK = 64


def _c_slices(c: int):
    return [(c0, min(c0 + _CCHUNK, c)) for c0 in range(0, c, _CCHUNK)]


def _subm_dw(dense_x, block_nbr, dy_dense):
    """(27, Cin, Cout) weight grad: dw[k] = sum_i x[i + off_k]^T dy[i].

    Same chunked halo construction as subm_conv; per offset the kernel-grad
    contribution is a (CH*512, Cin) x (CH*512, Cout) matmul.
    """
    nbcap = dense_x.shape[0] - 1
    cin = dense_x.shape[-1]
    cout = dy_dense.shape[-1]
    d = dense_x.reshape(nbcap + 1, BLOCK, BLOCK, BLOCK, cin)
    faces = []
    for k, (ox, oy, oz) in enumerate(_OFFS3):
        if (ox, oy, oz) == (0, 0, 0):
            faces.append(None)
        else:
            cells = jnp.asarray(_face_cells(ox, oy, oz))
            faces.append(dense_x[:, cells, :])

    def chunk_fn(args):
        nbr_c, d_c, dy_c = args
        ch = nbr_c.shape[0]
        halo = jnp.zeros((ch, BLOCK + 2, BLOCK + 2, BLOCK + 2, cin),
                         dense_x.dtype)
        for k, (ox, oy, oz) in enumerate(_OFFS3):
            dx0, dx1, sx0, sx1 = _halo_ranges(ox)
            dy0, dy1, sy0, sy1 = _halo_ranges(oy)
            dz0, dz1, sz0, sz1 = _halo_ranges(oz)
            if (ox, oy, oz) == (0, 0, 0):
                src = d_c[:, sx0:sx1, sy0:sy1, sz0:sz1]
            else:
                src = faces[k][nbr_c[:, k]].reshape(
                    ch, dx1 - dx0, dy1 - dy0, dz1 - dz0, cin
                )
            halo = halo.at[:, dx0:dx1, dy0:dy1, dz0:dz1].set(src)
        dyf = dy_c.reshape(ch * BLOCK_CELLS, cout)
        dws = []
        for ox, oy, oz in _OFFS3:
            view = halo[:, 1 + ox:1 + ox + BLOCK, 1 + oy:1 + oy + BLOCK,
                        1 + oz:1 + oz + BLOCK].reshape(ch * BLOCK_CELLS, cin)
            dws.append(jnp.einsum(
                "nc,nd->cd", view, dyf, preferred_element_type=jnp.float32
            ))
        return jnp.stack(dws)                            # (27, Cin, Cout)

    nbr_p, _ = _pad_rows_to(block_nbr, _BCHUNK, nbcap)
    d_p, _ = _pad_rows_to(d[:nbcap], _BCHUNK, 0)
    dy_p, _ = _pad_rows_to(dy_dense[:nbcap], _BCHUNK, 0)
    n_chunks = nbr_p.shape[0] // _BCHUNK

    def reshape_c(a):
        return a.reshape((n_chunks, _BCHUNK) + a.shape[1:])

    parts = jax.lax.map(
        chunk_fn, (reshape_c(nbr_p), reshape_c(d_p), reshape_c(dy_p))
    )
    return parts.sum(axis=0)


def _subm_rows_impl(feats, w, vox2cell, valid, block_nbr, occ):
    """Channel-chunked subm conv; accumulates in row space."""
    nbcap = block_nbr.shape[0]
    out = None
    for c0, c1 in _c_slices(feats.shape[-1]):
        dense = rows_to_blocks(feats[..., c0:c1], vox2cell, valid, nbcap)
        o = subm_conv(dense, occ, block_nbr, w[:, c0:c1])
        rows = blocks_to_rows(o, vox2cell)
        out = rows if out is None else out + rows
    return out


@jax.custom_vjp
def subm_conv_rows(feats, w, vox2cell, validf, block_nbr):
    """Row-space 3^3 submanifold conv: (cap, Cin) -> (cap, Cout).

    w: (27, Cin, Cout) in the gather conv's offset order — weights remain
    interchangeable across conv implementations.
    """
    valid = validf.astype(bool)
    occ = block_occupancy(vox2cell, valid, block_nbr.shape[0])
    return _subm_rows_impl(feats, w, vox2cell, valid, block_nbr, occ)


def _subm_rows_fwd(feats, w, vox2cell, validf, block_nbr):
    return (subm_conv_rows(feats, w, vox2cell, validf, block_nbr),
            (feats, w, vox2cell, validf, block_nbr))


def _subm_rows_bwd(res, dy):
    feats, w, vox2cell, validf, block_nbr = res
    nbcap = block_nbr.shape[0]
    valid = validf.astype(bool)
    occ = block_occupancy(vox2cell, valid, nbcap)
    # dx: subm conv of dy with the mirrored-transposed kernel (see header)
    w_hat = w[::-1].transpose(0, 2, 1)               # (27, Cout, Cin)
    dy = dy.astype(feats.dtype)
    dx = _subm_rows_impl(dy, w_hat, vox2cell, valid, block_nbr, occ)
    # dw: chunk input channels like the forward
    dy_dense = rows_to_blocks(dy, vox2cell, valid, nbcap)
    dws = []
    for c0, c1 in _c_slices(feats.shape[-1]):
        dense_x = rows_to_blocks(feats[..., c0:c1], vox2cell, valid, nbcap)
        dws.append(_subm_dw(dense_x, block_nbr, dy_dense))
    dw = jnp.concatenate(dws, axis=1).astype(w.dtype)
    return dx.astype(feats.dtype), dw, None, None, None


subm_conv_rows.defvjp(_subm_rows_fwd, _subm_rows_bwd)


def _down_dw(dense_f, block_child, dy_dense_c):
    """(8, Cin, Cout) weight grad for the stride-2 down conv."""
    nbf = dense_f.shape[0] - 1
    nbc = block_child.shape[0]
    cin = dense_f.shape[-1]
    cout = dy_dense_c.shape[-1]
    d = dense_f.reshape(nbf + 1, BLOCK, BLOCK, BLOCK, cin)

    def chunk_fn(args):
        child_c, dy_c = args
        ch = child_c.shape[0]
        vol = jnp.zeros((ch, 2 * BLOCK, 2 * BLOCK, 2 * BLOCK, cin),
                        dense_f.dtype)
        for k, (ox, oy, oz) in enumerate(_OFFS2):
            vol = vol.at[
                :, ox * BLOCK:(ox + 1) * BLOCK, oy * BLOCK:(oy + 1) * BLOCK,
                oz * BLOCK:(oz + 1) * BLOCK,
            ].set(d[child_c[:, k]])
        dyf = dy_c.reshape(ch * BLOCK_CELLS, cout)
        dws = []
        for ox, oy, oz in _OFFS2:
            view = vol[:, ox::2, oy::2, oz::2].reshape(
                ch * BLOCK_CELLS, cin)
            dws.append(jnp.einsum(
                "nc,nd->cd", view, dyf, preferred_element_type=jnp.float32
            ))
        return jnp.stack(dws)                            # (8, Cin, Cout)

    child_p, _ = _pad_rows_to(block_child, _BCHUNK, nbf)
    dy_p, _ = _pad_rows_to(dy_dense_c[:nbc], _BCHUNK, 0)
    n_chunks = child_p.shape[0] // _BCHUNK
    parts = jax.lax.map(
        chunk_fn,
        (child_p.reshape(n_chunks, _BCHUNK, 8),
         dy_p.reshape(n_chunks, _BCHUNK, BLOCK_CELLS, cout)),
    )
    return parts.sum(axis=0)


def _up_dw(dense_c, block_parent, block_quad, dy_dense_f):
    """(8, Cin, Cout) weight grad for the transposed stride-2 conv.

    up: out_f[2p + o] = in_c[p] w[o]  =>  dw[o] = sum_p in_c[p]^T dy_f[2p+o].
    """
    nbf = block_parent.shape[0]
    cin = dense_c.shape[-1]
    cout = dy_dense_f.shape[-1]
    h = BLOCK // 2
    quad_cells = jnp.asarray(_quad_cells())

    def chunk_fn(args):
        parent_c, quad_c, dy_c = args
        ch = parent_c.shape[0]
        par = dense_c[parent_c]                        # (CH, 512, Cin)
        cells = quad_cells[quad_c]                     # (CH, 64)
        sub = jnp.take_along_axis(par, cells[..., None], axis=1)
        subf = sub.reshape(ch * h * h * h, cin)
        dyv = dy_c.reshape(ch, BLOCK, BLOCK, BLOCK, cout)
        dws = []
        for ox, oy, oz in _OFFS2:
            view = dyv[:, ox::2, oy::2, oz::2].reshape(
                ch * h * h * h, cout)
            dws.append(jnp.einsum(
                "nc,nd->cd", subf, view, preferred_element_type=jnp.float32
            ))
        return jnp.stack(dws)                            # (8, Cin, Cout)

    nbcap_c = dense_c.shape[0] - 1
    parent_p, _ = _pad_rows_to(block_parent, _BCHUNK, nbcap_c)
    quad_p, _ = _pad_rows_to(block_quad, _BCHUNK, 0)
    dy_p, _ = _pad_rows_to(dy_dense_f[:nbf], _BCHUNK, 0)
    n_chunks = parent_p.shape[0] // _BCHUNK
    parts = jax.lax.map(
        chunk_fn,
        (parent_p.reshape(n_chunks, _BCHUNK),
         quad_p.reshape(n_chunks, _BCHUNK),
         dy_p.reshape(n_chunks, _BCHUNK, BLOCK_CELLS, cout)),
    )
    return parts.sum(axis=0)


@jax.custom_vjp
def down_conv_rows(feats_f, w, v2c_f, validf_f, block_child, block_parent,
                   block_quad, v2c_c, validf_c):
    """Row-space stride-2 kernel-2 conv: fine rows -> coarse rows.

    w: (8, Cin, Cout) in ``_offsets(2)`` order (gather-conv compatible).
    """
    nbc = block_child.shape[0]
    dense_f = rows_to_blocks(feats_f, v2c_f, validf_f.astype(bool),
                             block_parent.shape[0])
    occ_c = block_occupancy(v2c_c, validf_c.astype(bool), nbc)
    out = down_conv(dense_f, block_child, occ_c, w)
    return blocks_to_rows(out, v2c_c)


def _down_rows_fwd(feats_f, w, v2c_f, validf_f, block_child, block_parent,
                   block_quad, v2c_c, validf_c):
    out = down_conv_rows(feats_f, w, v2c_f, validf_f, block_child,
                         block_parent, block_quad, v2c_c, validf_c)
    return out, (feats_f, w, v2c_f, validf_f, block_child, block_parent,
                 block_quad, v2c_c, validf_c)


def _down_rows_bwd(res, dy):
    (feats_f, w, v2c_f, validf_f, block_child, block_parent, block_quad,
     v2c_c, validf_c) = res
    nbf = block_parent.shape[0]
    nbc = block_child.shape[0]
    valid_f = validf_f.astype(bool)
    valid_c = validf_c.astype(bool)
    dy = dy.astype(feats_f.dtype)
    dy_dense_c = rows_to_blocks(dy, v2c_c, valid_c, nbc)
    # dx: exact transpose of down is up with per-offset transposed weights
    occ_f = block_occupancy(v2c_f, valid_f, nbf)
    dx_dense = up_conv(dy_dense_c, block_parent, block_quad, occ_f,
                       w.transpose(0, 2, 1))
    dx = blocks_to_rows(dx_dense, v2c_f)
    dense_f = rows_to_blocks(feats_f, v2c_f, valid_f, nbf)
    dw = _down_dw(dense_f, block_child, dy_dense_c).astype(w.dtype)
    return (dx.astype(feats_f.dtype), dw, None, None, None, None, None,
            None, None)


down_conv_rows.defvjp(_down_rows_fwd, _down_rows_bwd)


@jax.custom_vjp
def up_conv_rows(feats_c, w, v2c_c, validf_c, block_child, block_parent,
                 block_quad, v2c_f, validf_f):
    """Row-space transposed stride-2 conv: coarse rows -> fine rows."""
    nbf = block_parent.shape[0]
    dense_c = rows_to_blocks(feats_c, v2c_c, validf_c.astype(bool),
                             block_child.shape[0])
    occ_f = block_occupancy(v2c_f, validf_f.astype(bool), nbf)
    out = up_conv(dense_c, block_parent, block_quad, occ_f, w)
    return blocks_to_rows(out, v2c_f)


def _up_rows_fwd(feats_c, w, v2c_c, validf_c, block_child, block_parent,
                 block_quad, v2c_f, validf_f):
    out = up_conv_rows(feats_c, w, v2c_c, validf_c, block_child, block_parent,
                       block_quad, v2c_f, validf_f)
    return out, (feats_c, w, v2c_c, validf_c, block_child, block_parent,
                 block_quad, v2c_f, validf_f)


def _up_rows_bwd(res, dy):
    (feats_c, w, v2c_c, validf_c, block_child, block_parent, block_quad,
     v2c_f, validf_f) = res
    nbf = block_parent.shape[0]
    nbc = block_child.shape[0]
    valid_f = validf_f.astype(bool)
    valid_c = validf_c.astype(bool)
    dy = dy.astype(feats_c.dtype)
    dy_dense_f = rows_to_blocks(dy, v2c_f, valid_f, nbf)
    # dx: exact transpose of up is down with per-offset transposed weights
    occ_c = block_occupancy(v2c_c, valid_c, nbc)
    dx_dense = down_conv(dy_dense_f, block_child, occ_c,
                         w.transpose(0, 2, 1))
    dx = blocks_to_rows(dx_dense, v2c_c)
    dense_c = rows_to_blocks(feats_c, v2c_c, valid_c, nbc)
    dw = _up_dw(dense_c, block_parent, block_quad, dy_dense_f).astype(w.dtype)
    return (dx.astype(feats_c.dtype), dw, None, None, None, None, None,
            None, None)


up_conv_rows.defvjp(_up_rows_fwd, _up_rows_bwd)
