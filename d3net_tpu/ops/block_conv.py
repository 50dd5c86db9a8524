"""Block-dense sparse convolution (TPU-native backbone, folded-lane design).

The gather-matmul sparse conv (:mod:`d3net_tpu.ops.sparse_conv`) issues ~27
random HBM row-gathers per output voxel; at 10^5 voxels that is
latency-bound (~76ns per 128B row, docs/perf_notes.md).  This module
re-lays sparse voxels into dense 8^3 spatial blocks (host tables:
``ops.voxelize.build_block_maps``) and computes convolution with banded
matmuls on the MXU over haloed block tiles.

Round-3 redesign, driven by per-op device profiles (docs/perf_notes.md):

1. FOLDED LANES.  TPU tiles are (8 sublanes, 128 lanes); any tensor whose
   minor dim is the channel count C pads lanes 128/C-fold — at the U-Net's
   C=16/32 levels that is an 8x/4x tax on every byte of HBM traffic and
   memory (the round-2 OOM's single biggest buffer was 3.2GB padded for
   410MB of data).  All block-dense tensors here fold the z axis into the
   lanes: layout (NB+1, 8, 8, 8*C) — 8C >= 128 for every level, so lanes
   are always fully packed.  A z-column of one (x, y) position is 8C
   contiguous lanes.

2. CONV AS BANDED MATMULS.  With z folded, the 3^3 conv is 9 matmuls (one
   per (ox, oy) neighbor column): out[:, x, y, :] += halo[:, x+ox, y+oy, :]
   @ W2[(ox,oy)], where W2 (10C, 8C') is the z-band matrix holding w[oz] on
   its (1+oz)-th block diagonal.  The off-band zeros cost ~3.3x the
   nominal conv FLOPs — noise next to the MXU's throughput — and every
   operand has fully-packed lanes.

3. HALO BY CONCAT, TWO STAGES.  First a global z-halo: Zfull (NB+1, 8, 8,
   10C) = lane-concat [gather(z-lo face) | core | gather(z-hi face)] — two
   contiguous row gathers.  Then per chunk, the (x, y) halo is built from
   8 gathered Zfull faces with a 3x3 nested spatial concat (one write
   pass).  Never ``.at[].set`` chains: XLA lowers each dynamic-update-slice
   in a chain to a full-tensor copy (measured ~2x the conv cost in the
   round-2 implementation).

4. NO OCCUPANCY TENSORS.  Submanifold masking falls out of the row
   contract: ``rows_to_blocks`` scatters only valid rows into zeros, so
   empty cells are zero in every conv INPUT, and outputs are only ever
   read back through ``blocks_to_rows`` at valid rows (invalid rows read
   the all-zero pad block).  The old per-conv occupancy build/multiply
   (4 full passes) is deleted.

5. CUSTOM VJPs, rows -> rows.  Residuals saved for backward are row-space
   (cap, C) only.  dx reuses the forward kernels (a submanifold conv is
   self-transpose under kernel mirroring; down/up stride-2 convs are exact
   transposes of each other).  dw accumulates per-(ox,oy) Gram matrices
   G = view^T dy (10C, 8C') with the same chunked halo walk, then extracts
   the 27 kernel taps from the band diagonals with einsum.

Reference parity: same math as MinkowskiEngine's subm/stride-2/transposed
convs used via ``model/common.py:73-118``; numerics vs the gather conv are
oracle-tested (values and gradients) in tests/test_block_conv.py.

All functions are per-scene; callers vmap over the batch.  The legacy
dense API (``subm_conv``/``down_conv``/``up_conv`` on (NB+1, 512, C) with
an occupancy argument) is kept as thin wrappers for the oracle tests.
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

_K3 = {off: k for k, off in enumerate(_OFFS3)}
_K2 = {off: k for k, off in enumerate(_OFFS2)}

# Blocks processed per sequential chunk of the subm/down/up convs: bounds
# the halo transient to ~_BCHUNK * 100 * 10C per vmap lane.
_BCHUNK = 512

# input-channel slice width for the wide (e.g. 134-dim) input conv: bounds
# the global folded-dense + Zfull transients (sum of convs == conv)
_CCHUNK = 32


# ---------------------------------------------------------------------------
# row <-> folded block-dense conversion
# ---------------------------------------------------------------------------

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


def rows_to_folded(feats, vox2cell, valid, nbcap: int):
    """(cap, C) rows -> (NB+1, 8, 8, 8C) folded block-dense."""
    c = feats.shape[-1]
    dense = rows_to_blocks(feats, vox2cell, valid, nbcap)
    return dense.reshape(nbcap + 1, BLOCK, BLOCK, BLOCK * c)


def folded_to_rows(folded, vox2cell):
    """(NB+1, 8, 8, 8C) folded -> (cap, C) rows."""
    nb1 = folded.shape[0]
    c = folded.shape[-1] // BLOCK
    return folded.reshape(nb1 * BLOCK_CELLS, c)[vox2cell]


# ---------------------------------------------------------------------------
# chunking helpers
# ---------------------------------------------------------------------------

def _pad_rows_to(a, mult, fill):
    pad = (-a.shape[0]) % mult
    if pad == 0:
        return a, 0
    filler = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a, filler], axis=0), pad


def _chunk_arrays(arrays, rows, fills):
    pad = (-rows) % _BCHUNK
    n_chunks = (rows + pad) // _BCHUNK

    def prep(a, fill):
        ap, _ = _pad_rows_to(a, _BCHUNK, fill)
        return ap.reshape((n_chunks, _BCHUNK) + a.shape[1:])

    return tuple(prep(a, f) for a, f in zip(arrays, fills))


def _chunked_map(chunk_fn, arrays, rows, fills):
    """lax.map over _BCHUNK-row chunks; output rows align with input rows."""
    chunks = _chunk_arrays(arrays, rows, fills)
    out = jax.lax.map(chunk_fn, chunks)
    pad = (-rows) % _BCHUNK
    return out.reshape((rows + pad,) + out.shape[2:])[:rows]


def _chunked_sum(chunk_fn, arrays, rows, fills):
    """Sum of per-chunk reductions (for weight gradients)."""
    chunks = _chunk_arrays(arrays, rows, fills)
    return jax.lax.map(chunk_fn, chunks).sum(axis=0)


# ---------------------------------------------------------------------------
# band-matrix construction (tiny tensors, traced from w each call)
# ---------------------------------------------------------------------------

def _band_w2_subm(w, ox, oy):
    """(10*Cin, 8*Cout) z-band matrix for subm offsets (ox, oy, *).

    W2[(z+1+oz)*Cin + ci, z*Cout + co] = w[k(ox,oy,oz), ci, co].
    """
    cin, cout = w.shape[1], w.shape[2]
    b = jnp.zeros((10, 8, cin, cout), w.dtype)
    z = jnp.arange(8)
    for oz in (-1, 0, 1):
        b = b.at[z + 1 + oz, z].set(w[_K3[(ox, oy, oz)]])
    return b.transpose(0, 2, 1, 3).reshape(10 * cin, 8 * cout)


def _band_w2_down(w, ox, oy):
    """(16*Cin, 8*Cout) band matrix for the stride-2 down conv.

    out_c[z] = sum_oz in_f[2z + oz] w[(ox,oy,oz)], oz in {0, 1}.
    """
    cin, cout = w.shape[1], w.shape[2]
    b = jnp.zeros((16, 8, cin, cout), w.dtype)
    z = jnp.arange(8)
    for oz in (0, 1):
        b = b.at[2 * z + oz, z].set(w[_K2[(ox, oy, oz)]])
    return b.transpose(0, 2, 1, 3).reshape(16 * cin, 8 * cout)


def _band_w2_up(w, ex, ey):
    """(4*Cin, 8*Cout) band matrix for the transposed stride-2 conv.

    out_f[2zq + ez] = in_c[zq] w[(ex,ey,ez)], ez in {0, 1}.
    """
    cin, cout = w.shape[1], w.shape[2]
    b = jnp.zeros((4, 8, cin, cout), w.dtype)
    zq = jnp.arange(4)
    for ez in (0, 1):
        b = b.at[zq, 2 * zq + ez].set(w[_K2[(ex, ey, ez)]])
    return b.transpose(0, 2, 1, 3).reshape(4 * cin, 8 * cout)


def _mm(a, b2, out_dtype):
    """(..., K) x (K, N) matmul with f32 accumulation."""
    return jnp.matmul(
        a, b2.astype(a.dtype), preferred_element_type=jnp.float32
    ).astype(out_dtype)


def _conv2d(x, k, strides=(1, 1), rhs_dilation=None):
    """NHWC x HWIO VALID conv with f32 accumulation (returns f32).

    Round-4 perf redesign: the 9 (ox,oy) taps used to be 9 separate
    banded matmuls over shifted VIEWS of the halo — ~9 strided re-reads
    of the halo from HBM per conv (the measured 178ms/level-0 was
    HBM-bound on exactly that traffic, docs/perf_notes.md).  One XLA
    conv reads the halo once, keeps the spatial reuse in VMEM, and runs
    the same banded matmuls on the MXU.
    """
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=strides, padding="VALID",
        rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _filter_grad(x, dy, strides=(1, 1)):
    """Filter gradient of ``_conv2d`` as one conv (classic transposition).

    x (CH, H, W, Cin), dy (CH, Ho, Wo, Cout) -> (kh, kw, Cin, Cout), f32.
    Replaces the per-(ox,oy) Gram einsums (same 9x halo re-read problem
    as the forward).
    """
    lhs = x.transpose(3, 1, 2, 0)        # Cin as batch, CH as channels
    rhs = dy.transpose(1, 2, 0, 3)       # out spatial as kernel, CH -> Cout
    g = jax.lax.conv_general_dilated(
        lhs, rhs.astype(lhs.dtype), window_strides=(1, 1), padding="VALID",
        rhs_dilation=strides,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return g.transpose(1, 2, 0, 3)       # (kh, kw, Cin, Cout)


# ---------------------------------------------------------------------------
# submanifold 3^3 conv (folded)
# ---------------------------------------------------------------------------

def _xy_slice(folded, ox, oy):
    """Facing xy-part of every block for a neighbor at offset (ox, oy)."""
    f = folded
    if ox == -1:
        f = f[:, BLOCK - 1:BLOCK]
    elif ox == 1:
        f = f[:, 0:1]
    if oy == -1:
        f = f[:, :, BLOCK - 1:BLOCK]
    elif oy == 1:
        f = f[:, :, 0:1]
    return f


def _halo_faces(folded, nbcap, c):
    """26 flat per-offset source arrays, one contiguous row per block.

    Keyed (ox, oy, part) with part in {-1: z=7 line, 0: full z, 1: z=0
    line} — the three z-sections a piece of the halo column at (ox, oy)
    lane-concatenates.  Every diagonal neighbor is addressed through its
    OWN block_nbr entry, so a corner-only neighbor (facing block absent)
    still contributes — matching the gather conv exactly.
    """
    faces = {}
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            xy = _xy_slice(folded, ox, oy)
            if (ox, oy) != (0, 0):
                faces[(ox, oy, 0)] = xy.reshape(nbcap + 1, -1)
            faces[(ox, oy, -1)] = xy[..., (BLOCK - 1) * c:].reshape(
                nbcap + 1, -1)
            faces[(ox, oy, 1)] = xy[..., :c].reshape(nbcap + 1, -1)
    return faces


def _halo_build(core_c, faces, nbr_c, cin):
    """(CH,8,8,8C) core chunk + gathered pieces -> (CH,10,10,10C) halo.

    One contiguous row gather per (offset, z-section) = 26 gathers, then
    a lane concat per column and a 3x3 nested spatial concat — a single
    write pass over the halo.
    """
    ch = nbr_c.shape[0]
    planes = []
    for ox in (-1, 0, 1):
        cols = []
        for oy in (-1, 0, 1):
            sx = 1 if ox else BLOCK
            sy = 1 if oy else BLOCK
            lo = faces[(ox, oy, -1)][nbr_c[:, _K3[(ox, oy, -1)]]].reshape(
                ch, sx, sy, cin)
            hi = faces[(ox, oy, 1)][nbr_c[:, _K3[(ox, oy, 1)]]].reshape(
                ch, sx, sy, cin)
            if (ox, oy) == (0, 0):
                mid = core_c
            else:
                mid = faces[(ox, oy, 0)][nbr_c[:, _K3[(ox, oy, 0)]]].reshape(
                    ch, sx, sy, BLOCK * cin)
            cols.append(jnp.concatenate([lo, mid, hi], axis=-1))
        planes.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(planes, axis=1)


def _subm_folded(folded, block_nbr, w, cout_dtype=None):
    """(NB+1, 8, 8, 8Cin) folded -> (NB+1, 8, 8, 8Cout); w (27, Cin, Cout)."""
    nbcap = block_nbr.shape[0]
    cin = folded.shape[-1] // BLOCK
    cout = w.shape[-1]
    dt = cout_dtype or folded.dtype
    faces = _halo_faces(folded, nbcap, cin)
    # (3, 3, 10Cin, 8Cout): kernel[1+ox, 1+oy] is the (ox, oy) z-band matrix
    kern = jnp.stack([
        jnp.stack([_band_w2_subm(w, ox, oy) for oy in (-1, 0, 1)], 0)
        for ox in (-1, 0, 1)], 0)

    def chunk_fn(args):
        nbr_c, core_c = args
        halo = _halo_build(core_c, faces, nbr_c, cin)
        return _conv2d(halo, kern).astype(dt)

    nbr_full = jnp.concatenate(
        [block_nbr, jnp.full((1, 27), nbcap, block_nbr.dtype)], axis=0)
    return _chunked_map(
        chunk_fn, (nbr_full, folded), nbcap + 1, (nbcap, 0))


def _subm_dw_folded(folded_x, block_nbr, dy_folded):
    """(27, Cin, Cout) weight grad via per-(ox,oy) Gram matrices."""
    nbcap = block_nbr.shape[0]
    cin = folded_x.shape[-1] // BLOCK
    cout = dy_folded.shape[-1] // BLOCK
    faces = _halo_faces(folded_x, nbcap, cin)

    def chunk_fn(args):
        nbr_c, core_c, dy_c = args
        halo = _halo_build(core_c, faces, nbr_c, cin)
        return _filter_grad(halo, dy_c)         # (3, 3, 10Cin, 8Cout)

    nbr_full = jnp.concatenate(
        [block_nbr, jnp.full((1, 27), nbcap, block_nbr.dtype)], axis=0)
    g33 = _chunked_sum(
        chunk_fn, (nbr_full, folded_x, dy_folded), nbcap + 1, (nbcap, 0, 0))
    # extract the 27 taps from the band diagonals
    dws = [None] * 27
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            g4 = g33[1 + ox, 1 + oy].reshape(10, cin, 8, cout)
            for oz in (-1, 0, 1):
                gs = g4[1 + oz:9 + oz]          # (8, Cin, 8, Cout)
                dws[_K3[(ox, oy, oz)]] = jnp.einsum(
                    "zczd->cd", gs, preferred_element_type=jnp.float32)
    return jnp.stack(dws)


# ---------------------------------------------------------------------------
# stride-2 down conv (folded)
# ---------------------------------------------------------------------------

def _down_folded(folded_f, block_child, nbf, w, cout_dtype=None):
    """fine (NBf+1, 8,8,8Cin) -> coarse (NBc+1, 8,8,8Cout); w (8,Cin,Cout)."""
    nbc = block_child.shape[0]
    cin = folded_f.shape[-1] // BLOCK
    cout = w.shape[-1]
    dt = cout_dtype or folded_f.dtype
    dflat = folded_f.reshape(nbf + 1, -1)
    # (2, 2, 16Cin, 8Cout) strided-conv kernel
    kern = jnp.stack([
        jnp.stack([_band_w2_down(w, ox, oy) for oy in (0, 1)], 0)
        for ox in (0, 1)], 0)

    def chunk_fn(args):
        (child_c,) = args
        ch = child_c.shape[0]

        def blk(k):
            return dflat[child_c[:, k]].reshape(ch, BLOCK, BLOCK, 8 * cin)

        # (CH, 16, 16, 16Cin) fine volume: z pairs lane-concat, then 2x2
        planes = []
        for ox in (0, 1):
            cols = []
            for oy in (0, 1):
                lo = blk(_K2[(ox, oy, 0)])
                hi = blk(_K2[(ox, oy, 1)])
                cols.append(jnp.concatenate([lo, hi], axis=-1))
            planes.append(jnp.concatenate(cols, axis=2))
        vol = jnp.concatenate(planes, axis=1)
        return _conv2d(vol, kern, strides=(2, 2)).astype(dt)

    child_full = jnp.concatenate(
        [block_child, jnp.full((1, 8), nbf, block_child.dtype)], axis=0)
    return _chunked_map(chunk_fn, (child_full,), nbc + 1, (nbf,))


def _down_dw_folded(folded_f, block_child, nbf, dy_folded_c):
    """(8, Cin, Cout) weight grad for the down conv."""
    nbc = block_child.shape[0]
    cin = folded_f.shape[-1] // BLOCK
    cout = dy_folded_c.shape[-1] // BLOCK
    dflat = folded_f.reshape(nbf + 1, -1)

    def chunk_fn(args):
        child_c, dy_c = args
        ch = child_c.shape[0]

        def blk(k):
            return dflat[child_c[:, k]].reshape(ch, BLOCK, BLOCK, 8 * cin)

        planes = []
        for ox in (0, 1):
            cols = []
            for oy in (0, 1):
                lo = blk(_K2[(ox, oy, 0)])
                hi = blk(_K2[(ox, oy, 1)])
                cols.append(jnp.concatenate([lo, hi], axis=-1))
            planes.append(jnp.concatenate(cols, axis=2))
        vol = jnp.concatenate(planes, axis=1)
        return _filter_grad(vol, dy_c, strides=(2, 2))  # (2,2,16Cin,8Cout)

    child_full = jnp.concatenate(
        [block_child, jnp.full((1, 8), nbf, block_child.dtype)], axis=0)
    g22 = _chunked_sum(
        chunk_fn, (child_full, dy_folded_c), nbc + 1, (nbf, 0))
    dws = [None] * 8
    for ox in (0, 1):
        for oy in (0, 1):
            g = g22[ox, oy].reshape(16, cin, 8, cout)
            for oz in (0, 1):
                gs = g[oz::2]                  # rows 2z+oz -> (8, Cin, 8, Cout)
                dws[_K2[(ox, oy, oz)]] = jnp.einsum(
                    "zczd->cd", gs, preferred_element_type=jnp.float32)
    return jnp.stack(dws)


# ---------------------------------------------------------------------------
# transposed stride-2 up conv (folded)
# ---------------------------------------------------------------------------

def _quad_rows(block_parent, block_quad, nbcap_c):
    """Combined (quad, parent) -> row ids into the stacked quad array."""
    return block_quad.astype(jnp.int32) * (nbcap_c + 1) + block_parent


def _quad_stack_folded(folded_c, nbcap_c, cin):
    """(NBc+1, 8,8,8C) -> (8*(NBc+1), 4*4*4C) per-quadrant flat rows.

    Row q*(NBc+1)+p holds quadrant q of coarse block p (a (4,4,4C/2)...
    (4,4,4*cin) folded sub-volume), so the per-chunk lookup for fine block
    f is ONE contiguous row gather.
    """
    h = BLOCK // 2
    quads = []
    for q in range(8):
        qx, qy, qz = (q >> 2) & 1, (q >> 1) & 1, q & 1
        sub = folded_c[:, qx * h:(qx + 1) * h, qy * h:(qy + 1) * h,
                       qz * h * cin:(qz + 1) * h * cin]
        quads.append(sub.reshape(nbcap_c + 1, -1))
    return jnp.concatenate(quads, axis=0)


def _interleave2(a, b, axis):
    """Interleave two equal arrays along ``axis``: result[2i]=a[i], [2i+1]=b[i]."""
    st = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return st.reshape(shape)


def _up_folded(folded_c, block_parent, block_quad, w, cout_dtype=None):
    """coarse (NBc+1, 8,8,8Cin) -> fine (NBf+1, 8,8,8Cout); w (8,Cin,Cout)."""
    nbf = block_parent.shape[0]
    nbcap_c = folded_c.shape[0] - 1
    cin = folded_c.shape[-1] // BLOCK
    cout = w.shape[-1]
    dt = cout_dtype or folded_c.dtype
    h = BLOCK // 2
    quads = _quad_stack_folded(folded_c, nbcap_c, cin)
    w2 = {(ex, ey): _band_w2_up(w, ex, ey)
          for ex in (0, 1) for ey in (0, 1)}

    def chunk_fn(args):
        (rows_c,) = args
        ch = rows_c.shape[0]
        quad = quads[rows_c].reshape(ch, h, h, h * cin)    # (CH,4,4,4Cin)
        outs = {}
        for (exy, mat) in w2.items():
            outs[exy] = _mm(quad, mat, jnp.float32)        # (CH,4,4,8Cout)
        row0 = _interleave2(outs[(0, 0)], outs[(0, 1)], axis=2)
        row1 = _interleave2(outs[(1, 0)], outs[(1, 1)], axis=2)
        return _interleave2(row0, row1, axis=1).astype(dt)  # (CH,8,8,8Cout)

    rows = _quad_rows(block_parent, block_quad, nbcap_c)
    rows_full = jnp.concatenate(
        [rows, jnp.asarray([nbcap_c], jnp.int32)], axis=0)
    return _chunked_map(chunk_fn, (rows_full,), nbf + 1, (nbcap_c,))


def _up_dw_folded(folded_c, block_parent, block_quad, dy_folded_f):
    """(8, Cin, Cout) weight grad for the transposed stride-2 conv."""
    nbf = block_parent.shape[0]
    nbcap_c = folded_c.shape[0] - 1
    cin = folded_c.shape[-1] // BLOCK
    cout = dy_folded_f.shape[-1] // BLOCK
    h = BLOCK // 2
    quads = _quad_stack_folded(folded_c, nbcap_c, cin)

    def chunk_fn(args):
        rows_c, dy_c = args
        ch = rows_c.shape[0]
        quad = quads[rows_c].reshape(ch * h * h, h * cin)
        gs = []
        for ex in (0, 1):
            for ey in (0, 1):
                view = dy_c[:, ex::2, ey::2, :].reshape(
                    ch * h * h, 8 * cout)
                gs.append(jnp.einsum(
                    "nk,nm->km", quad, view,
                    preferred_element_type=jnp.float32))
        return jnp.stack(gs)                    # (4, 4Cin, 8Cout)

    rows = _quad_rows(block_parent, block_quad, nbcap_c)
    rows_full = jnp.concatenate(
        [rows, jnp.asarray([nbcap_c], jnp.int32)], axis=0)
    g4 = _chunked_sum(
        chunk_fn, (rows_full, dy_folded_f), nbf + 1, (nbcap_c, 0))
    dws = [None] * 8
    i = 0
    for ex in (0, 1):
        for ey in (0, 1):
            g = g4[i].reshape(h, cin, 8, cout)   # (zq, Cin, zout, Cout)
            i += 1
            for ez in (0, 1):
                gs = g[:, :, ez::2]             # zout = 2zq+ez -> (4,Cin,4,Cout)
                dws[_K2[(ex, ey, ez)]] = jnp.einsum(
                    "zczd->cd", gs, preferred_element_type=jnp.float32)
    return jnp.stack(dws)


# ---------------------------------------------------------------------------
# legacy dense API (oracle tests; ScoreNet does not use these)
# ---------------------------------------------------------------------------

def _fold(dense):
    nb1 = dense.shape[0]
    c = dense.shape[-1]
    return dense.reshape(nb1, BLOCK, BLOCK, BLOCK * c)


def _unfold(folded):
    nb1 = folded.shape[0]
    c = folded.shape[-1] // BLOCK
    return folded.reshape(nb1, BLOCK_CELLS, c)


def subm_conv(dense, occ, block_nbr, w):
    """Submanifold 3^3 conv: (NB+1, 512, Cin) -> (NB+1, 512, Cout).

    w: (27, Cin, Cout), offset order ``_offsets(3)`` row-major — weights
    are interchangeable with the gather conv.
    """
    out = _unfold(_subm_folded(_fold(dense), block_nbr, w))
    return out * occ[..., None]


def down_conv(dense_f, block_child, occ_c, w):
    """Stride-2 kernel-2 conv: fine blocks -> coarse blocks."""
    nbf = dense_f.shape[0] - 1
    out = _unfold(_down_folded(_fold(dense_f), block_child, nbf, w))
    return out * occ_c[..., None]


def up_conv(dense_c, block_parent, block_quad, occ_f, w):
    """Transposed stride-2 kernel-2 conv: coarse blocks -> fine blocks.

    out[2p + o] = in[p] @ w[o] (matches the row-space ``upsample_table``
    semantics: fine voxel f reads parent f>>1 under kernel offset f mod 2).
    """
    out = _unfold(_up_folded(_fold(dense_c), block_parent, block_quad, w))
    return out * occ_f[..., None]


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
# row-space ops with custom VJPs — the production API (models/blocks.py)
# ---------------------------------------------------------------------------

def _c_slices(c: int):
    return [(c0, min(c0 + _CCHUNK, c)) for c0 in range(0, c, _CCHUNK)]


def _subm_rows_impl(feats, w, vox2cell, valid, block_nbr):
    """Channel-chunked subm conv; accumulates in row space."""
    nbcap = block_nbr.shape[0]
    cin = feats.shape[-1]
    if cin <= 2 * _CCHUNK:
        folded = rows_to_folded(feats, vox2cell, valid, nbcap)
        return folded_to_rows(
            _subm_folded(folded, block_nbr, w), vox2cell)
    out = None
    for c0, c1 in _c_slices(cin):
        folded = rows_to_folded(feats[..., c0:c1], vox2cell, valid, nbcap)
        rows = folded_to_rows(
            _subm_folded(folded, block_nbr, w[:, c0:c1]), vox2cell)
        out = rows if out is None else out + rows
    return out


@jax.custom_vjp
def subm_conv_rows(feats, w, vox2cell, validf, block_nbr):
    """Row-space 3^3 submanifold conv: (cap, Cin) -> (cap, Cout).

    w: (27, Cin, Cout) in the gather conv's offset order — weights remain
    interchangeable across conv implementations.
    """
    return _subm_rows_impl(feats, w, vox2cell, validf.astype(bool),
                           block_nbr)


def _subm_rows_fwd(feats, w, vox2cell, validf, block_nbr):
    return (subm_conv_rows(feats, w, vox2cell, validf, block_nbr),
            (feats, w, vox2cell, validf, block_nbr))


def _subm_rows_bwd(res, dy):
    feats, w, vox2cell, validf, block_nbr = res
    nbcap = block_nbr.shape[0]
    valid = validf.astype(bool)
    # dx: subm conv of dy with the mirrored-transposed kernel (see header)
    w_hat = w[::-1].transpose(0, 2, 1)               # (27, Cout, Cin)
    dy = dy.astype(feats.dtype)
    dx = _subm_rows_impl(dy, w_hat, vox2cell, valid, block_nbr)
    # dw: chunk input channels like the forward
    dy_folded = rows_to_folded(dy, vox2cell, valid, nbcap)
    dws = []
    for c0, c1 in _c_slices(feats.shape[-1]):
        folded_x = rows_to_folded(feats[..., c0:c1], vox2cell, valid, nbcap)
        dws.append(_subm_dw_folded(folded_x, block_nbr, dy_folded))
    dw = jnp.concatenate(dws, axis=1).astype(w.dtype)
    return dx.astype(feats.dtype), dw, None, None, None


subm_conv_rows.defvjp(_subm_rows_fwd, _subm_rows_bwd)


@jax.custom_vjp
def down_conv_rows(feats_f, w, v2c_f, validf_f, block_child, block_parent,
                   block_quad, v2c_c, validf_c):
    """Row-space stride-2 kernel-2 conv: fine rows -> coarse rows.

    w: (8, Cin, Cout) in ``_offsets(2)`` order (gather-conv compatible).
    """
    nbf = block_parent.shape[0]
    folded_f = rows_to_folded(feats_f, v2c_f, validf_f.astype(bool), nbf)
    out = _down_folded(folded_f, block_child, nbf, w)
    return folded_to_rows(out, v2c_c)


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
    dy_folded_c = rows_to_folded(dy, v2c_c, valid_c, nbc)
    # dx: exact transpose of down is up with per-offset transposed weights
    dx_folded = _up_folded(dy_folded_c, block_parent, block_quad,
                           w.transpose(0, 2, 1))
    dx = folded_to_rows(dx_folded, v2c_f)
    folded_f = rows_to_folded(feats_f, v2c_f, valid_f, nbf)
    dw = _down_dw_folded(folded_f, block_child, nbf,
                         dy_folded_c).astype(w.dtype)
    return (dx.astype(feats_f.dtype), dw, None, None, None, None, None,
            None, None)


down_conv_rows.defvjp(_down_rows_fwd, _down_rows_bwd)


@jax.custom_vjp
def up_conv_rows(feats_c, w, v2c_c, validf_c, block_child, block_parent,
                 block_quad, v2c_f, validf_f):
    """Row-space transposed stride-2 conv: coarse rows -> fine rows."""
    nbc = block_child.shape[0]
    folded_c = rows_to_folded(feats_c, v2c_c, validf_c.astype(bool), nbc)
    out = _up_folded(folded_c, block_parent, block_quad, w)
    return folded_to_rows(out, v2c_f)


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
    dy_folded_f = rows_to_folded(dy, v2c_f, valid_f, nbf)
    # dx: exact transpose of up is down with per-offset transposed weights
    dx_folded = _down_folded(dy_folded_f, block_child, nbf,
                             w.transpose(0, 2, 1))
    dx = folded_to_rows(dx_folded, v2c_c)
    folded_c = rows_to_folded(feats_c, v2c_c, valid_c, nbc)
    dw = _up_dw_folded(folded_c, block_parent, block_quad,
                       dy_folded_f).astype(w.dtype)
    return (dx.astype(feats_c.dtype), dw, None, None, None, None, None,
            None, None)


up_conv_rows.defvjp(_up_rows_fwd, _up_rows_bwd)
