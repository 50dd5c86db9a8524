"""Z-column folded sparse conv — gather-row-count optimized (round 4).

Why a third conv implementation.  The round-4 device profile of the
flagship forward (docs/perf_notes.md) shows the gather-matmul conv
(:mod:`d3net_tpu.ops.sparse_conv`) is bound by gather ROW COUNT, not
bytes: a 27-tap subm conv issues 27 random HBM row reads per voxel at a
measured ~15ns/row that is IDENTICAL for 32-byte (C=16) and 268-byte
(C=134) rows.  The block-dense path (:mod:`d3net_tpu.ops.block_conv`)
fixes the gather granularity but pays ~17-26x data inflation
materializing 8^3 blocks (ScanNet surfaces occupy ~6% of a block) plus a
serialized chunk loop.

The middle point implemented here: fold only the Z axis.  A *column* is
a run of 8 z-cells at one (x, y); features live in row space as
``(NCOL+1, 8C)`` tensors (z folded into lanes, pad column last).  ScanNet
surfaces put ~1.3-2 voxels in an 8-cell column, so the static column cap
is ~cap/2 — and a 3^3 submanifold conv needs only

    2 gathers  to augment each column with its z-boundary cells
               (below.z7 | own 8 cells | above.z0  ->  (NCOL+1, 10C)), plus
    8 gathers  of that augmented array, one per non-center (ox, oy) offset,

i.e. ~10 * cap/2 = 5 gather rows per voxel instead of 27 — ~5x fewer
random HBM rows, with the z taps handled by the same banded matrices the
block path uses (:func:`block_conv._band_w2_subm` et al).  No block-dense
tensor, no halo concat tree, no chunked ``lax.map``: each conv is a
handful of monolithic gathers + MXU matmuls XLA can pipeline freely.

Weights are interchangeable across all three conv implementations
(same ``(27|8, Cin, Cout)`` layout, ``voxelize._offsets`` order).
Custom VJPs keep residuals row-space only (the same property that lets
the flagship backward fit HBM, see block_conv's round-3 header): dX is
the mirrored-kernel conv of dy over the SAME tables, dW re-gathers the
inputs.

Reference being replaced: MinkowskiEngine sparse conv via
``/root/reference/model/common.py:8-118`` (engine internals external).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from d3net_tpu.ops.block_conv import (
    _band_w2_down,
    _band_w2_subm,
    _band_w2_up,
)

COL = 8  # z-cells per column == block_conv.BLOCK (band matrices shared)

# xy offset order for col_nbr tables (row-major, matching _offsets(3)'s
# (dx, dy) structure); k9 = 3*(ox+1) + (oy+1)
_OFFS_XY = [(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)]
_K9 = {off: k for k, off in enumerate(_OFFS_XY)}

# stride-2 child order: k2 = 4*ox + 2*oy + oz over {0,1}^3 (matches
# voxelize._offsets(2) row-major order used by block_child)
_OFFS2 = [(ox, oy, oz) for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)]
_K2 = {off: k for k, off in enumerate(_OFFS2)}


# ---------------------------------------------------------------------------
# row <-> column conversion
# ---------------------------------------------------------------------------

def rows_to_cols(feats, vox2col, valid, ccap: int):
    """(cap, C) voxel rows -> (ccap+1, 8C) z-folded columns (pad col last).

    ``vox2col`` is col*8 + z_local with INVALID/overflow = ccap*8; the pad
    column is forced to zero (overflow voxels would otherwise leave
    garbage every INVALID gather then reads).
    """
    c = feats.shape[-1]
    safe = jnp.where(valid[:, None], feats, 0.0).astype(feats.dtype)
    dense = jnp.zeros(((ccap + 1) * COL, c), feats.dtype)
    dense = dense.at[vox2col].set(safe)
    dense = dense.reshape(ccap + 1, COL * c)
    return dense.at[ccap].set(0.0)


def cols_to_rows(cols, vox2col):
    """(ccap+1, 8C) columns -> (cap, C) voxel rows (INVALID reads pad)."""
    nc1 = cols.shape[0]
    c = cols.shape[-1] // COL
    return cols.reshape(nc1 * COL, c)[vox2col]


def _mmf(a, b2, dt):
    return jnp.matmul(
        a, b2.astype(a.dtype), preferred_element_type=jnp.float32
    ).astype(dt)


def _augment(cols, col_zm, col_zp, cin: int):
    """(ccap+1, 8C) -> (ccap+1, 10C): below.z7 | own | above.z0.

    col_zm/col_zp are (ccap,) neighbor columns at z-block -1/+1 (INVALID =
    ccap -> reads the zero pad column); the pad row of the result is zero.
    """
    ccap = cols.shape[0] - 1
    pad1 = jnp.asarray([ccap], col_zm.dtype)
    lo = cols[jnp.concatenate([col_zm, pad1])][:, (COL - 1) * cin:]
    hi = cols[jnp.concatenate([col_zp, pad1])][:, :cin]
    return jnp.concatenate([lo, cols, hi], axis=-1)


# ---------------------------------------------------------------------------
# submanifold 3^3 conv
# ---------------------------------------------------------------------------

def _subm_cols(cols, col_nbr, col_zm, col_zp, w):
    """(ccap+1, 8Cin) columns -> (ccap+1, 8Cout); w (27, Cin, Cout)."""
    ccap = col_nbr.shape[0]
    cin = cols.shape[-1] // COL
    dt = cols.dtype
    aug = _augment(cols, col_zm, col_zp, cin)            # (ccap+1, 10Cin)
    out = _mmf(aug[:ccap], _band_w2_subm(w, 0, 0), jnp.float32)
    for ox, oy in _OFFS_XY:
        if (ox, oy) == (0, 0):
            continue
        g = aug[col_nbr[:, _K9[(ox, oy)]]]               # (ccap, 10Cin)
        out = out + _mmf(g, _band_w2_subm(w, ox, oy), jnp.float32)
    cout = w.shape[-1]
    return jnp.concatenate(
        [out.astype(dt), jnp.zeros((1, COL * cout), dt)], axis=0
    )


def _subm_dw_cols(cols_x, col_nbr, col_zm, col_zp, dy_cols):
    """(27, Cin, Cout) weight grad via per-(ox,oy) 10Cin x 8Cout Grams."""
    ccap = col_nbr.shape[0]
    cin = cols_x.shape[-1] // COL
    cout = dy_cols.shape[-1] // COL
    aug = _augment(cols_x, col_zm, col_zp, cin)
    dy = dy_cols[:ccap]
    dws = [None] * 27
    for ox, oy in _OFFS_XY:
        if (ox, oy) == (0, 0):
            g = aug[:ccap]
        else:
            g = aug[col_nbr[:, _K9[(ox, oy)]]]
        gram = jnp.matmul(                               # (10Cin, 8Cout)
            g.T, dy.astype(g.dtype), preferred_element_type=jnp.float32
        )
        g4 = gram.reshape(10, cin, COL, cout)
        for oz in (-1, 0, 1):
            gs = g4[1 + oz:9 + oz]                       # (8, Cin, 8, Cout)
            k = (1 + ox) * 9 + (1 + oy) * 3 + (1 + oz)   # _offsets(3) order
            dws[k] = jnp.einsum(
                "zczd->cd", gs, preferred_element_type=jnp.float32)
    return jnp.stack(dws)


@jax.custom_vjp
def subm_col_rows(feats, w, vox2col, validf, col_nbr, col_zm, col_zp):
    """Row-space 3^3 submanifold conv: (cap, Cin) -> (cap, Cout).

    w: (27, Cin, Cout) in the gather conv's offset order — weights remain
    interchangeable across conv implementations.
    """
    ccap = col_nbr.shape[0]
    cols = rows_to_cols(feats, vox2col, validf.astype(bool), ccap)
    return cols_to_rows(_subm_cols(cols, col_nbr, col_zm, col_zp, w),
                        vox2col)


def _subm_col_fwd(feats, w, vox2col, validf, col_nbr, col_zm, col_zp):
    return (subm_col_rows(feats, w, vox2col, validf, col_nbr, col_zm,
                          col_zp),
            (feats, w, vox2col, validf, col_nbr, col_zm, col_zp))


def _subm_col_bwd(res, dy):
    feats, w, vox2col, validf, col_nbr, col_zm, col_zp = res
    ccap = col_nbr.shape[0]
    valid = validf.astype(bool)
    dy = dy.astype(feats.dtype)
    # dx: subm conv of dy with the mirrored-transposed kernel over the SAME
    # tables (submanifold 3^3 is self-transpose under kernel mirroring —
    # identical argument to sparse_conv_t / subm_conv_rows)
    w_hat = w[::-1].transpose(0, 2, 1)
    dy_cols = rows_to_cols(dy, vox2col, valid, ccap)
    dx = cols_to_rows(
        _subm_cols(dy_cols, col_nbr, col_zm, col_zp, w_hat), vox2col)
    cols_x = rows_to_cols(feats, vox2col, valid, ccap)
    dw = _subm_dw_cols(cols_x, col_nbr, col_zm, col_zp, dy_cols)
    return (dx.astype(feats.dtype), dw.astype(w.dtype), None, None, None,
            None, None)


subm_col_rows.defvjp(_subm_col_fwd, _subm_col_bwd)


# ---------------------------------------------------------------------------
# stride-2 kernel-2 down conv
# ---------------------------------------------------------------------------

def _stacked_fine(cols_f, col_child, ox, oy):
    """concat of the two z-stacked fine child columns for xy offset."""
    lo = cols_f[col_child[:, _K2[(ox, oy, 0)]]]
    hi = cols_f[col_child[:, _K2[(ox, oy, 1)]]]
    return jnp.concatenate([lo, hi], axis=-1)           # (ccap_c, 16Cin)


def _down_cols(cols_f, col_child, w):
    """fine (ccapf+1, 8Cin) -> coarse (ccapc+1, 8Cout); w (8, Cin, Cout).

    A coarse column's 16 fine z-cells live entirely in its two z-stacked
    fine child columns — no halo.  8 gathers per coarse column.
    """
    cout = w.shape[-1]
    dt = cols_f.dtype
    out = None
    for ox in (0, 1):
        for oy in (0, 1):
            stack = _stacked_fine(cols_f, col_child, ox, oy)
            r = _mmf(stack, _band_w2_down(w, ox, oy), jnp.float32)
            out = r if out is None else out + r
    return jnp.concatenate(
        [out.astype(dt), jnp.zeros((1, COL * cout), dt)], axis=0
    )


def _down_dw_cols(cols_f, col_child, dy_cols_c):
    """(8, Cin, Cout) weight grad for the down conv."""
    cin = cols_f.shape[-1] // COL
    cout = dy_cols_c.shape[-1] // COL
    ccapc = col_child.shape[0]
    dy = dy_cols_c[:ccapc]
    dws = [None] * 8
    for ox in (0, 1):
        for oy in (0, 1):
            stack = _stacked_fine(cols_f, col_child, ox, oy)
            gram = jnp.matmul(                          # (16Cin, 8Cout)
                stack.T, dy.astype(stack.dtype),
                preferred_element_type=jnp.float32)
            g = gram.reshape(16, cin, COL, cout)
            for oz in (0, 1):
                gs = g[oz::2]                           # (8, Cin, 8, Cout)
                dws[_K2[(ox, oy, oz)]] = jnp.einsum(
                    "zczd->cd", gs, preferred_element_type=jnp.float32)
    return jnp.stack(dws)


# ---------------------------------------------------------------------------
# transposed stride-2 up conv
# ---------------------------------------------------------------------------

def _up_cols(cols_c, col_parent, col_quad, w):
    """coarse (ccapc+1, 8Cin) -> fine (ccapf+1, 8Cout); w (8, Cin, Cout).

    One parent per fine column: gather its coarse row (8Cin), lane-select
    the z-half by quad parity, then 4 masked band matmuls (one per (ex,
    ey) — compute is 4x a minimal scheme but the MXU has ~1000x headroom
    here and this keeps everything monolithic).
    """
    ccapc = cols_c.shape[0] - 1
    cin = cols_c.shape[-1] // COL
    cout = w.shape[-1]
    dt = cols_c.dtype
    prow = cols_c[col_parent]                           # (ccapf, 8Cin)
    h = COL // 2
    half = jnp.where(
        (col_quad & 1)[:, None].astype(bool),
        prow[:, h * cin:], prow[:, :h * cin])           # (ccapf, 4Cin)
    exy = (col_quad >> 1).astype(jnp.int32)             # 2*ex + ey
    out = None
    for ex in (0, 1):
        for ey in (0, 1):
            r = _mmf(half, _band_w2_up(w, ex, ey), jnp.float32)
            r = jnp.where((exy == 2 * ex + ey)[:, None], r, 0.0)
            out = r if out is None else out + r
    return jnp.concatenate(
        [out.astype(dt), jnp.zeros((1, COL * cout), dt)], axis=0
    )


def _up_dw_cols(cols_c, col_parent, col_quad, dy_cols_f):
    """(8, Cin, Cout) weight grad for the transposed conv."""
    cin = cols_c.shape[-1] // COL
    cout = dy_cols_f.shape[-1] // COL
    ccapf = col_parent.shape[0]
    prow = cols_c[col_parent]
    h = COL // 2
    half = jnp.where(
        (col_quad & 1)[:, None].astype(bool),
        prow[:, h * cin:], prow[:, :h * cin])
    exy = (col_quad >> 1).astype(jnp.int32)
    dy = dy_cols_f[:ccapf]
    dws = [None] * 8
    for ex in (0, 1):
        for ey in (0, 1):
            sel = (exy == 2 * ex + ey)[:, None]
            hm = jnp.where(sel, half, 0.0)
            gram = jnp.matmul(                          # (4Cin, 8Cout)
                hm.T, dy.astype(hm.dtype),
                preferred_element_type=jnp.float32)
            g = gram.reshape(h, cin, COL, cout)
            for ez in (0, 1):
                gs = g[:, :, ez::2]                     # (4, Cin, 4, Cout)
                dws[_K2[(ex, ey, ez)]] = jnp.einsum(
                    "zczd->cd", gs, preferred_element_type=jnp.float32)
    return jnp.stack(dws)


@jax.custom_vjp
def down_col_rows(feats_f, w, v2c_f, validf_f, col_child, col_parent,
                  col_quad, v2c_c, validf_c):
    """Row-space stride-2 kernel-2 conv: fine rows -> coarse rows.

    w: (8, Cin, Cout) in ``_offsets(2)`` order (gather-conv compatible).
    """
    ccapf = col_parent.shape[0]
    cols_f = rows_to_cols(feats_f, v2c_f, validf_f.astype(bool), ccapf)
    return cols_to_rows(_down_cols(cols_f, col_child, w), v2c_c)


def _down_col_fwd(feats_f, w, v2c_f, validf_f, col_child, col_parent,
                  col_quad, v2c_c, validf_c):
    out = down_col_rows(feats_f, w, v2c_f, validf_f, col_child, col_parent,
                        col_quad, v2c_c, validf_c)
    return out, (feats_f, w, v2c_f, validf_f, col_child, col_parent,
                 col_quad, v2c_c, validf_c)


def _down_col_bwd(res, dy):
    (feats_f, w, v2c_f, validf_f, col_child, col_parent, col_quad,
     v2c_c, validf_c) = res
    ccapf = col_parent.shape[0]
    ccapc = col_child.shape[0]
    valid_f = validf_f.astype(bool)
    valid_c = validf_c.astype(bool)
    dy = dy.astype(feats_f.dtype)
    dy_cols_c = rows_to_cols(dy, v2c_c, valid_c, ccapc)
    # dx: exact transpose of down is up with per-offset transposed weights
    dx_cols = _up_cols(dy_cols_c, col_parent, col_quad, w.transpose(0, 2, 1))
    dx = cols_to_rows(dx_cols, v2c_f)
    cols_f = rows_to_cols(feats_f, v2c_f, valid_f, ccapf)
    dw = _down_dw_cols(cols_f, col_child, dy_cols_c)
    return (dx.astype(feats_f.dtype), dw.astype(w.dtype), None, None, None,
            None, None, None, None)


down_col_rows.defvjp(_down_col_fwd, _down_col_bwd)


@jax.custom_vjp
def up_col_rows(feats_c, w, v2c_c, validf_c, col_child, col_parent,
                col_quad, v2c_f, validf_f):
    """Row-space transposed stride-2 conv: coarse rows -> fine rows."""
    ccapc = col_child.shape[0]
    cols_c = rows_to_cols(feats_c, v2c_c, validf_c.astype(bool), ccapc)
    return cols_to_rows(_up_cols(cols_c, col_parent, col_quad, w), v2c_f)


def _up_col_fwd(feats_c, w, v2c_c, validf_c, col_child, col_parent,
                col_quad, v2c_f, validf_f):
    out = up_col_rows(feats_c, w, v2c_c, validf_c, col_child, col_parent,
                      col_quad, v2c_f, validf_f)
    return out, (feats_c, w, v2c_c, validf_c, col_child, col_parent,
                 col_quad, v2c_f, validf_f)


def _up_col_bwd(res, dy):
    (feats_c, w, v2c_c, validf_c, col_child, col_parent, col_quad,
     v2c_f, validf_f) = res
    ccapf = col_parent.shape[0]
    ccapc = col_child.shape[0]
    valid_f = validf_f.astype(bool)
    valid_c = validf_c.astype(bool)
    dy = dy.astype(feats_c.dtype)
    dy_cols_f = rows_to_cols(dy, v2c_f, valid_f, ccapf)
    # dx: exact transpose of up is down with per-offset transposed weights
    dx_cols = _down_cols(dy_cols_f, col_child, w.transpose(0, 2, 1))
    dx = cols_to_rows(dx_cols, v2c_c)
    cols_c = rows_to_cols(feats_c, v2c_c, valid_c, ccapc)
    dw = _up_dw_cols(cols_c, col_parent, col_quad, dy_cols_f)
    return (dx.astype(feats_c.dtype), dw.astype(w.dtype), None, None, None,
            None, None, None, None)


up_col_rows.defvjp(_up_col_fwd, _up_col_bwd)
