"""Column-resident flat-batch sparse conv (round 5, ``conv_impl: colres``).

Round-4's z-column conv (:mod:`d3net_tpu.ops.column_conv`) cut gather rows
~4x but still ran ~73 ms per flagship L0 conv.  Device microbenchmarks
(scripts/gather_bench.py, one v5e) located the remaining cost in three
layout sins, none of them "gathers are slow":

  ============================  =========  ==========================
  pattern                        ns/row     where it hid
  ============================  =========  ==========================
  flat gather, 128 lanes         1.71       (the fast path)
  vmapped gather (B=4)           8.66       every conv (vmap batching)
  gather at 160 lanes            13.76      the (10C) augmented array
  gather at 256 lanes            12.32      L1+ column rows
  scatter at 16 lanes            43.7       rows_to_cols, every conv
  sliced 2x128-lane gathers      5.07       (the wide-row fix)
  ============================  =========  ==========================

This module is the redesign those numbers dictate:

- **Flat batch.**  One gather domain ``(B*(ccap+1), 8C)``; per-scene tables
  are offset on device once per level (no vmap — a batched gather costs 5x
  a flat one).
- **Column-resident.**  Features stay in column space across the whole
  U-Net level stack; rows<->cols conversion happens once at the network
  input and once before the heads, not per conv (the 16-lane scatter was
  ~23 ms per conv).
- **Strips instead of aug.**  The z-boundary cells ride a separate
  128-lane-padded strips array ``S = [lo | hi]`` gathered with the same
  neighbor indices, so no gather ever touches a 160-lane row:
  ``out_k = own_k @ B_mid + S_k @ B_lohi`` is algebraically identical to
  the augmented form (``B_mid``/``B_lohi`` are row-slices of the same
  ``_band_w2_subm`` matrix).
- **<=128-lane gathers.**  Wide rows (8C > 128) gather as 128-lane slabs;
  when Cout < Cin the band matmul runs *before* the gather
  (gather commutes with per-row matmuls), so e.g. the 134-channel input
  conv gathers 128-lane projected rows instead of 1072-lane ones.

Custom VJPs keep the round-3 row-space-residual property (saved residuals
are the column activations, ~4.6x row bytes — still far under HBM):
dx is the mirrored-kernel conv over the same tables, dW re-gathers the
inputs and folds per-offset Gram matrices onto the 27-tap layout.  Weights
remain interchangeable with every other conv impl (same ``(27|8, Cin,
Cout)`` layout, ``voxelize._offsets`` order; oracle tests in
tests/test_colres_conv.py).

Reference being replaced: MinkowskiEngine sparse conv used via
``/root/reference/model/common.py:8-118`` (engine internals external).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from d3net_tpu.ops.block_conv import (
    _band_w2_down,
    _band_w2_subm,
    _band_w2_up,
)

COL = 8  # z-cells per column

_OFFS_XY = [(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)]
_K9 = {off: k for k, off in enumerate(_OFFS_XY)}
_OFFS2 = [(ox, oy, oz) for ox in (0, 1) for oy in (0, 1) for oz in (0, 1)]
_K2 = {off: k for k, off in enumerate(_OFFS2)}


# ---------------------------------------------------------------------------
# gather helpers — every physical gather at <= 128 lanes
# ---------------------------------------------------------------------------

def slab_gather(a, idx):
    """``a[idx]`` with every physical gather over <= 128 lanes.

    Measured on v5e: gathers of >128-lane rows fall off the fast path
    (13.8 ns/row at 160 lanes vs 1.71 at 128); two sliced 128-lane gathers
    of the same rows run at 5.1 ns/row total.
    """
    c = a.shape[-1]
    if c <= 128:
        return a[idx]
    parts = [a[:, s:min(s + 128, c)][idx] for s in range(0, c, 128)]
    return jnp.concatenate(parts, axis=-1)


def _mmf(a, b2):
    return jnp.matmul(
        a, b2.astype(a.dtype), preferred_element_type=jnp.float32
    )


def _gather_mm(x, idx, b2):
    """``x[idx] @ b2`` gathering on the narrower side.

    When the output is narrower than the input, run the band matmul first
    and gather the projected rows (gather commutes with per-row matmuls);
    the FLOP count is identical, the gather lanes shrink.
    """
    if b2.shape[1] < x.shape[-1]:
        return slab_gather(_mmf(x, b2), idx)
    return _mmf(slab_gather(x, idx), b2)


# ---------------------------------------------------------------------------
# flat level tables
# ---------------------------------------------------------------------------

def _flat_idx(a, pad_val, domain_nc1):
    """(B, rows, ...) index table -> (B*(rows+1), ...) flat indices.

    Appends one pad row per scene (value ``pad_val``, the target domain's
    per-scene pad) and adds the per-scene target-domain offset
    ``s * domain_nc1``.
    """
    b = a.shape[0]
    pad = jnp.full((b, 1) + a.shape[2:], pad_val, a.dtype)
    ap = jnp.concatenate([a, pad], axis=1)
    off = (jnp.arange(b, dtype=a.dtype) * domain_nc1).reshape(
        (b, 1) + (1,) * (a.ndim - 2))
    return (ap + off).reshape((b * (a.shape[1] + 1),) + a.shape[2:])


def flatten_level(t: Dict, cap: int, next_ccap: int | None = None) -> Dict:
    """Batched column LevelTables -> flat-domain tables (device, cheap).

    The flat column domain has ``nc1 = ccap + 1`` rows per scene (pad row
    last, all-zero); every index table gains one pad row per scene pointing
    at its target domain's pad, plus the per-scene domain offset.
    ``next_ccap`` is the NEXT (coarser) level's column cap — needed to
    offset ``col_parent`` (whose values live in the coarse domain).
    """
    b, ccap = t["col_zm"].shape
    nc1 = ccap + 1

    out = {
        "nbr": _flat_idx(t["col_nbr"], ccap, nc1),   # (B*nc1, 9)
        "zm": _flat_idx(t["col_zm"], ccap, nc1),     # (B*nc1,)
        "zp": _flat_idx(t["col_zp"], ccap, nc1),
        "occ": jnp.concatenate(
            [t["col_occ"], jnp.zeros((b, 1, COL), t["col_occ"].dtype)], axis=1
        ).reshape(b * nc1, COL),
        "vox2col": (
            t["vox2col"]
            + (jnp.arange(b, dtype=jnp.int32) * (nc1 * COL))[:, None]
        ).reshape(-1),                                # (B*cap,) cell domain
        "mask": t["mask"],                            # (B, cap) voxel mask
        "b": b,
        "ccap": ccap,
        "cap": cap,
    }
    if "col2vox" in t:
        capp = cap + 1
        c2v = t["col2vox"].reshape(b, -1) + (
            jnp.arange(b, dtype=jnp.int32) * capp)[:, None]
        pad_cells = (jnp.full((b, COL), cap, jnp.int32)
                     + (jnp.arange(b, dtype=jnp.int32) * capp)[:, None])
        out["col2vox"] = jnp.concatenate(
            [c2v.reshape(b, ccap * COL), pad_cells], axis=1
        ).reshape(-1)                                 # (B*nc1*COL,)
    if "col_child" in t:
        # child rows live on the COARSE domain, values on this (fine) one;
        # the coarse pad row's children point at the fine pad (zero input)
        out["child"] = _flat_idx(t["col_child"], ccap, nc1)
    if "col_parent" in t and next_ccap is not None:
        nc1_c = next_ccap + 1
        out["parent"] = _flat_idx(t["col_parent"], next_ccap, nc1_c)
        quad = t["col_quad"]
        out["quad"] = jnp.concatenate(
            [quad, jnp.zeros((b, 1), quad.dtype)], axis=1
        ).reshape(-1)
    return out


def rows_to_cols_flat(feats, fl: Dict):
    """(B, cap, C) voxel rows -> (B*nc1, 8C) flat columns (pad rows zero).

    Gather-based (col2vox inverse map): the scatter form costs 43.7 ns/row
    at narrow lanes on v5e; a banded monotone gather is ~4-12 ns/cell.
    Unoccupied cells read a nearby valid voxel (host keeps the map
    monotone) and are zeroed by the occupancy mask.
    """
    b, cap, c = feats.shape
    nc1 = fl["ccap"] + 1
    fpad = jnp.concatenate(
        [feats, jnp.zeros((b, 1, c), feats.dtype)], axis=1
    ).reshape(b * (cap + 1), c)
    cells = slab_gather(fpad, fl["col2vox"])       # (B*nc1*COL, C)
    cells = cells.reshape(b * nc1, COL, c)
    occ = fl["occ"].astype(feats.dtype)[:, :, None]  # (B*nc1, COL, 1)
    return (cells * occ).reshape(b * nc1, COL * c)


def cols_to_rows_flat(cols, fl: Dict):
    """(B*nc1, 8C) flat columns -> (B, cap, C) voxel rows."""
    b, cap = fl["b"], fl["cap"]
    c = cols.shape[-1] // COL
    flat_cells = cols.reshape(-1, c)               # (B*nc1*COL, C)
    return slab_gather(flat_cells, fl["vox2col"]).reshape(b, cap, c)


def occ_lanes(fl: Dict, c: int, dtype):
    """(B*nc1, 8C) per-cell occupancy mask expanded over channels."""
    occ = fl["occ"].astype(dtype)                  # (N1, 8)
    return jnp.repeat(occ, c, axis=-1)             # z-major: [z0*C | z1*C ...]


# ---------------------------------------------------------------------------
# submanifold 3^3 conv
# ---------------------------------------------------------------------------

def _strips(cols, fl, cin):
    """(N1, 2C) z-boundary strips: [below.z7 | above.z0] per column.

    Padded to >=128 lanes so the per-offset strip gathers ride the fast
    gather path (the pad lanes multiply a zero band-matrix block).
    """
    lo = slab_gather(cols[:, (COL - 1) * cin:], fl["zm"])
    hi = slab_gather(cols[:, :cin], fl["zp"])
    s = jnp.concatenate([lo, hi], axis=-1)
    pad = (-s.shape[-1]) % 128 if s.shape[-1] < 128 else 0
    if pad:
        s = jnp.pad(s, ((0, 0), (0, pad)))
    return s


def _split_band(w, ox, oy, cin):
    """_band_w2_subm rows split as (B_mid (8C,8Co), B_lohi (2C,8Co))."""
    bfull = _band_w2_subm(w, ox, oy)               # (10C, 8Co)
    b_lo = bfull[:cin]
    b_mid = bfull[cin:(COL + 1) * cin]
    b_hi = bfull[(COL + 1) * cin:]
    return b_mid, jnp.concatenate([b_lo, b_hi], axis=0)


_OFFS_XY8 = [o for o in _OFFS_XY if o != (0, 0)]


def _padded_lohi(b_lohi, s_lanes, sc):
    if s_lanes > sc:   # zero rows for the 128-lane strips padding
        b_lohi = jnp.concatenate(
            [b_lohi, jnp.zeros((s_lanes - sc, b_lohi.shape[1]),
                               b_lohi.dtype)], axis=0)
    return b_lohi


def _subm_flat(cols, fl, w):
    """(N1, 8Cin) -> (N1, 8Cout) f32; w (27, Cin, Cout).

    The 8 gathered taps run under ONE ``lax.scan`` over stacked band
    matrices + neighbor columns: identical math to the unrolled form, but
    the emitted HLO holds one tap body instead of eight — the flagship
    train program has ~30 such convs in fwd+bwd and fully-unrolled taps
    crash the remote compile service (r4/r5: tpu_compile_helper HTTP 500;
    the gather conv compiles because its taps sit inside lax.map bodies).
    """
    cin = w.shape[1]
    s = _strips(cols, fl, cin)
    sc = 2 * cin
    b_mid0, b_lohi0 = _split_band(w, 0, 0, cin)
    out = _mmf(cols, b_mid0) + _mmf(s, _padded_lohi(b_lohi0, s.shape[-1], sc))

    bmids = jnp.stack([_split_band(w, ox, oy, cin)[0]
                       for ox, oy in _OFFS_XY8])
    blohis = jnp.stack([
        _padded_lohi(_split_band(w, ox, oy, cin)[1], s.shape[-1], sc)
        for ox, oy in _OFFS_XY8])
    idxs = jnp.stack([fl["nbr"][:, _K9[o]] for o in _OFFS_XY8])

    def body(acc, inp):
        idx, bm, bl = inp
        return acc + _gather_mm(cols, idx, bm) + _gather_mm(s, idx, bl), None

    out, _ = jax.lax.scan(body, out, (idxs, bmids, blohis))
    return out


def _subm_dw_flat(cols, fl, dy, cin, cout):
    """(27, Cin, Cout) weight grad: per-(ox,oy) aug-Gram fold.

    Same lax.scan HLO-compression as :func:`_subm_flat` (one tap body).
    """
    s = _strips(cols, fl, cin)[:, :2 * cin]
    eye = jnp.eye(COL, dtype=jnp.float32)[:, None, :, None]

    def fold(g_mid, g_s):
        gram_mid = jnp.matmul(                     # (8Cin, 8Cout)
            g_mid.T, dy.astype(g_mid.dtype),
            preferred_element_type=jnp.float32)
        gram_s = jnp.matmul(                       # (2Cin, 8Cout)
            g_s.T, dy.astype(g_s.dtype),
            preferred_element_type=jnp.float32)
        gram = jnp.concatenate(
            [gram_s[:cin], gram_mid, gram_s[cin:]], axis=0)  # (10Cin, 8Cout)
        g4 = gram.reshape(10, cin, COL, cout)
        # shifted-diagonal fold WITHOUT einsum-diag lowering (eye-mask
        # multiply + reduce keeps the HLO simple for the remote compiler)
        return jnp.stack([
            (g4[1 + oz:9 + oz] * eye).sum(axis=(0, 2)) for oz in (-1, 0, 1)
        ])                                          # (3, Cin, Cout)

    dw_c = fold(cols, s)                            # center (ox=oy=0)
    idxs = jnp.stack([fl["nbr"][:, _K9[o]] for o in _OFFS_XY8])

    def body(_, idx):
        return None, fold(slab_gather(cols, idx), slab_gather(s, idx))

    _, dw_8 = jax.lax.scan(body, None, idxs)        # (8, 3, Cin, Cout)

    dws = [None] * 27
    for j, (ox, oy) in enumerate(_OFFS_XY8):
        for zi, oz in enumerate((-1, 0, 1)):
            dws[(1 + ox) * 9 + (1 + oy) * 3 + (1 + oz)] = dw_8[j, zi]
    for zi, oz in enumerate((-1, 0, 1)):
        dws[9 + 3 + 1 + oz] = dw_c[zi]
    return jnp.stack(dws)


@jax.custom_vjp
def subm_cc(cols, w, nbr, zm, zp, occ):
    """Flat column-resident 3^3 submanifold conv: (N1, 8Cin) -> (N1, 8Cout).

    ``nbr``/``zm``/``zp``/``occ`` from :func:`flatten_level`; w (27, Cin,
    Cout) in the shared offset order.  Output is raw (unoccupied cells hold
    garbage); the BN/mask step downstream zeroes them — inputs MUST already
    be zero at unoccupied cells (BN guarantees it; submanifold semantics).
    """
    fl = {"nbr": nbr, "zm": zm, "zp": zp}
    return _subm_flat(cols, fl, w).astype(cols.dtype)


def _subm_cc_fwd(cols, w, nbr, zm, zp, occ):
    return subm_cc(cols, w, nbr, zm, zp, occ), (cols, w, nbr, zm, zp, occ)


def _subm_cc_bwd(res, dy):
    cols, w, nbr, zm, zp, occ = res
    fl = {"nbr": nbr, "zm": zm, "zp": zp}
    dy = dy.astype(cols.dtype)
    w_hat = w[::-1].transpose(0, 2, 1)
    dx = _subm_flat(dy, fl, w_hat).astype(cols.dtype)
    cin, cout = w.shape[1], w.shape[2]
    dw = _subm_dw_flat(cols, fl, dy, cin, cout)
    return dx, dw.astype(w.dtype), None, None, None, None


subm_cc.defvjp(_subm_cc_fwd, _subm_cc_bwd)


# ---------------------------------------------------------------------------
# stride-2 kernel-2 down conv (fine cols -> coarse cols)
# ---------------------------------------------------------------------------

def _down_flat(cols_f, child, w):
    """fine (N1f, 8Cin) -> coarse (N1c, 8Cout) f32; w (8, Cin, Cout)."""
    out = None
    for ox in (0, 1):
        for oy in (0, 1):
            band = _band_w2_down(w, ox, oy)        # (16Cin, 8Cout)
            cin8 = cols_f.shape[-1]
            lo = _gather_mm(cols_f, child[:, _K2[(ox, oy, 0)]], band[:cin8])
            hi = _gather_mm(cols_f, child[:, _K2[(ox, oy, 1)]], band[cin8:])
            r = lo + hi
            out = r if out is None else out + r
    return out


def _down_dw_flat(cols_f, child, dy_c, cin, cout):
    eye2 = jnp.eye(COL, dtype=jnp.float32)
    dws = [None] * 8
    for ox in (0, 1):
        for oy in (0, 1):
            lo = slab_gather(cols_f, child[:, _K2[(ox, oy, 0)]])
            hi = slab_gather(cols_f, child[:, _K2[(ox, oy, 1)]])
            stack = jnp.concatenate([lo, hi], axis=-1)   # (N1c, 16Cin)
            gram = jnp.matmul(
                stack.T, dy_c.astype(stack.dtype),
                preferred_element_type=jnp.float32)      # (16Cin, 8Cout)
            g = gram.reshape(16, cin, COL, cout)
            for oz in (0, 1):
                gs = g[oz::2]                            # (8, Cin, 8, Cout)
                dws[_K2[(ox, oy, oz)]] = (
                    gs * eye2[:, None, :, None]).sum(axis=(0, 2))
    return jnp.stack(dws)


# ---------------------------------------------------------------------------
# transposed stride-2 up conv (coarse cols -> fine cols)
# ---------------------------------------------------------------------------

def _up_flat(cols_c, parent, quad, w):
    """coarse (N1c, 8Cin) -> fine (N1f, 8Cout) f32; w (8, Cin, Cout)."""
    cin = w.shape[1]
    prow = slab_gather(cols_c, parent)             # (N1f, 8Cin)
    h = COL // 2
    half = jnp.where(
        (quad & 1)[:, None].astype(bool),
        prow[:, h * cin:], prow[:, :h * cin])      # (N1f, 4Cin)
    exy = (quad >> 1).astype(jnp.int32)
    out = None
    for ex in (0, 1):
        for ey in (0, 1):
            r = _mmf(half, _band_w2_up(w, ex, ey))
            r = jnp.where((exy == 2 * ex + ey)[:, None], r, 0.0)
            out = r if out is None else out + r
    return out


def _up_dw_flat(cols_c, parent, quad, dy_f, cin, cout):
    prow = slab_gather(cols_c, parent)
    h = COL // 2
    half = jnp.where(
        (quad & 1)[:, None].astype(bool),
        prow[:, h * cin:], prow[:, :h * cin])
    exy = (quad >> 1).astype(jnp.int32)
    eye4 = jnp.eye(h, dtype=jnp.float32)
    dws = [None] * 8
    for ex in (0, 1):
        for ey in (0, 1):
            sel = (exy == 2 * ex + ey)[:, None]
            hm = jnp.where(sel, half, 0.0)
            gram = jnp.matmul(
                hm.T, dy_f.astype(hm.dtype),
                preferred_element_type=jnp.float32)      # (4Cin, 8Cout)
            g = gram.reshape(h, cin, COL, cout)
            for ez in (0, 1):
                gs = g[:, :, ez::2]                      # (4, Cin, 4, Cout)
                dws[_K2[(ex, ey, ez)]] = (
                    gs * eye4[:, None, :, None]).sum(axis=(0, 2))
    return jnp.stack(dws)


@jax.custom_vjp
def down_cc(cols_f, w, child, parent, quad):
    """Flat stride-2 kernel-2 conv: fine cols -> coarse cols."""
    return _down_flat(cols_f, child, w).astype(cols_f.dtype)


def _down_cc_fwd(cols_f, w, child, parent, quad):
    return down_cc(cols_f, w, child, parent, quad), (cols_f, w, child,
                                                     parent, quad)


def _down_cc_bwd(res, dy):
    cols_f, w, child, parent, quad = res
    dy = dy.astype(cols_f.dtype)
    dx = _up_flat(dy, parent, quad, w.transpose(0, 2, 1)).astype(cols_f.dtype)
    dw = _down_dw_flat(cols_f, child, dy, w.shape[1], w.shape[2])
    return dx, dw.astype(w.dtype), None, None, None


down_cc.defvjp(_down_cc_fwd, _down_cc_bwd)


@jax.custom_vjp
def up_cc(cols_c, w, child, parent, quad):
    """Flat transposed stride-2 conv: coarse cols -> fine cols."""
    return _up_flat(cols_c, parent, quad, w).astype(cols_c.dtype)


def _up_cc_fwd(cols_c, w, child, parent, quad):
    return up_cc(cols_c, w, child, parent, quad), (cols_c, w, child,
                                                   parent, quad)


def _up_cc_bwd(res, dy):
    cols_c, w, child, parent, quad = res
    dy = dy.astype(cols_c.dtype)
    dx = _down_flat(dy, child, w.transpose(0, 2, 1)).astype(cols_c.dtype)
    dw = _up_dw_flat(cols_c, parent, quad, dy, w.shape[1], w.shape[2])
    return dx, dw.astype(w.dtype), None, None, None


up_cc.defvjp(_up_cc_fwd, _up_cc_bwd)


# ---------------------------------------------------------------------------
# column-space pointwise helpers
# ---------------------------------------------------------------------------

def proj_cc(cols, w1):
    """1x1 conv in column space: block-diagonal matmul, no relayout.

    w1 (Cin, Cout); out (N1, 8Cout).  kron(I8, w1) keeps the op a single
    (N1, 8Cin) @ (8Cin, 8Cout) MXU matmul instead of a (N1, 8, C) reshape
    (which relayouts lanes).
    """
    cin, cout = w1.shape
    w8 = jnp.kron(jnp.eye(COL, dtype=w1.dtype), w1)
    return jnp.matmul(
        cols, w8.astype(cols.dtype), preferred_element_type=jnp.float32
    ).astype(cols.dtype)


def concat_cc(a, b):
    """Per-cell channel concat of two column tensors, via placement matmuls.

    a (N1, 8Ca), b (N1, 8Cb) -> (N1, 8(Ca+Cb)) with channels interleaved
    per z-cell (matching row-space ``concatenate(axis=-1)``).
    """
    ca = a.shape[-1] // COL
    cb = b.shape[-1] // COL
    cc = ca + cb
    ea = jnp.zeros((COL * ca, COL * cc), a.dtype)
    eb = jnp.zeros((COL * cb, COL * cc), b.dtype)
    za = jnp.arange(COL * ca)
    zb = jnp.arange(COL * cb)
    ea = ea.at[za, (za // ca) * cc + (za % ca)].set(1)
    eb = eb.at[zb, (zb // cb) * cc + ca + (zb % cb)].set(1)
    return (
        jnp.matmul(a, ea, preferred_element_type=jnp.float32)
        + jnp.matmul(b, eb, preferred_element_type=jnp.float32)
    ).astype(a.dtype)
