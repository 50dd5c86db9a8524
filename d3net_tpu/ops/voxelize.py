"""Host-side voxelization rulebooks and sparse-conv kernel maps.

TPU-native replacement for the reference's CPU hash-map voxelizer
(``lib/pointgroup_ops/src/voxelize/voxelize.cpp:voxelize_inputmap``) and for
MinkowskiEngine's kernel-map construction.  Runs in the input pipeline on
host and emits **static-shape** integer index tables; the device program is
pure gathers + MXU matmuls driven by these tables.

Key structures (per scene, before batching/padding):

- ``p2v``   (N,)        point -> voxel index              (voxelize_idx parity)
- ``coords``(M, 3)      unique voxel integer coords
- per U-Net level:
    ``nbr``  (M_l, K)   submanifold 3^3 (K=27) neighbor table: for output
                        voxel i and kernel offset k, the input voxel index at
                        coords[i] + offset[k], or INVALID.
    ``down`` (M_{l+1}, 8)  stride-2 kernel-2 conv table into level l.
    ``up``   (M_l, 8)      transposed stride-2 kernel-2 table into level l+1
                           (exactly one valid entry per row: the parent).

INVALID entries point one past the real voxel count; the device side pads
feature arrays with a zero row at that slot so gathers need no masking.

All lookups are vectorized numpy: voxel coords are packed into int64 keys
and neighbor queries are `searchsorted` over the sorted key array — O(M·K
log M) with no Python-level loops.  A C++ drop-in (cc/) can replace the key
sort for very large scenes; numpy is already fast enough to be overlapped
with device compute by the input pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from d3net_tpu.ops import native

# Coordinate bound per axis after packing. ScanNet full_scale is <= 512;
# downsampled levels and cluster grids are far smaller. Coords may go
# slightly negative after integer division of negatives, so keys are biased.
_KEY_BOUND = 1 << 20  # per-axis headroom inside int64
_KEY_BIAS = 1 << 10


def pack_keys(coords: np.ndarray) -> np.ndarray:
    """(M, 3) int coords -> (M,) unique int64 keys (order-preserving lex)."""
    c = coords.astype(np.int64) + _KEY_BIAS
    return (c[:, 0] * _KEY_BOUND + c[:, 1]) * _KEY_BOUND + c[:, 2]


def voxelize(coords: np.ndarray):
    """Deduplicate integer point coords into voxels.

    Args:
        coords: (N, 3) int array (already floored/scaled point coords).

    Returns:
        voxel_coords (M, 3) int32, p2v (N,) int32 point->voxel map,
        counts (M,) int32 points per voxel.

    Mirrors ``pointgroup_ops.voxelization_idx`` (mode-4/mean rulebook): the
    v2p rulebook is implicit — device-side scatters use ``p2v`` with
    ``jax.ops.segment_*`` instead of the CUDA (M, maxActive) table.
    """
    if native.available():
        return native.voxelize(coords)
    keys = pack_keys(coords)
    uniq, p2v, counts = np.unique(keys, return_inverse=True, return_counts=True)
    # representative coords: first occurrence per voxel
    first = np.zeros(len(uniq), dtype=np.int64)
    # argsort keys; first occurrence of each unique key in sorted order
    order = np.argsort(keys, kind="stable")
    boundaries = np.searchsorted(keys[order], uniq, side="left")
    first = order[boundaries]
    voxel_coords = coords[first].astype(np.int32)
    return voxel_coords, p2v.astype(np.int32), counts.astype(np.int32)


def _lookup(sorted_keys: np.ndarray, sorted_to_orig: np.ndarray, query: np.ndarray,
            invalid: int) -> np.ndarray:
    """Find each query key's voxel index, or `invalid` if absent."""
    pos = np.searchsorted(sorted_keys, query)
    pos = np.clip(pos, 0, len(sorted_keys) - 1)
    hit = sorted_keys[pos] == query
    idx = np.where(hit, sorted_to_orig[pos], invalid)
    return idx.astype(np.int32)


def _offsets(kernel_size: int) -> np.ndarray:
    """Lexicographic kernel offsets. size 3 -> -1..1 (27), size 2 -> 0..1 (8)."""
    if kernel_size == 3:
        r = np.arange(-1, 2)
    elif kernel_size == 2:
        r = np.arange(0, 2)
    else:
        raise ValueError(f"unsupported kernel_size {kernel_size}")
    g = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    return g.astype(np.int64)


def submanifold_table(coords: np.ndarray, kernel_size: int = 3) -> np.ndarray:
    """(M, 3) voxel coords -> (M, k^3) stride-1 neighbor table (INVALID = M)."""
    if kernel_size == 3 and native.available():
        return native.submanifold_table(coords)
    m = len(coords)
    keys = pack_keys(coords)
    order = np.argsort(keys)
    sk, so = keys[order], order
    offs = _offsets(kernel_size)
    c = coords.astype(np.int64) + _KEY_BIAS
    out = np.empty((m, len(offs)), dtype=np.int32)
    for k, o in enumerate(offs):
        q = ((c[:, 0] + o[0]) * _KEY_BOUND + (c[:, 1] + o[1])) * _KEY_BOUND + (c[:, 2] + o[2])
        out[:, k] = _lookup(sk, so, q, m)
    return out


def downsample_level(coords: np.ndarray):
    """Stride-2 kernel-2 conv: new coarse level + gather table.

    Returns:
        coarse_coords (M2, 3) int32 — unique(floor(coords / 2)), and
        down (M2, 8) int32 — for coarse voxel p and offset k in {0,1}^3, the
        fine voxel index at 2p + k, or INVALID (= M_fine).
    """
    if native.available():
        return native.downsample_level(coords)
    m = len(coords)
    coarse = np.floor_divide(coords.astype(np.int64), 2)
    coarse_coords = np.unique(coarse, axis=0).astype(np.int32)

    keys = pack_keys(coords)
    order = np.argsort(keys)
    sk, so = keys[order], order

    offs = _offsets(2)
    base = coarse_coords.astype(np.int64) * 2 + _KEY_BIAS
    down = np.empty((len(coarse_coords), 8), dtype=np.int32)
    for k, o in enumerate(offs):
        q = ((base[:, 0] + o[0]) * _KEY_BOUND + (base[:, 1] + o[1])) * _KEY_BOUND + (base[:, 2] + o[2])
        down[:, k] = _lookup(sk, so, q, m)
    return coarse_coords, down


def upsample_table(fine_coords: np.ndarray, coarse_coords: np.ndarray) -> np.ndarray:
    """Transposed stride-2 kernel-2 conv table.

    For each fine voxel f: parent coarse voxel floor(f/2) under kernel offset
    (f mod 2).  Returns (M_fine, 8) with exactly one valid entry per row
    (INVALID = M_coarse elsewhere) so upconv uses the same gather-matmul
    kernel as every other conv.
    """
    if native.available():
        return native.upsample_table(fine_coords, coarse_coords)
    mc = len(coarse_coords)
    ckeys = pack_keys(coarse_coords)
    order = np.argsort(ckeys)
    sk, so = ckeys[order], order

    f = fine_coords.astype(np.int64)
    parent_coord = np.floor_divide(f, 2)
    off = f - parent_coord * 2  # in {0,1}^3
    off_id = (off[:, 0] * 2 + off[:, 1]) * 2 + off[:, 2]
    pc = parent_coord + _KEY_BIAS
    q = (pc[:, 0] * _KEY_BOUND + pc[:, 1]) * _KEY_BOUND + pc[:, 2]
    parent = _lookup(sk, so, q, mc)

    up = np.full((len(fine_coords), 8), mc, dtype=np.int32)
    up[np.arange(len(fine_coords)), off_id] = parent
    return up


@dataclass
class LevelMaps:
    """Static-shape kernel maps for one U-Net level (one scene)."""

    num_voxels: int
    coords: np.ndarray          # (cap, 3) int32, zero-padded
    nbr: np.ndarray             # (cap, 27) int32, INVALID = cap
    down: Optional[np.ndarray] = None  # (cap_next, 8) into this level, INVALID = cap
    up: Optional[np.ndarray] = None    # (cap, 8) into next level, INVALID = cap_next


def _pad_rows(a: np.ndarray, cap: int, fill) -> np.ndarray:
    out = np.full((cap,) + a.shape[1:], fill, dtype=a.dtype)
    n = min(len(a), cap)
    out[:n] = a[:n]
    return out


def build_unet_maps(coords: np.ndarray, caps: List[int], kernel_size: int = 3):
    """Build padded kernel maps for every U-Net level of one scene.

    Args:
        coords: (M0, 3) int voxel coords at the finest level.
        caps: static per-level voxel capacities, len = num levels.

    Returns list[LevelMaps], finest first.  Table entries that point past a
    level's real voxel count are remapped to that level's cap (the padded
    zero row), so truncation keeps every index in range.
    """
    levels: List[LevelMaps] = []
    cur = coords
    for li, cap in enumerate(caps):
        m = min(len(cur), cap)
        cur = cur[:m]
        nbr = submanifold_table(cur, kernel_size)
        nbr = np.where(nbr >= m, cap, nbr)
        lv = LevelMaps(
            num_voxels=m,
            coords=_pad_rows(cur.astype(np.int32), cap, 0),
            nbr=_pad_rows(nbr, cap, cap),
        )
        levels.append(lv)
        if li + 1 < len(caps):
            coarse, down = downsample_level(cur)
            next_cap = caps[li + 1]
            mc = min(len(coarse), next_cap)
            coarse = coarse[:mc]
            down = down[:mc]
            down = np.where(down >= m, cap, down)
            lv.down = _pad_rows(down, next_cap, cap)
            up = upsample_table(cur, coarse)
            up = np.where(up >= mc, next_cap, up)
            lv.up = _pad_rows(up, cap, next_cap)
            cur = coarse
    return levels


# ---------------------------------------------------------------------------
# Block-dense sparse conv tables (round-2 backbone redesign)
# ---------------------------------------------------------------------------

BLOCK = 8           # spatial block edge; 512 cells per block
BLOCK_CELLS = BLOCK ** 3


@dataclass
class BlockMaps:
    """Static-shape block-dense tables for one U-Net level (one scene).

    The gather-matmul conv's ~27 random HBM row-gathers per voxel are
    latency-bound on TPU (docs/perf_notes.md).  Block-dense layout instead
    scatters voxels into dense 8^3 spatial blocks once per level and runs
    plain XLA conv3d over haloed (10^3 / 16^3) block tiles — all random
    access happens at whole-block granularity (bandwidth-bound) and the
    conv itself rides the MXU.  Host cost also drops ~an order of
    magnitude: neighbor lookups are per *block*, not per voxel.
    """

    num_blocks: int
    vox2cell: np.ndarray            # (cap,) int32 block*512+local; INVALID = nbcap*512
    block_nbr: np.ndarray           # (nbcap, 27) int32; INVALID = nbcap
    block_child: Optional[np.ndarray] = None   # (nbcap_next, 8) fine block ids; INVALID = nbcap
    block_parent: Optional[np.ndarray] = None  # (nbcap,) coarse block id; INVALID = nbcap_next
    block_quad: Optional[np.ndarray] = None    # (nbcap,) in [0, 8)
    overflow_voxels: int = 0        # voxels dropped because their block fell past nbcap


def _block_list(coords: np.ndarray, nbcap: int):
    """Unique block coords (truncated to nbcap) + per-voxel block index.

    Returns (block_coords (nb, 3) int64, vox_block (M,) int32 with INVALID
    = nbcap for voxels whose block fell past the cap, nb).
    """
    bc = np.floor_divide(coords.astype(np.int64), BLOCK)
    keys = pack_keys(bc)
    uniq, inv = np.unique(keys, return_inverse=True)
    nb = min(len(uniq), nbcap)
    # unique() sorts keys; truncation keeps the lexicographically first nb
    vox_block = np.where(inv < nb, inv, nbcap).astype(np.int32)
    # recover block coords from the first occurrence of each key
    order = np.argsort(keys, kind="stable")
    first = order[np.searchsorted(keys[order], uniq[:nb], side="left")]
    return bc[first], vox_block, nb


def build_block_maps(coords: np.ndarray, caps: List[int], nb_caps: List[int]):
    """Block-dense tables for every U-Net level of one scene.

    Args:
        coords: (M0, 3) int voxel coords at the finest level.
        caps: per-level voxel capacities (same contract as build_unet_maps).
        nb_caps: per-level block capacities.

    Returns (levels: List[LevelMaps] with nbr left empty, blocks:
    List[BlockMaps]).  Level voxel lists/truncation match build_unet_maps
    exactly (same downsample_level), so p2v and loss supervision are
    unchanged.
    """
    levels: List[LevelMaps] = []
    blocks: List[BlockMaps] = []
    cur = coords
    prev_bcoords = None
    for li, (cap, nbcap) in enumerate(zip(caps, nb_caps)):
        m = min(len(cur), cap)
        cur = cur[:m]
        bcoords, vox_block, nb = _block_list(cur, nbcap)
        local = np.mod(cur.astype(np.int64), BLOCK)
        cell = (local[:, 0] * BLOCK + local[:, 1]) * BLOCK + local[:, 2]
        vox2cell = np.where(
            vox_block < nbcap,
            vox_block.astype(np.int64) * BLOCK_CELLS + cell,
            nbcap * BLOCK_CELLS,
        ).astype(np.int32)

        bkeys = pack_keys(bcoords)
        border = np.argsort(bkeys, kind="stable")
        sk, so = bkeys[border], border
        offs = _offsets(3)
        bb = bcoords + _KEY_BIAS
        block_nbr = np.empty((nb, 27), dtype=np.int32)
        for k, o in enumerate(offs):
            q = ((bb[:, 0] + o[0]) * _KEY_BOUND + (bb[:, 1] + o[1])) * _KEY_BOUND + (bb[:, 2] + o[2])
            block_nbr[:, k] = _lookup(sk, so, q, nbcap)

        bm = BlockMaps(
            num_blocks=nb,
            vox2cell=_pad_rows(vox2cell, cap, nbcap * BLOCK_CELLS),
            block_nbr=_pad_rows(block_nbr, nbcap, nbcap),
            overflow_voxels=int((vox_block >= nbcap).sum()),
        )
        lv = LevelMaps(
            num_voxels=m,
            coords=_pad_rows(cur.astype(np.int32), cap, 0),
            nbr=np.zeros((0, 0), np.int32),  # unused in block mode
        )

        if prev_bcoords is not None:
            # this level's blocks are the coarse side of the (li-1, li) pair:
            # child fine blocks at 2*bc + {0,1}^3; fine block parent = bc>>1
            fk = pack_keys(prev_bcoords)
            forder = np.argsort(fk, kind="stable")
            fsk, fso = fk[forder], forder
            offs2 = _offsets(2)
            base = bcoords * 2 + _KEY_BIAS
            prev_nbcap = nb_caps[li - 1]
            child = np.empty((nb, 8), dtype=np.int32)
            for k, o in enumerate(offs2):
                q = ((base[:, 0] + o[0]) * _KEY_BOUND + (base[:, 1] + o[1])) * _KEY_BOUND + (base[:, 2] + o[2])
                child[:, k] = _lookup(fsk, fso, q, prev_nbcap)
            blocks[-1].block_child = _pad_rows(child, nbcap, prev_nbcap)

            pc = np.floor_divide(prev_bcoords, 2) + _KEY_BIAS
            q = (pc[:, 0] * _KEY_BOUND + pc[:, 1]) * _KEY_BOUND + pc[:, 2]
            parent = _lookup(sk, so, q, nbcap)
            quad = (
                np.mod(prev_bcoords[:, 0], 2) * 4
                + np.mod(prev_bcoords[:, 1], 2) * 2
                + np.mod(prev_bcoords[:, 2], 2)
            ).astype(np.int32)
            blocks[-1].block_parent = _pad_rows(parent, prev_nbcap, nbcap)
            blocks[-1].block_quad = _pad_rows(quad, prev_nbcap, 0)

        levels.append(lv)
        blocks.append(bm)
        prev_bcoords = bcoords

        if li + 1 < len(caps):
            coarse, _ = downsample_level(cur)
            cur = coarse
    return levels, blocks


# ---------------------------------------------------------------------------
# Z-column folded conv tables (round-4 gather-row redesign)
# ---------------------------------------------------------------------------

COLZ = 8  # z-cells per column (== block edge; band matrices are shared)


@dataclass
class ColumnMaps:
    """Static-shape z-column tables for one U-Net level (one scene).

    The gather conv is bound by random-gather ROW COUNT (~15ns/row on v5e
    regardless of row bytes — docs/perf_notes.md round 4); folding only z
    into lanes cuts rows ~5x at ~1.3-2 voxels per 8-cell column on ScanNet
    surfaces, without the 8^3 block path's 17-26x block-dense inflation.
    Consumed by :mod:`d3net_tpu.ops.column_conv`.
    """

    num_cols: int
    vox2col: np.ndarray             # (cap,) int32 col*8+z_local; INVALID = ccap*8
    col_nbr: np.ndarray             # (ccap, 9) xy-offset neighbors; INVALID = ccap
    col_zm: np.ndarray              # (ccap,) column at z-block -1; INVALID = ccap
    col_zp: np.ndarray              # (ccap,) column at z-block +1; INVALID = ccap
    col_child: Optional[np.ndarray] = None   # (ccap_c, 8) fine columns; INVALID = ccap_f
    col_parent: Optional[np.ndarray] = None  # (ccap_f,) coarse column; INVALID = ccap_c
    col_quad: Optional[np.ndarray] = None    # (ccap_f,) 4*(fx&1)+2*(fy&1)+(fzb&1)
    col_occ: Optional[np.ndarray] = None     # (ccap, 8) uint8 occupied z-cells
    col2vox: Optional[np.ndarray] = None     # (ccap*8,) cell -> voxel row;
    # unoccupied cells hold the nearest previous valid voxel (keeps the
    # gather monotone-banded); mask with col_occ (colres conv only)
    overflow_voxels: int = 0
    dropped_phantoms: int = 0   # phantom columns past the cap (recall loss)


def _column_list(coords: np.ndarray, ccap: int):
    """Unique column coords (x, y, z>>3) + required phantoms, cap ccap.

    A submanifold contribution that crosses a column's z boundary under a
    diagonal xy offset flows through the AUGMENTED row of the mid column
    (x+ox, y+oy, zb) — see column_conv._augment.  If that mid column holds
    no voxels it would not exist and the contribution would silently drop
    (the same transitive-halo trap block_conv documents).  Fix: append
    PHANTOM columns (all-zero features, real zm/zp/nbr links) at every
    position that is (a) z-adjacent to an occupied column and (b) an
    xy-neighbor of an occupied column at its own z-block.

    Returns (col_coords (nc, 3) int64 — occupied first, then phantoms,
    vox_col (M,) int32 with INVALID = ccap for voxels whose column fell
    past the cap, nc).
    """
    cc = coords.astype(np.int64).copy()
    cc[:, 2] //= COLZ
    keys = pack_keys(cc)
    uniq, inv = np.unique(keys, return_inverse=True)
    n_occ = min(len(uniq), ccap)
    vox_col = np.where(inv < n_occ, inv, ccap).astype(np.int32)
    order = np.argsort(keys, kind="stable")
    first = order[np.searchsorted(keys[order], uniq[:n_occ], side="left")]
    occ_c = cc[first]

    # phantom set: (z-dilation of occupied) & (xy-dilation of occupied) - occ
    occ_set = uniq[:n_occ]
    zdil = np.concatenate([
        pack_keys(occ_c + np.asarray([0, 0, 1])),
        pack_keys(occ_c + np.asarray([0, 0, -1])),
    ])
    xyd = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            if (ox, oy) != (0, 0):
                xyd.append(pack_keys(occ_c + np.asarray([ox, oy, 0])))
    xydil = np.unique(np.concatenate(xyd))
    phant = np.intersect1d(np.unique(zdil), xydil, assume_unique=True)
    phant = np.setdiff1d(phant, occ_set, assume_unique=True)
    n_ph = min(len(phant), ccap - n_occ)
    if n_ph > 0:
        pk = phant[:n_ph]
        z = np.mod(pk, _KEY_BOUND) - _KEY_BIAS
        rest = pk // _KEY_BOUND
        y = np.mod(rest, _KEY_BOUND) - _KEY_BIAS
        x = rest // _KEY_BOUND - _KEY_BIAS
        occ_c = np.concatenate([occ_c, np.stack([x, y, z], axis=1)])
    dropped_ph = len(phant) - max(n_ph, 0)
    return occ_c, vox_col, n_occ + max(n_ph, 0), dropped_ph


def build_column_maps(coords: np.ndarray, caps: List[int],
                      col_caps: List[int]):
    """Z-column tables for every U-Net level of one scene.

    Level voxel lists/truncation match build_unet_maps exactly (same
    downsample_level), so p2v and loss supervision are unchanged.
    Returns (levels: List[LevelMaps] with nbr empty, cols: List[ColumnMaps]).
    """
    levels: List[LevelMaps] = []
    cols: List[ColumnMaps] = []
    cur = coords
    prev_ccoords = None
    use_native = native.available()
    for li, (cap, ccap) in enumerate(zip(caps, col_caps)):
        m = min(len(cur), cap)
        cur = cur[:m]
        if use_native:
            # one C++ pass per level (byte-identical to the numpy path
            # below; ~6x less host time — tests/test_native.py)
            (vox2col, col_nbr, col_zm, col_zp, occ, col2vox, ccoords,
             st) = native.column_level(cur, cap, ccap)
            cm = ColumnMaps(
                num_cols=st["n_occ"] + st["phantoms"],
                vox2col=vox2col,
                col_nbr=col_nbr,
                col_zm=col_zm,
                col_zp=col_zp,
                col_occ=occ,
                col2vox=col2vox,
                overflow_voxels=st["overflow_voxels"],
                dropped_phantoms=st["dropped_phantoms"],
            )
            lv = LevelMaps(
                num_voxels=m,
                coords=_pad_rows(cur.astype(np.int32), cap, 0),
                nbr=np.zeros((0, 0), np.int32),
            )
            if prev_ccoords is not None:
                prev_ccap = col_caps[li - 1]
                child, parent, quad = native.column_pair(
                    prev_ccoords, prev_ccap, ccoords, ccap)
                cols[-1].col_child = _pad_rows(child, ccap, prev_ccap)
                cols[-1].col_parent = parent
                cols[-1].col_quad = quad
            levels.append(lv)
            cols.append(cm)
            prev_ccoords = ccoords
            if li + 1 < len(caps):
                coarse, _ = downsample_level(cur)
                cur = coarse
            continue
        ccoords, vox_col, nc, dropped_ph = _column_list(cur, ccap)
        zloc = np.mod(cur[:, 2].astype(np.int64), COLZ)
        vox2col = np.where(
            vox_col < ccap,
            vox_col.astype(np.int64) * COLZ + zloc,
            ccap * COLZ,
        ).astype(np.int32)

        ckeys = pack_keys(ccoords)
        corder = np.argsort(ckeys, kind="stable")
        sk, so = ckeys[corder], corder
        cb = ccoords + _KEY_BIAS
        col_nbr = np.empty((nc, 9), dtype=np.int32)
        k = 0
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                q = ((cb[:, 0] + ox) * _KEY_BOUND
                     + (cb[:, 1] + oy)) * _KEY_BOUND + cb[:, 2]
                col_nbr[:, k] = _lookup(sk, so, q, ccap)
                k += 1
        qzm = (cb[:, 0] * _KEY_BOUND + cb[:, 1]) * _KEY_BOUND + (cb[:, 2] - 1)
        qzp = (cb[:, 0] * _KEY_BOUND + cb[:, 1]) * _KEY_BOUND + (cb[:, 2] + 1)
        col_zm = _lookup(sk, so, qzm, ccap)
        col_zp = _lookup(sk, so, qzp, ccap)

        # per-cell occupancy (column-resident conv masks unoccupied cells
        # after every conv to preserve submanifold semantics)
        occ = np.zeros((ccap, COLZ), np.uint8)
        v2c_valid = vox2col[:m]
        inb = v2c_valid < ccap * COLZ
        occ[v2c_valid[inb] // COLZ, v2c_valid[inb] % COLZ] = 1
        # cell -> voxel inverse map; unoccupied cells forward-fill with the
        # nearest previous valid voxel (both sides are lex-sorted, so the
        # map is monotone and the device gather stays banded)
        ncell = ccap * COLZ
        c2v = np.zeros(ncell, np.int32)
        cells_v = v2c_valid[inb]
        c2v[cells_v] = np.nonzero(inb)[0].astype(np.int32)
        pos = np.full(ncell, -1, np.int64)
        pos[cells_v] = cells_v
        np.maximum.accumulate(pos, out=pos)
        pos = np.where(pos < 0, cells_v[0] if len(cells_v) else 0, pos)
        col2vox = c2v[pos]
        cm = ColumnMaps(
            num_cols=nc,
            vox2col=_pad_rows(vox2col, cap, ccap * COLZ),
            col_nbr=_pad_rows(col_nbr, ccap, ccap),
            col_zm=_pad_rows(col_zm, ccap, ccap),
            col_zp=_pad_rows(col_zp, ccap, ccap),
            col_occ=occ,
            col2vox=col2vox,
            overflow_voxels=int((vox_col >= ccap).sum()),
            dropped_phantoms=dropped_ph,
        )
        lv = LevelMaps(
            num_voxels=m,
            coords=_pad_rows(cur.astype(np.int32), cap, 0),
            nbr=np.zeros((0, 0), np.int32),  # unused in column mode
        )

        if prev_ccoords is not None:
            # this level is the coarse side of the (li-1, li) pair: child
            # fine columns at (2x+ox, 2y+oy, 2zb+oz); fine parent = c>>1
            fk = pack_keys(prev_ccoords)
            forder = np.argsort(fk, kind="stable")
            fsk, fso = fk[forder], forder
            prev_ccap = col_caps[li - 1]
            base = ccoords * 2 + _KEY_BIAS
            child = np.empty((nc, 8), dtype=np.int32)
            for k2, o in enumerate(_offsets(2)):
                q = ((base[:, 0] + o[0]) * _KEY_BOUND
                     + (base[:, 1] + o[1])) * _KEY_BOUND + (base[:, 2] + o[2])
                child[:, k2] = _lookup(fsk, fso, q, prev_ccap)
            # pair tables live on the FINE level's map (same convention as
            # build_block_maps): models/blocks.py passes (t_fine, t_coarse)
            cols[-1].col_child = _pad_rows(child, ccap, prev_ccap)

            pc = np.floor_divide(prev_ccoords, 2) + _KEY_BIAS
            q = (pc[:, 0] * _KEY_BOUND + pc[:, 1]) * _KEY_BOUND + pc[:, 2]
            parent = _lookup(sk, so, q, ccap)
            quad = (
                np.mod(prev_ccoords[:, 0], 2) * 4
                + np.mod(prev_ccoords[:, 1], 2) * 2
                + np.mod(prev_ccoords[:, 2], 2)
            ).astype(np.int32)
            cols[-1].col_parent = _pad_rows(parent, prev_ccap, ccap)
            cols[-1].col_quad = _pad_rows(quad, prev_ccap, 0)

        levels.append(lv)
        cols.append(cm)
        prev_ccoords = ccoords

        if li + 1 < len(caps):
            coarse, _ = downsample_level(cur)
            cur = coarse
    return levels, cols
