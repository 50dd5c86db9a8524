"""Pallas TPU band-gather: windowed one-hot gather for column-sorted rows.

The sparse-conv tap tables produced by ``build_column_maps`` are *banded*:
columns are lex-sorted by (b, x, y, z-block), so every tap's source index
lies within a narrow window of its output index (docs/perf_notes.md,
round 5).  This kernel exploits that: per output chunk, a contiguous
window of source rows is block-pipelined into VMEM (scalar-prefetched
per-chunk window base), and the in-window gather is a one-hot matmul on
the MXU — no random HBM access at all.

Replaces the role of the reference's custom CUDA gather in its sparse-conv
engine (MinkowskiEngine's kernel-map gathers; see
reference ``lib/pointgroup_ops`` usage from ``model/common.py:73-118``)
with a TPU-native memory plan.

Measured on one v5e (scripts/pallas_probe.py, 256k x 128 bf16 rows):
XLA flat banded gather 1.71 ns/row vs this kernel ~parity — the one-hot
matmul trades the gather's HBM latency for MXU compute (window/8
inflation).  It is therefore an *opt-in* path (`use_pallas=True` call
sites / D3NET_PALLAS_GATHER=1), kept production-tested for backends or
shapes where XLA's gather lowering regresses; the default conv path uses
the flat XLA gather layout that round 5 showed runs at bandwidth.

Where the plan holds on real column maps (measured, synthetic ScanNet-like
scenes): the colres rows->cols ``col2vox`` gather is monotone-banded by
construction and plans at nwin=3 (384-row windows) on every level EXCEPT
L0, where the phantom-column tail (occupied-first layout,
``voxelize._column_list``) injects one far jump per boundary chunk; the
xy-neighbor tap tables need phantom interleaving before they band.  A
production default would therefore lex-interleave phantoms first — left
with the disposition above until a profile shows XLA's gather regressing.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import numpy as np


class BandPlan(NamedTuple):
    """Host-precomputed memory plan for :func:`band_gather`.

    bases: (nchunk,) int32 — per-chunk window base, in ``wblk``-row units.
    rel:   (1, n) int32 — idx relative to its chunk's window base row.
    chunk / wblk / nwin / n_src: static geometry (python ints).
    """

    bases: np.ndarray
    rel: np.ndarray
    chunk: int
    wblk: int
    nwin: int
    n_src: int


def plan_band_windows(
    idx: np.ndarray,
    n_src: int,
    *,
    chunk: int = 512,
    wblk: int = 128,
    nwin: int = 6,
) -> Optional[BandPlan]:
    """Build the per-chunk window plan, or None if the band is violated.

    The plan exists iff, for every length-``chunk`` slice of ``idx``, all
    indices fit in one ``nwin * wblk``-row window starting at a ``wblk``
    multiple.  Collate calls this once per level when the pallas path is
    enabled; a None return falls back to the XLA gather.
    """
    idx = np.asarray(idx, np.int32)
    n = idx.shape[0]
    if n % chunk or n_src % wblk or n_src < nwin * wblk:
        return None
    nchunk = n // chunk
    wtot = nwin * wblk
    per = idx.reshape(nchunk, chunk)
    lo = per.min(axis=1)
    hi = per.max(axis=1)
    base = np.clip(lo // wblk, 0, (n_src - wtot) // wblk)
    if (hi - base * wblk >= wtot).any() or (lo - base * wblk < 0).any():
        return None
    rel = (per - (base * wblk)[:, None]).reshape(1, n).astype(np.int32)
    return BandPlan(base.astype(np.int32), rel, chunk, wblk, nwin, n_src)


@functools.lru_cache(maxsize=None)
def _jitted_call():
    import jax

    return jax.jit(
        _band_gather_impl,
        static_argnames=("chunk", "wblk", "nwin", "interpret"),
    )


def _band_gather_impl(src, bases, rel, *, chunk, wblk, nwin, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = rel.shape[1]
    c = src.shape[1]
    nchunk = n // chunk
    wtot = nwin * wblk

    def kernel(base_ref, rel_ref, *refs):
        window = jnp.concatenate([w[:] for w in refs[:nwin]], axis=0)
        o_ref = refs[nwin]
        # transposed one-hot keeps rel along lanes (no 1-vector relayout)
        iota = jax.lax.broadcasted_iota(jnp.int32, (wtot, chunk), 0)
        onehot_t = (rel_ref[0, :][None, :] == iota).astype(window.dtype)
        o_ref[:] = jax.lax.dot_general(
            onehot_t, window, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    def win_spec(k):
        return pl.BlockSpec(
            (wblk, c), lambda j, base_ref, k=k: (base_ref[j] + k, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda j, base_ref: (0, j),
                         memory_space=pltpu.VMEM),
        ] + [win_spec(k) for k in range(nwin)],
        out_specs=pl.BlockSpec((chunk, c), lambda j, base_ref: (j, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c), src.dtype),
        interpret=interpret,
    )(bases, rel, *([src] * nwin))


def band_gather(src, plan: BandPlan, *, interpret: bool = False):
    """``src[idx]`` via the windowed one-hot kernel.  (n, c) rows out.

    ``src`` is (n_src, c) with c a multiple of 128 (bf16/f32); ``plan``
    comes from :func:`plan_band_windows` on the SAME index array.
    """
    import jax.numpy as jnp

    if src.shape[0] != plan.n_src:
        raise ValueError(
            f"src rows {src.shape[0]} != plan.n_src {plan.n_src}")
    return _jitted_call()(
        src, jnp.asarray(plan.bases), jnp.asarray(plan.rel),
        chunk=plan.chunk, wblk=plan.wblk, nwin=plan.nwin,
        interpret=interpret,
    )


def enabled() -> bool:
    """Opt-in switch for the conv paths (parity with XLA today; see header)."""
    return os.environ.get("D3NET_PALLAS_GATHER", "0") == "1"
