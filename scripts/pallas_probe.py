"""Pallas feasibility + microbenchmark probe for the banded gather kernel.

Round-5 design question (VERDICT r4 items 1-2): the sparse-conv forward is
bound by XLA's random row gather at a measured ~15 ns/row regardless of row
bytes (docs/perf_notes.md).  The candidate replacement is a Pallas kernel
that exploits the *banded* structure of column-neighbor indices (columns are
lex-sorted by (b, x, y), so every conv tap's source index lies in a narrow
window around the output index): per output chunk, the window is DMA'd
sequentially into VMEM and the in-window gather becomes a one-hot matmul on
the MXU — no random HBM access at all.

Round-2 found Mosaic's ``tpu.dynamic_gather`` unusable here (HTTP 500 on all
but a single (8,128) tile); this kernel needs NO dynamic_gather: only block
pipelining, iota compares, and ``jnp.dot``.

Modes (run on CPU first with --interpret to pin correctness, then on TPU):
  python scripts/pallas_probe.py --what smoke|band|prefetch|gather|all
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, *args, reps=5, inner=8):
    """Median wall of fn under k-differencing (k=inner vs k=1).

    fn(salt, k) must return a scalar depending on all k iterations.
    """
    import statistics

    float(fn(0.5, 1))  # compile
    float(fn(0.6, inner))
    t1s, t2s = [], []
    for i in range(reps):
        t0 = time.time()
        float(fn(1.0 + i, 1))
        t1s.append(time.time() - t0)
        t0 = time.time()
        float(fn(101.0 + i, inner))
        t2s.append(time.time() - t0)
    t1, t2 = statistics.median(t1s), statistics.median(t2s)
    return (t2 - t1) / (inner - 1)


def make_banded_indices(n, w, seed=0):
    """Monotonic-ish indices with drift, like real column tables."""
    rng = np.random.default_rng(seed)
    drift = np.cumsum(rng.integers(-2, 3, size=n))
    idx = np.arange(n) + drift
    return np.clip(idx, 0, n - 1).astype(np.int32)


def probe_smoke(interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((256, 128), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    ok = bool((np.asarray(out) == 2.0).all())
    print(f"smoke: ok={ok}")
    return ok


def _band_gather_pallas(src, idx, ch, interpret):
    """Gather src[idx] where idx[i] in [chunk_start - ch, chunk_start + 2ch).

    Window per chunk j = src blocks [j-1, j, j+1] (clamped); one-hot matmul.
    Returns (n, c) gathered rows.  Also establishes the BlockSpec index_map
    convention on this backend (block indices vs element offsets).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = src.shape
    nchunk = n // ch
    # Mosaic block-shape rule: last two dims divisible by (8, 128) or equal
    # to the array dims — a flat (1, n) index row with (1, ch) blocks
    # satisfies it (sublane dim equals the array's).
    idx_flat = idx.reshape(1, n)

    def kernel(idx_ref, a_ref, b_ref, c_ref, o_ref):
        j = pl.program_id(0)
        window = jnp.concatenate([a_ref[:], b_ref[:], c_ref[:]], axis=0)
        # rel index into the window: idx - (j-1)*ch for interior chunks;
        # edge chunks alias their clamped neighbor block, fixed up below
        rel = idx_ref[0, :] - (j - 1) * ch
        rel = jnp.where(j == 0, idx_ref[0, :] + ch, rel)
        rel = jnp.where((j == nchunk - 1) & (j > 0),
                        idx_ref[0, :] - (nchunk - 2) * ch, rel)
        # transposed one-hot keeps rel along lanes (no 1-vector relayout):
        # onehot_t[w, i] = (w == rel[i]); out = onehot_t^T @ window
        iota = jax.lax.broadcasted_iota(jnp.int32, (3 * ch, ch), 0)
        onehot_t = (rel[None, :] == iota).astype(window.dtype)
        o_ref[:] = jax.lax.dot_general(
            onehot_t, window, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    grid = (nchunk,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n, c), src.dtype),
        in_specs=[
            pl.BlockSpec((1, ch), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), lambda j: (jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), lambda j: (jnp.minimum(j + 1, nchunk - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ch, c), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_flat, src, src, src)
    return out


def probe_band(interpret, n=262144, c=128, ch=512, bench=True):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((n, c)), jnp.bfloat16)
    # keep indices strictly inside the 3-chunk band of their chunk
    base = np.arange(n)
    off = rng.integers(-ch // 2, ch // 2, size=n)
    idx_np = np.clip(base + off, 0, n - 1).astype(np.int32)
    # clamp into band (chunk j covers [ (j-1)ch, (j+2)ch ))
    j = base // ch
    idx_np = np.clip(idx_np, np.maximum((j - 1) * ch, 0),
                     np.minimum((j + 2) * ch, n) - 1).astype(np.int32)
    idx = jnp.asarray(idx_np)

    f = jax.jit(functools.partial(_band_gather_pallas, ch=ch,
                                  interpret=interpret))
    out = np.asarray(f(src, idx))
    ref = np.asarray(src)[idx_np]
    ok = np.allclose(out, ref, atol=0)
    print(f"band: exact={ok} mismatch_rows={int((out != ref).any(1).sum())}")
    if not ok or not bench:
        return ok

    @jax.jit
    def timed(s, salt, k):
        def body(i, acc):
            s2 = s.at[0, 0].add(acc * 1e-12)
            g = _band_gather_pallas(s2, idx, ch, interpret)
            return acc + g[0, 0].astype(jnp.float32) * 1e-6

        return jax.lax.fori_loop(0, k, body, salt)

    per = _timed(lambda salt, k: timed(src, jnp.float32(salt), k))
    print(f"band: {per*1e3:.3f} ms per gather of {n} rows x{c} "
          f"({per/n*1e9:.2f} ns/row)")
    return ok


def probe_gather(interpret, n=262144, c=128):
    """XLA take baseline: banded (sorted-ish) and random indices."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((n, c)), jnp.bfloat16)
    for name, idx_np in (
        ("banded", make_banded_indices(n, 512)),
        ("random", rng.integers(0, n, size=n).astype(np.int32)),
    ):
        idx = jnp.asarray(idx_np)

        @jax.jit
        def timed(s, salt, k):
            def body(i, acc):
                s2 = s.at[0, 0].add(acc * 1e-12)
                g = jnp.take(s2, idx, axis=0)
                return acc + g[0, 0].astype(jnp.float32) * 1e-6

            return jax.lax.fori_loop(0, k, body, salt)

        per = _timed(lambda salt, k: timed(src, jnp.float32(salt), k))
        print(f"xla take ({name}): {per*1e3:.3f} ms for {n} rows x{c} "
              f"({per/n*1e9:.2f} ns/row)")
    return True


def probe_prefetch(interpret, n=262144, c=128, ch=512, wblk=128, nwin=6):
    """Scalar-prefetch windows: dynamic per-chunk window base (block units).

    Window = nwin consecutive wblk-row blocks starting at a per-chunk base
    block; rel indices precomputed host-side.  This is the real kernel's
    memory plan (PrefetchScalarGridSpec index_map reads the base array).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunk = n // ch
    wtot = nwin * wblk

    rng = np.random.default_rng(1)
    src_np = rng.standard_normal((n, c)).astype(np.float32)
    base_rows = np.arange(n)
    # spread must fit the window: chunk span ch + 2*spread <= wtot - wblk
    # (base is rounded down to a wblk multiple)
    spread = (wtot - wblk - ch) // 2
    idx_np = np.clip(
        base_rows + rng.integers(-spread, spread + 1, size=n), 0, n - 1
    ).astype(np.int32)
    # per-chunk window base (in wblk units), rel = idx - base*wblk
    base_blk = np.empty(nchunk, np.int32)
    rel_np = np.empty(n, np.int32)
    for j in range(nchunk):
        sl = slice(j * ch, (j + 1) * ch)
        lo = int(idx_np[sl].min())
        b = min(max(lo // wblk, 0), (n - wtot) // wblk)
        base_blk[j] = b
        rel = idx_np[sl] - b * wblk
        assert (rel >= 0).all() and (rel < wtot).all(), "band violated"
        rel_np[sl] = rel

    src = jnp.asarray(src_np, jnp.bfloat16)
    rel = jnp.asarray(rel_np)
    bases = jnp.asarray(base_blk)

    def kernel(base_ref, rel_ref, *refs):
        wins = refs[:nwin]
        o_ref = refs[nwin]
        window = jnp.concatenate([w[:] for w in wins], axis=0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (wtot, ch), 0)
        onehot_t = (rel_ref[0, :][None, :] == iota).astype(window.dtype)
        o_ref[:] = jax.lax.dot_general(
            onehot_t, window, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    def win_spec(k):
        return pl.BlockSpec((wblk, c), lambda j, base_ref, k=k:
                            (base_ref[j] + k, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((1, ch), lambda j, base_ref: (0, j),
                         memory_space=pltpu.VMEM),
        ] + [win_spec(k) for k in range(nwin)],
        out_specs=pl.BlockSpec((ch, c), lambda j, base_ref: (j, 0),
                               memory_space=pltpu.VMEM),
    )

    rel2d = rel.reshape(1, n)

    @jax.jit
    def f(s, rel_in):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, c), s.dtype),
            interpret=interpret,
        )(bases, rel_in, *([s] * nwin))

    out = np.asarray(f(src, rel2d))
    ref = np.asarray(src)[idx_np]
    ok = bool((out == ref).all())
    print(f"prefetch: exact={ok} mismatch_rows={int((out != ref).any(1).sum())}")
    if not ok:
        return ok

    import jax

    @jax.jit
    def timed(s, salt, k):
        def body(i, acc):
            s2 = s.at[0, 0].add(acc * 1e-12)
            g = f(s2, rel2d)
            return acc + g[0, 0].astype(jnp.float32) * 1e-6

        return jax.lax.fori_loop(0, k, body, salt)

    per = _timed(lambda salt, k: timed(src, jnp.float32(salt), k))
    print(f"prefetch: {per*1e3:.3f} ms per gather of {n} rows x{c} "
          f"({per/n*1e9:.2f} ns/row)")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="all")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--ch", type=int, default=512)
    args = ap.parse_args()

    import jax

    if args.interpret:
        # the axon sitecustomize force-registers the TPU backend; pin CPU
        # so interpreted probes don't round-trip the tunnel
        jax.config.update("jax_platforms", "cpu")
    else:
        from d3net_tpu import runtime

        runtime.setup()

    print(f"backend={jax.default_backend()} interpret={args.interpret}",
          flush=True)
    todo = ("smoke", "band", "prefetch", "gather") if args.what == "all" \
        else args.what.split(",")
    for w in todo:
        t0 = time.time()
        try:
            fn = {"smoke": probe_smoke, "band": probe_band,
                  "prefetch": probe_prefetch, "gather": probe_gather}[w]
            fn(args.interpret, **({"n": args.n, "c": args.c, "ch": args.ch}
                                  if w in ("band", "prefetch") else
                                  {"n": args.n, "c": args.c}
                                  if w == "gather" else {}))
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{w}: FAILED {type(e).__name__}: "
                  + str(e).splitlines()[0][:300])
        print(f"[{w} took {time.time()-t0:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
