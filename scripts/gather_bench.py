"""Isolate WHY the column conv's gathers run ~15 ns/row when raw XLA
gathers on this chip do 1.2-4.2 ns/row (scripts/pallas_probe.py --what
gather).  Each experiment is one small program; results drive the round-5
conv redesign (VERDICT r4 items 1-2).

Suspects, each isolated:
  vmap     — batched gather (vmap over B=4) vs one flat gather with
             host-pre-offset indices
  lanes160 — gather rows of 160 lanes (the 10C aug array) vs 128
  lanes16  — gather rows of 16 lanes (gather-conv at C=16)
  scatter  — rows_to_cols .at[].set scatter at 16 lanes vs 128
  conv     — the real _subm_cols forward at flagship L0 shapes (ground
             truth ms/conv), then the same with batch flattened

Run: python scripts/gather_bench.py --what all
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 4
CCAP = 65536
CAP = 131072


def _timed(fn, reps=4, inner=6):
    import jax.numpy as jnp

    float(fn(jnp.float32(0.5), 1))
    float(fn(jnp.float32(0.6), inner))
    t1s, t2s = [], []
    for i in range(reps):
        t0 = time.time()
        float(fn(jnp.float32(1.0 + i), 1))
        t1s.append(time.time() - t0)
        t0 = time.time()
        float(fn(jnp.float32(101.0 + i), inner))
        t2s.append(time.time() - t0)
    return (statistics.median(t2s) - statistics.median(t1s)) / (inner - 1)


def _banded_idx(rng, n, spread, hi):
    idx = np.arange(n) % hi + np.cumsum(rng.integers(-3, 4, size=n)) % spread
    return np.clip(idx, 0, hi - 1).astype(np.int32)


def bench_gather(name, src_shape, idx_fn, vmapped=False):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal(src_shape), jnp.bfloat16)
    idx = jnp.asarray(idx_fn(rng))
    nrows = int(np.prod(idx.shape))

    if vmapped:
        take = jax.vmap(lambda s, i: jnp.take(s, i, axis=0))
    else:
        take = lambda s, i: jnp.take(s, i, axis=0)  # noqa: E731

    @jax.jit
    def f(s, salt, k):
        def body(i, acc):
            s2 = s.at[(0,) * s.ndim].add(acc * 1e-12)
            g = take(s2, idx)
            return acc + g[(0,) * g.ndim].astype(jnp.float32) * 1e-6

        return jax.lax.fori_loop(0, k, body, salt)

    per = _timed(lambda salt, k: f(src, salt, k))
    print(f"{name}: {per*1e3:.3f} ms, {per/nrows*1e9:.2f} ns/row "
          f"({nrows} rows from {src_shape})", flush=True)


def exp_vmap():
    rng0 = np.random.default_rng(1)
    n = CCAP
    bench_gather(
        "vmapped B=4 (ccap+1,128)",
        (B, CCAP + 1, 128),
        lambda rng: np.stack([_banded_idx(rng, n, 512, CCAP) for _ in range(B)]),
        vmapped=True,
    )
    bench_gather(
        "flat B*ccap (B*(ccap+1),128)",
        (B * (CCAP + 1), 128),
        lambda rng: np.concatenate([
            _banded_idx(rng, n, 512, CCAP) + s * (CCAP + 1) for s in range(B)
        ]),
    )


def exp_lanes():
    n = B * CCAP
    for c in (16, 128, 160, 256):
        bench_gather(
            f"flat lanes={c}",
            (B * (CCAP + 1), c),
            lambda rng: _banded_idx(rng, n, 512, B * CCAP),
        )


def exp_scatter():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    for c, name in ((16, "scatter lanes=16 (rows_to_cols L0)"),
                    (128, "scatter lanes=128")):
        feats = jnp.asarray(rng.standard_normal((B * CAP, c)), jnp.bfloat16)
        # vox2col-like: scattered but locally clustered destinations
        dst_np = np.sort(rng.choice((CCAP + 1) * 8 * B, size=B * CAP,
                                    replace=False)).astype(np.int32)
        rng.shuffle(dst_np.reshape(-1, 64))  # local shuffle, global order
        dst = jnp.asarray(dst_np)

        @jax.jit
        def f(x, salt, k):
            def body(i, acc):
                x2 = x.at[0, 0].add(acc * 1e-12)
                d = jnp.zeros(((CCAP + 1) * 8 * B, x.shape[1]), x.dtype)
                d = d.at[dst].set(x2)
                return acc + d[0, 0].astype(jnp.float32) * 1e-6

            return jax.lax.fori_loop(0, k, body, salt)

        per = _timed(lambda salt, k: f(feats, salt, k))
        print(f"{name}: {per*1e3:.3f} ms, {per/(B*CAP)*1e9:.2f} ns/row",
              flush=True)


def _l0_tables(seed=0):
    """Realistic flagship L0 column tables from a synthetic scene."""
    from d3net_tpu.data.collate import BatchSpec, build_batch
    from d3net_tpu.data.synthetic import make_scene

    scenes = [
        make_scene(seed=i, num_instances=16, density=2500.0,
                   floor_points=30000, room=8.0, with_multiview=True)
        for i in range(B)
    ]
    spec = BatchSpec(
        max_points=CAP,
        voxel_caps=[CAP, CAP // 2, CAP // 4, CAP // 8, CAP // 16, CAP // 32,
                    CAP // 64],
        max_instances=32, use_multiview=True, use_normal=True,
        conv_impl="column",
    )
    batch = build_batch(scenes, spec)
    return batch["tables"][0]


def exp_conv():
    import jax
    import jax.numpy as jnp

    from d3net_tpu.models import blocks as blk
    from d3net_tpu.ops import column_conv as cc

    t0 = _l0_tables()
    t = {k: jnp.asarray(v) for k, v in t0.items()}
    rng = np.random.default_rng(3)
    cin = cout = 16
    x = jnp.asarray(rng.standard_normal((B, CAP, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)) * 0.05, jnp.bfloat16)

    @jax.jit
    def f(xx, salt, k):
        def body(i, acc):
            x2 = xx.at[0, 0, 0].add(acc * 1e-12)
            o = blk.subm_cols(x2, t, w)
            return acc + o[0, 0, 0].astype(jnp.float32) * 1e-6

        return jax.lax.fori_loop(0, k, body, salt)

    per = _timed(lambda salt, k: f(x, salt, k))
    print(f"subm_cols L0 (current, vmapped, rows->rows): {per*1e3:.2f} ms/conv",
          flush=True)

    # column-space-resident variant: time ONLY the col->col conv (no
    # rows_to_cols/cols_to_rows), still vmapped
    ccap = t["col_nbr"].shape[1]
    xc = jax.vmap(cc.rows_to_cols, in_axes=(0, 0, 0, None))(
        x, t["vox2col"], t["mask"].astype(bool), ccap)

    sub_b = jax.vmap(cc._subm_cols, in_axes=(0, 0, 0, 0, None))

    @jax.jit
    def g(xx, salt, k):
        def body(i, acc):
            x2 = xx.at[0, 0, 0].add(acc * 1e-12)
            o = sub_b(x2, t["col_nbr"], t["col_zm"], t["col_zp"], w)
            return acc + o[0, 0, 0].astype(jnp.float32) * 1e-6

        return jax.lax.fori_loop(0, k, body, salt)

    per = _timed(lambda salt, k: g(xc, salt, k))
    print(f"subm col->col (no conversions, vmapped): {per*1e3:.2f} ms/conv",
          flush=True)

    # flattened-batch variant: one gather domain, host-pre-offset tables
    nc1 = ccap + 1
    nbr_f = np.asarray(t0["col_nbr"], np.int64)   # (B, ccap, 9), INVALID=ccap
    off = (np.arange(B) * nc1)[:, None, None]
    nbr_flat = jnp.asarray((nbr_f + off).reshape(B * ccap, 9).astype(np.int32))
    zm_f = (np.asarray(t0["col_zm"], np.int64) + off[..., 0]).reshape(-1)
    zp_f = (np.asarray(t0["col_zp"], np.int64) + off[..., 0]).reshape(-1)
    zm_flat = jnp.asarray(zm_f.astype(np.int32))
    zp_flat = jnp.asarray(zp_f.astype(np.int32))
    xcf = xc.reshape(B * nc1, -1)

    from d3net_tpu.ops.block_conv import _band_w2_subm

    def subm_flat(cols, salt):
        # flat equivalent of cc._subm_cols: pad rows stay per-scene (index
        # arithmetic pre-offset on host); lo/hi strips gathered flat
        c8 = cols.shape[-1]
        cin_ = c8 // 8
        lo = cols[zm_flat][:, (8 - 1) * cin_:]
        hi = cols[zp_flat][:, :cin_]
        aug = jnp.concatenate([lo, cols.reshape(B, nc1, c8)[:, :ccap]
                               .reshape(B * ccap, c8), hi], axis=-1)
        # re-pad aug to (B*nc1) domain for the xy gathers
        augp = jnp.concatenate(
            [aug.reshape(B, ccap, -1),
             jnp.zeros((B, 1, aug.shape[-1]), aug.dtype)], axis=1
        ).reshape(B * nc1, -1)
        out = jnp.matmul(aug, _band_w2_subm(w, 0, 0).astype(aug.dtype),
                         preferred_element_type=jnp.float32)
        k = 0
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                if (ox, oy) != (0, 0):
                    g = augp[nbr_flat[:, k]]
                    out = out + jnp.matmul(
                        g, _band_w2_subm(w, ox, oy).astype(g.dtype),
                        preferred_element_type=jnp.float32)
                k += 1
        return out.astype(cols.dtype)

    @jax.jit
    def h(xx, salt, k):
        def body(i, acc):
            x2 = xx.at[0, 0].add(acc * 1e-12)
            o = subm_flat(x2, acc)
            return acc + o[0, 0].astype(jnp.float32) * 1e-6

        return jax.lax.fori_loop(0, k, body, salt)

    per = _timed(lambda salt, k: h(xcf, salt, k))
    print(f"subm col->col FLAT batch (pre-offset tables): {per*1e3:.2f} "
          f"ms/conv", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="all")
    args = ap.parse_args()
    from d3net_tpu import runtime

    runtime.setup()
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    todo = ("vmap", "lanes", "scatter", "conv", "slab") \
        if args.what == "all" else args.what.split(",")
    for wname in todo:
        t0 = time.time()
        try:
            {"vmap": exp_vmap, "lanes": exp_lanes, "scatter": exp_scatter,
             "conv": exp_conv, "slab": exp_slab}[wname]()
        except Exception as e:  # noqa: BLE001
            print(f"{wname}: FAILED {type(e).__name__}: "
                  + str(e).splitlines()[0][:300], flush=True)
        print(f"[{wname} took {time.time()-t0:.1f}s]", flush=True)


def exp_slab():
    """Design checks for the round-5 conv: (a) 128-lane slab gathers from a
    wide array via lane slices, (b) gather-based rows_to_cols (col2vox
    inverse map) vs the 16-lane scatter."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    n = B * CCAP
    src = jnp.asarray(rng.standard_normal((n + 4, 256)), jnp.bfloat16)
    idx = jnp.asarray(_banded_idx(rng, n, 512, n))

    @jax.jit
    def f(s, salt, k):
        def body(i, acc):
            s2 = s.at[0, 0].add(acc * 1e-12)
            g = jnp.concatenate(
                [s2[:, 0:128][idx], s2[:, 128:256][idx]], axis=-1)
            return acc + g[0, 0].astype(jnp.float32) * 1e-6

        return jax.lax.fori_loop(0, k, body, salt)

    per = _timed(lambda salt, k: f(src, salt, k))
    print(f"slab-sliced 2x128 from (n,256): {per*1e3:.3f} ms, "
          f"{per/n*1e9:.2f} ns/row", flush=True)

    # gather-based rows_to_cols: cols[cell] = feats[col2vox[cell]]
    for c in (16, 134):
        feats = jnp.asarray(rng.standard_normal((B * CAP + 1, c)),
                            jnp.bfloat16)
        ncell = (CCAP + 1) * 8 * B
        c2v = rng.integers(0, B * CAP, size=ncell).astype(np.int32)
        c2v[rng.random(ncell) < 0.75] = B * CAP  # ~22% occupancy
        c2v = jnp.asarray(np.sort(c2v))

        @jax.jit
        def g(x, salt, k):
            def body(i, acc):
                x2 = x.at[0, 0].add(acc * 1e-12)
                d = x2[c2v]
                return acc + d[0, 0].astype(jnp.float32) * 1e-6

            return jax.lax.fori_loop(0, k, body, salt)

        per = _timed(lambda salt, k: g(feats, salt, k))
        print(f"gather rows_to_cols c={c}: {per*1e3:.3f} ms "
              f"({ncell} cells, {per/ncell*1e9:.2f} ns/cell)", flush=True)


if __name__ == "__main__":
    main()
