"""Benchmark: flagship detector inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); the driver
gate is >=5x the CUDA reference on one v5e chip.  We conservatively assume
the reference PointGroup detector sustains ~5 scenes/sec on its README GPU
(PyTorch 1.9 + CUDA 11.1, ~2080Ti class), so vs_baseline = scenes_per_sec/5.

Scenes are synthetic but ScanNet-statistics-sized (~125k points, ~90k 2cm
voxels, 16 instances); the model is the full flagship config (m=16, 7 U-Net
levels, 134-dim input with multiview features, dual clustering, ScoreNet).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from d3net_tpu import runtime as _rt
_rt.setup()
from d3net_tpu.data.collate import BatchSpec, build_batch
from d3net_tpu.data.synthetic import make_scene
from d3net_tpu.models.pointgroup import PointGroup

BATCH = 4
REF_SCENES_PER_SEC = 5.0


def build_bench_batch():
    scenes = [
        make_scene(
            seed=i,
            num_instances=16,
            density=2500.0,
            floor_points=30000,
            room=8.0,
            with_multiview=True,
        )
        for i in range(BATCH)
    ]
    spec = BatchSpec(
        max_points=131072,
        voxel_caps=[131072, 65536, 32768, 16384, 8192, 4096, 2048],
        max_instances=32,
        use_multiview=True,
        use_normal=True,
    )
    return build_batch(scenes, spec)


def main():
    model = PointGroup()  # flagship defaults: m=16, blocks 1..7
    t0 = time.time()
    batch_np = build_bench_batch()
    host_s = time.time() - t0
    batch = jax.tree.map(jnp.asarray, batch_np)

    init = jax.jit(lambda b: model.init({"params": jax.random.key(0)}, b, train=False))
    variables = init(batch)
    jax.block_until_ready(variables)

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    out = fwd(variables, batch)
    jax.block_until_ready(out["proposal_scores_all"])  # compile + warmup
    out = fwd(variables, batch)
    jax.block_until_ready(out["proposal_scores_all"])

    # In-graph forward scan: K sequential forwards chained through a carry
    # so neither XLA CSE nor the tunnel's request dedupe can skip work.
    K_FWD = 64

    @jax.jit
    def fwd_scan(variables, batch, c0):
        def body(c, _):
            feats = batch["point_feats"] + c * 1e-12
            o = model.apply(variables, {**batch, "point_feats": feats},
                            train=False)
            return c + o["proposal_scores_all"].sum() * 1e-6, ()
        c, _ = jax.lax.scan(body, c0, None, length=K_FWD)
        return c

    c = fwd_scan(variables, batch, jnp.float32(0.0))
    jax.block_until_ready(c)  # compile
    t0 = time.time()
    c = fwd_scan(variables, batch, jnp.float32(1.0))
    jax.block_until_ready(c)
    dt = (time.time() - t0) / K_FWD
    scenes_per_sec = BATCH / dt

    # Self-skepticism: this harness's tunneled runtime caches/dedups request
    # payloads, so wall timings can undershoot physics. Clamp the reported
    # throughput by the compiler's own FLOP count at v5e peak (197 bf16
    # TFLOP/s) — a hard upper bound no real execution can beat.
    PEAK_FLOPS = 197e12
    flops_per_batch = None
    try:
        ca = jax.jit(lambda v, b: model.apply(v, b, train=False)[
            "proposal_scores_all"]).lower(variables, batch).compile(
        ).cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_batch = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    bound_scenes_per_sec = None
    if flops_per_batch:
        bound_scenes_per_sec = PEAK_FLOPS / (flops_per_batch / BATCH)
        scenes_per_sec = min(scenes_per_sec, bound_scenes_per_sec)

    # Training-step timing. NOTE on this harness: the tunneled axon runtime
    # re-ships request payloads per dispatch and its backward-under-lax.scan
    # path kernel-faults (see MEMORY), so multi-step in-graph timing is
    # opt-in via D3NET_BENCH_TRAIN_SCAN=1; the default reports single
    # dispatch wall time (upper bound: includes tunnel I/O on this harness).
    import os as _os

    from d3net_tpu.train.trainer import (
        create_train_state, detector_train_step, jit_train_step, make_optimizer,
    )

    # free flagship buffers before the train-timing compile: fwd batch +
    # outputs + params otherwise co-reside with the train state in HBM
    import gc

    del out, variables, batch
    gc.collect()

    train_dt = float("nan")
    train_scenes_per_sec = float("nan")
    loss_drop = 0.0
    # train timing uses the 5-level/65k-cap config: the full 7-level
    # backward at 131k caps does not fit 16GB HBM yet (future work)
    train_model = PointGroup(blocks=(1, 2, 3, 4, 5))
    tb_spec = BatchSpec(
        max_points=65536, voxel_caps=[65536, 32768, 16384, 8192, 4096],
        max_instances=32, use_multiview=True, use_normal=True,
    )
    scenes = [
        make_scene(seed=i, num_instances=10, density=2500.0,
                   floor_points=15000, room=6.0, with_multiview=True)
        for i in range(BATCH)
    ]
    train_batch = jax.tree.map(jnp.asarray, build_batch(scenes, tb_spec))
    # Train timing is opt-in on this harness: the tunneled runtime's
    # worker reproducibly faults on the train-step execution inside this
    # process (runs fine standalone — see scripts/train.py runs), and a
    # crashed worker would poison the rest of the bench.
    _ok = _os.environ.get("D3NET_BENCH_TRAIN") == "1"
    if _ok:
        try:
            state = create_train_state(train_model, train_batch,
                                       jax.random.key(0),
                                       make_optimizer(lr=1e-3))
        except Exception as e:  # noqa: BLE001 — keep the JSON line alive
            print(f"# train-state init failed: {type(e).__name__}", flush=True)
            _ok = False
    if _ok and _os.environ.get("D3NET_BENCH_TRAIN_SCAN") == "1":
        K = 64

        @jax.jit
        def train_scan(state, batch, rng):
            def body(st, i):
                st, m = detector_train_step(train_model, st, batch,
                                            jax.random.fold_in(rng, i))
                return st, m["total_loss"]
            return jax.lax.scan(body, state, jnp.arange(K))

        st, losses = train_scan(state, train_batch, jax.random.key(1))
        jax.block_until_ready(losses)
        t0 = time.time()
        st, losses = train_scan(st, train_batch, jax.random.key(2))
        jax.block_until_ready(losses)
        train_dt = (time.time() - t0) / K
        loss_drop = float(losses[0] - losses[-1])
        train_scenes_per_sec = BATCH / train_dt
    elif _ok:
        try:
            step = jit_train_step(train_model)
            state, m = step(state, train_batch, jax.random.key(1))
            jax.block_until_ready(m["total_loss"])  # compile
            l0 = float(m["total_loss"])
            t0 = time.time()
            state, m = step(state, train_batch, jax.random.key(2))
            jax.block_until_ready(m["total_loss"])
            train_dt = time.time() - t0
            loss_drop = l0 - float(m["total_loss"])
            train_scenes_per_sec = BATCH / train_dt
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            print(f"# train-step timing failed: {msg}", flush=True)

    print(
        json.dumps(
            {
                "metric": "detector_fwd_scenes_per_sec",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/sec",
                "vs_baseline": round(scenes_per_sec / REF_SCENES_PER_SEC, 3),
                "detail": {
                    "batch": BATCH,
                    "fwd_step_ms": round(dt * 1e3, 2),
                    "fwd_measured_scenes_per_sec": round(BATCH / dt, 1),
                    "flops_bound_scenes_per_sec": (
                        round(bound_scenes_per_sec, 1)
                        if bound_scenes_per_sec else None),
                    "train_step_ms": (round(train_dt * 1e3, 2)
                                      if train_dt == train_dt else None),
                    "train_scenes_per_sec": (round(train_scenes_per_sec, 3)
                                             if train_scenes_per_sec == train_scenes_per_sec else None),
                    "train_loss_drop": round(loss_drop, 4),
                    "host_pipeline_s_per_batch": round(host_s, 2),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
