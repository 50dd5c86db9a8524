"""Benchmark: flagship detector throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement protocol (this harness's tunneled axon runtime requires care):
``jax.block_until_ready`` does not actually block, and device->host
transfers are slow — so every timed program returns a SCALAR whose
``float()`` materialization forces completion, each call carries a distinct
salt (request dedupe immunity), and the per-step time is the difference
between two in-graph scan lengths, (T(K2)-T(K1))/(K2-K1), which cancels the
fixed dispatch/tunnel overhead.  The compiler FLOP count at v5e peak is
reported as a *diagnostic bound only*: a measurement that beats the bound
is reported as failed (value null + error), never substituted.

The tunneled worker enforces a per-dispatch execution-time watchdog
(~60-90s; docs/tpu_scan_fault.md) — any single XLA execution running
longer kernel-faults the worker (recovery ~3min).  Scan lengths are
therefore chosen to keep every timed program well under the limit.

The reference publishes no throughput numbers (BASELINE.md); the driver
gate is >=5x the CUDA reference on one v5e chip.  ``vs_baseline`` divides
by an ASSUMED 5 scenes/sec for the reference PointGroup detector on its
README GPU — an estimate, flagged as such in the output.

Scenes are synthetic but ScanNet-statistics-sized (~125k points, ~90k 2cm
voxels, 16 instances); the model is the full flagship config (m=16, 7 U-Net
levels, 134-dim input with multiview features, dual clustering, ScoreNet).
"""

from __future__ import annotations

import json
import os
import signal
import statistics
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
REF_SCENES_PER_SEC_ASSUMED = 5.0  # unpublished; conservative estimate
PEAK_FLOPS = 197e12  # v5e bf16 peak

# production backbone: block-dense folded-lane conv, bf16 activations
# (exact parity with the gather conv is oracle-tested; bf16 is bitwise-
# identical through the convs on this backend — docs/perf_notes.md).
# D3NET_BENCH_CONV=gather compares against the row-gather path.
CONV_IMPL = os.environ.get("D3NET_BENCH_CONV", "block")


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
        conv_impl=CONV_IMPL,
    )
    return scenes, spec


def timed_scan_ms(make_fn, k1: int, k2: int, reps: int = 3):
    """Per-step ms via scan-length differencing with scalar materialization.

    make_fn(K) -> jitted fn(salt) returning a scalar that depends on all K
    iterations.  Distinct salts defeat request dedupe; the scalar fetch
    forces completion (block_until_ready is unreliable on this runtime).
    """
    f1, f2 = make_fn(k1), make_fn(k2)
    float(f1(jnp.float32(0.5)))  # compile + warm
    float(f2(jnp.float32(0.5)))
    t1s, t2s = [], []
    for i in range(reps):
        t0 = time.time()
        float(f1(jnp.float32(1.0 + i)))
        t1s.append(time.time() - t0)
        t0 = time.time()
        float(f2(jnp.float32(101.0 + i)))
        t2s.append(time.time() - t0)
    t1, t2 = statistics.median(t1s), statistics.median(t2s)
    per_step = (t2 - t1) / (k2 - k1)
    return per_step * 1e3, t1 * 1e3, t2 * 1e3


def _wait_for_worker(max_wait_s: float = 360.0):
    """Block until the device answers a trivial program again.

    A watchdog kill (docs/tpu_scan_fault.md) restarts the tunneled worker;
    for ~3 min every dispatch fails UNAVAILABLE.  Poll with a tiny matmul
    so follow-up measurements hit a healthy device instead of inheriting
    the crash.
    """
    deadline = time.time() + max_wait_s
    while True:
        try:
            x = jnp.ones((128, 128))
            float((x @ x).sum())
            return
        except Exception:  # noqa: BLE001
            if time.time() > deadline:
                return
            time.sleep(15)


def _device_reachable(timeout_s: float = 420.0) -> str | None:
    """Probe the backend in a subprocess with a hard wall-clock bound.

    Tunnel RPCs on the axon runtime can hang forever (no error, no
    timeout) when the remote worker is down; a hung bench would leave the
    driver with no JSON line at all.  The probe runs device discovery + one
    tiny op in a child process so a hang is killable; returns an error
    string if the device never answers, else None.
    """
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp;"
        "print(jax.default_backend());"
        "print(float(jnp.ones((8,128)).sum()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, env=dict(os.environ),
        )
    except subprocess.TimeoutExpired:
        return (f"device unreachable: backend probe hung >{timeout_s:.0f}s "
                "(tunneled worker down?)")
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return "device probe failed: " + (tail[-1][:200] if tail else "?")
    return None


def main():
    probe_err = _device_reachable()
    if probe_err:
        print(json.dumps({
            "metric": "detector_fwd_scenes_per_sec", "value": None,
            "unit": "scenes/sec", "vs_baseline": None, "error": probe_err,
        }))
        return
    # flagship defaults: m=16, blocks 1..7, bf16 compute
    model = PointGroup(compute_dtype="bfloat16")
    scenes, spec = build_bench_batch()
    host_ts = []
    for _ in range(3):
        t0 = time.time()
        batch_np = build_batch(scenes, spec)
        host_ts.append(time.time() - t0)
    host_s = statistics.median(host_ts)
    batch = jax.tree.map(jnp.asarray, batch_np)

    init = jax.jit(lambda b: model.init({"params": jax.random.key(0)}, b, train=False))
    variables = init(batch)

    def make_fwd(K):
        # big arrays enter as jit ARGUMENTS (closure capture would bake
        # them into the HLO as constants — the remote compile service
        # rejects payloads that large)
        @jax.jit
        def f(v, b, salt):
            def body(c, _):
                feats = b["point_feats"].at[0, 0, 0].add(c * 1e-12)
                o = model.apply(v, {**b, "point_feats": feats}, train=False)
                return c + o["proposal_scores_all"].sum() * 1e-6, ()
            c, _ = jax.lax.scan(body, salt, None, length=K)
            return c
        return lambda salt: f(variables, batch, salt)

    error = None
    fwd_ms = None
    try:
        # K kept small: flagship fwd is ~9s/step and the worker watchdog
        # kills dispatches over ~60s
        fwd_ms, t1_ms, t2_ms = timed_scan_ms(make_fwd, 2, 4)
    except Exception as e:  # noqa: BLE001 — keep the JSON line alive
        error = f"fwd timing failed: {str(e).splitlines()[0][:200]}"
        t1_ms = t2_ms = None

    # diagnostic FLOPs bound (per batch forward) at v5e peak
    flops_per_batch = None
    bound_scenes_per_sec = None
    try:
        ca = jax.jit(lambda v, b: model.apply(v, b, train=False)[
            "proposal_scores_all"]).lower(variables, batch).compile(
        ).cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_batch = float(ca.get("flops", 0.0)) or None
        if flops_per_batch:
            bound_scenes_per_sec = PEAK_FLOPS / (flops_per_batch / BATCH)
    except Exception:
        pass

    scenes_per_sec = None
    if fwd_ms is not None and fwd_ms > 0:
        scenes_per_sec = BATCH / (fwd_ms / 1e3)
        if bound_scenes_per_sec and scenes_per_sec > bound_scenes_per_sec:
            error = (
                f"measured {scenes_per_sec:.1f} scenes/s exceeds the "
                f"compiler-FLOPs bound {bound_scenes_per_sec:.1f} — timing "
                "invalid (tunnel contamination), not reported"
            )
            scenes_per_sec = None
    elif fwd_ms is not None:
        error = f"non-positive per-step time ({fwd_ms:.4f} ms)"
        scenes_per_sec = None

    # ---- training-step timing (default ON; scan path, sequential fallback)
    import gc

    from d3net_tpu.train.trainer import (
        create_train_state, detector_train_step, jit_train_step, make_optimizer,
    )

    del variables, batch
    gc.collect()

    train_detail = {}
    train_scenes_per_sec = None
    # train timing uses the SAME flagship config as the forward timing:
    # the block-conv custom-VJP backward keeps residuals in row space, so
    # the full 7-level/131k backward fits HBM (docs/perf_notes.md round 3)
    train_model = model
    tb_spec = spec
    tscenes = scenes
    try:
        train_batch = jax.tree.map(jnp.asarray, build_batch(tscenes, tb_spec))
        state = create_train_state(train_model, train_batch,
                                   jax.random.key(0), make_optimizer(lr=1e-3))

        def make_train(K):
            @jax.jit
            def f(st0, tb, salt):
                def body(st, i):
                    st, m = detector_train_step(
                        train_model, st, tb,
                        jax.random.fold_in(jax.random.key(7), i))
                    return st, m["total_loss"]
                _, losses = jax.lax.scan(body, st0, jnp.arange(K))
                return losses.sum() + salt * 1e-12
            return lambda salt: f(state, train_batch, salt)

        try:
            train_ms, _, _ = timed_scan_ms(make_train, 2, 4)
            train_detail["train_path"] = "scan"
        except Exception as e:  # noqa: BLE001 — scan may fault some runtimes
            train_detail["train_scan_error"] = str(e).splitlines()[0][:160]
            _wait_for_worker()  # a faulted worker needs ~3min to recover
            step = jit_train_step(train_model)
            st, m = step(state, train_batch, jax.random.key(1))
            float(m["total_loss"])  # compile
            ts = []
            for i in range(4):
                t0 = time.time()
                st, m = step(st, train_batch, jax.random.key(2 + i))
                float(m["total_loss"])
                ts.append(time.time() - t0)
            train_ms = statistics.median(ts) * 1e3
            train_detail["train_path"] = "sequential"
        # loss drop over a short real run (separate from timing)
        step = jit_train_step(train_model)
        st, m0 = step(state, train_batch, jax.random.key(11))
        l0 = float(m0["total_loss"])
        for i in range(6):
            st, m1 = step(st, train_batch, jax.random.key(12 + i))
        l1 = float(m1["total_loss"])
        train_detail["train_loss_drop_7steps"] = round(l0 - l1, 4)
        if train_ms > 0:
            train_scenes_per_sec = BATCH / (train_ms / 1e3)
            train_detail["train_step_ms"] = round(train_ms, 2)
    except Exception as e:  # noqa: BLE001
        train_detail["train_error"] = str(e).splitlines()[0][:200]

    out = {
        "metric": "detector_fwd_scenes_per_sec",
        "value": round(scenes_per_sec, 3) if scenes_per_sec else None,
        "unit": "scenes/sec",
        "vs_baseline": (
            round(scenes_per_sec / REF_SCENES_PER_SEC_ASSUMED, 3)
            if scenes_per_sec else None),
        "detail": {
            "vs_baseline_note": (
                "denominator is an ASSUMED 5 scenes/s for the CUDA reference "
                "(it publishes no throughput); treat vs_baseline as an "
                "estimate"),
            "batch": BATCH,
            "fwd_step_ms": round(fwd_ms, 2) if fwd_ms is not None else None,
            "scan_walls_ms": ([round(t1_ms, 1), round(t2_ms, 1)]
                              if t1_ms is not None else None),
            "flops_bound_scenes_per_sec": (
                round(bound_scenes_per_sec, 1) if bound_scenes_per_sec else None),
            "train_scenes_per_sec": (
                round(train_scenes_per_sec, 3) if train_scenes_per_sec else None),
            "host_pipeline_s_per_batch": round(host_s, 2),
            "conv_impl": CONV_IMPL,
            "backend": jax.default_backend(),
            **train_detail,
        },
    }
    if error:
        out["error"] = error
    print(json.dumps(out))


if __name__ == "__main__":
    # last-resort wall-clock bound: if the worker dies mid-bench and an RPC
    # wedges, emit an error JSON line instead of hanging the driver.  (The
    # alarm can only fire once the interpreter regains control, so a truly
    # wedged C call still hangs — the subprocess probe above catches the
    # common cold-start case.)
    def _alarm(signum, frame):  # noqa: ARG001
        raise TimeoutError("bench exceeded wall-clock budget")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("D3NET_BENCH_BUDGET_S", "3000")))
    try:
        main()
    except TimeoutError as e:
        print(json.dumps({
            "metric": "detector_fwd_scenes_per_sec", "value": None,
            "unit": "scenes/sec", "vs_baseline": None, "error": str(e),
        }))
