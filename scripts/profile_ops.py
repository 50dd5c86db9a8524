"""Per-op device profile of the flagship forward / train step.

Captures a jax.profiler trace of one flagship-config dispatch on the TPU
and aggregates per-op durations from the raw Chrome trace (the
tensorboard converter is broken in this image; the "XLA Ops" thread of
the trace JSON has per-op events — docs/perf_notes.md round 3).

Usage:
    python scripts/profile_ops.py [--what fwd|train|conv0] [--conv gather|block]
    python scripts/profile_ops.py --what conv0   # one level-0 subm conv

Prints the top-N ops by total duration plus a category rollup
(gather / scatter / copy-concat / conv-matmul / other).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from d3net_tpu import runtime as _rt

_rt.setup()


def _load_trace_events(logdir: str):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no trace under {logdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def _xla_op_events(events):
    """Duration events on the 'XLA Ops' threads."""
    op_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if "XLA Ops" in e.get("args", {}).get("name", ""):
                op_tids.add((e.get("pid"), e.get("tid")))
    out = []
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            out.append(e)
    return out


_CATS = [
    ("gather", re.compile(r"gather", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("conv/matmul", re.compile(r"dot|conv", re.I)),
    ("copy/concat/slice", re.compile(
        r"copy|concat|slice|dynamic-update|pad|reshape|transpose|bitcast", re.I)),
    ("reduce/elementwise", re.compile(
        r"reduce|add|mul|sub|max|min|rsqrt|select|compare|fused", re.I)),
]


def _categorize(name: str) -> str:
    for cat, rx in _CATS:
        if rx.search(name):
            return cat
    return "other"


def summarize(logdir: str, top: int = 40):
    events = _xla_op_events(_load_trace_events(logdir))
    per_op: dict[str, float] = {}
    per_op_n: dict[str, int] = {}
    for e in events:
        name = e.get("name", "?")
        per_op[name] = per_op.get(name, 0.0) + e.get("dur", 0) / 1e3
        per_op_n[name] = per_op_n.get(name, 0) + 1
    total = sum(per_op.values())
    cats: dict[str, float] = {}
    for name, ms in per_op.items():
        cats[_categorize(name)] = cats.get(_categorize(name), 0.0) + ms
    print(f"\n== XLA op time: {total:.1f} ms over {len(events)} events ==")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<22} {ms:9.1f} ms  {100 * ms / max(total, 1e-9):5.1f}%")
    print(f"\n== top {top} ops ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:9.2f} ms  x{per_op_n[name]:<5} {name[:110]}")
    return total


def build_flagship(conv_impl: str):
    from d3net_tpu.data.collate import BatchSpec, build_batch
    from d3net_tpu.data.synthetic import make_scene
    from d3net_tpu.models.pointgroup import PointGroup

    scenes = [make_scene(seed=i, num_instances=16, density=2500.0,
                         floor_points=30000, room=8.0, with_multiview=True)
              for i in range(4)]
    spec = BatchSpec(
        max_points=131072,
        voxel_caps=[131072, 65536, 32768, 16384, 8192, 4096, 2048],
        max_instances=32, use_multiview=True, use_normal=True,
        conv_impl=conv_impl,
    )
    batch = jax.tree.map(jnp.asarray, build_batch(scenes, spec))
    model = PointGroup(compute_dtype="bfloat16")
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=False)
    )(batch)
    return model, variables, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="fwd",
                    choices=["fwd", "train", "conv0", "backbone"])
    ap.add_argument("--conv", default="colres",
                    choices=["gather", "block", "column", "colres"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    logdir = args.logdir or tempfile.mkdtemp(prefix="d3net_prof_")

    if args.what == "conv0":
        # one flagship-level-0-sized subm conv, C=16, B=4, bf16
        from d3net_tpu.data.collate import BatchSpec, build_batch
        from d3net_tpu.data.synthetic import make_scene
        from d3net_tpu.models import blocks as mblocks

        scenes = [make_scene(seed=i, num_instances=16, density=2500.0,
                             floor_points=30000, room=8.0)
                  for i in range(4)]
        spec = BatchSpec(
            max_points=131072,
            voxel_caps=[131072, 65536, 32768, 16384, 8192, 4096, 2048],
            max_instances=32, conv_impl=args.conv,
        )
        batch = jax.tree.map(jnp.asarray, build_batch(scenes, spec))
        t0 = batch["tables"][0]
        cap = spec.caps()[0]
        x = jax.random.normal(jax.random.key(1), (4, cap, 16), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(2), (27, 16, 16), jnp.float32)

        if args.conv == "block":
            f = jax.jit(lambda x, w: mblocks.subm_rows(x, t0, w).sum())
        elif args.conv == "column":
            f = jax.jit(lambda x, w: mblocks.subm_cols(x, t0, w).sum())
        else:
            f = jax.jit(lambda x, w: mblocks._batched_conv(
                x, t0["nbr"], t0["nbr"], w, True).sum())
        float(f(x, w))  # compile+warm
        jax.profiler.start_trace(logdir)
        for _ in range(3):
            float(f(x, w))
        jax.profiler.stop_trace()
        summarize(logdir, args.top)
        return

    model, variables, batch = build_flagship(args.conv)

    if args.what in ("fwd", "backbone"):
        fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)[
            "proposal_scores_all"].sum())
        t0 = time.time()
        float(fwd(variables, batch))
        print(f"compile+first: {time.time() - t0:.1f}s")
        t0 = time.time()
        float(fwd(variables, batch))
        wall = time.time() - t0
        print(f"second dispatch wall: {wall:.2f}s")
        jax.profiler.start_trace(logdir)
        float(fwd(variables, batch))
        jax.profiler.stop_trace()
    else:  # train
        from d3net_tpu.train.trainer import (
            create_train_state, jit_train_step, make_optimizer)
        state = create_train_state(model, batch, jax.random.key(0),
                                   make_optimizer(lr=1e-3))
        step = jit_train_step(model)
        st, m = step(state, batch, jax.random.key(1))
        float(m["total_loss"])
        jax.profiler.start_trace(logdir)
        st, m = step(st, batch, jax.random.key(2))
        float(m["total_loss"])
        jax.profiler.stop_trace()

    print(f"trace: {logdir}")
    summarize(logdir, args.top)


if __name__ == "__main__":
    main()
