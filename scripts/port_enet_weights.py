"""Port the reference's pretrained ENet checkpoint to the Flax encoder.

The reference extracts frozen 128-d multiview features with a torch7-
converted ENet loaded from ``scannetv2_enet.pth``
(``/root/reference/data/scannet/compute_multiview_features.py:84-124``,
``model/enet.py:697-716`` ``create_enet_for_3d`` keeps everything but the
final 1x1 classifier).  That checkpoint is a positional ``state_dict``
over a deeply nested ``nn.Sequential``; this script maps it onto
``d3net_tpu.models.enet.ENetEncoder(full=True)``, whose layout is
reference-exact (22 bottlenecks, torch padding grid, (1,5)+(5,1) asym
order).

Usage:
    python scripts/port_enet_weights.py --checkpoint scannetv2_enet.pth \
        --output pretrained/enet_scannet.pkl
    python scripts/port_enet_weights.py --selftest   # no checkpoint needed

The output pickle holds {"params", "batch_stats"} for ENetEncoder(full=
True), directly usable by scripts/compute_multiview_features.py
(--full-enet).  No ScanNet checkpoint ships in this environment, so
--selftest synthesizes a random state_dict with the exact keys/shapes the
real file has and proves the mapping is complete (every torch key
consumed, every Flax leaf written, shapes agree, forward runs).
"""

from __future__ import annotations

import argparse
import pickle
import sys
from typing import Dict, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# torch-side layout (derived from the literal nn.Sequential in the
# reference's model/enet.py:130-589; entries 0-3 initial block, 4..25
# bottlenecks, 26 classifier — dropped)
# ---------------------------------------------------------------------------

# (mid, out, kind) per bottleneck; kind in {"down", "reg", "asym"}
_BOTTLENECKS = (
    [(16, 64, "down")] + [(16, 64, "reg")] * 4
    + [(32, 128, "down")]
    + [(32, 128, k) for k in ("reg", "reg", "asym", "reg",
                              "reg", "reg", "asym", "reg")] * 2
)


def _conv(o, i, kh, kw, bias):
    d = {"weight": (o, i, kh, kw)}
    if bias:
        d["bias"] = (o,)
    return d


def _bn(c):
    return {"weight": (c,), "bias": (c,), "running_mean": (c,),
            "running_var": (c,)}


def expected_torch_keys() -> Dict[str, Tuple[int, ...]]:
    """Every key of the reference encoder's state_dict -> shape."""
    keys: Dict[str, Tuple[int, ...]] = {}

    def put(prefix, d):
        for k, shp in d.items():
            keys[f"{prefix}.{k}"] = shp

    put("0.0", _conv(13, 3, 3, 3, bias=True))      # initial conv
    put("2", _bn(16))                              # initial BN
    keys["3.weight"] = (16,)                       # initial PReLU
    for bi, (mid, out, kind) in enumerate(_BOTTLENECKS):
        top = 4 + bi
        inp = {0: 16, 5: 64}.get(bi, out)          # in-channels
        br = f"{top}.0.0"
        if kind == "down":
            put(f"{br}.0", _conv(mid, inp, 2, 2, bias=False))
        else:
            put(f"{br}.0", _conv(mid, inp, 1, 1, bias=False))
        put(f"{br}.1", _bn(mid))
        keys[f"{br}.2.weight"] = (mid,)
        if kind == "asym":
            put(f"{br}.3", _conv(mid, mid, 1, 5, bias=False))
            put(f"{br}.4", _conv(mid, mid, 5, 1, bias=True))
            put(f"{br}.5", _bn(mid))
            keys[f"{br}.6.weight"] = (mid,)
            put(f"{br}.7", _conv(out, mid, 1, 1, bias=False))
            put(f"{br}.8", _bn(out))
        else:
            put(f"{br}.3", _conv(mid, mid, 3, 3, bias=True))
            put(f"{br}.4", _bn(mid))
            keys[f"{br}.5.weight"] = (mid,)
            put(f"{br}.6", _conv(out, mid, 1, 1, bias=False))
            put(f"{br}.7", _bn(out))
        keys[f"{top}.2.weight"] = (out,)           # final PReLU
    return keys


# ---------------------------------------------------------------------------
# mapping to the Flax tree
# ---------------------------------------------------------------------------

def _t(w):
    """torch conv (O, I, KH, KW) -> flax (KH, KW, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def port_enet_state_dict(sd: Dict[str, np.ndarray]):
    """Positional torch state_dict -> (params, batch_stats) for
    ENetEncoder(full=True).  Raises on missing keys; reports leftovers."""
    sd = dict(sd)
    used = set()

    def take(k):
        used.add(k)
        return np.asarray(sd[k], dtype=np.float32)

    def conv(prefix, bias):
        out = {"kernel": _t(take(f"{prefix}.weight"))}
        if bias:
            out["bias"] = take(f"{prefix}.bias")
        return out

    def bn(prefix):
        p = {"scale": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}
        s = {"mean": take(f"{prefix}.running_mean"),
             "var": take(f"{prefix}.running_var")}
        return p, s

    params: Dict = {}
    stats: Dict = {}

    ib_bn_p, ib_bn_s = bn("2")
    params["InitialBlock_0"] = {
        "Conv_0": conv("0.0", bias=True),
        "BatchNorm_0": ib_bn_p,
        "PReLU_0": {"alpha": take("3.weight")},
    }
    stats["InitialBlock_0"] = {"BatchNorm_0": ib_bn_s}

    for bi, (_mid, _out, kind) in enumerate(_BOTTLENECKS):
        top = 4 + bi
        br = f"{top}.0.0"
        p: Dict = {}
        s: Dict = {}
        p["Conv_0"] = conv(f"{br}.0", bias=False)
        p["BatchNorm_0"], s["BatchNorm_0"] = bn(f"{br}.1")
        p["PReLU_0"] = {"alpha": take(f"{br}.2.weight")}
        if kind == "asym":
            p["Conv_1"] = conv(f"{br}.3", bias=False)   # (1,5)
            p["Conv_2"] = conv(f"{br}.4", bias=True)    # (5,1)
            p["BatchNorm_1"], s["BatchNorm_1"] = bn(f"{br}.5")
            p["PReLU_1"] = {"alpha": take(f"{br}.6.weight")}
            p["Conv_3"] = conv(f"{br}.7", bias=False)
            p["BatchNorm_2"], s["BatchNorm_2"] = bn(f"{br}.8")
        else:
            p["Conv_1"] = conv(f"{br}.3", bias=True)
            p["BatchNorm_1"], s["BatchNorm_1"] = bn(f"{br}.4")
            p["PReLU_1"] = {"alpha": take(f"{br}.5.weight")}
            p["Conv_2"] = conv(f"{br}.6", bias=False)
            p["BatchNorm_2"], s["BatchNorm_2"] = bn(f"{br}.7")
        p["PReLU_2"] = {"alpha": take(f"{top}.2.weight")}
        params[f"Bottleneck_{bi}"] = p
        stats[f"Bottleneck_{bi}"] = s

    leftovers = sorted(
        k for k in sd
        if k not in used
        and not k.startswith("26.")                 # classifier — dropped
        and not k.endswith("num_batches_tracked")
    )
    if leftovers:
        raise ValueError(f"unmapped checkpoint keys: {leftovers[:8]} "
                         f"(+{max(0, len(leftovers) - 8)} more)")
    return params, stats


def synth_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random state_dict with the real checkpoint's exact keys/shapes."""
    rng = np.random.default_rng(seed)
    out = {}
    for k, shp in expected_torch_keys().items():
        if k.endswith("running_var"):
            out[k] = rng.uniform(0.5, 1.5, shp).astype(np.float32)
        else:
            out[k] = rng.normal(0, 0.1, shp).astype(np.float32)
    return out


def selftest() -> None:
    import jax
    import jax.numpy as jnp

    from d3net_tpu.models.enet import ENetEncoder

    sd = synth_state_dict()
    params, stats = port_enet_state_dict(sd)

    model = ENetEncoder(full=True)
    x = jnp.zeros((1, 64, 64, 3))
    ref = model.init({"params": jax.random.key(0)}, x, train=False)

    # shape contract: the ported tree must be leaf-for-leaf identical
    ported = {"params": params, "batch_stats": stats}
    ref_flat = jax.tree_util.tree_flatten_with_path(
        {"params": ref["params"], "batch_stats": ref["batch_stats"]})[0]
    got_flat = jax.tree_util.tree_flatten_with_path(ported)[0]
    ref_shapes = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    got_shapes = {jax.tree_util.keystr(p): v.shape for p, v in got_flat}
    missing = sorted(set(ref_shapes) - set(got_shapes))
    extra = sorted(set(got_shapes) - set(ref_shapes))
    assert not missing, f"missing leaves: {missing[:6]}"
    assert not extra, f"extra leaves: {extra[:6]}"
    bad = [k for k in ref_shapes if ref_shapes[k] != got_shapes[k]]
    assert not bad, f"shape mismatches: {[(k, ref_shapes[k], got_shapes[k]) for k in bad[:4]]}"

    y = model.apply(ported, jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)
    ), train=False)
    assert y.shape == (1, 8, 8, 128), y.shape
    assert bool(jnp.isfinite(y).all())
    print(f"selftest OK: {len(ref_shapes)} leaves mapped, "
          f"output {tuple(y.shape)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", help="scannetv2_enet.pth (torch)")
    ap.add_argument("--output", default="pretrained/enet_scannet.pkl")
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()

    if args.selftest:
        selftest()
        return
    if not args.checkpoint:
        ap.error("--checkpoint required (or use --selftest)")

    import torch  # cpu build is baked into this image

    sd = torch.load(args.checkpoint, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    params, stats = port_enet_state_dict(sd)

    import os

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump({"params": params, "batch_stats": stats,
                     "full": True}, f)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
