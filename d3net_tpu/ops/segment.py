"""Fixed-shape segment reductions (device, jit-safe, differentiable).

TPU-native replacements for the reference CUDA kernels:

- ``segment_mean``      -> voxelize_fp/bp mode-4 (``src/voxelize/voxelize.cu``)
                           and sec_mean (``src/sec_mean/sec_mean.cu``)
- ``segment_min/max``   -> sec_min / sec_max
- ``segment_max`` over proposal feats -> roipool_fp/bp
                           (``src/roipool/roipool.cu``) — autodiff gives the
                           argmax-routed backward for free.

All take a static ``num_segments`` and an optional validity mask; masked
elements are routed to a trash segment (index ``num_segments``) and sliced
off, so shapes stay static and XLA sees one scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e30


def _route(seg_ids, mask, num_segments):
    if mask is None:
        return seg_ids
    return jnp.where(mask, seg_ids, num_segments)


def segment_sum(data, seg_ids, num_segments: int, mask=None):
    ids = _route(seg_ids, mask, num_segments)
    out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(seg_ids, num_segments: int, mask=None, dtype=jnp.float32):
    ones = jnp.ones(seg_ids.shape, dtype=dtype)
    return segment_sum(ones, seg_ids, num_segments, mask)


def segment_mean(data, seg_ids, num_segments: int, mask=None, eps: float = 1e-8):
    s = segment_sum(data, seg_ids, num_segments, mask)
    n = segment_count(seg_ids, num_segments, mask, dtype=s.dtype)
    return s / jnp.maximum(n, eps).reshape((-1,) + (1,) * (s.ndim - 1))


def segment_max(data, seg_ids, num_segments: int, mask=None, fill=-_BIG):
    ids = _route(seg_ids, mask, num_segments)
    out = jax.ops.segment_max(data, ids, num_segments=num_segments + 1)
    out = out[:num_segments]
    return jnp.where(jnp.isfinite(out) & (out > -_BIG / 2), out, fill)


def segment_min(data, seg_ids, num_segments: int, mask=None, fill=_BIG):
    ids = _route(seg_ids, mask, num_segments)
    out = jax.ops.segment_min(data, ids, num_segments=num_segments + 1)
    out = out[:num_segments]
    return jnp.where(jnp.isfinite(out) & (out < _BIG / 2), out, fill)


def gather_padded(feats, idx):
    """Gather rows of ``feats`` with one zero row appended at index len(feats).

    ``idx`` entries equal to feats.shape[0] (the INVALID sentinel emitted by
    the host kernel-map builder) read zeros — this is the device half of the
    padding contract in :mod:`d3net_tpu.ops.voxelize`.
    """
    padded = jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)
    return padded[idx]
