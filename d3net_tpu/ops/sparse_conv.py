"""Sparse 3D convolution as neighbor-table gather + one MXU matmul.

TPU-native replacement for MinkowskiEngine's gather-GEMM-scatter sparse conv
(used via ``model/common.py`` in the reference).  The key redesign: instead
of scatter-accumulate per kernel offset (bad on TPU), the host precomputes a
**gather table** ``nbr`` (M_out, K) — for every output voxel, the input
voxel index contributing under each kernel offset (INVALID entries read a
zero pad row).  The conv is then

    out[i] = sum_k feats[nbr[i, k]] @ W[k]
           = reshape(gather(feats, nbr), (M, K*Cin)) @ reshape(W, (K*Cin, Cout))

— a single large matmul that XLA tiles straight onto the MXU, with the
gather fused into the operand pipeline.  Stride-1 (submanifold), stride-2
down-conv, and stride-2 transposed up-conv all use the same op with
different tables (see :mod:`d3net_tpu.ops.voxelize`).
"""

from __future__ import annotations

import jax.numpy as jnp


def sparse_conv(feats, nbr, weight, precision=None):
    """Gather-matmul sparse convolution.

    Args:
        feats: (M_in, Cin) input voxel features (rows past the real voxel
            count are zero).
        nbr: (M_out, K) int32 gather table; INVALID entries == M_in.
        weight: (K, Cin, Cout).

    Returns:
        (M_out, Cout)
    """
    k, cin, cout = weight.shape
    padded = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    gathered = padded[nbr]  # (M_out, K, Cin)
    m_out = nbr.shape[0]
    out = jnp.dot(
        gathered.reshape(m_out, k * cin),
        weight.reshape(k * cin, cout).astype(feats.dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.astype(feats.dtype)


def sparse_upconv_onehot(feats, parent, offset_id, weight, num_offsets=8):
    """Transposed conv specialization: exactly one parent per output voxel.

    Equivalent to ``sparse_conv`` with a one-hot (M, 8) table but does one
    (M, Cin) gather instead of eight: builds the (M, K*Cin) operand by
    masking the gathered parent features into the offset's slot.

    Args:
        feats: (M_in, Cin); parent: (M_out,) int32 (INVALID == M_in);
        offset_id: (M_out,) int32 in [0, num_offsets).
    """
    k, cin, cout = weight.shape
    assert k == num_offsets
    padded = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    g = padded[parent]  # (M_out, Cin)
    onehot = jnp.eye(num_offsets, dtype=feats.dtype)[offset_id]  # (M_out, K)
    operand = (onehot[:, :, None] * g[:, None, :]).reshape(g.shape[0], k * cin)
    out = jnp.dot(
        operand,
        weight.reshape(k * cin, cout).astype(feats.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(feats.dtype)
