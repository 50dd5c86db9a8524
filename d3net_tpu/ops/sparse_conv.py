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

import functools

import jax
import jax.numpy as jnp


# Output rows processed per sequential chunk. Bounds the transient
# (chunk, K*Cin) gathered operand to ~tens of MB regardless of voxel count —
# without chunking, XLA materializes (M, K*Cin) temps per conv (hundreds of
# MB at 10^5 voxels) and the backward OOMs on 16GB HBM.
_CHUNK = 8192


def _conv_block(padded, nbr_block, wflat, precision):
    m, k = nbr_block.shape
    gathered = padded[nbr_block].reshape(m, -1)
    return jnp.dot(
        gathered, wflat, preferred_element_type=jnp.float32, precision=precision
    )


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
    m_out = nbr.shape[0]
    padded = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    wflat = weight.reshape(k * cin, cout).astype(feats.dtype)
    if m_out > _CHUNK:
        pad_rows = (-m_out) % _CHUNK
        nbr_p = jnp.concatenate(
            [nbr, jnp.full((pad_rows, k), feats.shape[0], nbr.dtype)]
        ) if pad_rows else nbr
        out = jax.lax.map(
            lambda nb: _conv_block(padded, nb, wflat, precision),
            nbr_p.reshape(-1, _CHUNK, k),
        ).reshape(m_out + pad_rows, cout)[:m_out]
    else:
        out = _conv_block(padded, nbr, wflat, precision)
    return out.astype(feats.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def sparse_conv_t(feats, nbr, nbr_t, weight, flip_t: bool = False):
    """``sparse_conv`` with a gather-only backward via the transpose table.

    The naive VJP of gather+matmul saves the (M, K*Cin) gathered operand and
    scatters gradients — both HBM killers at 10^5 voxels.  Sparse-conv
    tables have exact transposes that are themselves gather tables:

    - submanifold 3^3: ``nbr(i,k)=j  <=>  nbr(j, flip(k))=i`` on the same
      coordinate set -> nbr_t = nbr with ``flip_t=True`` (kernel mirrored);
    - stride-2 down-conv table and the transposed-conv up table of the same
      level pair are mutual transposes -> pass the sibling table.

    So d feats = gather-matmul(g, nbr_t, W^T) and dW re-gathers the inputs:
    zero extra residual memory, zero scatters.
    """
    return sparse_conv(feats, nbr, weight)


def _sct_fwd(feats, nbr, nbr_t, weight, flip_t):
    return sparse_conv(feats, nbr, weight), (feats, nbr, nbr_t, weight)


def _sct_bwd(flip_t, res, g):
    feats, nbr, nbr_t, weight = res
    k, cin, cout = weight.shape
    wt = weight[::-1] if flip_t else weight
    wt = jnp.swapaxes(wt, 1, 2)  # (K, Cout, Cin)
    # pad g to the width nbr_t expects (INVALID = len(g))
    dfeats = sparse_conv(g, nbr_t, wt)[: feats.shape[0]]
    # dW[k] = gathered^T @ g, accumulated over row chunks
    padded = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    m_out = nbr.shape[0]

    def dw_block(nbr_block, g_block):
        gathered = padded[nbr_block]  # (chunk, K, Cin)
        return jnp.einsum(
            "mkc,md->kcd", gathered, g_block, preferred_element_type=jnp.float32
        )

    if m_out > _CHUNK:
        pad_rows = (-m_out) % _CHUNK
        if pad_rows:
            nbr_c = jnp.concatenate(
                [nbr, jnp.full((pad_rows, k), feats.shape[0], nbr.dtype)]
            )
            g_c = jnp.concatenate([g, jnp.zeros((pad_rows, cout), g.dtype)])
        else:
            nbr_c, g_c = nbr, g
        dw = jax.lax.map(
            lambda args: dw_block(*args),
            (nbr_c.reshape(-1, _CHUNK, k), g_c.reshape(-1, _CHUNK, cout)),
        ).sum(0)
    else:
        dw = dw_block(nbr, g)
    return dfeats, None, None, dw.astype(weight.dtype)


sparse_conv_t.defvjp(_sct_fwd, _sct_bwd)


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
