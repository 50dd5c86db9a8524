"""Transformer primitives (parity: ``model/transformer/attention.py``).

Multi-head attention with optional additive/multiplicative attention-weight
injection (the listener's distance-weighted attention), key masking, and the
reference's post-LN residual wrapper (dropout -> add -> LayerNorm).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class MultiHeadAttention(nn.Module):
    """MHA + dropout + residual + post-LN (ref ``MultiHeadAttention``)."""

    d_model: int
    d_k: int
    d_v: int
    h: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        queries,                 # (B, Nq, d_model)
        keys,                    # (B, Nk, d_model)
        values,                  # (B, Nk, d_model)
        key_mask=None,           # (B, Nk) 1 = attend
        attention_weights=None,  # (B, h, Nq, Nk)
        way: str = "mul",
        deterministic: bool = True,
    ):
        b, nq, _ = queries.shape
        nk = keys.shape[1]
        q = nn.Dense(self.h * self.d_k, name="fc_q")(queries)
        k = nn.Dense(self.h * self.d_k, name="fc_k")(keys)
        v = nn.Dense(self.h * self.d_v, name="fc_v")(values)
        q = q.reshape(b, nq, self.h, self.d_k).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, self.h, self.d_k).transpose(0, 2, 3, 1)
        v = v.reshape(b, nk, self.h, self.d_v).transpose(0, 2, 1, 3)

        att = jnp.matmul(q, k) / jnp.sqrt(jnp.asarray(self.d_k, q.dtype))
        if attention_weights is not None:
            att = att * attention_weights if way == "mul" else att + attention_weights
        if key_mask is not None:
            att = jnp.where(key_mask[:, None, None, :] > 0, att, -jnp.inf)
        att = nn.softmax(att, axis=-1)
        # rows with no valid key produce NaNs from all -inf; zero them
        att = jnp.where(jnp.isfinite(att), att, 0.0)
        out = jnp.matmul(att, v).transpose(0, 2, 1, 3).reshape(b, nq, self.h * self.d_v)
        out = nn.Dense(self.d_model, name="fc_o")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return nn.LayerNorm()(queries + out)
