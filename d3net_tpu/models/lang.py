"""GRU language encoder (parity: ``model/lang_module.py``).

The reference packs padded sequences into cuDNN GRU calls; here a masked
``nn.scan`` over the fixed token horizon produces identical semantics:
per-step hiddens are zeroed beyond each sequence's length and the "last"
embedding is the hidden state at step len-1 (pack_padded parity).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn


class LangModule(nn.Module):
    num_text_classes: int = 18
    emb_size: int = 300
    hidden_size: int = 256
    use_lang_classifier: bool = True
    use_bidir: bool = False

    def setup(self):
        self.gru_fwd = nn.GRUCell(self.hidden_size)
        if self.use_bidir:
            self.gru_bwd = nn.GRUCell(self.hidden_size)
        if self.use_lang_classifier:
            self.lang_cls = nn.Dense(self.num_text_classes)
            self.cls_dropout = nn.Dropout(0.5)

    def _run(self, cell, embs, masks):
        """embs (N, T, E), masks (N, T) -> (hiddens (N, T, H), last (N, H))."""
        n = embs.shape[0]

        def body(mdl, carry, xs):
            x, m = xs
            h_new, _ = cell(carry, x)
            h = jnp.where(m[:, None] > 0, h_new, carry)
            return h, h_new * m[:, None]

        init = jnp.zeros((n, self.hidden_size))
        last, hiddens = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(self, init, (embs, masks))
        return hiddens, last

    def __call__(self, word_embs, lang_len, deterministic: bool = True) -> Dict:
        """word_embs (N, T, E); lang_len (N,) -> dict with lang_hiddens
        (N, T, H), lang_emb (N, H), lang_masks (N, T), lang_scores."""
        n, t, _ = word_embs.shape
        masks = (jnp.arange(t)[None, :] < lang_len[:, None]).astype(word_embs.dtype)
        hiddens, last = self._run(self.gru_fwd, word_embs, masks)
        if self.use_bidir:
            rev = jnp.flip(word_embs, axis=1)
            rev_m = jnp.flip(masks, axis=1)
            h_b, last_b = self._run(self.gru_bwd, rev, rev_m)
            hiddens = (hiddens + jnp.flip(h_b, axis=1)) / 2
            last = (last + last_b) / 2
        out = {
            "lang_hiddens": hiddens,
            "lang_emb": last,
            "lang_masks": masks,
        }
        if self.use_lang_classifier:
            scores = self.lang_cls(last)
            scores = self.cls_dropout(scores, deterministic=deterministic)
            out["lang_scores"] = scores
        return out
