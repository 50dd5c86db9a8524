"""ListenerNet: language encoder + match module (parity: ``model/listener.py``)."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from d3net_tpu.models.lang import LangModule
from d3net_tpu.models.match import MatchModule, TransformerMatchModule


class ListenerNet(nn.Module):
    num_text_classes: int = 18
    lang_hidden: int = 256
    match_hidden: int = 128
    match_type: str = "Transformer"
    use_lang_classifier: bool = True
    use_bidir: bool = False
    num_proposals: int = 128

    def setup(self):
        self.lang = LangModule(
            num_text_classes=self.num_text_classes,
            hidden_size=self.lang_hidden,
            use_lang_classifier=self.use_lang_classifier,
            use_bidir=self.use_bidir,
        )
        if self.match_type == "Transformer":
            self.match = TransformerMatchModule(
                lang_size=self.lang_hidden,
                hidden_size=self.match_hidden,
                num_proposals=self.num_proposals,
            )
        elif self.match_type == "ScanRefer":
            self.match = MatchModule(
                hidden_size=self.match_hidden, lang_size=self.lang_hidden
            )
        else:
            raise ValueError(self.match_type)

    def __call__(self, data: Dict[str, Any], word_embs, lang_len,
                 chunk_size: int, train: bool = False, rng=None) -> Dict[str, Any]:
        """word_embs (B*chunk, T, E); lang_len (B*chunk,)."""
        lang_out = self.lang(word_embs, lang_len, deterministic=not train)
        data = dict(data)
        data.update(lang_out)
        if self.match_type == "Transformer":
            data = self.match(data, chunk_size=chunk_size, train=train, rng=rng)
        else:
            feats = jnp.repeat(data["proposal_feats_batched"], chunk_size, axis=0)
            masks = jnp.repeat(data["proposal_batch_mask"], chunk_size, axis=0)
            data["cluster_ref"] = self.match(
                feats, masks, lang_out["lang_emb"], deterministic=not train
            )
        return data
