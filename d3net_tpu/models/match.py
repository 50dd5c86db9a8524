"""Grounding match module (parity: ``model/match_module.py``).

``TransformerMatchModule``: proposal features -> conv fuse -> visual
self-attention with a detached inverse-distance prior added to the logits
-> alternating (distance-weighted self-attn, vision<->language cross-attn)
x depth -> conv match head producing one confidence per proposal.

Includes the reference's train-time **object copy-paste augmentation**
(padded proposal slots filled with real objects from other scenes in the
batch, p=0.5, ``match_module.py:269-291``) — implemented with a fixed-shape
roll-based donor pool instead of the reference's per-scene Python loops.

``MatchModule`` is the simpler ScanRefer-style fuse head.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from d3net_tpu.models.transformer import MultiHeadAttention


class MatchModule(nn.Module):
    """ScanRefer-style matcher (ref ``MatchModule`` :11-141)."""

    hidden_size: int = 128
    lang_size: int = 256

    @nn.compact
    def __call__(self, feats, masks, lang_emb, deterministic: bool = True):
        # feats (N, P, F); lang_emb (N, L_hidden)
        n, p, _ = feats.shape
        fused = nn.Dense(self.hidden_size)(feats)
        lang = jnp.broadcast_to(lang_emb[:, None, :], (n, p, lang_emb.shape[-1]))
        h = jnp.concatenate([fused, lang], -1)
        h = nn.Dense(self.hidden_size)(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_size)(h)
        h = nn.relu(h)
        conf = nn.Dense(1)(h)[..., 0]
        return conf * masks


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, a * x)


class TransformerMatchModule(nn.Module):
    lang_size: int = 256
    hidden_size: int = 128
    head: int = 4
    depth: int = 2
    num_proposals: int = 128
    use_dist_weight_matrix: bool = True
    copy_paste_prob: float = 0.5

    def setup(self):
        self.feat_fc1 = nn.Dense(self.hidden_size)
        self.feat_bn = nn.BatchNorm(use_running_average=None, epsilon=1e-5,
                                    momentum=0.9)
        self.feat_prelu = PReLU()
        self.feat_fc2 = nn.Dense(self.hidden_size)

        self.lang_fc = nn.Dense(self.hidden_size)
        self.lang_dropout = nn.Dropout(0.1)
        self.lang_ln = nn.LayerNorm()
        self.lang_self_attn = MultiHeadAttention(
            self.hidden_size, 16, 16, self.head
        )
        self.self_attns = [
            MultiHeadAttention(
                self.hidden_size, self.hidden_size // self.head,
                self.hidden_size // self.head, self.head, name=f"self_attn_{i}"
            )
            for i in range(self.depth)
        ]
        self.cross_attns = [
            MultiHeadAttention(
                self.hidden_size, self.hidden_size // self.head,
                self.hidden_size // self.head, self.head, name=f"cross_attn_{i}"
            )
            for i in range(self.depth)
        ]
        self.match_fc1 = nn.Dense(self.hidden_size)
        self.match_bn1 = nn.BatchNorm(use_running_average=None, epsilon=1e-5,
                                      momentum=0.9)
        self.match_prelu1 = PReLU()
        self.match_fc2 = nn.Dense(self.hidden_size)
        self.match_bn2 = nn.BatchNorm(use_running_average=None, epsilon=1e-5,
                                      momentum=0.9)
        self.match_prelu2 = PReLU()
        self.match_fc3 = nn.Dense(1)

    # ------------------------------------------------------------------
    def _features_concat(self, feats, train: bool):
        h = self.feat_fc1(feats)
        h = self.feat_bn(h.reshape(-1, h.shape[-1]),
                         use_running_average=not train).reshape(h.shape)
        h = self.feat_prelu(h)
        return self.feat_fc2(h)

    def _dist_weights(self, centers):
        """Detached inverse-distance attention prior (ref :220-241)."""
        d = jnp.sqrt(((centers[:, None, :, :] - centers[:, :, None, :]) ** 2).sum(-1))
        w = 1.0 / (d + 1e-2)
        w = w / w.sum(axis=2, keepdims=True)[..., :]
        w = jnp.broadcast_to(w[:, None, :, :], (w.shape[0], self.head) + w.shape[1:])
        return jax.lax.stop_gradient(w)

    def _copy_paste(self, feats, masks, rng):
        """Fill padded slots with real objects from other scenes (p=0.5)."""
        b, p, c = feats.shape
        k_apply = jax.random.bernoulli(rng, self.copy_paste_prob)
        # donor pool: roll scenes by one so donors come from another scene
        donor_feats = jnp.roll(feats, 1, axis=0)
        donor_masks = jnp.roll(masks, 1, axis=0)
        # for each empty slot, pick a random valid donor slot
        g = jax.random.gumbel(jax.random.fold_in(rng, 1), (b, p, p))
        pick_logits = jnp.where(donor_masks[:, None, :] > 0, g, -jnp.inf)
        pick = jnp.argmax(pick_logits, axis=-1)  # (B, P) donor slot per slot
        donor = jnp.take_along_axis(donor_feats, pick[..., None], axis=1)
        has_donor = donor_masks.sum(-1, keepdims=True) > 0
        fill = jnp.where((masks[..., None] > 0) | ~has_donor[..., None], feats, donor)
        return jnp.where(k_apply, fill, feats)

    def multiplex_attention(self, v_features, l_features, l_masks, dist_weights,
                            train: bool):
        l = self.lang_fc(l_features)
        l = nn.relu(l)
        l = self.lang_dropout(l, deterministic=not train)
        l = self.lang_ln(l)
        l = self.lang_self_attn(l, l, l, key_mask=l_masks, deterministic=not train)
        v = self.cross_attns[0](v_features, l, l, key_mask=l_masks,
                                deterministic=not train)
        for i in range(1, self.depth):
            v = self.self_attns[i](v, v, v, attention_weights=dist_weights,
                                   way="add", deterministic=not train)
            v = self.cross_attns[i](v, l, l, key_mask=l_masks,
                                    deterministic=not train)
        h = self.match_fc1(v)
        h = self.match_bn1(h.reshape(-1, h.shape[-1]),
                           use_running_average=not train).reshape(h.shape)
        h = self.match_prelu1(h)
        h = self.match_fc2(h)
        h = self.match_bn2(h.reshape(-1, h.shape[-1]),
                           use_running_average=not train).reshape(h.shape)
        h = self.match_prelu2(h)
        return self.match_fc3(h)[..., 0]  # (N, P)

    # ------------------------------------------------------------------
    def __call__(self, data: Dict, chunk_size: int, train: bool = False,
                 rng=None) -> Dict:
        """Scene-level proposals + chunked descriptions -> confidences.

        data requires: proposal_feats_batched (B, P, F), proposal_batch_mask,
        proposal_center_batched, lang_hiddens (B*chunk, T, H), lang_masks.
        Returns cluster_ref (B*chunk, P).
        """
        feats = data["proposal_feats_batched"]
        masks = data["proposal_batch_mask"]
        centers = data["proposal_center_batched"]
        b, p, _ = feats.shape

        dist_weights = (
            self._dist_weights(centers) if self.use_dist_weight_matrix else None
        )
        way = "add" if self.use_dist_weight_matrix else "mul"

        h = self._features_concat(feats, train)
        h = self.self_attns[0](h, h, h, attention_weights=dist_weights, way=way,
                               deterministic=not train)
        if train and rng is not None:
            h = self._copy_paste(h, masks, rng)

        # expand scenes to chunk descriptions
        v = jnp.repeat(h, chunk_size, axis=0)
        dw = (
            jnp.repeat(dist_weights, chunk_size, axis=0)
            if dist_weights is not None
            else None
        )
        conf = self.multiplex_attention(
            v, data["lang_hiddens"], data["lang_masks"], dw, train
        )
        out = dict(data)
        out["cluster_ref"] = conf
        return out
