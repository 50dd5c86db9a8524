"""Top-down attention caption decoder (parity: ``model/caption_module.py``).

TPU-first redesign:
- the teacher-forcing loop, greedy decode, and beam search are all
  ``nn.scan`` over a fixed token horizon with eos/length masking — no
  Python-loop-over-timesteps, no ragged trim (the reference's
  ``trim_outputs`` becomes mask arithmetic);
- eval-mode captioning folds the proposal dimension into the batch (the
  reference loops ``for prop_id in range(128)`` running 128 sequential GRU
  rollouts per scene, ``caption_module.py:689-770``);
- beam search folds the beam dimension into the batch with ancestry
  backtracking via a reverse ``lax.scan``.

Semantics preserved, including the reference's attention-mask quirk
(`scores.masked_fill_(mask==0, 0)` then softmax over all proposals —
masked proposals still receive e^0 weight, ``caption_module.py:108-116``).

The GLoVE embedding matrix arrives via ``data["glove_embeddings"]`` (V, E)
so the decoder supports both hard token ids (gather) and the moderator's
differentiable soft one-hots (matmul), like the reference's
onehot @ embeddings (``caption_module.py:96-99``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from d3net_tpu.models.graph import query_locals
from d3net_tpu.utils.bbox import aabb_iou_corners
from d3net_tpu.utils.nn_distance import nn_distance

_NEG = -1e9


class CaptionModule(nn.Module):
    """Speaker caption head over batched proposals."""

    num_vocabs: int
    sos_id: int
    eos_id: int
    pad_id: int = 0
    emb_size: int = 300
    feat_size: int = 128
    hidden_size: int = 512
    num_proposals: int = 128
    num_locals: int = 10
    max_len: int = 30          # data.max_spk_len
    min_iou_threshold: float = 0.25
    use_relation: bool = True
    beam_group_size: int = 1       # diverse beam: groups of beam_size/g
    diversity_lambda: float = 0.5  # same-step word-repeat penalty

    def setup(self):
        self.map_topdown = nn.Dense(self.emb_size)
        self.cell_td = nn.GRUCell(self.hidden_size)
        self.map_feat = nn.Dense(self.hidden_size, use_bias=False)
        self.map_hidd = nn.Dense(self.hidden_size, use_bias=False)
        self.attend = nn.Dense(1, use_bias=False)
        self.map_lang = nn.Dense(self.emb_size)
        self.cell_lang = nn.GRUCell(self.hidden_size)
        self.cls_fc1 = nn.Dense(self.hidden_size)
        self.cls_fc2 = nn.Dense(self.num_vocabs)

    # ------------------------------------------------------------------
    def step(self, hiddens, word_emb, target_feat, obj_feats, valid_masks):
        """One recurrent step (ref ``step`` :72-133).

        hiddens: (h1, h2) each (N, H); word_emb (N, E); obj_feats (N, P, F);
        valid_masks (N, P).  Returns (logits (N, V), hiddens, attn (N, P)).
        """
        h1, h2 = hiddens
        x = self.map_topdown(jnp.concatenate([word_emb, h2, target_feat], -1))
        h1, _ = self.cell_td(h1, x)

        combined = self.map_feat(obj_feats) + self.map_hidd(h1)[:, None, :]
        scores = self.attend(jnp.tanh(combined))  # (N, P, 1)
        # reference quirk: masked scores are zeroed (not -inf) pre-softmax
        scores = jnp.where(valid_masks[..., None] > 0, scores, 0.0)
        attn = jax.nn.softmax(scores, axis=1)
        attended = (obj_feats * attn).sum(1)

        lx = self.map_lang(jnp.concatenate([attended, h1], -1))
        h2, _ = self.cell_lang(h2, lx)
        logits = self.cls_fc2(nn.relu(self.cls_fc1(h2)))
        return logits, (h1, h2), attn[..., 0]

    def _init_hiddens(self, n):
        z = jnp.zeros((n, self.hidden_size))
        return (z, z)

    # ------------------------------------------------------------------
    def teacher_forcing(self, word_ids, embeddings, target_feat, obj_feats,
                        valid_masks, use_tf: bool = True):
        """word_ids (N, T) -> logits (N, T-1, V) (ref TF loop :636-667)."""
        n, t = word_ids.shape

        def body(mdl, carry, word_in):
            hiddens, prev_pred = carry
            ids = word_in if use_tf else prev_pred
            logits, hiddens, _ = mdl.step(
                hiddens, embeddings[ids], target_feat, obj_feats, valid_masks
            )
            return (hiddens, jnp.argmax(logits, -1).astype(jnp.int32)), logits

        init = (self._init_hiddens(n), word_ids[:, 0].astype(jnp.int32))
        _, logits = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(self, init, word_ids[:, : t - 1])
        return logits

    def greedy_decode(self, embeddings, target_feat, obj_feats, valid_masks,
                      max_len: Optional[int] = None):
        """Greedy rollout from sos -> (ids (N, T), logits (N, T, V))."""
        n = target_feat.shape[0]
        t = (max_len or self.max_len) + 1

        def body(mdl, carry, _):
            hiddens, ids = carry
            logits, hiddens, _ = mdl.step(
                hiddens, embeddings[ids], target_feat, obj_feats, valid_masks
            )
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (hiddens, nxt), (nxt, logits)

        init = (self._init_hiddens(n), jnp.full((n,), self.sos_id, jnp.int32))
        _, (ids, logits) = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            length=t,
        )(self, init, None)
        return ids, logits

    def beam_decode(self, embeddings, target_feat, obj_feats, valid_masks,
                    beam_size: int, max_len: Optional[int] = None,
                    group_size: int = 1, diversity_lambda: float = 0.5):
        """(Diverse) beam search with the beam dim folded into the batch.

        ``beam_size`` splits into ``group_size`` groups of ``bdash`` beams.
        At every step, group g's log-probs are penalized by
        ``diversity_lambda x count`` of each word already selected by groups
        < g at the *same* step — the same-local-time penalty of diverse beam
        search (reference ``add_diversity``, ``caption_module.py:139-156``,
        adapted from self-critical.pytorch), realized without the
        reference's group time-stagger: a static Python loop over groups
        inside one scan step gives each group the earlier groups' current
        choices directly.

        This is EQUIVALENT to the reference's staggered schedule, not an
        approximation: in the reference, group g at global time t executes
        local step tau = t - g and is penalized by the words groups < g
        chose at the same LOCAL tau (``add_diversity`` indexes
        ``beam_seq_table[prev][:, :, local_time]``).  By induction over
        (g, tau), group g's decision at tau depends only on its own state
        at tau-1 and on groups < g's decisions at tau — the stagger merely
        schedules those dependencies across global steps for sequential
        execution, while the in-step group loop satisfies them directly,
        so both schemes compute the identical selections
        (tests/test_speaker_listener.py::test_diverse_beam_matches_staggered
        _reference_schedule pins this on a toy decoder).

        Selection uses the augmented scores; the recorded per-step logps
        are unaugmented (what the RL policy gradient needs, ref ``:614``).
        group_size=1 == standard beam search.

        Returns (seqs (N, beam, T), logps (N, beam, T), scores (N, beam)),
        groups concatenated in order, each sorted best-first (matching the
        reference's done_beams ordering).  Finished beams are frozen on pad
        with 0 logp (mask arithmetic replaces the ragged ``done_beams``
        lists).
        """
        n = target_feat.shape[0]
        t = (max_len or self.max_len) + 1
        bm = beam_size
        g_n = max(1, int(group_size))
        assert bm % g_n == 0, "beam_size must be divisible by group_size"
        bd = bm // g_n
        v = self.num_vocabs

        tf_b = jnp.repeat(target_feat, bm, axis=0)
        of_b = jnp.repeat(obj_feats, bm, axis=0)
        vm_b = jnp.repeat(valid_masks, bm, axis=0)

        def body(mdl, carry, _):
            hiddens, last_ids, scores, done = carry
            logits, new_hiddens, _ = mdl.step(
                hiddens, embeddings[last_ids.reshape(-1)], tf_b, of_b, vm_b
            )
            logp_all = jax.nn.log_softmax(logits, -1).reshape(n, g_n, bd, v)
            done_g = done.reshape(n, g_n, bd)
            scores_g = scores.reshape(n, g_n, bd)
            pad_only = jnp.full((n, bd, v), _NEG).at[:, :, mdl.pad_id].set(0.0)

            counts = jnp.zeros((n, v))
            words, srcs_glob, step_lps, new_scores, new_done = [], [], [], [], []
            for g in range(g_n):  # static loop: groups see earlier groups
                lp_un = jnp.where(done_g[:, g, :, None], pad_only,
                                  logp_all[:, g])
                if g > 0:
                    lp_aug = jnp.where(
                        done_g[:, g, :, None], lp_un,
                        lp_un - diversity_lambda * counts[:, None, :])
                else:
                    lp_aug = lp_un
                cand = (scores_g[:, g][:, :, None] + lp_aug).reshape(n, bd * v)
                top_scores, top_idx = jax.lax.top_k(cand, bd)
                src = (top_idx // v).astype(jnp.int32)
                word = (top_idx % v).astype(jnp.int32)
                step_lp = jnp.take_along_axis(
                    lp_un.reshape(n, bd * v), top_idx, axis=1)
                dg = jnp.take_along_axis(done_g[:, g], src, axis=1) | (
                    word == mdl.eos_id)
                counts = counts + jax.nn.one_hot(word, v).sum(1)
                words.append(word)
                srcs_glob.append(src + g * bd)
                step_lps.append(step_lp)
                new_scores.append(top_scores)
                new_done.append(dg)

            word = jnp.concatenate(words, axis=1)
            beam_src = jnp.concatenate(srcs_glob, axis=1)
            step_logp = jnp.concatenate(step_lps, axis=1)
            top_scores = jnp.concatenate(new_scores, axis=1)
            done = jnp.concatenate(new_done, axis=1)
            gidx = (jnp.arange(n)[:, None] * bm + beam_src).reshape(-1)
            h1, h2 = new_hiddens
            hiddens = (h1[gidx], h2[gidx])
            return (hiddens, word, top_scores, done), (word, step_logp, beam_src)

        init_scores = jnp.full((n, g_n, bd), _NEG).at[:, :, 0].set(0.0)
        init = (
            self._init_hiddens(n * bm),
            jnp.full((n, bm), self.sos_id, jnp.int32),
            init_scores.reshape(n, bm),
            jnp.zeros((n, bm), bool),
        )
        carry, (words, logps, srcs) = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            length=t,
        )(self, init, None)
        final_scores = carry[2]

        def backtrack(w, lp, s):
            # (T, bm) time-major per sample -> (bm, T) sequences
            def bt(ptr, xs):
                wt, lt, st = xs
                return st[ptr], (wt[ptr], lt[ptr])

            _, (seq_r, lp_r) = jax.lax.scan(
                bt, jnp.arange(bm), (w[::-1], lp[::-1], s[::-1])
            )
            return seq_r[::-1].T, lp_r[::-1].T

        # scan emitted (N, T, bm); vmap over samples with time-major slices
        seqs, lps = jax.vmap(backtrack)(words, logps, srcs)
        return seqs, lps, final_scores

    # ------------------------------------------------------------------
    def select_target(self, rng, obj_masks, centers, corners, center_labels,
                      corner_labels, ref_corner_label, is_annotated):
        """Vectorized ``select_target`` (ref :416-508): annotated entries
        take the max-IoU proposal vs the referred GT box; unannotated take a
        random valid proposal with a nearest-GT assignment."""
        n, p = obj_masks.shape
        iou_ann = aabb_iou_corners(corners, ref_corner_label[:, None, :, :])
        ann_id = jnp.argmax(iou_ann, axis=1).astype(jnp.int32)
        ann_iou = jnp.max(iou_ann, axis=1)

        g = jax.random.gumbel(rng, (n, p))
        rand_id = jnp.argmax(jnp.where(obj_masks > 0, g, -jnp.inf), axis=1)
        any_valid = obj_masks.sum(1) > 0
        rand_id = jnp.where(any_valid, rand_id, jnp.argmax(g, axis=1)).astype(jnp.int32)
        _, assign, _, _ = nn_distance(centers, center_labels)
        rand_assigned = jnp.take_along_axis(assign, rand_id[:, None], axis=1)[:, 0]
        rand_corner = jnp.take_along_axis(
            corners, rand_id[:, None, None, None], axis=1
        )[:, 0]
        rand_gt = jnp.take_along_axis(
            corner_labels, rand_assigned[:, None, None, None], axis=1
        )[:, 0]
        rand_iou = aabb_iou_corners(rand_corner, rand_gt)

        ann = is_annotated > 0
        target_id = jnp.where(ann, ann_id, rand_id)
        target_iou = jnp.where(ann, ann_iou, rand_iou)
        return target_id, target_iou, rand_assigned.astype(jnp.int32)

    def add_relation_feat(self, edge_feature, local_ids, local_mask, obj_feats,
                          target_ids):
        """Scatter the target's edge features onto its local objects and add
        (ref ``_add_relation_feat`` :866-885)."""
        rel = jnp.take_along_axis(
            edge_feature, target_ids[:, None, None, None], axis=1
        )[:, 0]                                          # (N, L, C)
        ids = jnp.take_along_axis(local_ids, target_ids[:, None, None], axis=1)[:, 0]
        msk = jnp.take_along_axis(local_mask, target_ids[:, None, None], axis=1)[:, 0]
        scattered = jax.vmap(lambda i, r, m: jnp.zeros_like(obj_feats[0]).at[i].add(
            r * m[:, None]
        ))(ids, rel, msk)
        return obj_feats + scattered

    # ------------------------------------------------------------------
    def __call__(self, data: Dict[str, Any], mode: str = "tf",
                 rng=None, beam_size: int = 1, sample_topn: int = 1) -> Dict[str, Any]:
        """mode: 'tf' teacher forcing | 'free' free-running | 'eval'
        (caption every proposal greedily) | 'rl' (beam sample + baseline)."""
        embeddings = data["glove_embeddings"]       # (V, E)
        obj_feats = data["bbox_feature"]            # (N, P, F)
        obj_masks = data["proposal_batch_mask"]     # (N, P)
        corners = data["proposal_bbox_batched"]     # (N, P, 8, 3)
        centers = (corners.min(2) + corners.max(2)) * 0.5

        out = dict(data)
        if mode == "eval":
            b, p, f = obj_feats.shape
            rep = lambda x: jnp.repeat(x, p, axis=0)
            tgt_ids = jnp.tile(jnp.arange(p, dtype=jnp.int32), b)
            of, om, oc = rep(obj_feats), rep(obj_masks), rep(corners)
            target_feats = of[jnp.arange(b * p), tgt_ids]
            vm = (
                om
                if self.num_locals == -1
                else query_locals(oc, (oc.min(2) + oc.max(2)) * 0.5, tgt_ids,
                                  om, self.num_locals)
            )
            if self.use_relation:
                of = self.add_relation_feat(
                    rep(data["edge_feature"]), rep(data["local_ids"]),
                    rep(data["local_mask"]), of, tgt_ids,
                )
            ids, _ = self.greedy_decode(embeddings, target_feats, of, vm)
            out["lang_cap"] = ids.reshape(b, p, -1)
            return out

        # description-level modes: leading dim = B*chunk descriptions
        word_ids = data["lang_ids"]                      # (N, T)
        is_annotated = data["annotated"]                 # (N,)
        ref_corner_label = data["ref_box_corner_label"]  # (N, 8, 3)
        center_labels = data["center_label_chunk"]       # (N, I, 3)
        corner_labels = data["gt_bbox_chunk"]            # (N, I, 8, 3)

        if "target_ids_in" in data:
            # two-phase RL phase B: reuse phase A's selection verbatim so the
            # teacher-forced logps correspond exactly to the host-scored
            # captions (no cross-program determinism assumption)
            target_ids = data["target_ids_in"]
            target_ious = data["target_ious_in"]
            assigned = jnp.zeros_like(target_ids)
        else:
            target_ids, target_ious, assigned = self.select_target(
                rng, obj_masks, centers, corners, center_labels, corner_labels,
                ref_corner_label, is_annotated,
            )
        n = target_ids.shape[0]
        target_feats = obj_feats[jnp.arange(n), target_ids]
        vm = (
            obj_masks
            if self.num_locals == -1
            else query_locals(corners, centers, target_ids, obj_masks,
                              self.num_locals)
        )
        if self.use_relation:
            obj_feats = self.add_relation_feat(
                data["edge_feature"], data["local_ids"], data["local_mask"],
                obj_feats, target_ids,
            )

        out["target_ids"] = target_ids
        out["target_ious"] = target_ious
        out["assigned_bbox_id_labels"] = assigned
        out["good_bbox_masks"] = target_ious > self.min_iou_threshold

        if mode in ("tf", "free"):
            logits = self.teacher_forcing(
                word_ids, embeddings, target_feats, obj_feats, vm,
                use_tf=(mode == "tf"),
            )
            out["lang_cap"] = logits                     # (N, T-1, V)
        elif mode == "rl":
            seqs, lps, _ = self.beam_decode(
                embeddings, target_feats, obj_feats, vm, beam_size,
                group_size=self.beam_group_size,
                diversity_lambda=self.diversity_lambda,
            )
            out["sampled_cap"] = seqs[:, :sample_topn]   # (N, topn, T)
            out["sampled_logps"] = lps[:, :sample_topn]
            base_ids, _ = self.greedy_decode(
                embeddings, target_feats, obj_feats, vm, self.max_len + 1
            )
            out["baseline_cap"] = base_ids               # (N, T)
        elif mode == "rl_tf":
            # two-phase RL phase B: teacher-force the phase-A rollout.
            # Recomputes the sampled tokens' log-probs under grad without
            # re-running beam search (halves the speaker-stream cost) and is
            # exact by construction: logp(token | prefix) of given ids is the
            # same computation the beam recorded, so no bitwise re-sampling
            # assumption remains.
            sampled = data["sampled_cap_in"]             # (N, topn, T)
            n2, topn, t = sampled.shape
            rep = lambda x: jnp.repeat(x, topn, axis=0)
            flat = sampled.reshape(n2 * topn, t)
            # prepend sos: teacher_forcing consumes full[:, :T] and predicts
            # full[:, 1:] == the rollout tokens
            full = jnp.concatenate(
                [jnp.full((n2 * topn, 1), self.sos_id, flat.dtype), flat], -1
            )
            logits = self.teacher_forcing(
                full, embeddings, rep(target_feats), rep(obj_feats), rep(vm)
            )                                            # (N*topn, T, V)
            lp = jax.nn.log_softmax(logits, -1)
            step_lp = jnp.take_along_axis(lp, flat[..., None], -1)[..., 0]
            # beam semantics: finished beams emit pad with logp 0 — zero
            # every position strictly after the first eos
            after_eos = jnp.cumsum((flat == self.eos_id).astype(jnp.int32),
                                   axis=-1) - (flat == self.eos_id)
            step_lp = jnp.where(after_eos > 0, 0.0, step_lp)
            out["sampled_cap"] = sampled
            out["sampled_logps"] = step_lp.reshape(n2, topn, t)
            out["baseline_cap"] = data["baseline_cap_in"]
        else:
            raise ValueError(mode)
        return out
