"""PipelineNet: detector -> speaker -> listener (parity: ``model/pipeline.py``).

One Flax module holding the three submodules so parameters nest as
{detector, speaker, listener} — the same layout the reference's
``prepare_weights.py`` dumps for the stage-wise curriculum, enabling
per-submodule loading/freezing.

Modes (``_get_current_mode`` :91-123):
    0 detector | 1 det->speaker | 2 det->listener | 3 det->speaker->listener
    (RL) | 4/5/6 GT-proposal variants (speaker/listener on GT boxes).

The moderator (:759-892) converts speaker samples into listener inputs with
fixed-shape mask arithmetic: prepend sos, force eos where missing, derive
lengths, embed via the GLoVE matrix, and build pseudo-GT boxes from the
speaker's *target proposals* (the reference gathers proposals at GT-object
indices — a space-mixing quirk; we use the proposal the speaker actually
described, which is the semantically intended pseudo-GT).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from d3net_tpu.models.listener import ListenerNet
from d3net_tpu.models.pointgroup import PointGroup
from d3net_tpu.models.speaker import SpeakerNet


def moderate_captions(ids, sos_id: int, eos_id: int, pad_id: int, max_len: int):
    """Speaker output ids (..., T) -> listener input ids (..., T+1) + lens.

    Prepends sos; forces eos at the last slot when absent; zeroes tokens
    after the first eos. Fixed-shape equivalent of ref ``moderator`` padding.
    """
    t = ids.shape[-1]
    out = jnp.concatenate(
        [jnp.full(ids.shape[:-1] + (1,), sos_id, ids.dtype), ids], axis=-1
    )
    has_eos = jnp.any(out == eos_id, axis=-1, keepdims=True)
    # force eos at the final slot when the rollout never emitted one
    out = out.at[..., -1].set(
        jnp.where(has_eos[..., 0], out[..., -1], eos_id)
    )
    pos = jnp.arange(out.shape[-1])
    is_eos = out == eos_id
    first_eos = jnp.argmax(is_eos, axis=-1)
    keep = pos <= first_eos[..., None]
    out = jnp.where(keep, out, pad_id)
    lens = first_eos + 1  # sos..eos inclusive
    return out[..., : max_len], jnp.minimum(lens, max_len)


class PipelineNet(nn.Module):
    # detector config
    detector_cfg: Dict[str, Any]
    # speaker/listener config
    num_vocabs: int = 44
    sos_id: int = 2
    eos_id: int = 3
    pad_id: int = 0
    num_graph_steps: int = 2
    num_locals: int = 10
    max_spk_len: int = 30
    min_iou_threshold: float = 0.25
    use_relation: bool = True
    use_orientation: bool = True
    use_lang_classifier: bool = True
    use_bidir: bool = False
    match_type: str = "Transformer"
    num_text_classes: int = 18
    no_detection: bool = False
    no_captioning: bool = False
    no_grounding: bool = False
    beam_group_size: int = 1       # diverse-beam groups for the RL sampler
    diversity_lambda: float = 0.5

    def setup(self):
        self.detector = PointGroup(**self.detector_cfg)
        if not self.no_captioning:
            self.speaker = SpeakerNet(
                num_vocabs=self.num_vocabs,
                sos_id=self.sos_id,
                eos_id=self.eos_id,
                pad_id=self.pad_id,
                m=self.detector_cfg.get("m", 16),
                num_graph_steps=self.num_graph_steps,
                num_locals=self.num_locals,
                num_proposals=self.detector_cfg.get("max_num_proposal", 128),
                max_len=self.max_spk_len,
                min_iou_threshold=self.min_iou_threshold,
                use_relation=self.use_relation,
                use_orientation=self.use_orientation,
                beam_group_size=self.beam_group_size,
                diversity_lambda=self.diversity_lambda,
            )
        if not self.no_grounding:
            self.listener = ListenerNet(
                num_text_classes=self.num_text_classes,
                match_type=self.match_type,
                use_lang_classifier=self.use_lang_classifier,
                use_bidir=self.use_bidir,
                num_proposals=self.detector_cfg.get("max_num_proposal", 128),
            )

    # -- submodule entry points (used via apply(..., method=...)) ---------
    def run_detector(self, batch, train: bool = False, do_clustering: bool = True):
        return self.detector(batch, train=train, do_clustering=do_clustering)

    def run_speaker(self, data, mode: str = "tf", rng=None, chunk_size: int = 1,
                    beam_size: int = 1, sample_topn: int = 1):
        return self.speaker(data, mode=mode, rng=rng, chunk_size=chunk_size,
                            beam_size=beam_size, sample_topn=sample_topn)

    def run_listener(self, data, word_embs, lang_len, chunk_size: int,
                     train: bool = False, rng=None):
        return self.listener(data, word_embs, lang_len, chunk_size=chunk_size,
                             train=train, rng=rng)

    def moderator(self, data, sample_topn: int):
        """Speaker RL outputs -> listener inputs + pseudo-GT (ref :759-892)."""
        emb = data["glove_embeddings"]
        max_t = self.max_spk_len + 2
        s_ids, s_lens = moderate_captions(
            data["sampled_cap"], self.sos_id, self.eos_id, self.pad_id, max_t
        )  # (N, topn, T')
        b_ids, b_lens = moderate_captions(
            data["baseline_cap"][:, None, :].repeat(sample_topn, 1),
            self.sos_id, self.eos_id, self.pad_id, max_t,
        )
        out = dict(data)
        # fold topn into rows: (N*topn, T')
        fold = lambda x: x.reshape((-1,) + x.shape[2:])
        out["mod_sampled_ids"] = fold(s_ids)
        out["mod_sampled_lens"] = fold(s_lens)
        out["mod_sampled_embs"] = emb[fold(s_ids)]
        out["mod_baseline_ids"] = fold(b_ids)
        out["mod_baseline_lens"] = fold(b_lens)
        out["mod_baseline_embs"] = emb[fold(b_ids)]

        # pseudo-GT from the speaker's target proposals
        n = data["target_ids"].shape[0]
        tgt = data["target_ids"]
        corners = data["proposal_bbox_batched"]      # (N, P, 8, 3) (expanded)
        sems = data["proposal_sem_cls_batched_rows"] # (N, P)
        ref_corner = jnp.take_along_axis(
            corners, tgt[:, None, None, None], axis=1
        )[:, 0]
        ref_sem = jnp.take_along_axis(sems, tgt[:, None], axis=1)[:, 0]
        ref_cat = ref_sem - 2
        ref_cat = jnp.where(ref_cat < 0, 17, ref_cat)
        rep = lambda x: jnp.repeat(x, sample_topn, axis=0)
        out["mod_ref_box_corner_label"] = rep(ref_corner)
        out["mod_ref_cat_label"] = rep(ref_cat.astype(jnp.int32))
        return out

    # -- full forward used for parameter init -----------------------------
    def __call__(self, batch, lang_data: Optional[Dict] = None,
                 train: bool = False, chunk_size: int = 1):
        out = self.detector(batch, train=train)
        if lang_data is None:
            return out
        data = {**out, **lang_data}
        if "center_label" in batch:
            from d3net_tpu.utils.bbox import box_corners

            rep = lambda x: jnp.repeat(x, chunk_size, axis=0)
            data["center_label_chunk"] = rep(batch["center_label"])
            data["gt_bbox_chunk"] = rep(
                box_corners(batch["center_label"], batch["size_label"])
            )
            data["proposal_bbox_rows"] = rep(out["proposal_bbox_batched"])
            data["proposal_sem_cls_batched_rows"] = rep(
                out["proposal_sem_cls_batched"]
            )
        spk_data = data
        if not self.no_captioning:
            # speaker expands scene-level keys to description rows in its own
            # copy; keep the scene-level dict intact for the listener
            spk_data = self.speaker(
                dict(data), mode="tf",
                rng=self.make_rng("target_sampling") if train else jax.random.key(0),
                chunk_size=chunk_size,
            )
        if not self.no_grounding:
            emb = lang_data["glove_embeddings"]
            word_embs = emb[lang_data["lang_ids"]]
            lis_data = self.listener(
                data, word_embs, lang_data["lang_len"], chunk_size=chunk_size,
                train=train, rng=self.make_rng("copy_paste") if train else None,
            )
            spk_data = {**spk_data, **{k: v for k, v in lis_data.items()
                                       if k not in spk_data}}
            spk_data["cluster_ref"] = lis_data["cluster_ref"]
        return spk_data
