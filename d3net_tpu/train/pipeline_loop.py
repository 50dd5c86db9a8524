"""Pipeline training: detector->speaker / ->listener / joint RL.

Parity: ``PipelineNet.training_step`` modes 1-3 (``model/pipeline.py:
138-455``), ``validation_step``/``validation_epoch_end`` (:457-735), module
freezing and stage-wise pretrained loading (``scripts/train.py:288-326``).

The RL step reproduces the self-critical objective
(``lib/captioning/loss_helper.py:98-224``): CIDEr(sampled)-CIDEr(baseline)
computed on host through ``jax.experimental.io_callback`` + detached
listener loss deltas as reward, policy loss = -reward * sum logprob over
good boxes; the sampled listener losses additionally train the listener.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import io_callback
import numpy as np
import optax

from d3net_tpu.config import Config, save as save_cfg
from d3net_tpu.data.dataset import BatchIterator, SyntheticScenes
from d3net_tpu.data.language import NYU20_NAMES, base_corpus, build_lang_batch
from d3net_tpu.data.vocab import Vocabulary, embedding_matrix
from d3net_tpu.eval.caption_eval import CaptionEvaluator, decode_captions
from d3net_tpu.eval.grounding_eval import GroundingEvaluator
from d3net_tpu.eval import capeval
from d3net_tpu.models.pipeline import PipelineNet
from d3net_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from d3net_tpu.train.loop import Checkpointer, MetricLogger, make_dataloaders, \
    spec_from_cfg
from d3net_tpu.train.losses import detector_loss
from d3net_tpu.train.losses_slt import (
    caption_loss,
    grounding_loss,
    lang_cls_loss,
    orientation_loss,
)
from d3net_tpu.train.trainer import TrainState, make_optimizer
from d3net_tpu.utils.bbox import box_corners


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def detector_cfg_dict(cfg: Config) -> Dict[str, Any]:
    return dict(
        m=cfg.model.m,
        classes=cfg.data.classes,
        blocks=tuple(cfg.model.blocks),
        cluster_blocks=tuple(cfg.model.cluster_blocks),
        block_reps=cfg.model.block_reps,
        block_residual=cfg.model.block_residual,
        use_coords=cfg.model.use_coords,
        max_num_proposal=cfg.model.max_num_proposal,
        cluster_radius=cfg.cluster.cluster_radius,
        cluster_cell_size=cfg.tpu.cluster_cell_size,
        cluster_ring=cfg.tpu.cluster_ring,
        cluster_npoint_thre=cfg.cluster.cluster_npoint_thre,
        cluster_prop_iters=cfg.tpu.cluster_prop_iters,
        clusters_per_pass=cfg.tpu.clusters_per_pass,
        score_fullscale=cfg.train.score_fullscale,
        score_scale=cfg.train.score_scale,
        test_score_thresh=cfg.test.TEST_SCORE_THRESH,
        test_npoint_thresh=cfg.test.TEST_NPOINT_THRESH,
        requires_gt_mask=bool(cfg.data.get("requires_gt_mask", False)),
        compute_dtype=cfg.tpu.get("activation_dtype"),
    )


def pipeline_from_cfg(cfg: Config, vocab: Vocabulary) -> PipelineNet:
    return PipelineNet(
        detector_cfg=detector_cfg_dict(cfg),
        num_vocabs=len(vocab),
        sos_id=vocab.sos_id,
        eos_id=vocab.eos_id,
        pad_id=vocab.pad_id,
        num_graph_steps=cfg.model.num_graph_steps,
        num_locals=cfg.model.num_locals,
        max_spk_len=cfg.data.max_spk_len,
        min_iou_threshold=cfg.data.min_iou_threshold,
        use_relation=cfg.model.use_relation,
        use_orientation=cfg.model.use_orientation,
        use_lang_classifier=cfg.model.use_lang_classifier,
        use_bidir=cfg.model.use_bidir,
        match_type=cfg.model.match_type,
        num_text_classes=cfg.model.num_bbox_class,
        no_captioning=bool(cfg.model.no_captioning),
        no_grounding=bool(cfg.model.no_grounding),
        beam_group_size=int(cfg.train.get("beam_group_size", 1) or 1),
        diversity_lambda=float(cfg.train.get("diversity_lambda", 0.5)),
    )


def lang_rows(lang_np: Dict[str, np.ndarray], emb: np.ndarray) -> Dict[str, jnp.ndarray]:
    """(B, C, ...) host lang batch -> flattened (B*C, ...) device dict."""
    out = {}
    for k, v in lang_np.items():
        a = jnp.asarray(v)
        out[k] = a.reshape((-1,) + a.shape[2:])
    out["glove_embeddings"] = jnp.asarray(emb)
    return out


def expand_rows(det_out: Dict, batch: Dict, chunk_size: int) -> Dict:
    """Scene-level labels -> description rows for speaker/listener losses."""
    rep = lambda x: jnp.repeat(x, chunk_size, axis=0)
    add = {
        "center_label_chunk": rep(batch["center_label"]),
        "gt_bbox_chunk": rep(box_corners(batch["center_label"], batch["size_label"])),
        "proposal_bbox_rows": rep(det_out["proposal_bbox_batched"]),
        "proposal_sem_cls_batched_rows": rep(det_out["proposal_sem_cls_batched"]),
    }
    return add


_RNGS = ("cluster_jitter", "proposal_shuffle", "target_sampling", "copy_paste",
         "dropout")


def _rngs(rng, state_step):
    base = jax.random.fold_in(rng, state_step)
    keys = jax.random.split(base, len(_RNGS))
    return dict(zip(_RNGS, keys))


# ---------------------------------------------------------------------------
# train steps (one per pipeline mode)
# ---------------------------------------------------------------------------

def speaker_train_step(model, rotations_available, state, batch, lang, rng,
                       chunk_size: int, det_weight=(1.0, 1.0, 1.0, 1.0)):
    """Mode 1: det -> speaker XE (+0.1 orientation) (ref :152-191)."""
    rngs = _rngs(rng, state.step)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        out, mut = model.apply(
            variables, batch, train=True, method=PipelineNet.run_detector,
            rngs=rngs, mutable=["batch_stats"],
        )
        det_losses = detector_loss(out, batch, loss_weight=det_weight)
        data = {**out, **lang, **expand_rows(out, batch, chunk_size)}
        data, mut2 = model.apply(
            {"params": params, "batch_stats": mut["batch_stats"]},
            data, mode="tf", rng=rngs["target_sampling"], chunk_size=chunk_size,
            method=PipelineNet.run_speaker, rngs=rngs, mutable=["batch_stats"],
        )
        cap_l, cap_acc = caption_loss(
            data["lang_cap"], lang["lang_ids"],
            data["good_bbox_masks"] & (lang["annotated"] > 0),
            pad_id=model.pad_id,
        )
        if model.use_orientation and "scene_object_rotations" in batch:
            ori_l, ori_acc = orientation_loss(
                data["edge_orientations"], data["local_ids"], data["local_mask"],
                out["object_assignment"], batch["scene_object_rotations"],
                batch["scene_object_rotation_masks"],
            )
        else:
            ori_l = jnp.zeros(())
            ori_acc = jnp.zeros(())
        total = det_losses["total_loss"] + cap_l + 0.1 * ori_l
        metrics = {
            "detect_loss": det_losses["total_loss"],
            "captioning_loss": cap_l,
            "orientation_loss": ori_l,
            "cap_acc": cap_acc,
            "ori_acc": ori_acc,
            "pred_ious": (data["target_ious"] * lang["annotated"]).sum()
            / jnp.maximum(lang["annotated"].sum(), 1.0),
            "loss": total,
        }
        return total, (metrics, mut2["batch_stats"])

    (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    return state.apply_gradients(grads, new_bs), metrics


def listener_train_step(model, state, batch, lang, rng, chunk_size: int,
                        det_weight=(1.0, 1.0, 1.0, 1.0),
                        loss_type: str = "cross_entropy"):
    """Mode 2: det -> listener XE grounding (ref :193-226)."""
    rngs = _rngs(rng, state.step)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        out, mut = model.apply(
            variables, batch, train=True, method=PipelineNet.run_detector,
            rngs=rngs, mutable=["batch_stats"],
        )
        det_losses = detector_loss(out, batch, loss_weight=det_weight)
        data = {**out, **lang}
        emb = lang["glove_embeddings"]
        word_embs = emb[lang["lang_ids"]]
        data, mut2 = model.apply(
            {"params": params, "batch_stats": mut["batch_stats"]},
            data, word_embs, lang["lang_len"], chunk_size, True,
            rngs["copy_paste"], method=PipelineNet.run_listener,
            rngs=rngs, mutable=["batch_stats"],
        )
        extra = expand_rows(out, batch, chunk_size)
        ref_l, ref_m = grounding_loss(
            data["cluster_ref"], extra["proposal_bbox_rows"],
            lang["ref_box_corner_label"], lang["annotated"],
            loss_type=loss_type,
        )
        lang_l, lang_acc = lang_cls_loss(
            data["lang_scores"], lang["ref_cat_label"], lang["annotated"]
        )
        total = det_losses["total_loss"] + ref_l + lang_l
        metrics = {
            "detect_loss": det_losses["total_loss"],
            "grounding_loss": ref_l,
            "lobjcls_loss": lang_l,
            "lang_acc": lang_acc,
            "loss": total,
            **ref_m,
        }
        return total, (metrics, mut2["batch_stats"])

    (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    return state.apply_gradients(grads, new_bs), metrics


def make_caption_reward_fn(vocab: Vocabulary, caption_weight: float = 1.0,
                           bleu_weight: float = 0.0):
    """Host callback: decoded CIDEr(+BLEU) of candidate ids vs GT ref ids
    (ref ``compute_caption_reward`` :15-96).

    ``gt_ids`` may be (N, T) — one reference per row — or (N, R, T):
    every annotation of the target object, matching the reference's
    ``organized_data[scene][object]`` reward corpus (all-zero rows are
    padding)."""

    def host_fn(cand_ids: np.ndarray, gt_ids: np.ndarray,
                annotated: np.ndarray) -> np.ndarray:
        cand_ids = np.asarray(cand_ids)
        gt_ids = np.asarray(gt_ids)
        n = cand_ids.shape[0]
        gts, cands, keys = {}, {}, []
        for i in range(n):
            if annotated[i] <= 0:
                continue
            key = str(i)
            rows = gt_ids[i] if gt_ids.ndim == 3 else gt_ids[i][None]
            refs = []
            for row in rows:
                if not row.any():
                    continue
                s = " ".join(vocab.decode(row, stop_at_eos=True) + ["eos"])
                if s not in refs:
                    refs.append(s)
            if not refs:
                continue
            gts[key] = refs
            toks = vocab.decode(cand_ids[i], stop_at_eos=True) + ["eos"]
            cands[key] = [" ".join(toks)]
            keys.append(i)
        scores = np.zeros(n, np.float32)
        if keys:
            _, cider = capeval.Cider().compute_score(gts, cands)
            vals = np.asarray(cider, np.float32)
            if bleu_weight:
                _, per_n = capeval.bleu(gts, cands, 4)
                vals = caption_weight * vals + bleu_weight * np.asarray(
                    per_n[3], np.float32
                )
            scores[np.asarray(keys)] = vals
        return scores

    return host_fn


def use_two_phase_rl() -> bool:
    """Two-phase RL (host CIDEr between two dispatches) is REQUIRED on
    backends that reject io_callback (the tunneled axon TPU); on CPU the
    in-graph io_callback path is the default and D3NET_RL_TWO_PHASE=1
    opts in to two-phase for testing."""
    return (jax.default_backend() != "cpu"
            or bool(int(os.environ.get("D3NET_RL_TWO_PHASE", "0"))))


def sample_caption_ids(model, state, spk_batch, spk_lang, rng,
                       chunk_size: int, beam_size: int, sample_topn: int):
    """Phase A of the two-phase RL step: run the speaker rollout WITHOUT
    grad and return the full rollout record.

    The tunneled axon TPU backend rejects host callbacks (io_callback), so
    the CIDEr reward cannot run inside the jitted step.  Phase A samples,
    the host scores CIDEr, and phase B (`joint_rl_train_step` with
    ``rollout=``) TEACHER-FORCES these exact ids under grad — the logps it
    reinforces belong to the captions the host scored by construction, with
    no cross-program bitwise-determinism assumption.
    """
    rngs = _rngs(rng, state.step)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out, mut = model.apply(
        variables, spk_batch, train=True,
        method=PipelineNet.run_detector, rngs=rngs, mutable=["batch_stats"],
    )
    data = {**out, **spk_lang, **expand_rows(out, spk_batch, chunk_size)}
    data, _ = model.apply(
        {"params": state.params, "batch_stats": mut["batch_stats"]},
        data, mode="rl", rng=rngs["target_sampling"],
        chunk_size=chunk_size, beam_size=beam_size, sample_topn=sample_topn,
        method=PipelineNet.run_speaker, rngs=rngs, mutable=["batch_stats"],
    )
    return {
        "sampled_cap": data["sampled_cap"],        # (N, topn, T)
        "baseline_cap": data["baseline_cap"],      # (N, T)
        "target_ids": data["target_ids"],          # (N,)
        "target_ious": data["target_ious"],        # (N,)
        "sampled_logps": data["sampled_logps"],    # (N, topn, T) — tests
    }


def joint_rl_train_step(model, reward_host_fn, state, spk_batch, spk_lang,
                        lis_batch, lis_lang, rng, chunk_size: int,
                        beam_size: int = 3, sample_topn: int = 3,
                        det_weight=(1.0, 1.0, 1.0, 1.0),
                        ref_reward_weight: float = 1.0,
                        lang_reward_weight: float = 1.0,
                        listener_reward_weight: float = 0.1,
                        caption_reward_weight: float = 1.0,
                        loss_type: str = "cross_entropy",
                        xe_weight: float = 0.0,
                        caption_scores=None, rollout=None):
    """Mode 3: joint self-critical RL over two dataloader streams
    (ref :228-309).

    ``caption_scores``: optional (sampled_scores, baseline_scores) arrays
    computed on host from `sample_caption_ids` output — required on
    backends without io_callback support; None falls back to in-graph
    host callbacks (CPU).
    ``rollout``: optional phase-A record (dict from `sample_caption_ids`).
    When given, the speaker teacher-forces these exact ids (mode "rl_tf")
    instead of re-running beam search — cheaper, and the reinforced logps
    match the host-scored captions exactly.
    """
    rngs = _rngs(rng, state.step)

    def loss_fn(params):
        variables = lambda bs: {"params": params, "batch_stats": bs}
        bs = state.batch_stats
        metrics = {}

        # ---------------- speaker stream --------------------------------
        out, mut = model.apply(
            variables(bs), spk_batch, train=True,
            method=PipelineNet.run_detector, rngs=rngs, mutable=["batch_stats"],
        )
        bs = mut["batch_stats"]
        det_spk = detector_loss(out, spk_batch, loss_weight=det_weight)
        data = {**out, **spk_lang, **expand_rows(out, spk_batch, chunk_size)}
        spk_mode = "rl"
        if rollout is not None:
            spk_mode = "rl_tf"
            data["sampled_cap_in"] = rollout["sampled_cap"]
            data["baseline_cap_in"] = rollout["baseline_cap"]
            data["target_ids_in"] = rollout["target_ids"]
            data["target_ious_in"] = rollout["target_ious"]
        spk_in = dict(data)  # pristine speaker input (XE anchor re-runs it)
        data, mut = model.apply(
            variables(bs), data, mode=spk_mode, rng=rngs["target_sampling"],
            chunk_size=chunk_size, beam_size=beam_size, sample_topn=sample_topn,
            method=PipelineNet.run_speaker, rngs=rngs, mutable=["batch_stats"],
        )
        bs = mut["batch_stats"]
        # expanded proposal rows for moderator
        data["proposal_bbox_batched"] = data["proposal_bbox_rows"]
        data = model.apply(
            variables(bs), data, sample_topn, method=PipelineNet.moderator,
        )

        n_rows = spk_lang["lang_ids"].shape[0]
        rep_topn = lambda x: jnp.repeat(x, sample_topn, axis=0)

        # listener on sampled captions (trains listener)
        lis_data = {
            "proposal_feats_batched": out["proposal_feats_batched"],
            "proposal_batch_mask": out["proposal_batch_mask"],
            "proposal_center_batched": out["proposal_center_batched"],
        }
        s_out, mut = model.apply(
            variables(bs), lis_data, data["mod_sampled_embs"],
            data["mod_sampled_lens"], chunk_size * sample_topn, True,
            rngs["copy_paste"], method=PipelineNet.run_listener,
            rngs=rngs, mutable=["batch_stats"],
        )
        bs = mut["batch_stats"]
        prop_rows_topn = rep_topn(data["proposal_bbox_rows"])
        ref_sampled, ref_m = grounding_loss(
            s_out["cluster_ref"], prop_rows_topn,
            data["mod_ref_box_corner_label"], reduce=False,
            loss_type=loss_type,
        )
        lang_sampled, _ = lang_cls_loss(
            s_out["lang_scores"], data["mod_ref_cat_label"], reduce=False
        )
        # listener on baseline captions (reward baseline only, no grads)
        b_out = model.apply(
            variables(bs), lis_data,
            jax.lax.stop_gradient(data["mod_baseline_embs"]),
            data["mod_baseline_lens"], chunk_size * sample_topn, False, None,
            method=PipelineNet.run_listener,
        )
        ref_baseline, _ = grounding_loss(
            b_out["cluster_ref"], prop_rows_topn,
            data["mod_ref_box_corner_label"], reduce=False,
            loss_type=loss_type,
        )
        lang_baseline, _ = lang_cls_loss(
            b_out["lang_scores"], data["mod_ref_cat_label"], reduce=False
        )

        # caption rewards via host CIDEr
        ann_rep = rep_topn(spk_lang["annotated"])
        if caption_scores is not None:
            sampled_scores, baseline_scores = caption_scores
        else:
            sampled_flat = data["sampled_cap"].reshape(
                n_rows * sample_topn, -1
            )
            gt_rep = rep_topn(spk_lang.get("gt_refs", spk_lang["lang_ids"]))
            reward_shape = jax.ShapeDtypeStruct(
                (n_rows * sample_topn,), jnp.float32
            )
            sampled_scores = io_callback(
                reward_host_fn, reward_shape, sampled_flat, gt_rep, ann_rep,
                ordered=False,
            )
            baseline_rep = rep_topn(data["baseline_cap"])
            baseline_scores = io_callback(
                reward_host_fn, reward_shape, baseline_rep, gt_rep, ann_rep,
                ordered=False,
            )
        caption_reward = sampled_scores - baseline_scores
        ref_reward = -(jax.lax.stop_gradient(ref_sampled) - jax.lax.stop_gradient(ref_baseline))
        lang_reward = -(jax.lax.stop_gradient(lang_sampled) - jax.lax.stop_gradient(lang_baseline))
        listener_reward = (
            ref_reward_weight * ref_reward + lang_reward_weight * lang_reward
        )
        rewards = (
            caption_reward_weight * caption_reward
            + listener_reward_weight * listener_reward
        )
        logps = data["sampled_logps"].reshape(n_rows * sample_topn, -1).sum(-1)
        good = rep_topn(data["good_bbox_masks"].astype(jnp.float32))
        cap_loss_rl = -(rewards * logps * good).sum() / (good.sum() + 1e-8)
        ann_mask = ann_rep * good
        metrics["cap_rwd"] = (caption_reward * good).sum() / (good.sum() + 1e-8)
        metrics["loc_rwd"] = (listener_reward * good).sum() / (good.sum() + 1e-8)
        metrics["ttl_rwd"] = (rewards * good).sum() / (good.sum() + 1e-8)
        metrics["cap_acc"] = (sampled_scores * ann_mask).sum() / (
            ann_mask.sum() + 1e-8
        )

        spk_ref_loss = (ref_sampled).mean()
        spk_lang_loss = (lang_sampled).mean()

        # Optional cross-entropy anchor on the GT descriptions.  Pure
        # self-critical RL has an absorbing failure mode at toy data
        # scale: once every candidate scores CIDEr 0 the caption reward
        # carries no gradient and the listener reward alone drives the
        # speaker off the language manifold (degenerate repeated-token
        # captions — outputs/cpu_joint_gt/caption_diag.json).  A small XE
        # term keeps the speaker anchored; 0.0 (default) is exact
        # reference parity (``compute_cap_loss`` is RL-only when use_rl).
        cap_loss_xe = jnp.zeros(())
        if xe_weight > 0.0:
            # keep target_ids_in if present: the anchor teacher-forces the
            # same phase-A target selection the RL arm reinforced
            tf_data = dict(spk_in)
            tf_out, mut = model.apply(
                variables(bs), tf_data, mode="tf", rng=rngs["target_sampling"],
                chunk_size=chunk_size,
                method=PipelineNet.run_speaker, rngs=rngs,
                mutable=["batch_stats"],
            )
            bs = mut["batch_stats"]
            cap_loss_xe, _ = caption_loss(
                tf_out["lang_cap"], spk_lang["lang_ids"],
                tf_out["good_bbox_masks"] & (spk_lang["annotated"] > 0),
            )
            cap_loss_xe = xe_weight * cap_loss_xe
            metrics["cap_xe_loss"] = cap_loss_xe

        # ---------------- listener stream (XE) --------------------------
        out2, mut = model.apply(
            variables(bs), lis_batch, train=True,
            method=PipelineNet.run_detector, rngs=rngs, mutable=["batch_stats"],
        )
        bs = mut["batch_stats"]
        det_lis = detector_loss(out2, lis_batch, loss_weight=det_weight)
        extra2 = expand_rows(out2, lis_batch, chunk_size)
        emb = lis_lang["glove_embeddings"]
        data2 = {**out2, **lis_lang}
        data2, mut = model.apply(
            variables(bs), data2, emb[lis_lang["lang_ids"]],
            lis_lang["lang_len"], chunk_size, True, rngs["copy_paste"],
            method=PipelineNet.run_listener, rngs=rngs, mutable=["batch_stats"],
        )
        bs = mut["batch_stats"]
        ref2, ref2_m = grounding_loss(
            data2["cluster_ref"], extra2["proposal_bbox_rows"],
            lis_lang["ref_box_corner_label"], lis_lang["annotated"],
            loss_type=loss_type,
        )
        lang2, lang2_acc = lang_cls_loss(
            data2["lang_scores"], lis_lang["ref_cat_label"], lis_lang["annotated"]
        )

        total = (
            det_spk["total_loss"] + cap_loss_rl + cap_loss_xe
            + spk_ref_loss + spk_lang_loss
            + det_lis["total_loss"] + ref2 + lang2
        )
        metrics.update(
            loss=total,
            spk_detect_loss=det_spk["total_loss"],
            lis_detect_loss=det_lis["total_loss"],
            captioning_loss=cap_loss_rl,
            spk_ref_loss=spk_ref_loss,
            lis_ref_loss=ref2,
            lang_acc=lang2_acc,
            **{f"lis_{k}": v for k, v in ref2_m.items()},
        )
        return total, (metrics, bs)

    (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    return state.apply_gradients(grads, new_bs), metrics


# ---------------------------------------------------------------------------
# freezing / pretrained weights
# ---------------------------------------------------------------------------

def make_frozen_optimizer(tx, params, freeze: Dict[str, bool]):
    """Zero updates for frozen top-level submodules (freeze_* cfg flags)."""

    def label(path_key):
        top = path_key[0].key if hasattr(path_key[0], "key") else str(path_key[0])
        return "freeze" if freeze.get(top, False) else "train"

    labels = jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def apply_pretrained(params, batch_stats, cfg: Config):
    """Load submodule weights dumped by scripts/prepare_weights.py
    (ref per-rank loading in ``scripts/train.py:288-310``)."""
    import pickle

    params = dict(params)
    batch_stats = dict(batch_stats) if batch_stats else {}
    for sub in ("detector", "speaker", "listener"):
        path = cfg.model.get(f"pretrained_{sub}")
        if not path:
            continue
        with open(path, "rb") as f:
            payload = pickle.load(f)
        assert sub in params, f"{sub} not in model params"
        from d3net_tpu.train.migrate import migrate_legacy_block_names

        params[sub] = migrate_legacy_block_names(payload["params"])
        if payload.get("batch_stats"):
            batch_stats[sub] = migrate_legacy_block_names(
                payload["batch_stats"])
        print(f"loaded pretrained {sub} from {path}")
    return params, batch_stats


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def build_vocab(cfg: Config):
    vocab = Vocabulary.build(base_corpus())
    emb = embedding_matrix(vocab, cfg.get("glove_path"))
    return vocab, emb


def run_pipeline_training(cfg: Config, run_dir: str, max_steps: Optional[int] = None):
    os.makedirs(run_dir, exist_ok=True)
    save_cfg(cfg, os.path.join(run_dir, "config.yaml"))
    logger = MetricLogger(run_dir)
    monitor = cfg.general.monitor.split("/")[-1]
    ckpt = Checkpointer(run_dir, monitor, cfg.general.monitor_mode)

    vocab, emb = build_vocab(cfg)
    model = pipeline_from_cfg(cfg, vocab)
    spec = spec_from_cfg(cfg)
    train_it, val_it = make_dataloaders(cfg, spec, return_scenes=True)
    chunk = int(cfg.data.num_des_per_scene)
    mode = 3 if (not cfg.model.no_captioning and not cfg.model.no_grounding) \
        else (1 if not cfg.model.no_captioning else 2)

    mesh = make_mesh(batch_size=int(cfg.data.batch_size))
    steps_per_epoch = max(1, len(train_it))
    tx = make_optimizer(
        lr=cfg.train.optim.lr, optim=cfg.train.optim.classname,
        weight_decay=cfg.train.optim.weight_decay,
        step_epoch=cfg.train.step_epoch, multiplier=cfg.train.multiplier,
        steps_per_epoch=steps_per_epoch,
    )

    rng_np = np.random.default_rng(cfg.general.manual_seed)

    def make_lang(batch_scenes):
        lang_np = build_lang_batch(
            batch_scenes, vocab, chunk, cfg.data.max_spk_len, rng_np,
            spec.max_instances,
            apply_word_erase=bool(cfg.train.get("apply_word_erase", False)),
            num_refs=int(cfg.train.get("num_caption_refs", 1) or 1),
        )
        return lang_rows(lang_np, emb)

    # ---- init over a first batch ---------------------------------------
    first_scenes = [train_it.scenes[i] for i in range(cfg.data.batch_size)]
    from d3net_tpu.data.collate import build_batch

    first = shard_batch(jax.tree.map(jnp.asarray, build_batch(first_scenes, spec)), mesh)
    first_lang = make_lang(first_scenes)
    init_rngs = {k: jax.random.key(i) for i, k in enumerate(
        ("params",) + _RNGS)}
    variables = jax.jit(
        lambda b, l: model.init(init_rngs, b, l, train=True, chunk_size=chunk)
    )(first, first_lang)
    params = variables["params"]
    batch_stats0 = variables.get("batch_stats", {})
    params, batch_stats0 = apply_pretrained(params, batch_stats0, cfg)

    freeze = {
        "detector": bool(cfg.model.freeze_detector),
        "speaker": bool(cfg.model.get("freeze_speaker", False)) and mode != 1,
        "listener": bool(cfg.model.get("freeze_listener", False)) and mode != 2,
    }
    tx = make_frozen_optimizer(tx, params, freeze)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats0,
        opt_state=tx.init(params),
        tx=tx,
    )
    state = replicate(state, mesh)
    restored = ckpt.restore_last(state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")
    from d3net_tpu.train.loop import write_run_meta
    write_run_meta(run_dir, cfg)
    logger.begin(int(state.step))

    det_w = tuple(cfg.train.loss_weight[:4])
    loss_type = str(cfg.model.get("loss_type", "cross_entropy"))
    if mode == 1:
        step_fn = jax.jit(functools.partial(
            speaker_train_step, model, False, chunk_size=chunk,
            det_weight=det_w), donate_argnums=(0,))
    elif mode == 2:
        step_fn = jax.jit(functools.partial(
            listener_train_step, model, chunk_size=chunk, det_weight=det_w,
            loss_type=loss_type),
            donate_argnums=(0,))
    else:
        reward_fn = make_caption_reward_fn(
            vocab, cfg.train.caption_reward_weight, 0.0
        )
        # two-phase RL (backends without io_callback, e.g. the tunneled
        # axon TPU): phase A samples caption ids on device, the host scores
        # CIDEr, phase B teacher-forces the sampled ids under grad.
        # io_callback stays the single-dispatch path on CPU.
        two_phase = use_two_phase_rl()
        sample_fn = jax.jit(functools.partial(
            sample_caption_ids, model, chunk_size=chunk,
            beam_size=cfg.train.beam_size, sample_topn=cfg.train.sample_topn,
        ))
        step_fn = jax.jit(functools.partial(
            joint_rl_train_step, model, reward_fn, chunk_size=chunk,
            beam_size=cfg.train.beam_size, sample_topn=cfg.train.sample_topn,
            det_weight=det_w,
            ref_reward_weight=cfg.train.ref_reward_weight,
            lang_reward_weight=cfg.train.lang_reward_weight,
            listener_reward_weight=cfg.train.listener_reward_weight,
            caption_reward_weight=cfg.train.caption_reward_weight,
            loss_type=loss_type,
            xe_weight=float(cfg.train.get("rl_xe_weight", 0.0) or 0.0),
        ), donate_argnums=(0,))

    rng = jax.random.key(cfg.general.manual_seed + 7)
    step = int(state.step)
    # Device-batch caching (tpu.cache_batches): keeping batch + lang tensors
    # resident avoids re-uploading tens of MB per step over the tunneled TPU
    # (same lever as the detector loop).  With augmentation ON the first
    # ``tpu.augment_variants`` epochs are cached as independent augmented
    # copies (epoch-seeded loader; lang is regenerated from each variant's
    # augmented scenes so spatial relations stay consistent) and later
    # epochs cycle them.
    cache_batches = bool(cfg.tpu.get("cache_batches", False))
    n_var = 1
    if cache_batches and train_it.augment:
        n_var = max(1, int(cfg.tpu.get("augment_variants", 2)))
    variant_pairs: list = []
    prev_pair = None  # mode-3 listener stream: previous draw (two streams)
    val_fns = _ValFns(model, chunk)
    for epoch in range(cfg.train.epochs):
        caching_this_epoch = cache_batches and len(variant_pairs) < n_var
        if cache_batches and not caching_this_epoch:
            src = variant_pairs[epoch % n_var]
        else:
            src = None
            if caching_this_epoch:
                variant_pairs.append([])
        for item in (src if src is not None else train_it):
            if src is None:
                batch_np, batch_scenes = item
                lang = make_lang(batch_scenes)
                batch = shard_batch(jax.tree.map(jnp.asarray, batch_np), mesh)
                if caching_this_epoch:
                    variant_pairs[-1].append((batch, lang))
            else:
                batch, lang = item
            t0 = time.time()
            if mode == 3:
                # two independent streams (ref scripts/train.py:359-365 uses
                # two dataloaders): speaker takes the current draw, the
                # listener stream the previous one — both cover the dataset,
                # no extra host collate
                lis_batch, lis_lang = (prev_pair if prev_pair is not None
                                       else (batch, lang))
                prev_pair = (batch, lang)
                if two_phase:
                    rollout = sample_fn(state, batch, lang, rng)
                    topn = int(cfg.train.sample_topn)
                    n_rows = lang["lang_ids"].shape[0]
                    ids_s = np.asarray(rollout["sampled_cap"]).reshape(
                        n_rows * topn, -1)
                    ids_b = np.repeat(np.asarray(rollout["baseline_cap"]),
                                      topn, axis=0)
                    gt = np.repeat(
                        np.asarray(lang.get("gt_refs", lang["lang_ids"])),
                        topn, axis=0)
                    ann = np.repeat(np.asarray(lang["annotated"]), topn,
                                    axis=0)
                    s_sc = jnp.asarray(reward_fn(ids_s, gt, ann))
                    b_sc = jnp.asarray(reward_fn(ids_b, gt, ann))
                    state, metrics = step_fn(
                        state, batch, lang, lis_batch, lis_lang, rng,
                        caption_scores=(s_sc, b_sc),
                        rollout={k: rollout[k] for k in (
                            "sampled_cap", "baseline_cap", "target_ids",
                            "target_ious")},
                    )
                else:
                    state, metrics = step_fn(state, batch, lang, lis_batch,
                                             lis_lang, rng)
            else:
                state, metrics = step_fn(state, batch, lang, rng)
            step += 1
            if step % cfg.train.log_every_n_steps == 0:
                m = jax.device_get(metrics)
                m["iter_time"] = time.time() - t0
                logger.log(step, m, "train")
                print(f"epoch {epoch} step {step} " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(m.items())))
            if max_steps and step >= max_steps:
                break

        check_every = int(cfg.train.get("check_val_every_n_epoch", 1) or 1)
        last_epoch = epoch + 1 >= cfg.train.epochs
        if ((epoch + 1) % check_every != 0 and not last_epoch
                and not (max_steps and step >= max_steps)):
            continue
        val_metrics = run_pipeline_validation(
            cfg, model, state, val_it, vocab, emb, chunk, mesh, mode,
            val_fns=val_fns,
            diag_path=os.path.join(run_dir, "caption_diag.json"),
        )
        logger.log(step, val_metrics, "val")
        print(f"epoch {epoch} VAL " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(val_metrics.items())))
        ckpt.save(step, state, val_metrics)
        if max_steps and step >= max_steps:
            break
    return state


class _ValFns:
    """Jitted validation fns with variables as ARGUMENTS — closing over the
    epoch's variables would re-trace + re-compile every validation epoch
    (minutes each on the tunneled backend)."""

    def __init__(self, model, chunk: int):
        self.det = jax.jit(functools.partial(
            model.apply, train=False, method=PipelineNet.run_detector))
        self.spk = jax.jit(functools.partial(
            model.apply, mode="eval", method=PipelineNet.run_speaker))
        self.lis = jax.jit(functools.partial(
            model.apply, chunk_size=chunk, train=False, rng=None,
            method=PipelineNet.run_listener))


def run_pipeline_validation(cfg, model, state, val_it, vocab, emb, chunk,
                            mesh, mode, val_fns: "_ValFns" = None,
                            diag_path: str = None) -> Dict[str, float]:
    """Caption CIDEr@0.5IoU + grounding Acc@kIoU over the val split
    (ref ``validation_epoch_end`` :645-735)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if val_fns is None:
        val_fns = _ValFns(model, chunk)
    det_fn = functools.partial(val_fns.det, variables)
    cap_eval = CaptionEvaluator(min_iou=cfg.eval.min_iou_threshold)
    grd_eval = GroundingEvaluator()
    rng_np = np.random.default_rng(0)

    out: Dict[str, float] = {}
    for batch_np, scenes in val_it:
        batch = shard_batch(jax.tree.map(jnp.asarray, batch_np), mesh)
        det_out = det_fn(batch)

        lang_np = build_lang_batch(
            scenes, vocab, chunk, cfg.data.max_spk_len, rng_np,
            val_it.spec.max_instances,
        )
        lang = lang_rows(lang_np, emb)

        if mode in (1, 3):
            data = {**det_out, "glove_embeddings": jnp.asarray(emb)}
            data = val_fns.spk(variables, data)
            ids = np.asarray(data["lang_cap"])
            corners = np.asarray(det_out["proposal_bbox_batched"])
            mask = np.asarray(det_out["proposal_batch_mask"])
            for i, scene in enumerate(scenes):
                captions = decode_captions(ids[i], vocab)
                nb = len(scene.instance_bboxes)
                gt_c = np.stack([
                    box_corners(bb[:3], bb[3:6]) for bb in scene.instance_bboxes
                ]) if nb else np.zeros((0, 8, 3))
                gt_m = np.ones(nb)
                from d3net_tpu.data.language import describe_instance

                # several deterministic grammar samples per object — the
                # reference evaluates against every human annotation of the
                # object (``lib/captioning/eval_helper.py:258-307``), not one
                n_val_refs = int(cfg.eval.get("num_caption_refs", 4) or 1)
                gt_desc = {}
                for j in range(nb):
                    refs = []
                    for seed in range(n_val_refs):
                        s = " ".join(describe_instance(
                            scene, j, np.random.default_rng(seed)))
                        if s not in refs:
                            refs.append(s)
                    gt_desc[j] = refs
                cap_eval.add_scene(scene.scene_id, captions, corners[i], mask[i],
                                   gt_c, gt_m, gt_desc)

        if mode in (2, 3):
            data = {**det_out, **lang}
            word_embs = lang["glove_embeddings"][lang["lang_ids"]]
            data = val_fns.lis(variables, data, word_embs, lang["lang_len"])
            prop_rows = np.repeat(
                np.asarray(det_out["proposal_bbox_batched"]), chunk, axis=0)
            mask_rows = np.repeat(
                np.asarray(det_out["proposal_batch_mask"]), chunk, axis=0)
            grd_eval.add(
                np.asarray(data["cluster_ref"]), prop_rows, mask_rows,
                np.asarray(lang["ref_box_corner_label"]),
                np.asarray(lang["annotated"]),
                unique_multiple=np.asarray(lang["unique_multiple"]),
                object_cat=np.asarray(lang["ref_cat_label"]),
            )

    if mode in (1, 3):
        out.update({f"{k}": v for k, v in cap_eval.compute().items()})
        diag = cap_eval.diagnostics()
        if diag:
            out["cap_frac_replaced"] = diag["frac_replaced"]
            out["cap_assign_iou_mean"] = diag["assign_iou_mean"]
            out["cider_raw"] = diag["cider_raw"]
            if diag_path:
                with open(diag_path, "w") as f:
                    json.dump(diag, f, indent=1)
    if mode in (2, 3):
        # overall acc@K -> the reference's ref_iou_rate_K name; breakdown
        # keys (unique_/multiple_/others_...) keep their prefix
        out.update({
            f"ref_iou_rate_{k.split('@')[-1]}" if k.startswith("acc@") else k: v
            for k, v in grd_eval.compute().items()
        })
    if "cider" in out and "ref_iou_rate_0.5" in out:
        out["combined"] = out["cider"] + out["ref_iou_rate_0.5"]
    return out


def run_joint_rl_step_once(cfg: Config, mesh=None, two_phase: bool = True):
    """ONE mode-3 (joint speaker-listener RL) train step, dp-sharded.

    Multi-chip verification beyond the detector (the reference runs every
    mode under DDP, ``scripts/train.py:264-280``): builds the full
    PipelineNet, shards the detector batch over the mesh's dp axis, and
    runs the two-phase RL step — phase-A device sampling, host CIDEr
    scoring, phase-B teacher-forced grad step — exactly as
    ``run_pipeline_training``'s mode-3 branch does.  The moderator,
    rep/fold logic and host scoring all assume a batch-leading axis; this
    is the path that proves those assumptions hold under GSPMD sharding.
    Used by ``__graft_entry__.dryrun_multichip`` and tests/test_parallel.py.
    """
    vocab, emb = build_vocab(cfg)
    model = pipeline_from_cfg(cfg, vocab)
    spec = spec_from_cfg(cfg)
    chunk = int(cfg.data.num_des_per_scene)
    if mesh is None:
        mesh = make_mesh(batch_size=int(cfg.data.batch_size))
    train_it, _ = make_dataloaders(cfg, spec, return_scenes=True)
    rng_np = np.random.default_rng(cfg.general.manual_seed)
    batch_np, batch_scenes = next(iter(train_it))
    lang_np = build_lang_batch(
        batch_scenes, vocab, chunk, cfg.data.max_spk_len, rng_np,
        spec.max_instances,
        num_refs=int(cfg.train.get("num_caption_refs", 1) or 1),
    )
    lang = lang_rows(lang_np, emb)
    det_w = tuple(cfg.train.loss_weight[:4])
    reward_fn = make_caption_reward_fn(vocab, 1.0, 0.0)
    with jax.set_mesh(mesh):
        batch = shard_batch(jax.tree.map(jnp.asarray, batch_np), mesh)
        init_rngs = {k: jax.random.key(i) for i, k in enumerate(
            ("params",) + _RNGS)}
        variables = jax.jit(
            lambda b, l: model.init(init_rngs, b, l, train=True,
                                    chunk_size=chunk))(batch, lang)
        tx = make_optimizer(lr=1e-4, steps_per_epoch=10)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            tx=tx,
        )
        state = replicate(state, mesh)
        sample_fn = jax.jit(functools.partial(
            sample_caption_ids, model, chunk_size=chunk,
            beam_size=int(cfg.train.beam_size),
            sample_topn=int(cfg.train.sample_topn)))
        step_fn = jax.jit(functools.partial(
            joint_rl_train_step, model, reward_fn, chunk_size=chunk,
            beam_size=int(cfg.train.beam_size),
            sample_topn=int(cfg.train.sample_topn), det_weight=det_w,
            ref_reward_weight=cfg.train.ref_reward_weight,
            lang_reward_weight=cfg.train.lang_reward_weight,
            listener_reward_weight=cfg.train.listener_reward_weight,
            caption_reward_weight=cfg.train.caption_reward_weight,
            xe_weight=float(cfg.train.get("rl_xe_weight", 0.0) or 0.0),
        ))
        rng = jax.random.key(5)
        if two_phase:
            rollout = sample_fn(state, batch, lang, rng)
            topn = int(cfg.train.sample_topn)
            n_rows = lang["lang_ids"].shape[0]
            ids_s = np.asarray(rollout["sampled_cap"]).reshape(
                n_rows * topn, -1)
            ids_b = np.repeat(np.asarray(rollout["baseline_cap"]), topn,
                              axis=0)
            gt = np.repeat(
                np.asarray(lang.get("gt_refs", lang["lang_ids"])), topn,
                axis=0)
            ann = np.repeat(np.asarray(lang["annotated"]), topn, axis=0)
            s_sc = jnp.asarray(reward_fn(ids_s, gt, ann))
            b_sc = jnp.asarray(reward_fn(ids_b, gt, ann))
            state, metrics = step_fn(
                state, batch, lang, batch, lang, rng,
                caption_scores=(s_sc, b_sc),
                rollout={k: rollout[k] for k in (
                    "sampled_cap", "baseline_cap", "target_ids",
                    "target_ious")},
            )
        else:
            state, metrics = step_fn(state, batch, lang, batch, lang, rng)
        metrics = jax.device_get(metrics)
    return state, metrics
