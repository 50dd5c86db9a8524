import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3net_tpu.models.caption import CaptionModule
from d3net_tpu.models.graph import GraphModule, adjacency_matrix, query_locals
from d3net_tpu.models.lang import LangModule
from d3net_tpu.models.match import TransformerMatchModule
from d3net_tpu.train.losses_slt import (
    caption_loss,
    grounding_loss,
    lang_cls_loss,
    orientation_loss,
    radian_to_label,
    softmax_ranking_loss,
)
from d3net_tpu.utils.bbox import box_corners

B, P, F, V, T, L = 2, 12, 32, 40, 12, 4
CHUNK = 3
N = B * CHUNK


def fake_proposals(rng):
    centers = rng.uniform(0, 5, (B, P, 3)).astype(np.float32)
    sizes = rng.uniform(0.3, 1.0, (B, P, 3)).astype(np.float32)
    corners = box_corners(centers, sizes)
    mask = np.ones((B, P), np.float32)
    mask[:, -2:] = 0
    feats = rng.normal(size=(B, P, F)).astype(np.float32)
    return {
        "proposal_feats_batched": jnp.asarray(feats),
        "proposal_batch_mask": jnp.asarray(mask),
        "proposal_bbox_batched": jnp.asarray(corners),
        "proposal_center_batched": jnp.asarray(centers),
    }


@pytest.fixture(scope="module")
def graph_out():
    rng = np.random.default_rng(0)
    data = fake_proposals(rng)
    gm = GraphModule(out_size=F, num_layers=2, num_locals=L)
    vs = gm.init(jax.random.key(0), data)
    out = jax.jit(lambda v, d: gm.apply(v, d))(vs, data)
    return out


def test_graph_module_shapes_and_adjacency(graph_out):
    out = graph_out
    assert out["bbox_feature"].shape == (B, P, F)
    adj = np.asarray(out["adjacent_mat"])
    assert adj.shape == (B, P, P)
    # each valid row has at most L locals, none invalid, no self loops
    assert adj.sum(-1).max() <= L
    assert np.diagonal(adj, axis1=1, axis2=2).max() == 0
    mask = np.asarray(out["proposal_batch_mask"])
    assert (adj[:, :, mask[0] == 0][0] == 0).all()
    assert out["edge_feature"].shape == (B, P, L, F)
    assert out["edge_orientations"].shape == (B, P, L, 6)


def _caption_data(graph_out, rng):
    data = dict(graph_out)
    emb = rng.normal(size=(V, 300)).astype(np.float32) * 0.1
    data["glove_embeddings"] = jnp.asarray(emb)
    word_ids = rng.integers(4, V, (N, T)).astype(np.int32)
    word_ids[:, 0] = 2  # sos
    word_ids[:, 6] = 3  # eos
    word_ids[:, 7:] = 0
    data["lang_ids"] = jnp.asarray(word_ids)
    data["annotated"] = jnp.ones((N,))
    centers = np.asarray(graph_out["proposal_center_batched"])
    ref_center = np.repeat(centers[:, 3], CHUNK, 0)
    data["ref_box_corner_label"] = jnp.asarray(
        box_corners(ref_center, np.full_like(ref_center, 0.5))
    )
    data["center_label_chunk"] = jnp.asarray(np.repeat(centers, CHUNK, 0))
    data["gt_bbox_chunk"] = jnp.asarray(
        np.repeat(np.asarray(graph_out["proposal_bbox_batched"]), CHUNK, 0)
    )
    # expand scene-level keys to description rows
    for k in ["bbox_feature", "proposal_batch_mask", "proposal_bbox_batched",
              "edge_feature", "local_ids", "local_mask"]:
        data[k] = jnp.repeat(data[k], CHUNK, axis=0)
    return data


@pytest.fixture(scope="module")
def caption_setup(graph_out):
    rng = np.random.default_rng(1)
    data = _caption_data(graph_out, rng)
    cm = CaptionModule(
        num_vocabs=V, sos_id=2, eos_id=3, pad_id=0, feat_size=F,
        num_proposals=P, num_locals=L, max_len=T - 2, hidden_size=64,
    )
    vs = cm.init(jax.random.key(0), data, mode="tf", rng=jax.random.key(1))
    return cm, vs, data


def test_caption_tf_mode(caption_setup):
    cm, vs, data = caption_setup
    out = jax.jit(
        lambda v, d: cm.apply(v, d, mode="tf", rng=jax.random.key(1))
    )(vs, data)
    assert out["lang_cap"].shape == (N, T - 1, V)
    assert bool(jnp.isfinite(out["lang_cap"]).all())
    assert out["target_ids"].shape == (N,)
    # annotated rows pick the max-IoU proposal = proposal 3 (ref center there)
    tid = np.asarray(out["target_ids"]).reshape(B, CHUNK)
    assert (tid == 3).all()
    assert np.asarray(out["target_ious"]).min() > 0.0


def test_caption_eval_mode(caption_setup, graph_out):
    cm, vs, _ = caption_setup
    rng = np.random.default_rng(2)
    data = dict(graph_out)
    data["glove_embeddings"] = jnp.asarray(
        rng.normal(size=(V, 300)).astype(np.float32)
    )
    out = jax.jit(lambda v, d: cm.apply(v, d, mode="eval"))(vs, data)
    assert out["lang_cap"].shape == (B, P, T - 1)
    ids = np.asarray(out["lang_cap"])
    assert ids.min() >= 0 and ids.max() < V


def test_caption_rl_mode_beam_matches_greedy_at_beam1(caption_setup):
    cm, vs, data = caption_setup
    out = jax.jit(
        lambda v, d: cm.apply(v, d, mode="rl", rng=jax.random.key(1),
                              beam_size=1, sample_topn=1)
    )(vs, data)
    assert out["sampled_cap"].shape[0] == N
    # beam-1 search == greedy rollout (greedy runs one step longer,
    # mirroring the reference's max_len vs max_len+1 horizons)
    sampled = np.asarray(out["sampled_cap"][:, 0])
    np.testing.assert_array_equal(
        sampled, np.asarray(out["baseline_cap"])[:, : sampled.shape[1]]
    )


def test_beam_scores_sorted(caption_setup):
    cm, vs, data = caption_setup
    def run(v, d):
        emb = d["glove_embeddings"]
        n = d["lang_ids"].shape[0]
        tf = d["bbox_feature"][:, 0]
        return cm.apply(
            v, d, mode="rl", rng=jax.random.key(5), beam_size=3, sample_topn=3
        )
    out = jax.jit(run)(vs, data)
    lps = np.asarray(out["sampled_logps"]).sum(-1)  # (N, topn)
    assert (np.diff(lps, axis=1) <= 1e-4).all()  # descending total logp


def test_lang_module_masking():
    lm = LangModule(hidden_size=32)
    rng = np.random.default_rng(3)
    embs = rng.normal(size=(4, T, 300)).astype(np.float32)
    lens = np.array([5, 7, 3, T])
    vs = lm.init(jax.random.key(0), jnp.asarray(embs), jnp.asarray(lens))
    out1 = lm.apply(vs, jnp.asarray(embs), jnp.asarray(lens))
    # perturb tokens beyond each length: lang_emb must not change
    embs2 = embs.copy()
    for i, l in enumerate(lens):
        embs2[i, l:] += 100.0
    out2 = lm.apply(vs, jnp.asarray(embs2), jnp.asarray(lens))
    np.testing.assert_allclose(
        np.asarray(out1["lang_emb"]), np.asarray(out2["lang_emb"]), atol=1e-5
    )
    assert out1["lang_hiddens"].shape == (4, T, 32)


def test_match_module_forward(graph_out):
    rng = np.random.default_rng(4)
    data = dict(graph_out)
    data["lang_hiddens"] = jnp.asarray(rng.normal(size=(N, T, 128)).astype(np.float32))
    data["lang_masks"] = jnp.ones((N, T))
    mm = TransformerMatchModule(hidden_size=64, num_proposals=P)
    vs = mm.init(jax.random.key(0), data, chunk_size=CHUNK, train=False)
    out = jax.jit(
        lambda v, d: mm.apply(v, d, chunk_size=CHUNK, train=False)
    )(vs, data)
    assert out["cluster_ref"].shape == (N, P)
    assert bool(jnp.isfinite(out["cluster_ref"]).all())
    # train mode with dropout/copy-paste rngs and batch_stats mutation
    out_t, st = mm.apply(
        vs, data, chunk_size=CHUNK, train=True, rng=jax.random.key(7),
        rngs={"dropout": jax.random.key(8)}, mutable=["batch_stats"],
    )
    assert bool(jnp.isfinite(out_t["cluster_ref"]).all())


def test_caption_loss_golden():
    # perfect logits -> ~0 loss, acc 1
    ids = jnp.asarray([[2, 5, 6, 3, 0, 0]])
    logits = jnp.full((1, 5, 10), -20.0)
    for t, w in enumerate([5, 6, 3, 0, 0]):
        logits = logits.at[0, t, w].set(20.0)
    loss, acc = caption_loss(logits, ids, jnp.asarray([True]))
    assert float(loss) < 1e-3
    assert float(acc) == 1.0
    # no good bboxes -> zeros
    loss0, acc0 = caption_loss(logits, ids, jnp.asarray([False]))
    assert float(loss0) == 0.0 and float(acc0) == 0.0


def test_softmax_ranking_golden():
    preds = jnp.asarray([[10.0, -10.0, -10.0]])
    targets = jnp.asarray([[1.0, 0.0, 0.0]])
    assert float(softmax_ranking_loss(preds, targets)) < 1e-3


def test_grounding_loss_metrics():
    rng = np.random.default_rng(5)
    centers = rng.uniform(0, 5, (N, P, 3)).astype(np.float32)
    corners = jnp.asarray(box_corners(centers, np.full_like(centers, 0.6)))
    ref = corners[:, 4]  # GT = proposal 4's box
    conf = jnp.full((N, P), -5.0).at[:, 4].set(5.0)
    loss, metrics = grounding_loss(conf, corners, ref)
    assert float(loss) < 1e-2
    assert float(metrics["ref_acc_mean"]) == 1.0
    assert float(metrics["ref_iou_rate_0.5"]) == 1.0


def test_orientation_loss_identity_rotations():
    rng = np.random.default_rng(6)
    eo = jnp.asarray(rng.normal(size=(B, P, L, 6)).astype(np.float32))
    local_ids = jnp.zeros((B, P, L), jnp.int32)
    local_mask = jnp.ones((B, P, L))
    assign = jnp.zeros((B, P), jnp.int32)
    rot = jnp.broadcast_to(jnp.eye(3), (B, 4, 3, 3))
    rmask = jnp.ones((B, 4))
    loss, acc = orientation_loss(eo, local_ids, local_mask, assign, rot, rmask)
    assert bool(jnp.isfinite(loss))
    # identity rotations -> relative angle 0 -> label 0
    labels = radian_to_label(jnp.zeros(5))
    np.testing.assert_array_equal(np.asarray(labels), 0)
    # masked-out rotations -> zero-ish loss denominator safe
    loss0, _ = orientation_loss(eo, local_ids, local_mask, assign, rot,
                                jnp.zeros((B, 4)))
    assert bool(jnp.isfinite(loss0))


def test_lang_cls_loss():
    scores = jnp.asarray([[10.0, -5.0], [-5.0, 10.0]])
    labels = jnp.asarray([0, 1])
    loss, acc = lang_cls_loss(scores, labels)
    assert float(loss) < 1e-3 and float(acc) == 1.0


def test_diverse_beam_zero_lambda_equals_greedy(caption_setup):
    """G groups with diversity_lambda=0 and 1 beam each all reproduce the
    greedy rollout (the group penalty is the ONLY coupling between groups)."""
    cm, vs, data = caption_setup

    def run(v, d):
        emb = d["glove_embeddings"]
        n = d["lang_ids"].shape[0]
        tgt = d["bbox_feature"][jnp.arange(n), jnp.zeros(n, jnp.int32)]
        return cm.apply(
            v, emb, tgt, d["bbox_feature"], d["proposal_batch_mask"],
            3, None, 3, 0.0, method=cm.beam_decode,
        )

    seqs, lps, scores = jax.jit(run)(vs, data)
    s = np.asarray(seqs)
    np.testing.assert_array_equal(s[:, 0], s[:, 1])
    np.testing.assert_array_equal(s[:, 0], s[:, 2])

    def run_greedy(v, d):
        emb = d["glove_embeddings"]
        n = d["lang_ids"].shape[0]
        tgt = d["bbox_feature"][jnp.arange(n), jnp.zeros(n, jnp.int32)]
        ids, _ = cm.apply(
            v, emb, tgt, d["bbox_feature"], d["proposal_batch_mask"],
            method=cm.greedy_decode,
        )
        return ids

    greedy = np.asarray(jax.jit(run_greedy)(vs, data))
    np.testing.assert_array_equal(s[:, 0], greedy[:, : s.shape[2]])


def test_diverse_beam_groups_diverge(caption_setup):
    """With a large diversity penalty, later groups must avoid the words
    earlier groups picked at the same step (reference add_diversity)."""
    cm, vs, data = caption_setup

    def run(v, d):
        emb = d["glove_embeddings"]
        n = d["lang_ids"].shape[0]
        tgt = d["bbox_feature"][jnp.arange(n), jnp.zeros(n, jnp.int32)]
        return cm.apply(
            v, emb, tgt, d["bbox_feature"], d["proposal_batch_mask"],
            3, None, 3, 100.0, method=cm.beam_decode,
        )

    seqs, lps, scores = jax.jit(run)(vs, data)
    first = np.asarray(seqs)[:, :, 0]  # (N, 3 groups) first words
    for row in first:
        assert len(set(row.tolist())) == 3, f"groups not diverse: {row}"


def test_standard_beam_score_equals_logp_sum(caption_setup):
    """group_size=1: no augmentation, so the running beam score must equal
    the sum of the recorded per-step (unaugmented) logps."""
    cm, vs, data = caption_setup

    def run(v, d):
        emb = d["glove_embeddings"]
        n = d["lang_ids"].shape[0]
        tgt = d["bbox_feature"][jnp.arange(n), jnp.zeros(n, jnp.int32)]
        return cm.apply(
            v, emb, tgt, d["bbox_feature"], d["proposal_batch_mask"],
            4, method=cm.beam_decode,
        )

    seqs, lps, scores = jax.jit(run)(vs, data)
    np.testing.assert_allclose(
        np.asarray(lps).sum(-1), np.asarray(scores), rtol=1e-4, atol=1e-4
    )


def test_rl_tf_logps_match_beam_rollout(caption_setup):
    """Two-phase RL contract: teacher-forcing the beam's sampled ids (mode
    'rl_tf') must reproduce the beam's recorded per-step logps exactly —
    phase B reinforces the captions the host actually scored."""
    cm, vs, data = caption_setup
    rl = jax.jit(
        lambda v, d: cm.apply(v, d, mode="rl", rng=jax.random.key(3),
                              beam_size=4, sample_topn=2)
    )(vs, data)
    d2 = dict(data)
    d2["sampled_cap_in"] = rl["sampled_cap"]
    d2["baseline_cap_in"] = rl["baseline_cap"]
    d2["target_ids_in"] = rl["target_ids"]
    d2["target_ious_in"] = rl["target_ious"]
    tf = jax.jit(lambda v, d: cm.apply(v, d, mode="rl_tf"))(vs, d2)
    np.testing.assert_array_equal(
        np.asarray(tf["sampled_cap"]), np.asarray(rl["sampled_cap"])
    )
    np.testing.assert_allclose(
        np.asarray(tf["sampled_logps"]), np.asarray(rl["sampled_logps"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(tf["good_bbox_masks"]), np.asarray(rl["good_bbox_masks"])
    )


def test_use_two_phase_rl_gating(monkeypatch):
    from d3net_tpu.train import pipeline_loop as pl

    # CPU backend: in-graph io_callback path by default
    monkeypatch.delenv("D3NET_RL_TWO_PHASE", raising=False)
    assert pl.use_two_phase_rl() is (jax.default_backend() != "cpu")
    monkeypatch.setenv("D3NET_RL_TWO_PHASE", "1")
    assert pl.use_two_phase_rl() is True


def test_diverse_beam_matches_staggered_reference_schedule(caption_setup):
    """The in-step group loop computes the SAME selections as the
    reference's time-staggered diverse beam search schedule.

    Oracle: the reference (``caption_module.py:157-238``, from
    self-critical.pytorch) advances group g at global step t on LOCAL step
    tau = t - g, penalizing by the words groups < g chose at the same tau.
    We run exactly that schedule here — independent per-group beam states,
    stepped in staggered order around ``CaptionModule.step`` — with the
    repo's done-beam freezing, and require bitwise-equal selections and
    matching logps/scores from ``beam_decode``'s single fused scan.
    """
    cm, vs, data = caption_setup
    emb = data["glove_embeddings"]
    n = int(data["lang_ids"].shape[0])
    tgt = np.asarray(data["bbox_feature"])[np.arange(n), 0]
    of = data["bbox_feature"]
    vm = data["proposal_batch_mask"]
    bm, g_n, lam = 4, 2, 0.7
    bd = bm // g_n
    t_steps = cm.max_len + 1
    v = cm.num_vocabs
    neg = -1e9

    seqs, lps, scores = jax.jit(
        lambda vv: cm.apply(vv, emb, jnp.asarray(tgt), of, vm, bm, None,
                            g_n, lam, method=cm.beam_decode)
    )(vs)
    seqs, lps, scores = map(np.asarray, (seqs, lps, scores))

    # ---- staggered oracle ------------------------------------------------
    tgt_rep = jnp.repeat(jnp.asarray(tgt), bd, axis=0)
    of_rep = jnp.repeat(of, bd, axis=0)
    vm_rep = jnp.repeat(vm, bd, axis=0)

    @jax.jit
    def step(h, ids):
        return cm.apply(vs, h, emb[ids], tgt_rep, of_rep, vm_rep,
                        method=cm.step)

    z = jnp.zeros((n * bd, cm.hidden_size))
    st = []
    for _ in range(g_n):
        sc = np.full((n, bd), neg, np.float32)
        sc[:, 0] = 0.0
        st.append({
            "h": (z, z),
            "ids": np.full((n, bd), cm.sos_id, np.int32),
            "scores": sc,
            "done": np.zeros((n, bd), bool),
            "words": [], "srcs": [], "lps": [],
        })

    pad_only = np.full((n, bd, v), neg, np.float32)
    pad_only[:, :, cm.pad_id] = 0.0
    for t in range(t_steps + g_n - 1):
        for g in range(g_n):
            tau = t - g
            if not (0 <= tau < t_steps):
                continue
            s = st[g]
            logits, h_new, _ = step(
                s["h"], jnp.asarray(s["ids"].reshape(-1)))
            lp_all = np.asarray(
                jax.nn.log_softmax(logits, -1)).reshape(n, bd, v)
            lp_un = np.where(s["done"][..., None], pad_only, lp_all)
            if g > 0:
                counts = np.zeros((n, v), np.float32)
                for gp in range(g):
                    w_prev = st[gp]["words"][tau]          # (n, bd) same tau
                    for b in range(bd):
                        counts[np.arange(n), w_prev[:, b]] += 1.0
                lp_aug = np.where(s["done"][..., None], lp_un,
                                  lp_un - lam * counts[:, None, :])
            else:
                lp_aug = lp_un
            cand = (s["scores"][:, :, None] + lp_aug).reshape(n, bd * v)
            top_scores, top_idx = jax.lax.top_k(jnp.asarray(cand), bd)
            top_scores, top_idx = np.asarray(top_scores), np.asarray(top_idx)
            src = top_idx // v
            word = (top_idx % v).astype(np.int32)
            step_lp = np.take_along_axis(
                lp_un.reshape(n, bd * v), top_idx, axis=1)
            s["done"] = np.take_along_axis(s["done"], src, 1) | (
                word == cm.eos_id)
            gidx = (np.arange(n)[:, None] * bd + src).reshape(-1)
            h1, h2 = h_new
            s["h"] = (jnp.asarray(np.asarray(h1)[gidx]),
                      jnp.asarray(np.asarray(h2)[gidx]))
            s["scores"] = top_scores
            s["ids"] = word
            s["words"].append(word)
            s["srcs"].append(src)
            s["lps"].append(step_lp)

    for g in range(g_n):
        s = st[g]
        seq = np.zeros((n, bd, t_steps), np.int32)
        lp = np.zeros((n, bd, t_steps), np.float32)
        ptr = np.tile(np.arange(bd), (n, 1))
        for tt in reversed(range(t_steps)):
            seq[:, :, tt] = np.take_along_axis(s["words"][tt], ptr, 1)
            lp[:, :, tt] = np.take_along_axis(s["lps"][tt], ptr, 1)
            ptr = np.take_along_axis(s["srcs"][tt], ptr, 1)
        sl = slice(g * bd, (g + 1) * bd)
        np.testing.assert_array_equal(seqs[:, sl], seq,
                                      err_msg=f"group {g} sequences")
        np.testing.assert_allclose(lps[:, sl], lp, rtol=1e-4, atol=1e-4,
                                   err_msg=f"group {g} logps")
        np.testing.assert_allclose(scores[:, sl], s["scores"], rtol=1e-4,
                                   atol=1e-4, err_msg=f"group {g} scores")
