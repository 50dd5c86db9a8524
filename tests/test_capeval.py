import numpy as np

from d3net_tpu.eval.capeval import Cider, bleu, rouge_l
from d3net_tpu.eval import capeval


def test_bleu_perfect_match():
    gts = {"0": ["the red chair near the table"]}
    cands = {"0": ["the red chair near the table"]}
    corpus, sent = bleu(gts, cands)
    assert np.isclose(corpus[3], 1.0, atol=1e-6)
    assert np.isclose(sent[3][0], 1.0, atol=1e-3)


def test_bleu_no_overlap():
    gts = {"0": ["aa bb cc dd ee"]}
    cands = {"0": ["xx yy zz ww vv"]}
    corpus, _ = bleu(gts, cands)
    assert corpus[3] < 1e-3


def test_bleu_brevity_penalty():
    gts = {"0": ["a b c d e f g h"]}
    short = {"0": ["a b c d"]}
    full = {"0": ["a b c d e f g h"]}
    c_short, _ = bleu(gts, short)
    c_full, _ = bleu(gts, full)
    assert c_short[0] < c_full[0]  # penalized despite perfect precision


def test_cider_perfect_and_scaled():
    gts = {
        "0": ["the chair is red eos"],
        "1": ["a large table eos"],
    }
    cands = {"0": ["the chair is red eos"], "1": ["a large table eos"]}
    mean, scores = Cider().compute_score(gts, cands)
    # perfect match: cosine sim 1 per n-gram order, x10
    assert all(s > 9.0 for s in scores)
    # unrelated candidate scores ~0
    cands2 = {"0": ["zz ww vv uu tt"], "1": ["a large table eos"]}
    _, scores2 = Cider().compute_score(gts, cands2)
    assert scores2[0] < 0.5
    assert scores2[1] > 5.0


def test_cider_sos_eos_replacement_scores_low():
    # the eval protocol replaces bad-IoU captions with "sos eos"
    # (single-key corpora give idf=0 like the COCO port, so use 2 keys)
    gts = {"0": ["sos the chair is red eos"], "1": ["sos a tall cabinet eos"]}
    good = {"0": ["sos the chair is red eos"], "1": ["sos a tall cabinet eos"]}
    bad = {"0": ["sos eos"], "1": ["sos a tall cabinet eos"]}
    _, sg = Cider().compute_score(gts, good)
    _, sb = Cider().compute_score(gts, bad)
    assert sg[0] > sb[0]


def test_rouge_l():
    gts = {"0": ["the red chair near the table"]}
    assert rouge_l(gts, {"0": ["the red chair near the table"]})[0] > 0.999
    assert rouge_l(gts, {"0": ["zz ww"]})[0] < 1e-6
    partial = rouge_l(gts, {"0": ["the chair near table"]})[0]
    assert 0.3 < partial < 1.0


# ---------------------------------------------------------------------------
# METEOR (clean-room pure-Python; classic parameters)
# ---------------------------------------------------------------------------

def test_meteor_identical_sentence():
    gts = {"0": ["the red chair near the table"]}
    cands = {"0": ["the red chair near the table"]}
    mean, scores = capeval.meteor(gts, cands)
    # perfect match, one chunk: P=R=1, fmean=1, penalty=0.5*(1/6)^3
    want = 1.0 * (1.0 - 0.5 * (1 / 6) ** 3)
    assert abs(mean - want) < 1e-9


def test_meteor_no_overlap_zero():
    mean, _ = capeval.meteor({"0": ["cat dog"]}, {"0": ["sofa window"]})
    assert mean == 0.0


def test_meteor_hand_computed():
    # cand: "the chair" vs ref: "the red chair" — matches: the->the(0),
    # chair->chair(2): m=2, P=2/2=1, R=2/3, chunks=2 (non-adjacent in ref)
    mean, _ = capeval.meteor({"0": ["the red chair"]}, {"0": ["the chair"]})
    p, r, m, ch = 1.0, 2 / 3, 2, 2
    fmean = p * r / (0.9 * p + 0.1 * r)
    want = fmean * (1 - 0.5 * (ch / m) ** 3)
    assert abs(mean - want) < 1e-9


def test_meteor_stem_stage_matches():
    # "chairs" should stem-match "chair"
    mean, _ = capeval.meteor({"0": ["the chairs"]}, {"0": ["the chair"]})
    assert mean > 0.5


def test_meteor_word_order_penalty():
    # same words, scrambled order -> more chunks -> lower score
    good, _ = capeval.meteor({"0": ["a b c d e f"]}, {"0": ["a b c d e f"]})
    bad, _ = capeval.meteor({"0": ["a b c d e f"]}, {"0": ["f e d c b a"]})
    assert bad < good


def test_meteor_multi_reference_takes_best():
    gts = {"0": ["completely unrelated words here", "the red chair"]}
    cands = {"0": ["the red chair"]}
    mean, _ = capeval.meteor(gts, cands)
    want = 1.0 * (1.0 - 0.5 * (1 / 3) ** 3)
    assert abs(mean - want) < 1e-9


def test_meteor_jar_protocol(tmp_path, monkeypatch):
    """The MeteorJar wrapper speaks meteor-1.5's -stdio protocol exactly
    (SCORE ||| refs ||| cand -> stats; EVAL ||| stats... -> per-segment
    scores then aggregate).  A mock scorer stands in for the jar (no java
    in this image); where java + meteor-1.5.jar exist the same wrapper
    drives the official scorer and meteor() uses it automatically."""
    import os
    import stat
    import sys

    from d3net_tpu.eval import capeval

    mock = tmp_path / "mock_meteor.py"
    mock.write_text(
        "import sys\n"
        "stats = []\n"
        "for line in sys.stdin:\n"
        "    parts = [p.strip() for p in line.split('|||')]\n"
        "    if parts[0] == 'SCORE':\n"
        "        # stat = n_refs * 100 + len(cand words)\n"
        "        s = (len(parts) - 2) * 100 + len(parts[-1].split())\n"
        "        print(s); sys.stdout.flush()\n"
        "    elif parts[0] == 'EVAL':\n"
        "        vals = [float(p) for p in parts[1:]]\n"
        "        for v in vals: print(v / 1000.0)\n"
        "        print(sum(vals) / len(vals) / 1000.0)\n"
        "        sys.stdout.flush()\n"
    )
    monkeypatch.setenv("D3NET_METEOR_CMD", f"{sys.executable} {mock}")
    gts = {"a": ["the red chair", "a chair that is red"],
           "b": ["a wooden table"]}
    cands = {"a": ["the red chair"], "b": ["a table"]}
    mean, scores = capeval.meteor(gts, cands)
    # a: 2 refs + 3 cand words -> 203; b: 1 ref + 2 words -> 102
    assert scores == [0.203, 0.102]
    assert abs(mean - (203 + 102) / 2 / 1000.0) < 1e-9


def test_meteor_python_fallback_without_jar(monkeypatch):
    monkeypatch.delenv("D3NET_METEOR_CMD", raising=False)
    monkeypatch.delenv("D3NET_METEOR_JAR", raising=False)
    from d3net_tpu.eval import capeval

    gts = {"x": ["a red chair near the table"]}
    cands = {"x": ["a red chair near the table"]}
    mean, scores = capeval.meteor(gts, cands)
    assert 0.9 < mean <= 1.0  # perfect match, single chunk
