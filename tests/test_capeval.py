import numpy as np

from d3net_tpu.eval.capeval import Cider, bleu, rouge_l


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
