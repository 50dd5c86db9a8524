"""Dense-captioning evaluation (parity: ``lib/captioning/eval_helper.py``).

Protocol (C@kIoU):
1. For each scene, the speaker captions every proposal (eval mode).
2. GT boxes are assigned to predicted boxes by hungarian matching on the
   GIoU matrix (``assign_dense_caption`` :102-240; scipy
   linear_sum_assignment on -GIoU).
3. Each GT object's candidate caption is its assigned proposal's caption;
   if the assignment IoU < min_iou the candidate is replaced by "sos eos"
   (:75-100), zeroing its n-gram overlap.
4. Corpus BLEU-4 / CIDEr / ROUGE-L (/ METEOR when available) over
   {scene|object} keys.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

from d3net_tpu.eval import capeval
from d3net_tpu.utils.bbox import corners_to_minmax, pairwise_giou_matrix, \
    aabb_iou_minmax


def assign_dense_caption(
    pred_corners: np.ndarray,   # (P, 8, 3)
    pred_mask: np.ndarray,      # (P,)
    gt_corners: np.ndarray,     # (I, 8, 3)
    gt_mask: np.ndarray,        # (I,)
) -> List[Tuple[int, int, float]]:
    """Hungarian GIoU assignment: [(gt_idx, pred_idx, iou)] per valid GT."""
    valid_p = np.where(pred_mask > 0)[0]
    valid_g = np.where(gt_mask > 0)[0]
    if len(valid_p) == 0 or len(valid_g) == 0:
        return [(int(g), -1, 0.0) for g in valid_g]
    pmin, pmax = corners_to_minmax(pred_corners[valid_p])
    gmin, gmax = corners_to_minmax(gt_corners[valid_g])
    giou = pairwise_giou_matrix(gmin, gmax, pmin, pmax)  # (G, P)
    rows, cols = linear_sum_assignment(-giou)
    iou = aabb_iou_minmax(
        gmin[rows], gmax[rows], pmin[cols], pmax[cols]
    )
    out = []
    assigned = {}
    for r, c, i in zip(rows, cols, iou):
        assigned[int(valid_g[r])] = (int(valid_p[c]), float(i))
    for g in valid_g:
        pred_idx, i = assigned.get(int(g), (-1, 0.0))
        out.append((int(g), pred_idx, i))
    return out


class CaptionEvaluator:
    """Accumulates per-scene candidates and computes corpus metrics."""

    def __init__(self, min_iou: float = 0.5):
        self.min_iou = min_iou
        self.gts: Dict[str, List[str]] = {}
        self.cands: Dict[str, List[str]] = {}

    def add_scene(
        self,
        scene_id: str,
        captions: List[str],        # per-proposal decoded strings (P,)
        pred_corners: np.ndarray,
        pred_mask: np.ndarray,
        gt_corners: np.ndarray,
        gt_mask: np.ndarray,
        gt_descriptions: Dict[int, List[str]],  # gt idx -> reference strings
    ):
        pairs = assign_dense_caption(pred_corners, pred_mask, gt_corners, gt_mask)
        for g, p, iou in pairs:
            refs = gt_descriptions.get(g)
            if not refs:
                continue
            key = f"{scene_id}|{g}"
            self.gts[key] = [f"sos {r} eos" for r in refs]
            if p >= 0 and iou >= self.min_iou:
                self.cands[key] = [captions[p]]
            else:
                self.cands[key] = ["sos eos"]

    def compute(self) -> Dict[str, float]:
        if not self.cands:
            return {"bleu4": 0.0, "cider": 0.0, "rouge": 0.0, "meteor": 0.0}
        corpus_bleu, _ = capeval.bleu(self.gts, self.cands, 4)
        cider, _ = capeval.Cider().compute_score(self.gts, self.cands)
        rouge, _ = capeval.rouge_l(self.gts, self.cands)
        if capeval.meteor_available():
            met, _ = capeval.meteor(self.gts, self.cands)
        else:  # nltk (Porter stemmer) absent — report 0 rather than crash
            met = 0.0
        return {"bleu4": corpus_bleu[3], "cider": cider, "rouge": rouge,
                "meteor": met}


def decode_captions(ids: np.ndarray, vocab) -> List[str]:
    """(P, T) token ids -> 'sos w1 w2 ... eos' strings (eval candidate form)."""
    out = []
    for row in ids:
        words = vocab.decode(row, stop_at_eos=True)
        out.append(" ".join(["sos"] + words + ["eos"]))
    return out
