"""Visual-grounding evaluation (parity: ``lib/grounding/eval_helper.py``).

Protocol: mask invalid proposals, pick the argmax-confidence proposal, score
its IoU against the referred GT box; report Acc@0.25/0.5 with
unique/multiple breakdowns (a description is "unique" when its object class
appears exactly once among the scene's GT boxes).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from d3net_tpu.utils.bbox import aabb_iou_corners


class GroundingEvaluator:
    def __init__(self):
        self.ious: List[float] = []
        self.unique: List[bool] = []

    def add(
        self,
        cluster_ref: np.ndarray,      # (N, P) confidences
        pred_corners: np.ndarray,     # (N, P, 8, 3)
        pred_mask: np.ndarray,        # (N, P)
        ref_corner_label: np.ndarray, # (N, 8, 3)
        annotated: np.ndarray,        # (N,)
        is_unique: np.ndarray = None, # (N,) unique-class flag per description
    ):
        conf = np.where(pred_mask > 0, cluster_ref, -1e30)
        pick = conf.argmax(-1)
        chosen = pred_corners[np.arange(len(pick)), pick]
        iou = aabb_iou_corners(chosen, ref_corner_label)
        for i in range(len(pick)):
            if annotated[i] <= 0:
                continue
            self.ious.append(float(iou[i]))
            self.unique.append(bool(is_unique[i]) if is_unique is not None else False)

    def compute(self) -> Dict[str, float]:
        if not self.ious:
            return {"acc@0.25": 0.0, "acc@0.5": 0.0, "iou_mean": 0.0}
        ious = np.asarray(self.ious)
        uniq = np.asarray(self.unique)
        out = {
            "acc@0.25": float((ious >= 0.25).mean()),
            "acc@0.5": float((ious >= 0.5).mean()),
            "iou_mean": float(ious.mean()),
        }
        if uniq.any():
            out["unique_acc@0.5"] = float((ious[uniq] >= 0.5).mean())
        if (~uniq).any():
            out["multiple_acc@0.5"] = float((ious[~uniq] >= 0.5).mean())
        return out
