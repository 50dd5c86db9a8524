import numpy as np

from d3net_tpu.eval.segmentation import (
    InstanceEvaluator,
    semantic_confusion,
    semantic_iou,
)


def test_semantic_iou_perfect():
    gt = np.array([0, 1, 2, 2, -1])
    pred = np.array([0, 1, 2, 2, 0])
    conf = semantic_confusion(pred, gt, 3)
    m = semantic_iou(conf)
    assert np.isclose(m["mIoU"], 1.0)
    assert np.isclose(m["accuracy"], 1.0)


def test_semantic_iou_half():
    gt = np.array([0, 0, 1, 1])
    pred = np.array([0, 1, 1, 1])
    conf = semantic_confusion(pred, gt, 2)
    m = semantic_iou(conf)
    # class0: tp1 fp0 fn1 -> 0.5; class1: tp2 fp1 fn0 -> 2/3
    assert np.isclose(m["per_class_iou"][0], 0.5)
    assert np.isclose(m["per_class_iou"][1], 2 / 3)


def test_instance_ap_perfect():
    n = 400
    gt_ids = np.concatenate([np.zeros(200), np.ones(200)]).astype(np.int64)
    gt_sem = np.concatenate([np.full(200, 3), np.full(200, 5)])
    preds = [
        (gt_ids == 0, 3, 0.9),
        (gt_ids == 1, 5, 0.8),
    ]
    ev = InstanceEvaluator()
    ev.add_scene(preds, gt_ids, gt_sem)
    m = ev.compute()
    assert np.isclose(m["AP"], 1.0)
    assert np.isclose(m["AP@50"], 1.0)


def test_instance_ap_partial_overlap():
    n = 400
    gt_ids = np.concatenate([np.zeros(200), np.ones(200)]).astype(np.int64)
    gt_sem = np.full(400, 3)
    # prediction covers 60% of instance 0 only
    mask = np.zeros(n, bool)
    mask[:120] = True
    ev = InstanceEvaluator()
    ev.add_scene([(mask, 3, 0.9)], gt_ids, gt_sem)
    m = ev.compute()
    # IoU = 120/200 = 0.6: TP at 0.5/0.55, FP at >=0.6; recall caps at 0.5
    assert m["AP@50"] > 0
    assert m["AP@50"] <= 0.5 + 1e-6
    assert m["AP@25"] > 0
