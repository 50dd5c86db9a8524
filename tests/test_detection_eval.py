import numpy as np

from d3net_tpu.eval.detection import (
    APCalculator,
    eval_det,
    parse_groundtruths,
    parse_predictions,
    sem_to_box_class,
    voc_ap,
)
from d3net_tpu.utils.bbox import box_corners


def _box(cx, cy, cz, dx, dy, dz):
    return box_corners(np.array([cx, cy, cz]), np.array([dx, dy, dz]))


def test_sem_to_box_class_remap():
    sem = np.array([0, 1, 2, 10, 19])
    np.testing.assert_array_equal(sem_to_box_class(sem), [17, 17, 0, 8, 17])


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert np.isclose(voc_ap(rec, prec), 1.0)


def test_voc_ap_half():
    # 2 GT, 2 dets: first TP, second FP -> rec [0.5,0.5], prec [1.0,0.5]
    rec = np.array([0.5, 0.5])
    prec = np.array([1.0, 0.5])
    assert np.isclose(voc_ap(rec, prec), 0.5)


def test_eval_det_perfect_detection():
    gt_box = _box(0, 0, 0, 1, 1, 1)
    pred = {0: [(3, gt_box, 0.9)]}
    gt = {0: [(3, gt_box)]}
    aps, _rec = eval_det(pred, gt, ovthresh=0.5)
    assert np.isclose(aps[3], 1.0)


def test_eval_det_miss_and_fp():
    gt_box = _box(0, 0, 0, 1, 1, 1)
    far_box = _box(10, 10, 10, 1, 1, 1)
    pred = {0: [(3, far_box, 0.9)]}  # FP only
    gt = {0: [(3, gt_box)]}
    aps, _rec = eval_det(pred, gt, ovthresh=0.5)
    assert aps[3] == 0.0


def test_eval_det_duplicate_detection_is_fp():
    gt_box = _box(0, 0, 0, 1, 1, 1)
    pred = {0: [(3, gt_box, 0.9), (3, gt_box, 0.8)]}
    gt = {0: [(3, gt_box)]}
    aps, _rec = eval_det(pred, gt, ovthresh=0.5)
    # one TP one FP on single GT: rec=[1,1], prec=[1,.5] -> AP 1.0
    assert np.isclose(aps[3], 1.0)


def test_parse_predictions_nms_and_threshold():
    b1 = _box(0, 0, 0, 1, 1, 1)
    b2 = _box(0.02, 0, 0, 1, 1, 1)  # overlaps b1, same class -> suppressed
    b3 = _box(5, 5, 5, 1, 1, 1)
    corners = np.stack([b1, b2, b3])[None]
    sem = np.array([[4, 4, 6]])
    prob = np.array([[0.9, 0.8, 0.05]])  # b3 below conf threshold
    mask = np.ones((1, 3))
    preds = parse_predictions(corners, sem, prob, mask, nms_iou=0.5, conf_thresh=0.09)
    assert len(preds) == 1
    assert len(preds[0]) == 1
    cls, box, score = preds[0][0]
    assert cls == 2 and score == 0.9


def test_ap_calculator_end_to_end():
    gt_center = np.array([[[0, 0, 0.5], [3, 3, 0.5]]], np.float32)
    gt_size = np.array([[[1, 1, 1], [1, 1, 1]]], np.float32)
    gt_sem = np.array([[5, 7]])
    gt_mask = np.ones((1, 2))
    gts = parse_groundtruths(gt_center, gt_size, gt_sem, gt_mask)

    # predictions: perfect box for first, slightly-off for second
    pred_corners = np.stack(
        [_box(0, 0, 0.5, 1, 1, 1), _box(3.05, 3, 0.5, 1, 1, 1)]
    )[None]
    preds = parse_predictions(
        pred_corners,
        np.array([[5, 7]]),
        np.array([[0.9, 0.85]]),
        np.ones((1, 2)),
    )
    calc = APCalculator(0.5)
    calc.step(preds, gts)
    m = calc.compute_metrics()
    assert np.isclose(m["mAP"], 1.0)
    # at a brutal threshold the off-box fails
    calc9 = APCalculator(0.95)
    calc9.step(preds, gts)
    assert calc9.compute_metrics()["mAP"] < 1.0


def test_eval_det_recall_and_ar():
    gt_box = _box(0, 0, 0, 1, 1, 1)
    far_box = _box(10, 10, 10, 1, 1, 1)
    # class 3: 2 GT, one found -> recall 0.5; class 4: 1 GT, found -> 1.0
    pred = {0: [(3, gt_box, 0.9), (4, gt_box, 0.9)]}
    gt = {0: [(3, gt_box), (3, far_box), (4, gt_box)]}
    aps, rec = eval_det(pred, gt, ovthresh=0.5)
    assert np.isclose(rec[3], 0.5) and np.isclose(rec[4], 1.0)
    calc = APCalculator(0.5)
    calc.step([pred[0]], [gt[0]])
    m = calc.compute_metrics()
    assert np.isclose(m["AR"], 0.75) and "Recall_3" in m
