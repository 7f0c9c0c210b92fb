"""mAP evaluator: matching semantics, AP modes, end-to-end perfect detector."""

import os

import numpy as np
import pytest
from PIL import Image

from jpeg_detection_resnet_ssd_tpu.data import (
    ClassificationPipeline,
    DetectionDataset,
    DetectionPipeline,
    ImageFolderDataset,
)
from jpeg_detection_resnet_ssd_tpu.eval import (
    ClassificationEvaluator,
    DetectionEvaluator,
    average_precision,
    match_predictions,
    num_gt_per_class,
    read_voc_detection_files,
    write_voc_detection_files,
)
from jpeg_detection_resnet_ssd_tpu.eval.map_eval import precision_recall


def test_match_predictions_semantics():
    gt = {
        "img0": (
            np.array([[1, 10, 10, 50, 50], [1, 100, 100, 150, 150]], float),
            np.array([False, True]),  # second box difficult -> neutral
        ),
    }
    preds = [
        [],
        [
            ("img0", 0.9, 10, 10, 50, 50),      # TP (exact)
            ("img0", 0.8, 11, 11, 51, 51),      # duplicate of matched GT -> FP
            ("img0", 0.7, 100, 100, 150, 150),  # matches difficult -> neutral
            ("img0", 0.6, 200, 200, 220, 220),  # IoU 0 -> FP
        ],
    ]
    cum_tp, cum_fp = match_predictions(preds, gt, n_classes=1)
    np.testing.assert_array_equal(cum_tp[1], [1, 1, 1, 1])
    np.testing.assert_array_equal(cum_fp[1], [0, 1, 1, 2])
    counts = num_gt_per_class(gt, 1)
    assert counts[1] == 1  # difficult box excluded


def test_average_precision_modes():
    # perfect detector: precision stays 1.0 while recall goes to 1.0
    prec = np.array([1.0, 1.0, 1.0, 1.0])
    rec = np.array([0.25, 0.5, 0.75, 1.0])
    assert average_precision(prec, rec, "sample") == pytest.approx(1.0)
    assert average_precision(prec, rec, "integrate") == pytest.approx(
        0.75, abs=1e-6
    )  # integration over [0.25, 1.0]
    # worst detector
    assert average_precision(np.zeros(4), rec, "sample") == 0.0


def test_precision_recall():
    prec, rec = precision_recall(np.array([1, 2, 2]), np.array([0, 0, 1]), 4)
    np.testing.assert_allclose(prec, [1, 1, 2 / 3])
    np.testing.assert_allclose(rec, [0.25, 0.5, 0.5])


def test_voc_writer_roundtrip(tmp_path):
    preds = [[] for _ in range(21)]
    preds[1].append(("000001", 0.75, 10.0, 20.0, 30.0, 40.0))
    preds[12].append(("000002", 0.5, 1.0, 2.0, 3.0, 4.0))
    write_voc_detection_files(preds, str(tmp_path))
    assert os.path.exists(tmp_path / "comp3_det_test_aeroplane.txt")
    back = read_voc_detection_files(str(tmp_path))
    assert back[1][0][0] == "000001"
    assert back[1][0][1] == pytest.approx(0.75)
    assert back[12][0][2:] == (1.0, 2.0, 3.0, 4.0)


@pytest.fixture
def voc_mini(tmp_path):
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets").mkdir()
    rng = np.random.default_rng(0)
    ids, gt_boxes = [], {}
    for i in range(3):
        image_id = f"00000{i}"
        ids.append(image_id)
        arr = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{image_id}.jpg")
        boxes = [[3, 30 + i * 5, 40, 130 + i * 5, 140], [7, 150, 20, 280, 120]]
        gt_boxes[image_id] = np.array(boxes, float)
        objs = "".join(
            f"<object><name>{'bird' if b[0] == 3 else 'car'}</name>"
            f"<difficult>0</difficult>"
            f"<bndbox><xmin>{b[1]}</xmin><ymin>{b[2]}</ymin>"
            f"<xmax>{b[3]}</xmax><ymax>{b[4]}</ymax></bndbox></object>"
            for b in boxes
        )
        (root / "Annotations" / f"{image_id}.xml").write_text(
            f"<annotation>{objs}</annotation>"
        )
    (root / "ImageSets" / "test.txt").write_text("\n".join(ids) + "\n")
    return str(root), gt_boxes, ids


def test_end_to_end_perfect_detector(voc_mini):
    root, gt_boxes, ids = voc_mini
    ds = DetectionDataset.from_voc(
        os.path.join(root, "JPEGImages"),
        os.path.join(root, "ImageSets", "test.txt"),
        os.path.join(root, "Annotations"),
    )
    pipe = DetectionPipeline(ds, batch_size=3, train=False, encoder=None,
                             num_workers=2)
    order = list(ids)  # eval order = dataset order (no shuffle)

    def perfect_infer(inputs):
        # Emit GT boxes (converted to the 300x300 resized frame) as
        # detections with confidence 0.9, padded to 10 rows.
        out = np.zeros((3, 10, 6), np.float32)
        for i, image_id in enumerate(order):
            boxes = gt_boxes[image_id]
            for j, b in enumerate(boxes):
                # original 300x200 -> resized 300x300: x scale 1, y scale 1.5
                out[i, j] = [b[0], 0.9, b[1], b[2] * 1.5, b[3], b[4] * 1.5]
        return out

    ev = DetectionEvaluator(perfect_infer, pipe, n_classes=20)
    mean_ap, aps, _ = ev(average_precision_mode="sample")
    assert aps[3] == pytest.approx(1.0, abs=1e-6)   # bird
    assert aps[7] == pytest.approx(1.0, abs=1e-6)   # car
    # classes with no GT and no predictions contribute AP 0
    assert mean_ap == pytest.approx(2.0 / 20.0, abs=1e-6)


def test_classification_evaluator(tmp_path):
    root = tmp_path / "cls"
    rng = np.random.default_rng(0)
    for c in ["a", "b"]:
        (root / c).mkdir(parents=True)
        for j in range(2):
            arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / c / f"{j}.jpeg")
    ds = ImageFolderDataset(str(root))
    pipe = ClassificationPipeline(ds, 2, train=False, input_format="rgb",
                                  image_size=64, num_workers=2)

    labels_by_batch = iter(
        [np.array([0, 0]), np.array([1, 1])]
    )  # dataset order: class a then b

    def oracle_infer(inputs):
        labels = next(labels_by_batch)
        return np.eye(2)[labels] * 10.0

    ev = ClassificationEvaluator(oracle_infer, pipe)
    res = ev()
    assert res["top1"] == 1.0 and res["count"] == 4
