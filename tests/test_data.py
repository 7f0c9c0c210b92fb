"""Datasets, augmentation ops and input pipelines over a synthetic mini-corpus."""

import os

import numpy as np
import pytest
from PIL import Image

from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec, TargetEncoder
from jpeg_detection_resnet_ssd_tpu.data import (
    ClassificationPipeline,
    DetectionDataset,
    DetectionPipeline,
    ImageFolderDataset,
    parse_detection_csv,
    parse_voc_xml,
)
from jpeg_detection_resnet_ssd_tpu.data import augment as aug

SSD300_PREDICTOR_SIZES = ((38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1))


def _write_jpeg(path, size=(120, 160), seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path, "jpeg")


@pytest.fixture
def imagenet_root(tmp_path):
    root = tmp_path / "imagenet"
    for i, wnid in enumerate(["n01440764", "n01443537", "n01484850"]):
        d = root / wnid
        d.mkdir(parents=True)
        for j in range(3):
            _write_jpeg(str(d / f"img_{j}.JPEG".lower()), seed=i * 10 + j)
    return str(root)


@pytest.fixture
def voc_root(tmp_path):
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets").mkdir()
    ids = []
    for i in range(4):
        image_id = f"00000{i}"
        ids.append(image_id)
        _write_jpeg(str(root / "JPEGImages" / f"{image_id}.jpg"),
                    size=(200, 300), seed=i)
        xml = f"""<annotation>
  <size><width>300</width><height>200</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult><truncated>0</truncated>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>110</xmax><ymax>120</ymax></bndbox>
  </object>
  <object><name>person</name><difficult>1</difficult><truncated>0</truncated>
    <bndbox><xmin>150</xmin><ymin>50</ymin><xmax>250</xmax><ymax>150</ymax></bndbox>
  </object>
</annotation>"""
        (root / "Annotations" / f"{image_id}.xml").write_text(xml)
    (root / "ImageSets" / "trainval.txt").write_text("\n".join(ids) + "\n")
    return str(root)


class TestDatasets:
    def test_image_folder(self, imagenet_root):
        ds = ImageFolderDataset(imagenet_root)
        assert len(ds) == 9
        assert ds.num_classes == 3
        path, label = ds[0]
        assert os.path.exists(path) and label == 0
        s0, s1 = ds.shard(0, 2), ds.shard(1, 2)
        assert len(s0) + len(s1) == 9
        assert set(p for p, _ in s0.samples).isdisjoint(
            p for p, _ in s1.samples
        )

    def test_voc_parse(self, voc_root):
        recs = parse_voc_xml(
            os.path.join(voc_root, "JPEGImages"),
            os.path.join(voc_root, "ImageSets", "trainval.txt"),
            os.path.join(voc_root, "Annotations"),
        )
        assert len(recs) == 4
        r = recs[0]
        assert r["boxes"].shape == (2, 5)
        assert r["boxes"][0, 0] == 12  # 'dog' -> class 12 (1-indexed VOC order)
        assert r["boxes"][1, 0] == 15  # 'person'
        np.testing.assert_allclose(r["boxes"][0, 1:], [10, 20, 110, 120])
        assert list(r["difficult"]) == [False, True]

    def test_voc_exclude_difficult(self, voc_root):
        recs = parse_voc_xml(
            os.path.join(voc_root, "JPEGImages"),
            os.path.join(voc_root, "ImageSets", "trainval.txt"),
            os.path.join(voc_root, "Annotations"),
            include_difficult=False,
        )
        assert recs[0]["boxes"].shape == (1, 5)

    def test_csv_parse(self, tmp_path, voc_root):
        csv_path = tmp_path / "labels.csv"
        csv_path.write_text(
            "image_name,xmin,xmax,ymin,ymax,class_id\n"
            "000000.jpg,10,110,20,120,3\n"
            "000000.jpg,5,50,5,50,1\n"
        )
        recs = parse_detection_csv(
            str(csv_path), os.path.join(voc_root, "JPEGImages")
        )
        assert len(recs) == 1 and recs[0]["boxes"].shape == (2, 5)
        np.testing.assert_allclose(recs[0]["boxes"][0], [3, 10, 20, 110, 120])

    def test_dataset_save_load(self, voc_root, tmp_path):
        ds = DetectionDataset.from_voc(
            os.path.join(voc_root, "JPEGImages"),
            os.path.join(voc_root, "ImageSets", "trainval.txt"),
            os.path.join(voc_root, "Annotations"),
        )
        p = str(tmp_path / "ds.pkl")
        ds.save(p)
        ds2 = DetectionDataset.load(p)
        assert len(ds2) == len(ds)


class TestAugment:
    def test_hflip_boxes(self):
        img = np.zeros((100, 200, 3), np.uint8)
        labels = np.array([[1, 10, 20, 60, 80]], np.float32)
        out, lab = aug.horizontal_flip(img, labels)
        np.testing.assert_allclose(lab[0], [1, 140, 20, 190, 80])

    def test_crop_patch_center_criterion(self):
        img = np.full((100, 100, 3), 50, np.uint8)
        labels = np.array(
            [[1, 10, 10, 30, 30],      # center (20,20) inside patch
             [2, 70, 70, 95, 95]],     # center (82.5,82.5) outside
            np.float32,
        )
        out, lab = aug.crop_patch(img, labels, 0, 0, 50, 50)
        assert out.shape == (50, 50, 3)
        assert lab.shape == (1, 5) and lab[0, 0] == 1

    def test_expand_keeps_boxes(self, rng):
        img = np.full((60, 80, 3), 100, np.uint8)
        labels = np.array([[1, 10, 10, 40, 40]], np.float32)
        ex = aug.SSDExpand()
        for _ in range(10):
            out, lab = ex(img, labels, rng)
            assert lab.shape == (1, 5)
            # box size preserved by pure translation/canvas placement
            np.testing.assert_allclose(lab[0, 3] - lab[0, 1], 30)

    def test_ssd_random_crop_terminates_and_valid(self, rng):
        img = np.full((120, 120, 3), 100, np.uint8)
        labels = np.array([[1, 30, 30, 90, 90]], np.float32)
        crop = aug.SSDRandomCrop()
        for _ in range(10):
            out, lab = crop(img, labels, rng)
            assert out.ndim == 3
            if lab is not None and len(lab):
                assert (lab[:, 3] > lab[:, 1]).all()

    def test_photometric_chain_ranges(self, rng):
        img = np.full((32, 32, 3), 128, np.uint8)
        out, _ = aug.SSDPhotometricDistortions()(img, None, rng)
        assert out.dtype == np.uint8 and out.shape == (32, 32, 3)

    def test_resize_inverter_roundtrip(self):
        img = np.zeros((150, 100, 3), np.uint8)
        labels = np.array([[1, 10, 30, 50, 90]], np.float32)
        out, lab, inv = aug.resize(img, labels, 300, 300, return_inverter=True)
        assert out.shape == (300, 300, 3)
        back = inv(lab)
        np.testing.assert_allclose(back[0, 1:], [10, 30, 50, 90], atol=1e-4)

    def test_classification_views(self, rng):
        img = (rng.uniform(0, 255, (180, 240, 3))).astype(np.uint8)
        train = aug.classification_train_view(img, rng)
        assert train.shape == (224, 224, 3)
        ev = aug.classification_eval_view(img)
        assert ev.shape == (224, 224, 3)

    def test_rotate90_boxes(self):
        img = np.zeros((100, 200, 3), np.uint8)
        labels = np.array([[1, 10, 20, 60, 80]], np.float32)
        out, lab = aug.rotate90(img, labels, 1)
        assert out.shape == (200, 100, 3)
        # 90 deg CCW: new_x = y, new_y = W - x
        np.testing.assert_allclose(lab[0], [1, 20, 140, 80, 190])


class TestBoxValidation:
    """Standalone `BoxFilter`/`ImageValidator`/`BoundGenerator`
    (`object_detection_2d_image_boxes_validation_utils.py:28,79,234`)."""

    LABELS = np.array(
        [[1, 10, 10, 50, 50],      # fully inside 100x100
         [2, 80, 80, 140, 140],    # partially outside, center (110,110) out
         [3, 120, 120, 160, 160],  # fully outside
         [4, 30, 30, 32, 32],      # tiny (area 4)
         [5, 40, 40, 40, 60]],     # degenerate (xmax == xmin)
        np.float32,
    )

    def test_center_point(self):
        out = aug.box_filter(
            self.LABELS, 100, 100, overlap_criterion="center_point",
            check_min_area=False, check_degenerate=False,
        )
        assert sorted(out[:, 0]) == [1, 4, 5]

    def test_degenerate_and_min_area(self):
        out = aug.box_filter(
            self.LABELS, 100, 100, check_overlap=False,
            check_min_area=True, check_degenerate=True, min_area=16,
        )
        # drops the degenerate (5) and the 4-px box (4)
        assert sorted(out[:, 0]) == [1, 2, 3]

    def test_area_criterion(self):
        out = aug.box_filter(
            self.LABELS[:3], 100, 100, overlap_criterion="area",
            overlap_bounds=(0.3, 1.0), check_min_area=False,
            check_degenerate=False,
        )
        # box 1 fully inside (ratio 1); box 2 ~ (19*19)/(60*60) ≈ 0.10 < .3;
        # box 3 fully outside
        assert list(out[:, 0]) == [1]

    def test_iou_criterion(self):
        big = np.array([[7, 0, 0, 100, 100]], np.float32)
        out = aug.box_filter(
            big, 100, 100, overlap_criterion="iou",
            overlap_bounds=(0.5, 1.0), check_min_area=False,
            check_degenerate=False,
        )
        assert len(out) == 1
        out = aug.box_filter(
            self.LABELS[2:3], 100, 100, overlap_criterion="iou",
            overlap_bounds=(0.1, 1.0), check_min_area=False,
            check_degenerate=False,
        )
        assert len(out) == 0

    def test_image_validator(self):
        assert aug.image_is_valid(self.LABELS[:1], 100, 100, n_boxes_min=1)
        assert not aug.image_is_valid(
            self.LABELS[:3], 100, 100, n_boxes_min="all"
        )
        # no valid boxes at all
        assert not aug.image_is_valid(self.LABELS[2:3], 100, 100)

    def test_bound_generator(self, rng):
        bg = aug.BoundGenerator()
        seen = set()
        for _ in range(100):
            lo, hi = bg(rng)
            assert 0.0 <= lo <= hi <= 1.0
            seen.add((lo, hi))
        assert len(seen) == 6  # all six sample-space entries reachable
        with pytest.raises(ValueError):
            aug.BoundGenerator(sample_space=((0.9, 0.1),))

    def test_bound_generator_in_box_filter(self, rng):
        out = aug.box_filter(
            self.LABELS[:2], 100, 100, overlap_criterion="iou",
            overlap_bounds=aug.BoundGenerator(sample_space=((0.0, 1.0),)),
            check_min_area=False, check_degenerate=False, rng=rng,
        )
        assert len(out) == 2


class TestFixedARPatches:
    def test_max_crop_fixed_ar_shape(self, rng):
        img = np.full((100, 200, 3), 90, np.uint8)
        labels = np.array([[1, 90, 40, 110, 60]], np.float32)
        op = aug.RandomMaxCropFixedAR(patch_aspect_ratio=1.0)
        for _ in range(10):
            out, lab = op(img, labels, rng)
            assert out.shape == (100, 100, 3)  # largest 1:1 patch of 100x200

    def test_max_crop_fixed_ar_validator_fallback(self, rng):
        img = np.full((100, 300, 3), 90, np.uint8)
        # box at the far right; validator demands a box in every patch
        labels = np.array([[1, 280, 40, 299, 60]], np.float32)
        validator = lambda lab, h, w, r: aug.image_is_valid(
            lab, h, w, n_boxes_min=1
        )
        op = aug.RandomMaxCropFixedAR(1.0, n_trials_max=50,
                                      image_validator=validator)
        out, lab = op(img, labels, rng)
        if out.shape == (100, 100, 3):   # found a valid patch: box kept
            assert len(lab) == 1
        else:                            # fell back to the input unchanged
            assert out.shape == (100, 300, 3)

    def test_pad_fixed_ar(self, rng):
        img = np.full((100, 40, 3), 90, np.uint8)
        labels = np.array([[1, 5, 10, 35, 90]], np.float32)
        op = aug.RandomPadFixedAR(patch_aspect_ratio=2.0)
        out, lab = op(img, labels, rng)
        assert out.shape == (100, 200, 3)  # padded to 2:1, keeps full image
        assert len(lab) == 1
        np.testing.assert_allclose(lab[0, 4] - lab[0, 2], 80)  # height kept


class TestPipelines:
    def test_classification_dct(self, imagenet_root):
        ds = ImageFolderDataset(imagenet_root)
        pipe = ClassificationPipeline(ds, 4, train=True, input_format="dct",
                                      num_workers=2)
        batch = next(iter(pipe))
        y, cbcr = batch["inputs"]
        assert y.shape == (4, 28, 28, 64)
        assert cbcr.shape == (4, 14, 14, 128)
        assert batch["labels"].shape == (4,)

    def test_classification_deconv_and_rgb(self, imagenet_root):
        ds = ImageFolderDataset(imagenet_root)
        b = next(iter(ClassificationPipeline(
            ds, 2, train=False, input_format="dct_deconv", num_workers=2)))
        y, cb, cr = b["inputs"]
        assert cb.shape == (2, 14, 14, 64) and cr.shape == (2, 14, 14, 64)
        b = next(iter(ClassificationPipeline(
            ds, 2, train=False, input_format="rgb", num_workers=2)))
        assert b["inputs"].shape == (2, 224, 224, 3)

    def test_detection_training_targets(self, voc_root):
        ds = DetectionDataset.from_voc(
            os.path.join(voc_root, "JPEGImages"),
            os.path.join(voc_root, "ImageSets", "trainval.txt"),
            os.path.join(voc_root, "Annotations"),
        )
        enc = TargetEncoder(
            spec=AnchorSpec(), predictor_sizes=SSD300_PREDICTOR_SIZES,
            n_classes=20,
        )
        pipe = DetectionPipeline(ds, 2, train=True, encoder=enc,
                                 num_workers=2)
        batch = next(iter(pipe))
        y, cbcr = batch["inputs"]
        assert y.shape == (2, 38, 38, 64)
        assert cbcr.shape == (2, 19, 19, 128)
        assert batch["targets"].shape == (2, 8732, 33)
        # there must be at least one positive anchor per image with GT
        pos = batch["targets"][..., 1:21].max(-1)
        assert (pos.sum(axis=1) >= 1).all()

    def test_detection_eval_mode(self, voc_root):
        ds = DetectionDataset.from_voc(
            os.path.join(voc_root, "JPEGImages"),
            os.path.join(voc_root, "ImageSets", "trainval.txt"),
            os.path.join(voc_root, "Annotations"),
        )
        pipe = DetectionPipeline(ds, 2, train=False, encoder=None,
                                 num_workers=2)
        batch = next(iter(pipe))
        assert len(batch["image_ids"]) == 2
        inv = batch["inverters"][0]
        # boxes at resized 300x300 scale map back to 300x200 original
        boxes = np.array([[1.0, 0.9, 0, 0, 300, 300]])
        back = inv(boxes)
        np.testing.assert_allclose(back[0, -4:], [0, 0, 300, 200], atol=1e-3)

    def test_dct_255_format(self, voc_root):
        """`input_format='dct_255'` reproduces the reference's 0-255
        coefficient mapping `(x + 1024) * 255 // 2048` applied to the
        jpegdecoder spatial layout
        (`object_detection_2d_data_generator_dct_255.py:1174-1184`)."""
        ds = DetectionDataset.from_voc(
            os.path.join(voc_root, "JPEGImages"),
            os.path.join(voc_root, "ImageSets", "trainval.txt"),
            os.path.join(voc_root, "Annotations"),
        )
        p255 = DetectionPipeline(ds, 2, train=False, encoder=None,
                                 input_format="dct_255", num_workers=2)
        praw = DetectionPipeline(ds, 2, train=False, encoder=None,
                                 input_format="dct_image", num_workers=2)
        b255 = next(iter(p255))["inputs"]
        braw = next(iter(praw))["inputs"]
        assert b255.shape == braw.shape == (2, 300, 300, 3)
        expected = (braw.astype(np.int64) + 1024) * 255 // 2048
        np.testing.assert_array_equal(b255, expected.astype(np.float32))
        assert b255.min() >= 0 and b255.max() <= 255

    def test_epoch_determinism(self, imagenet_root):
        ds = ImageFolderDataset(imagenet_root)
        p1 = ClassificationPipeline(ds, 4, train=True, seed=7, num_workers=2)
        p2 = ClassificationPipeline(ds, 4, train=True, seed=7, num_workers=2)
        b1, b2 = next(iter(p1)), next(iter(p2))
        np.testing.assert_array_equal(b1["labels"], b2["labels"])
        np.testing.assert_allclose(b1["inputs"][0], b2["inputs"][0])


class TestPresetChains:
    def _img_labels(self, rng):
        img = (rng.uniform(0, 255, (160, 200, 3))).astype(np.uint8)
        labels = np.array([[1, 40, 40, 120, 120], [2, 10, 10, 60, 60]],
                          np.float32)
        return img, labels

    def test_constant_input_size_chain(self, rng):
        img, labels = self._img_labels(rng)
        chain = aug.DataAugmentationConstantInputSize()
        for _ in range(5):
            out, lab = chain(img, labels, rng)
            assert out.shape == img.shape  # constant size preserved
            if lab is not None and len(lab):
                assert (lab[:, 3] > lab[:, 1]).all()

    def test_variable_input_size_chain(self, rng):
        img, labels = self._img_labels(rng)
        chain = aug.DataAugmentationVariableInputSize(128, 128)
        out, lab = chain(img, labels, rng)
        assert out.shape == (128, 128, 3)

    def test_satellite_chain(self, rng):
        img, labels = self._img_labels(rng)
        chain = aug.DataAugmentationSatellite(96, 96)
        out, lab = chain(img, labels, rng)
        assert out.shape == (96, 96, 3)

    def test_scale_affine_boxes(self):
        img = np.full((100, 100, 3), 60, np.uint8)
        labels = np.array([[1, 40, 40, 60, 60]], np.float32)
        out, lab = aug.scale_affine(img, labels, 2.0)
        assert out.shape == (100, 100, 3)
        # box centered at (50,50) scales about the center: 40->30, 60->70
        np.testing.assert_allclose(lab[0, 1:], [30, 30, 70, 70], atol=1.0)


class TestHdf5Cache:
    def test_pack_and_read(self, voc_root, tmp_path):
        from jpeg_detection_resnet_ssd_tpu.data.datasets import Hdf5ImageCache

        ds = DetectionDataset.from_voc(
            os.path.join(voc_root, "JPEGImages"),
            os.path.join(voc_root, "ImageSets", "trainval.txt"),
            os.path.join(voc_root, "Annotations"),
        )
        cache = Hdf5ImageCache.create(ds, str(tmp_path / "cache.h5"))
        assert len(cache) == len(ds)
        rec = cache[0]
        assert rec["boxes"].shape == (2, 5)
        assert rec["image_bytes"][:2] == b"\xff\xd8"  # JPEG magic
        # pipeline consumes the cache directly
        pipe = DetectionPipeline(cache, 2, train=False, encoder=None,
                                 num_workers=2)
        batch = next(iter(pipe))
        y, cbcr = batch["inputs"]
        assert y.shape == (2, 38, 38, 64)
        shard = cache.shard(0, 2)
        assert len(shard) == 2
        assert shard[0]["image_id"] == cache[0]["image_id"]


class TestDeviceDCTAugment:
    def test_device_augmented_batches(self, imagenet_root):
        from jpeg_detection_resnet_ssd_tpu.data.pipeline import (
            DeviceDCTAugmentedPipeline,
        )

        ds = ImageFolderDataset(imagenet_root)
        pipe = DeviceDCTAugmentedPipeline(
            ds, 4, train=True, source_size=256, num_workers=2
        )
        batch = next(iter(pipe))
        y, cbcr = batch["inputs"]
        assert np.asarray(y).shape == (4, 28, 28, 64)
        assert np.asarray(cbcr).shape == (4, 14, 14, 128)
        # eval mode: deterministic center crop
        pipe_ev = DeviceDCTAugmentedPipeline(
            ds, 4, train=False, source_size=256, num_workers=2
        )
        b1 = next(iter(pipe_ev))
        b2 = next(iter(DeviceDCTAugmentedPipeline(
            ds, 4, train=False, source_size=256, num_workers=2)))
        np.testing.assert_allclose(
            np.asarray(b1["inputs"][0]), np.asarray(b2["inputs"][0])
        )


class TestPackedDct:
    def test_pack_roundtrip_and_pipeline(self, voc_root, tmp_path):
        from jpeg_detection_resnet_ssd_tpu.data.packed import (
            PackedDctDataset,
            PackedDctPipeline,
        )

        ds = DetectionDataset.from_voc(
            os.path.join(voc_root, "JPEGImages"),
            os.path.join(voc_root, "ImageSets", "trainval.txt"),
            os.path.join(voc_root, "Annotations"),
        )
        stem = str(tmp_path / "packed")
        packed = PackedDctDataset.create(
            ds, stem, img_height=352, img_width=352, max_gt=8, num_workers=2
        )
        assert len(packed) == len(ds)
        assert packed.y.shape == (len(ds), 44, 44, 64)
        assert packed.cbcr.shape == (len(ds), 22, 22, 128)
        # packed coefficients equal a fresh decode of the same record
        from jpeg_detection_resnet_ssd_tpu.data import augment as aug2
        from jpeg_detection_resnet_ssd_tpu.data.dct_convert import (
            rgb_to_dct_tensors,
        )
        from jpeg_detection_resnet_ssd_tpu.data.pipeline import (
            _load_record_rgb,
        )

        rec = ds[0]
        img, _ = aug2.resize(
            aug2.to_3_channels(_load_record_rgb(rec)), rec["boxes"].copy(),
            352, 352, filter_degenerate=False,
        )
        y_ref, _ = rgb_to_dct_tensors(img)
        np.testing.assert_array_equal(np.asarray(packed.y[0]), y_ref)
        # reload from disk
        again = PackedDctDataset(stem)
        assert again.gt_mask.sum() == sum(len(r["boxes"]) for r in
                                          (ds[i] for i in range(len(ds))))

        pipe = PackedDctPipeline(again, 2, train=True, seed=3)
        b1 = next(iter(pipe))
        y, cbcr = b1["inputs"]
        assert y.shape == (2, 44, 44, 64) and y.dtype == np.float32
        assert b1["gt"].shape == (2, 8, 5) and b1["gt_mask"].shape == (2, 8)
        # deterministic epoch shuffles: same seed -> same order
        p2 = PackedDctPipeline(again, 2, train=True, seed=3)
        np.testing.assert_array_equal(
            next(iter(p2))["gt"], b1["gt"]
        )
        # host sharding is disjoint and covers the corpus
        s0 = PackedDctPipeline(again, 1, train=False, shard_index=0,
                               shard_count=2)
        s1 = PackedDctPipeline(again, 1, train=False, shard_index=1,
                               shard_count=2)
        assert len(s0.indices) + len(s1.indices) == len(again)
        assert set(s0.indices).isdisjoint(s1.indices)

    def test_native_pack_parity(self, voc_root, tmp_path):
        """The one-C++-call pack path (`dctjpeg.pack`) must produce the same
        corpus as the Python PIL/cv2 path it replaces: identical coefficients
        and identically rescaled boxes."""
        from jpeg_detection_resnet_ssd_tpu.data.packed import PackedDctDataset

        ds = DetectionDataset.from_voc(
            os.path.join(voc_root, "JPEGImages"),
            os.path.join(voc_root, "ImageSets", "trainval.txt"),
            os.path.join(voc_root, "Annotations"),
        )
        nat = PackedDctDataset.create(
            ds, str(tmp_path / "nat"), img_height=352, img_width=352,
            max_gt=8, num_workers=2, use_native=True,
        )
        py = PackedDctDataset.create(
            ds, str(tmp_path / "py"), img_height=352, img_width=352,
            max_gt=8, num_workers=2, use_native=False,
        )
        np.testing.assert_array_equal(np.asarray(nat.y), np.asarray(py.y))
        np.testing.assert_array_equal(
            np.asarray(nat.cbcr), np.asarray(py.cbcr)
        )
        np.testing.assert_allclose(nat.gt, py.gt, atol=1e-4)
        np.testing.assert_array_equal(nat.gt_mask, py.gt_mask)

    def test_classification_pack_and_device_augment(self, imagenet_root,
                                                    tmp_path):
        import jax

        from jpeg_detection_resnet_ssd_tpu.data.packed import (
            PackedDctDataset,
            PackedDctPipeline,
        )
        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_classification_augment,
        )

        ds = ImageFolderDataset(imagenet_root)
        stem = str(tmp_path / "cls_pack")
        packed = PackedDctDataset.create_classification(
            ds, stem, img_size=256, num_workers=2
        )
        assert packed.y.shape == (len(ds), 32, 32, 64)
        assert packed.labels.shape == (len(ds),)
        assert packed.gt is None
        pipe = PackedDctPipeline(packed, 4, train=True, seed=1)
        batch = next(iter(pipe))
        assert batch["labels"].shape == (4,)
        aug_fn = make_dct_classification_augment(out_y_blocks=28)
        import jax.numpy as jnp

        out = aug_fn(
            {"inputs": tuple(jnp.asarray(v) for v in batch["inputs"]),
             "labels": batch["labels"]},
            jax.random.PRNGKey(0),
        )
        y, cbcr = out["inputs"]
        assert y.shape == (4, 28, 28, 64) and cbcr.shape == (4, 14, 14, 128)
        np.testing.assert_array_equal(out["labels"], batch["labels"])

    def test_load_or_create_validates_staleness(self, voc_root, tmp_path):
        from jpeg_detection_resnet_ssd_tpu.data.packed import load_or_create

        ds = DetectionDataset.from_voc(
            os.path.join(voc_root, "JPEGImages"),
            os.path.join(voc_root, "ImageSets", "trainval.txt"),
            os.path.join(voc_root, "Annotations"),
        )
        stem = str(tmp_path / "p")
        packed = load_or_create(stem, ds, task="detection",
                                img_height=352, img_width=352,
                                num_workers=2, verbose=False)
        assert len(packed) == len(ds)
        # dataset-size mismatch -> explicit error, not silent reuse
        smaller = ds.shard(0, 2)
        with pytest.raises(ValueError, match="stale cache"):
            load_or_create(stem, smaller, task="detection",
                           img_height=352, img_width=352, num_workers=2)
        # parameter mismatch -> explicit error
        with pytest.raises(ValueError, match="re-pack"):
            load_or_create(stem, ds, task="detection",
                           img_height=304, img_width=304, num_workers=2)

    def test_host_augment_flag_disables_pixel_augment(self, imagenet_root):
        """train=True + host_augment=False: shuffling/drop_remainder stay in
        training mode but the host emits the deterministic eval view (the
        device-augment contract; double augmentation was a real bug)."""
        ds = ImageFolderDataset(imagenet_root)
        a = ClassificationPipeline(ds, 4, train=True, host_augment=False,
                                   input_format="rgb", image_size=64,
                                   num_workers=2, seed=0)
        b = ClassificationPipeline(ds, 4, train=False,
                                   input_format="rgb", image_size=64,
                                   num_workers=2, seed=0)
        assert a.drop_remainder and not b.drop_remainder
        ia = next(iter(a))
        # same items as the eval view, modulo shuffling: compare per-image
        # content sets
        eval_imgs = {img.tobytes() for batch in b
                     for img in np.asarray(batch["inputs"], np.uint8)}
        for img in np.asarray(ia["inputs"], np.uint8):
            assert img.tobytes() in eval_imgs

    @pytest.mark.slow
    def test_classification_augment_v2_shapes(self, rng):
        import jax
        import jax.numpy as jnp

        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_classification_augment_v2,
        )

        y = rng.normal(0, 50, (6, 32, 32, 64)).astype(np.int16)
        cbcr = rng.normal(0, 20, (6, 16, 16, 128)).astype(np.int16)
        labels = rng.integers(0, 8, 6)
        aug_fn = make_dct_classification_augment_v2(out_y_blocks=28)
        out = aug_fn(
            {"inputs": (jnp.asarray(y), jnp.asarray(cbcr)),
             "labels": labels},
            jax.random.PRNGKey(0),
        )
        yo, co = out["inputs"]
        assert yo.shape == (6, 28, 28, 64) and co.shape == (6, 14, 14, 128)
        assert yo.dtype == jnp.float32
        np.testing.assert_array_equal(out["labels"], labels)
        # different images get different crop geometries (continuous scales)
        a = np.asarray(yo)
        assert not np.allclose(a[0], a[1])

    def test_int16_shipping_matches_f32(self, imagenet_root, tmp_path):
        """ship_dtype=int16 halves transfer; device-side cast in the augment
        factory yields identical results to f32 shipping."""
        import jax
        import jax.numpy as jnp

        from jpeg_detection_resnet_ssd_tpu.data.packed import (
            PackedDctDataset,
            PackedDctPipeline,
        )
        from jpeg_detection_resnet_ssd_tpu.ops import (
            make_dct_classification_augment,
        )

        ds = ImageFolderDataset(imagenet_root)
        stem = str(tmp_path / "cls_pack16")
        packed = PackedDctDataset.create_classification(
            ds, stem, img_size=256, num_workers=2
        )
        bf = next(iter(PackedDctPipeline(packed, 4, train=True, seed=5)))
        bi = next(iter(PackedDctPipeline(packed, 4, train=True, seed=5,
                                         ship_dtype=np.int16)))
        assert bi["inputs"][0].dtype == np.int16
        aug_fn = make_dct_classification_augment(out_y_blocks=28)
        key = jax.random.PRNGKey(2)
        of = aug_fn({"inputs": tuple(jnp.asarray(v) for v in bf["inputs"]),
                     "labels": bf["labels"]}, key)
        oi = aug_fn({"inputs": tuple(jnp.asarray(v) for v in bi["inputs"]),
                     "labels": bi["labels"]}, key)
        np.testing.assert_allclose(
            np.asarray(of["inputs"][0]), np.asarray(oi["inputs"][0])
        )


def test_rotate_angle_boxes():
    img = np.full((100, 100, 3), 80, np.uint8)
    labels = np.array([[1, 40, 40, 60, 60]], np.float32)
    out, lab = aug.rotate_angle(img, labels, 90)
    assert out.shape == (100, 100, 3)
    # 90-degree rotation of a centered square stays (approximately) in place
    np.testing.assert_allclose(lab[0, 1:], [40, 40, 60, 60], atol=1.5)
    out, lab = aug.rotate_angle(img, labels, 45)
    # 45-degree loose fit: sqrt(2) * 20 wide box, still centered
    w = lab[0, 3] - lab[0, 1]
    np.testing.assert_allclose(w, 20 * np.sqrt(2), atol=1.5)


def test_coco_parser(tmp_path):
    import json as _json

    from jpeg_detection_resnet_ssd_tpu.data import parse_coco_json

    coco = {
        "images": [
            {"id": 7, "file_name": "a.jpg", "width": 100, "height": 80},
            {"id": 9, "file_name": "b.jpg", "width": 100, "height": 80},
        ],
        "categories": [{"id": 18, "name": "dog"}, {"id": 3, "name": "car"}],
        "annotations": [
            {"image_id": 7, "category_id": 18, "bbox": [10, 20, 30, 40],
             "iscrowd": 0},
            {"image_id": 7, "category_id": 3, "bbox": [5, 5, 10, 10],
             "iscrowd": 1},  # crowd: skipped by default
            {"image_id": 9, "category_id": 3, "bbox": [0, 0, 50, 60],
             "iscrowd": 0},
        ],
    }
    p = tmp_path / "instances.json"
    p.write_text(_json.dumps(coco))
    records, cat_map = parse_coco_json(str(p), str(tmp_path))
    # contiguous ids follow the categories list's FILE order — the genuine
    # reference contract (`coco_utils.py:54-57`; see test_reference_parity)
    assert cat_map == {18: 1, 3: 2}
    by_id = {r["image_id"]: r for r in records}
    assert by_id[7]["boxes"].shape == (1, 5)  # crowd excluded
    np.testing.assert_allclose(by_id[7]["boxes"][0], [1, 10, 20, 40, 60])
    np.testing.assert_allclose(by_id[9]["boxes"][0], [2, 0, 0, 50, 60])
    records2, _ = parse_coco_json(str(p), str(tmp_path), include_crowd=True)
    assert {r["image_id"]: r for r in records2}[7]["boxes"].shape == (2, 5)
