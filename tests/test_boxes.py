"""Box geometry / anchors / matching / encode / decode vs NumPy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from jpeg_detection_resnet_ssd_tpu.boxes import (
    AnchorSpec,
    anchor_grid_for_layer,
    build_anchors,
    centroids_to_corners,
    corners_to_centroids,
    decode_detections,
    encode_targets,
    iou_matrix,
    match_bipartite_greedy,
    match_multi,
    TargetEncoder,
)
from jpeg_detection_resnet_ssd_tpu.boxes.geometry import convert

import oracles

SSD300_PREDICTOR_SIZES = ((38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1))


def random_corner_boxes(rng, n, size=300.0):
    xy = rng.uniform(0, size * 0.8, (n, 2))
    wh = rng.uniform(5, size * 0.3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestGeometry:
    def test_roundtrip_conversions(self, rng):
        boxes = random_corner_boxes(rng, 40)
        cent = corners_to_centroids(boxes)
        back = centroids_to_corners(cent)
        np.testing.assert_allclose(np.asarray(back), boxes, atol=1e-4)

    def test_convert_all_pairs(self, rng):
        boxes = random_corner_boxes(rng, 10)
        for fmt in ("corners", "minmax", "centroids"):
            x = convert(boxes, "corners", fmt)
            back = convert(x, fmt, "corners")
            np.testing.assert_allclose(np.asarray(back), boxes, atol=1e-4)

    @pytest.mark.parametrize("border", ["half", "include", "exclude"])
    def test_iou_matrix_vs_oracle(self, rng, border):
        a = random_corner_boxes(rng, 13)
        b = random_corner_boxes(rng, 17)
        ours = np.asarray(iou_matrix(a, b, coords="corners", border_pixels=border))
        ref = oracles.iou_corners(a, b, border=border)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_iou_centroids_matches_corners(self, rng):
        a = random_corner_boxes(rng, 8)
        b = random_corner_boxes(rng, 9)
        ours = np.asarray(
            iou_matrix(
                corners_to_centroids(a), corners_to_centroids(b), coords="centroids"
            )
        )
        ref = oracles.iou_corners(a, b)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestAnchors:
    def test_ssd300_total_boxes(self):
        spec = AnchorSpec()
        anchors = build_anchors(spec, SSD300_PREDICTOR_SIZES)
        assert anchors.shape == (8732, 8)
        # centroid w/h positive; variances as configured
        assert (anchors[:, 2] > 0).all() and (anchors[:, 3] > 0).all()
        np.testing.assert_allclose(
            anchors[:, 4:], np.tile([0.1, 0.1, 0.2, 0.2], (8732, 1))
        )

    def test_layer_geometry_contract(self):
        # First SSD300 layer: 38x38, scale 0.1, next 0.2, ars (1, 2, 0.5),
        # steps 8 -> box sizes from the reference formula
        # (`keras_layer_AnchorBoxes.py:150-214`).
        g = anchor_grid_for_layer(
            (38, 38), 300, 300, 0.1, 0.2,
            aspect_ratios=(1.0, 2.0, 0.5), this_steps=8,
            normalize_coords=True, coords="centroids",
        )
        assert g.shape == (38, 38, 4, 4)
        size = 300.0
        # per-cell order: ar1, ar1-geomean, ar2, ar0.5
        np.testing.assert_allclose(g[0, 0, 0, 2:] * size, [30.0, 30.0], rtol=1e-5)
        np.testing.assert_allclose(
            g[0, 0, 1, 2:] * size,
            [np.sqrt(0.1 * 0.2) * 300] * 2, rtol=1e-5,
        )
        np.testing.assert_allclose(
            g[0, 0, 2, 2:] * size, [30 * np.sqrt(2), 30 / np.sqrt(2)], rtol=1e-5
        )
        # centers: offset 0.5 * step 8 = 4 px
        np.testing.assert_allclose(g[0, 0, 0, :2] * size, [4.0, 4.0], atol=1e-4)
        np.testing.assert_allclose(g[1, 2, 0, :2] * size, [20.0, 12.0], atol=1e-4)

    def test_unit_offsets_when_no_steps(self):
        g = anchor_grid_for_layer(
            (3, 3), 300, 300, 0.2, 0.37, aspect_ratios=(1.0,),
            two_boxes_for_ar1=False, coords="centroids",
        )
        # step = 100, centers at 50, 150, 250
        np.testing.assert_allclose(g[:, 0, 0, 1], [50.0, 150.0, 250.0], atol=1e-4)


class TestMatching:
    def test_bipartite_vs_oracle(self, rng):
        for trial in range(5):
            m, n = 6, 40
            sims = rng.uniform(0, 1, (m, n)).astype(np.float32)
            ours, valid = match_bipartite_greedy(
                jnp.asarray(sims), jnp.ones(m, dtype=bool)
            )
            ref = oracles.bipartite_greedy(sims)
            np.testing.assert_array_equal(np.asarray(ours), ref)

    def test_bipartite_with_padding(self, rng):
        m, n = 8, 30
        sims = rng.uniform(0, 1, (m, n)).astype(np.float32)
        mask = np.array([True] * 5 + [False] * 3)
        ours, _ = match_bipartite_greedy(jnp.asarray(sims), jnp.asarray(mask))
        ref = oracles.bipartite_greedy(sims[:5])
        np.testing.assert_array_equal(np.asarray(ours)[:5], ref)

    def test_multi_threshold(self, rng):
        sims = np.array(
            [[0.9, 0.2, 0.55], [0.1, 0.6, 0.5]], dtype=np.float32
        )
        best, hit = match_multi(jnp.asarray(sims), jnp.ones(2, dtype=bool), 0.5)
        np.testing.assert_array_equal(np.asarray(best), [0, 1, 0])
        np.testing.assert_array_equal(np.asarray(hit), [True, True, True])


class TestTargetEncoder:
    def make_encoder(self):
        return TargetEncoder(
            spec=AnchorSpec(),
            predictor_sizes=SSD300_PREDICTOR_SIZES,
            n_classes=20,
        )

    def test_encode_vs_oracle(self, rng):
        enc = self.make_encoder()
        anchors = enc.anchors
        k = 3
        gt = np.zeros((k, 5), dtype=np.float32)
        gt[:, 0] = rng.integers(1, 21, k)
        gt[:, 1:] = random_corner_boxes(rng, k)
        padded, mask = enc.pad_labels([gt], max_gt=8)
        ours = np.asarray(enc(padded, mask))[0]
        ref = oracles.encode_targets_oracle(
            gt.astype(np.float64), anchors[:, :4].astype(np.float64),
            anchors[:, 4:].astype(np.float64), 20, 300, 300,
        )
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_empty_gt_all_background(self):
        enc = self.make_encoder()
        padded, mask = enc.pad_labels([np.zeros((0, 5))], max_gt=8)
        out = np.asarray(enc(padded, mask))[0]
        assert (out[:, 0] == 1).all()  # all background
        assert (out[:, 1:21] == 0).all()
        np.testing.assert_allclose(out[:, -12:-8], 0.0, atol=1e-6)

    def test_every_gt_matched(self, rng):
        enc = self.make_encoder()
        k = 4
        gt = np.zeros((k, 5), dtype=np.float32)
        gt[:, 0] = np.arange(1, k + 1)
        gt[:, 1:] = random_corner_boxes(rng, k)
        padded, mask = enc.pad_labels([gt], max_gt=8)
        out = np.asarray(enc(padded, mask))[0]
        n_pos = int((out[:, 1:21].max(axis=1) > 0).sum())
        assert n_pos >= k  # bipartite guarantees at least one anchor per GT

    def test_multi_match_density_and_neutral_zone(self):
        """Regression for the round-3 matching fix: multi matching and the
        neutral zone operate on the ORIGINAL similarities with only matched
        COLUMNS cleared (`ssd_input_encoder.py:366-390`), not on the
        bipartite loop's row-killed working copy.  Reference invariants:
        every anchor with IoU >= pos_iou_threshold to ANY GT is positive
        (bipartite or multi — GT rows stay alive for multi), and any
        non-positive anchor with max IoU in [neg_iou_limit, pos) is neutral.
        The broken row-killed version yields exactly n_gt positives and zero
        neutrals.  The repeatable check against the reference's own
        matching_utils/SSDInputEncoder lives in
        `tests/test_reference_parity.py` (TestMatching, TestInputEncoder)."""
        from jpeg_detection_resnet_ssd_tpu.boxes import geometry

        enc = self.make_encoder()
        gt = np.zeros((2, 5), np.float32)
        gt[0] = [3, 30, 40, 180, 190]
        gt[1] = [7, 150, 60, 280, 240]
        padded, mask = enc.pad_labels([gt], max_gt=8)
        out = np.asarray(enc(padded, mask))[0]
        pos = out[:, 1:21].max(axis=1) > 0
        neutral = out[:, :21].sum(axis=1) == 0

        anchors = enc.anchors
        ac = anchors[:, :4]
        corners = np.stack(
            [ac[:, 0] - ac[:, 2] / 2, ac[:, 1] - ac[:, 3] / 2,
             ac[:, 0] + ac[:, 2] / 2, ac[:, 1] + ac[:, 3] / 2], axis=1,
        )
        sims = np.asarray(geometry.iou_matrix(
            np.asarray(gt[:, 1:5] / 300.0, np.float32),
            np.asarray(corners, np.float32), coords="corners",
        ))
        max_iou = sims.max(axis=0)
        # every >= 0.5 anchor is positive (this fails with the row-killed bug)
        assert pos[max_iou >= 0.5].all()
        assert pos.sum() > 2  # strictly more than bipartite-only
        # the [0.3, 0.5) band that is not positive is entirely neutral
        band = (max_iou >= 0.3) & ~pos
        assert band.sum() > 0
        assert neutral[band].all()
        # and anchors below the neutral limit that are not positive stay
        # plain background
        bg = ~pos & (max_iou < 0.3)
        assert (out[bg, 0] == 1).all()

    def test_batch_vmap(self, rng):
        enc = self.make_encoder()
        gts = [random_corner_boxes(rng, 2), random_corner_boxes(rng, 5)]
        labs = [
            np.concatenate([np.ones((g.shape[0], 1), np.float32), g], axis=1)
            for g in gts
        ]
        padded, mask = enc.pad_labels(labs, max_gt=8)
        out = np.asarray(enc(padded, mask))
        assert out.shape == (2, 8732, 33)


class TestDecode:
    def _fake_preds(self, rng, n_boxes=200, n_classes=3):
        """Build raw predictions whose decoded boxes/scores we control."""
        xy = rng.uniform(0, 0.7, (n_boxes, 2))
        wh = rng.uniform(0.05, 0.3, (n_boxes, 2))
        anchors_corn = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        cent = np.asarray(corners_to_centroids(anchors_corn))
        variances = np.tile([0.1, 0.1, 0.2, 0.2], (n_boxes, 1)).astype(np.float32)
        logits = rng.uniform(0, 1, (n_boxes, n_classes + 1)).astype(np.float32)
        scores = logits / logits.sum(axis=1, keepdims=True)
        offsets = rng.normal(0, 0.5, (n_boxes, 4)).astype(np.float32)
        y = np.concatenate([scores, offsets, cent, variances], axis=1)
        return y[None]  # batch of 1

    def test_decode_matches_oracle(self, rng):
        n_classes = 3
        y = self._fake_preds(rng, n_boxes=150, n_classes=n_classes)
        out = np.asarray(
            decode_detections(
                jnp.asarray(y), n_classes=n_classes, confidence_thresh=0.3,
                iou_threshold=0.45, top_k=50, nms_max_output_size=64,
                img_height=300, img_width=300,
            )
        )[0]
        # Oracle: decode boxes by hand, then per-class threshold+NMS+top-k.
        scores = y[0, :, : n_classes + 1]
        offs, cent, var = y[0, :, -12:-8], y[0, :, -8:-4], y[0, :, -4:]
        cx = offs[:, 0] * var[:, 0] * cent[:, 2] + cent[:, 0]
        cy = offs[:, 1] * var[:, 1] * cent[:, 3] + cent[:, 1]
        w = np.exp(offs[:, 2] * var[:, 2]) * cent[:, 2]
        h = np.exp(offs[:, 3] * var[:, 3]) * cent[:, 3]
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
        boxes *= 300.0
        expected = []
        for c in range(1, n_classes + 1):
            s = scores[:, c].copy()
            s[s <= 0.3] = 0.0
            kept = oracles.greedy_nms(boxes, s, 0.45)
            expected += [(c, s[i], *boxes[i]) for i in kept if s[i] > 0]
        expected.sort(key=lambda r: -r[1])
        expected = expected[:50]
        got = [tuple(r) for r in out if r[1] > 0]
        assert len(got) == len(expected)
        for g, e in zip(got, expected):
            assert g[0] == e[0]
            np.testing.assert_allclose(g[1:], e[1:], atol=1e-3)

    def test_shared_selector_matches_exact_on_peaked_scores(self, rng):
        """'shared' candidate pre-compaction == 'exact' when the head is
        background-dominant (the trained-network regime it serves)."""
        n_classes, n_boxes = 4, 500
        y = self._fake_preds(rng, n_boxes=n_boxes, n_classes=n_classes)
        # Make it realistic: background takes ~all mass everywhere except a
        # sparse set of confident detections.
        scores = np.full((n_boxes, n_classes + 1), 1e-4, np.float32)
        scores[:, 0] = 1.0
        hot = rng.choice(n_boxes, 40, replace=False)
        for i in hot:
            c = int(rng.integers(1, n_classes + 1))
            p = float(rng.uniform(0.2, 0.95))
            scores[i, 0] = 1.0 - p
            scores[i, c] = p
        scores /= scores.sum(axis=1, keepdims=True)
        y[0, :, : n_classes + 1] = scores
        kw = dict(n_classes=n_classes, confidence_thresh=0.05,
                  iou_threshold=0.45, top_k=50, nms_max_output_size=64,
                  img_height=300, img_width=300)
        exact = np.asarray(decode_detections(
            jnp.asarray(y), candidate_selector="exact", **kw))
        shared = np.asarray(decode_detections(
            jnp.asarray(y), candidate_selector="shared",
            shared_pool_size=128, **kw))
        np.testing.assert_allclose(shared, exact, atol=1e-5)
        # approx pool top-k: same result here (approx_max_k is exact when the
        # candidate count is far below the pool size; on TPU it trades ~5%
        # recall of the lowest pool slots for the partial-reduction kernel).
        approx = np.asarray(decode_detections(
            jnp.asarray(y), candidate_selector="shared",
            shared_pool_size=128, pool_topk_impl="approx", **kw))
        np.testing.assert_allclose(approx, exact, atol=1e-5)

    def test_nms_k_truncation_is_prefix_stable(self, rng):
        """nms_max_output_size=top_k yields the same detections as the
        reference's k=2*top_k: a greedy-NMS keep decision depends only on
        HIGHER-scored candidates, so truncating the per-class candidate
        list at k cannot change which of the global top-k rows survive
        (the property behind the serving preset's halved NMS lanes)."""
        n_classes, n_boxes = 4, 500
        y = self._fake_preds(rng, n_boxes=n_boxes, n_classes=n_classes)
        scores = np.full((n_boxes, n_classes + 1), 1e-4, np.float32)
        scores[:, 0] = 1.0
        hot = rng.choice(n_boxes, 120, replace=False)
        for i in hot:
            c = int(rng.integers(1, n_classes + 1))
            p = float(rng.uniform(0.1, 0.95))
            scores[i, 0] = 1.0 - p
            scores[i, c] = p
        scores /= scores.sum(axis=1, keepdims=True)
        y[0, :, : n_classes + 1] = scores
        kw = dict(n_classes=n_classes, confidence_thresh=0.05,
                  iou_threshold=0.45, top_k=40,
                  img_height=300, img_width=300,
                  candidate_selector="shared", shared_pool_size=256)
        wide = np.asarray(decode_detections(
            jnp.asarray(y), nms_max_output_size=80, **kw))
        tight = np.asarray(decode_detections(
            jnp.asarray(y), nms_max_output_size=40, **kw))
        np.testing.assert_allclose(tight, wide, atol=1e-5)

    def test_decode_debug_preserves_box_ids(self, rng):
        """decode_detections_debug == decode_detections + a correct box_id
        column (`ssd_output_decoder.py:342`)."""
        from jpeg_detection_resnet_ssd_tpu.boxes.decode import (
            decode_detections_debug,
            decode_raw_predictions,
        )

        n_classes = 3
        y = self._fake_preds(rng, n_boxes=150, n_classes=n_classes)
        kw = dict(n_classes=n_classes, confidence_thresh=0.3,
                  iou_threshold=0.45, top_k=50, nms_max_output_size=64,
                  img_height=300, img_width=300)
        plain = np.asarray(decode_detections(jnp.asarray(y), **kw))[0]
        dbg = np.asarray(decode_detections_debug(jnp.asarray(y), **kw))[0]
        assert dbg.shape == (50, 7)
        # columns 1: of debug == the plain decode
        np.testing.assert_allclose(dbg[:, 1:], plain, atol=1e-5)
        # each surviving row's box_id points at the raw box that decodes to
        # exactly these coordinates
        _, raw_boxes = decode_raw_predictions(
            jnp.asarray(y), img_height=300, img_width=300)
        raw_boxes = np.asarray(raw_boxes)[0]
        for row in dbg:
            if row[2] > 0:
                np.testing.assert_allclose(
                    raw_boxes[int(row[0])], row[3:], atol=1e-4
                )

    def test_decode_output_shape_padding(self, rng):
        y = self._fake_preds(rng, n_boxes=60, n_classes=2)
        out = np.asarray(
            decode_detections(
                jnp.asarray(y), n_classes=2, confidence_thresh=0.99,
                top_k=20, nms_max_output_size=32,
                img_height=300, img_width=300,
            )
        )
        assert out.shape == (1, 20, 6)
        assert np.allclose(out, 0.0)  # nothing passes a 0.99 threshold


class TestDecodeFast:
    def test_fast_decode_argmax_and_global_nms(self, rng):
        from jpeg_detection_resnet_ssd_tpu.boxes.decode import (
            decode_detections_fast,
        )

        n_classes = 3
        td = TestDecode()
        y = td._fake_preds(rng, n_boxes=120, n_classes=n_classes)
        out = np.asarray(
            decode_detections_fast(
                jnp.asarray(y), confidence_thresh=0.3, iou_threshold=0.45,
                top_k=40, nms_max_output_size=64,
                img_height=300, img_width=300,
            )
        )[0]
        # Oracle: argmax class, global NMS
        scores = y[0, :, : n_classes + 1]
        offs, cent, var = y[0, :, -12:-8], y[0, :, -8:-4], y[0, :, -4:]
        cx = offs[:, 0] * var[:, 0] * cent[:, 2] + cent[:, 0]
        cy = offs[:, 1] * var[:, 1] * cent[:, 3] + cent[:, 1]
        w = np.exp(offs[:, 2] * var[:, 2]) * cent[:, 2]
        h = np.exp(offs[:, 3] * var[:, 3]) * cent[:, 3]
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                         axis=1) * 300.0
        cls = scores.argmax(-1)
        conf = scores.max(-1)
        s = np.where((cls != 0) & (conf > 0.3), conf, 0.0)
        kept = oracles.greedy_nms(boxes, s, 0.45)
        expected = sorted(
            ((cls[i], s[i], *boxes[i]) for i in kept if s[i] > 0),
            key=lambda r: -r[1],
        )[:40]
        got = [tuple(r) for r in out if r[1] > 0]
        assert len(got) == len(expected)
        for g, e in zip(got, expected):
            assert g[0] == e[0]
            np.testing.assert_allclose(g[1:], e[1:], atol=1e-3)

    def test_no_log_roundtrip(self, rng):
        """no-log encode + no-log decode recovers the GT boxes."""
        from jpeg_detection_resnet_ssd_tpu.boxes.decode import (
            decode_raw_predictions,
        )

        enc = TargetEncoder(
            spec=AnchorSpec(), predictor_sizes=SSD300_PREDICTOR_SIZES,
            n_classes=20, log_scale_offsets=False,
        )
        gt = np.zeros((2, 5), dtype=np.float32)
        gt[:, 0] = [3, 7]
        gt[:, 1:] = random_corner_boxes(rng, 2)
        padded, mask = enc.pad_labels([gt], max_gt=8)
        encoded = np.asarray(enc(padded, mask))
        scores, boxes = decode_raw_predictions(
            jnp.asarray(encoded), img_height=300, img_width=300,
            log_scale_offsets=False,
        )
        boxes = np.asarray(boxes)[0]
        pos = np.asarray(encoded)[0, :, 1:21].max(-1) > 0
        # every positive anchor's decoded box equals one of the GT boxes
        for b in boxes[pos]:
            dists = np.abs(gt[:, 1:] - b).max(axis=1)
            assert dists.min() < 0.5


def test_coco_writer(tmp_path):
    from jpeg_detection_resnet_ssd_tpu.eval.coco_writer import (
        detections_to_coco_json,
    )

    preds = [[], [("42", 0.9, 10.0, 20.0, 30.0, 60.0)]]
    out = detections_to_coco_json(
        preds, str(tmp_path / "res.json"), contiguous_to_cat={1: 17}
    )
    assert out[0]["category_id"] == 17
    assert out[0]["image_id"] == 42
    assert out[0]["bbox"] == [10.0, 20.0, 20.0, 40.0]


class TestPallasNMS:
    def test_pallas_matches_xla_decode(self, rng):
        """'pallas' nms_impl (interpret mode on CPU) == 'xla' decode."""
        n_classes = 3
        td = TestDecode()
        y = td._fake_preds(rng, n_boxes=100, n_classes=n_classes)
        kw = dict(n_classes=n_classes, confidence_thresh=0.3,
                  iou_threshold=0.45, top_k=30, nms_max_output_size=32,
                  img_height=300, img_width=300)
        a = np.asarray(decode_detections(jnp.asarray(y), nms_impl="xla", **kw))
        b = np.asarray(decode_detections(jnp.asarray(y), nms_impl="pallas", **kw))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_pallas_mask_matches_oracle(self, rng):
        from jpeg_detection_resnet_ssd_tpu.ops.pallas_nms import (
            pallas_batched_nms_mask,
        )

        N, K = 6, 24
        xy = rng.uniform(0, 200, (N, K, 2))
        wh = rng.uniform(20, 120, (N, K, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = np.sort(
            rng.uniform(0.01, 1, (N, K)).astype(np.float32), axis=1
        )[:, ::-1].copy()
        scores[:, -4:] = 0.0  # padded slots
        keep = np.asarray(pallas_batched_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), 0.45, interpret=True
        ))
        for n in range(N):
            expect = oracles.greedy_nms(
                boxes[n].astype(np.float64), scores[n].astype(np.float64), 0.45
            )
            got = sorted(np.nonzero(keep[n])[0].tolist())
            assert got == sorted(expect), (n, got, expect)
