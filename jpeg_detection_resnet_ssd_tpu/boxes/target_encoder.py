"""SSD ground-truth -> training-target encoding as a jit-compiled XLA program.

The reference runs this per batch on the host in NumPy inside the data
generator (`localisation_part/ssd_encoder_decoder/ssd_input_encoder.py:277-418`,
invoked from `object_detection_2d_data_generator.py:1150-1156`) — an
O(n_gt x 8732) Python-loop bottleneck.  Here it is a pure, shape-static jnp
function over padded GT tensors, vmapped over the batch and jit-compiled, so it
can run on TPU (or pipelined on host CPU cores) at negligible cost.

Matching semantics replicated exactly (see `matching.py` for the one degenerate
-case deviation):
  1. all anchors start as background,
  2. greedy bipartite matching guarantees every GT box one anchor
     (`ssd_input_encoder.py:356-366`),
  3. 'multi' matching assigns every remaining anchor with IoU >=
     pos_iou_threshold to its best GT (`:372-381`),
  4. remaining anchors with IoU >= neg_iou_limit to any GT become neutral
     (one-hot all zeros -> ignored by the loss) (`:383-390`),
  5. matched boxes are encoded as variance-scaled offsets; for 'centroids':
     ((cx-cxa)/wa/v0, (cy-cya)/ha/v1, ln(w/wa)/v2, ln(h/ha)/v3) (`:396-400`).

GT input format: padded `(max_gt, 5)` rows of `(class_id, xmin, ymin, xmax,
ymax)` in absolute pixel 'corners' coords with class_id >= 1, plus a validity
mask — the static-shape analog of the reference's ragged per-image lists.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from jpeg_detection_resnet_ssd_tpu.boxes import geometry
from jpeg_detection_resnet_ssd_tpu.boxes import matching
from jpeg_detection_resnet_ssd_tpu.boxes.anchors import AnchorSpec, build_anchors
from jpeg_detection_resnet_ssd_tpu.ops.pallas_match import bipartite_match


def encode_targets(
    gt: jax.Array,
    gt_mask: jax.Array,
    anchors: jax.Array,
    *,
    n_classes: int,
    img_height: int,
    img_width: int,
    pos_iou_threshold: float = 0.5,
    neg_iou_limit: float = 0.3,
    border_pixels: str = "half",
    normalize_coords: bool = True,
    matching_type: str = "multi",
    log_scale_offsets: bool = True,
    bipartite_impl: str = "auto",
) -> jax.Array:
    """Encode one image's padded GT into the SSD training target.

    Args:
      gt: (max_gt, 5) float32 — (class_id, xmin, ymin, xmax, ymax), absolute.
      gt_mask: (max_gt,) bool — validity of each GT row.
      anchors: (n_boxes, 8) float32 — centroid coords + variances
        (from `build_anchors(..., coords='centroids')`).
      n_classes: number of positive classes (background NOT included; the
        one-hot gets n_classes + 1 columns, background first).

    Returns:
      (n_boxes, n_classes + 1 + 12) float32 target tensor:
      [one-hot classes, 4 offsets, 4 anchor coords, 4 variances].
    """
    n_total = n_classes + 1
    anchors_cent = anchors[:, :4]
    variances = anchors[:, 4:]
    n_boxes = anchors.shape[0]

    cls_ids = gt[:, 0].astype(jnp.int32)
    corners = gt[:, 1:5]
    if normalize_coords:
        scale = jnp.array(
            [img_width, img_height, img_width, img_height], dtype=jnp.float32
        )
        corners = corners / scale
    cent = geometry.corners_to_centroids(corners, border_pixels=border_pixels)

    sims = geometry.iou_matrix(
        cent, anchors_cent, coords="centroids", border_pixels=border_pixels
    )
    sims = jnp.where(gt_mask[:, None], sims, matching._NEG)

    max_gt = gt.shape[0]

    # Per-anchor (column-wise) best GT over the full matrix — computed ONCE.
    # Multi matching and the neutral zone are column-LOCAL decisions: the
    # reference clears matched COLUMNS before each stage
    # (`ssd_input_encoder.py:366-390`), but clearing a column only changes
    # that column's own max, and matched columns are excluded from the later
    # stages anyway — so one pass over the matrix suffices for both.
    col_best_gt = jnp.argmax(sims, axis=0).astype(jnp.int32)
    col_best_sim = jnp.max(sims, axis=0)

    # -- 1: bipartite matching (sequential greedy, reference semantics:
    # repeatedly take the globally-best (gt, anchor) pair, consume both) —
    # a while loop bounded by the VALID GT count (see `ops/pallas_match.py`
    # for the measurement story behind this choice).
    bip_anchor = bipartite_match(sims, impl=bipartite_impl)
    # scatter the <= max_gt bipartite pairs into the per-anchor assignment
    assigned = jnp.full((n_boxes,), -1, dtype=jnp.int32)
    assigned = assigned.at[
        jnp.where(bip_anchor >= 0, bip_anchor, n_boxes)
    ].set(jnp.arange(max_gt, dtype=jnp.int32), mode="drop")

    # -- 2: multi matching on the remaining columns (all GT rows alive —
    # an anchor whose best GT was bipartite-matched still multi-matches).
    if matching_type == "multi":
        multi_hit = (assigned < 0) & (col_best_sim >= pos_iou_threshold)
        assigned = jnp.where(multi_hit, col_best_gt, assigned)

    # -- 3: neutral zone.
    neutral = (assigned < 0) & (col_best_sim >= neg_iou_limit)

    # -- 4: assemble outputs.  Row-gathers from the tiny GT tables are slow
    # on TPU (per-element dynamic gathers); expressed as one-hot matmuls
    # they ride the MXU instead.
    positive = assigned >= 0
    safe_idx = jnp.clip(assigned, 0, max_gt - 1)
    assign_oh = jax.nn.one_hot(safe_idx, max_gt, dtype=jnp.float32)
    # HIGHEST: the TPU's default matmul precision rounds the f32 GT coords
    # to bf16 (~0.5 px at 300 px scale) before the MXU multiply; the class
    # matmul below is 0/1-valued and exact at any precision.
    matched_cent = jnp.matmul(
        assign_oh, cent, precision=jax.lax.Precision.HIGHEST
    )  # (n_boxes, 4)
    cls_table = jax.nn.one_hot(cls_ids, n_total, dtype=jnp.float32)
    one_hot_pos = assign_oh @ cls_table  # (n_boxes, n_total)

    one_hot_bg = jax.nn.one_hot(
        jnp.zeros((n_boxes,), jnp.int32), n_total, dtype=jnp.float32
    )
    one_hot = jnp.where(positive[:, None], one_hot_pos, one_hot_bg)
    one_hot = jnp.where(neutral[:, None], 0.0, one_hot)

    wa, ha = anchors_cent[:, 2], anchors_cent[:, 3]
    d_cx = (matched_cent[:, 0] - anchors_cent[:, 0]) / (wa * variances[:, 0])
    d_cy = (matched_cent[:, 1] - anchors_cent[:, 1]) / (ha * variances[:, 1])
    if log_scale_offsets:
        # Guard the log for padded rows (w/h may be 0); positives have w>0.
        d_w = (
            jnp.log(jnp.maximum(matched_cent[:, 2] / wa, 1e-12))
            / variances[:, 2]
        )
        d_h = (
            jnp.log(jnp.maximum(matched_cent[:, 3] / ha, 1e-12))
            / variances[:, 3]
        )
    else:
        # `ssd_input_encoder_no_log.py:400`: raw w/h ratios, no log.
        d_w = (matched_cent[:, 2] / wa) / variances[:, 2]
        d_h = (matched_cent[:, 3] / ha) / variances[:, 3]
    offsets = jnp.stack([d_cx, d_cy, d_w, d_h], axis=-1)
    offsets = jnp.where(positive[:, None], offsets, 0.0)

    return jnp.concatenate([one_hot, offsets, anchors_cent, variances], axis=-1)


@dataclasses.dataclass(frozen=True)
class TargetEncoder:
    """Batched, jit-compiled GT encoder bound to a fixed anchor configuration.

    Drop-in role of the reference's `SSDInputEncoder`
    (`ssd_input_encoder.py:36-133`), but batched + shape-static.
    """

    spec: AnchorSpec
    predictor_sizes: tuple[tuple[int, int], ...]
    n_classes: int = 20
    pos_iou_threshold: float = 0.5
    neg_iou_limit: float = 0.3
    border_pixels: str = "half"
    matching_type: str = "multi"
    log_scale_offsets: bool = True
    bipartite_impl: str = "auto"

    @functools.cached_property
    def anchors(self) -> np.ndarray:
        return build_anchors(self.spec, self.predictor_sizes, coords="centroids")

    @property
    def n_boxes(self) -> int:
        return self.anchors.shape[0]

    @property
    def encode_fn(self):
        """Unjitted batched encode (gt, gt_mask) -> targets, for fusing INTO a
        larger jit program (e.g. the train step) so padded GT — ~1000x smaller
        than encoded targets — is what crosses the host->device boundary."""
        anchors = jnp.asarray(self.anchors)
        fn = functools.partial(
            encode_targets,
            anchors=anchors,
            n_classes=self.n_classes,
            img_height=self.spec.img_height,
            img_width=self.spec.img_width,
            pos_iou_threshold=self.pos_iou_threshold,
            neg_iou_limit=self.neg_iou_limit,
            border_pixels=self.border_pixels,
            normalize_coords=self.spec.normalize_coords,
            matching_type=self.matching_type,
            log_scale_offsets=self.log_scale_offsets,
            bipartite_impl=self.bipartite_impl,
        )
        return jax.vmap(fn)

    @functools.cached_property
    def _encode_batch(self):
        anchors = jnp.asarray(self.anchors)
        fn = functools.partial(
            encode_targets,
            anchors=anchors,
            n_classes=self.n_classes,
            img_height=self.spec.img_height,
            img_width=self.spec.img_width,
            pos_iou_threshold=self.pos_iou_threshold,
            neg_iou_limit=self.neg_iou_limit,
            border_pixels=self.border_pixels,
            normalize_coords=self.spec.normalize_coords,
            matching_type=self.matching_type,
            log_scale_offsets=self.log_scale_offsets,
            bipartite_impl=self.bipartite_impl,
        )
        return jax.jit(jax.vmap(fn))

    def __call__(self, gt: jax.Array, gt_mask: jax.Array) -> jax.Array:
        """gt: (B, max_gt, 5), gt_mask: (B, max_gt) -> (B, n_boxes, n_cls+1+12)."""
        return self._encode_batch(
            jnp.asarray(gt, jnp.float32), jnp.asarray(gt_mask, bool)
        )

    def pad_labels(self, labels_list, max_gt: int = 64):
        """Pack a ragged list of (k_i, 5) arrays into padded (B, max_gt, 5) + mask.

        Host-side convenience bridging the reference's per-image label lists
        (`DataGenerator.generate`, `object_detection_2d_data_generator.py:836+`)
        to the static-shape encoder input.
        """
        B = len(labels_list)
        gt = np.zeros((B, max_gt, 5), dtype=np.float32)
        mask = np.zeros((B, max_gt), dtype=bool)
        for i, lab in enumerate(labels_list):
            lab = np.asarray(lab, dtype=np.float32).reshape(-1, 5)
            k = min(lab.shape[0], max_gt)
            gt[i, :k] = lab[:k]
            mask[i, :k] = True
        return gt, mask
