"""Device-side DETECTION augmentation in DCT space: crop + flip with labels.

Completes the north-star path for detection training: the host ships one
oversized coefficient map + padded GT per image; random 16px-aligned crop and
horizontal flip run on device IN COEFFICIENT SPACE with the ground-truth boxes
rewritten to match, and compose with the in-step target encoder
(`Trainer(target_encoder=...)`) so augmentation + encoding + train step are
ONE compiled program.

Semantics vs the reference: the Caffe-SSD random crop
(`data_augmentation_chain_original_ssd.py:29-101`) samples arbitrary-pixel
patches with min-IoU rejection on the host; this op is its block-aligned,
rejection-free analog (crop offsets land on 16px boundaries so luma and 4:2:0
chroma stay block-aligned; boxes are kept by the same center-in-patch
criterion and clipped).  Distribution parity is a metric-level argument
(SURVEY.md §7.4); exactness of the kept pixels is bit-level (no
recompression).

Labels layout: (max_gt, 5) rows (class_id, xmin, ymin, xmax, ymax) in absolute
pixels of the SOURCE map, plus a validity mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jpeg_detection_resnet_ssd_tpu.ops.dct_augment import (
    _flip_h_jnp,
    dct_crop_blocks,
)


def _crop_flip_one(y, cbcr, gt, gt_mask, y0c, x0c, flip,
                   out_y_blocks: int):
    """Crop one image's (y, cbcr) at chroma-block offset (y0c, x0c) and
    optionally hflip; rewrite gt accordingly."""
    out_cb = out_y_blocks // 2
    yc = dct_crop_blocks(y, 2 * y0c, 2 * x0c, out_y_blocks, out_y_blocks)
    cc = dct_crop_blocks(cbcr, y0c, x0c, out_cb, out_cb)
    yc = jnp.where(flip, _flip_h_jnp(yc), yc)
    cc = jnp.where(flip, _flip_h_jnp(cc), cc)

    # box rewrite: crop offset in pixels (16 px per chroma block)
    out_px = out_y_blocks * 8
    dx = (16 * x0c).astype(jnp.float32)
    dy = (16 * y0c).astype(jnp.float32)
    cls = gt[:, 0:1]
    xmin = gt[:, 1] - dx
    ymin = gt[:, 2] - dy
    xmax = gt[:, 3] - dx
    ymax = gt[:, 4] - dy
    # horizontal flip inside the crop frame
    fxmin = jnp.where(flip, out_px - xmax, xmin)
    fxmax = jnp.where(flip, out_px - xmin, xmax)
    xmin, xmax = fxmin, fxmax
    # keep boxes whose center stays inside (the Caffe 'center_point'
    # criterion), then clip
    cx = (xmin + xmax) / 2.0
    cy = (ymin + ymax) / 2.0
    inside = (cx >= 0) & (cx < out_px) & (cy >= 0) & (cy < out_px)
    new_mask = gt_mask & inside
    xmin = jnp.clip(xmin, 0.0, out_px - 1.0)
    xmax = jnp.clip(xmax, 0.0, out_px - 1.0)
    ymin = jnp.clip(ymin, 0.0, out_px - 1.0)
    ymax = jnp.clip(ymax, 0.0, out_px - 1.0)
    # degenerate after clip -> invalid
    new_mask = new_mask & (xmax > xmin) & (ymax > ymin)
    new_gt = jnp.concatenate(
        [cls, xmin[:, None], ymin[:, None], xmax[:, None], ymax[:, None]],
        axis=-1,
    )
    # zero out invalid rows so downstream encode sees clean padding
    new_gt = jnp.where(new_mask[:, None], new_gt, 0.0)
    return yc, cc, new_gt, new_mask


@functools.partial(jax.jit, static_argnames=("out_y_blocks",))
def dct_detection_crop_flip(
    y: jax.Array,
    cbcr: jax.Array,
    gt: jax.Array,
    gt_mask: jax.Array,
    rng: jax.Array,
    out_y_blocks: int = 38,
):
    """Batched random block-aligned crop + hflip with GT rewrite.

    Args:
      y: (B, H8, W8, 64) luma coefficients (H8, W8 >= out_y_blocks, even).
      cbcr: (B, H8/2, W8/2, 128) chroma.
      gt: (B, max_gt, 5) absolute-pixel GT in the SOURCE frame.
      gt_mask: (B, max_gt) validity.
      rng: PRNG key.
      out_y_blocks: output luma blocks per side (38 -> 304 px frame; the SSD
        encoder treats it as the 300x300-ish input frame).

    Returns (y_out, cbcr_out, gt_out, mask_out) with gt in the CROP frame.
    """
    B, H8, W8, _ = y.shape
    max_y0 = (H8 - out_y_blocks) // 2
    max_x0 = (W8 - out_y_blocks) // 2
    k1, k2, k3 = jax.random.split(rng, 3)
    y0c = jax.random.randint(k1, (B,), 0, max_y0 + 1)
    x0c = jax.random.randint(k2, (B,), 0, max_x0 + 1)
    flip = jax.random.bernoulli(k3, 0.5, (B,))
    fn = functools.partial(_crop_flip_one, out_y_blocks=out_y_blocks)
    return jax.vmap(fn)(y, cbcr, gt, gt_mask, y0c, x0c, flip)


def make_dct_detection_augment(out_y_blocks: int = 38):
    """Build a Trainer `augment_fn`: batches carrying oversized coefficient
    maps + source-frame GT get cropped/flipped (with GT rewrite) on device,
    then flow into the in-step target encoder.

    Usage:
        enc = TargetEncoder(spec=AnchorSpec(img_height=304, img_width=304), ..)
        trainer = Trainer(..., target_encoder=enc.encode_fn,
                          augment_fn=make_dct_detection_augment(38))
        # pipeline: DetectionPipeline(img_height=352, img_width=352,
        #           device_encode=True, augmentation=None)  # 44-block source
    """

    def augment(batch, rng):
        y, cbcr = batch["inputs"]
        y2, c2, gt2, m2 = dct_detection_crop_flip(
            y, cbcr, batch["gt"], batch["gt_mask"], rng,
            out_y_blocks=out_y_blocks,
        )
        out = dict(batch)
        out["inputs"] = (y2, c2)
        out["gt"], out["gt_mask"] = gt2, m2
        return out

    return augment
