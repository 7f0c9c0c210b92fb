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
import numpy as np

from jpeg_detection_resnet_ssd_tpu.ops.dct_augment import (
    _flip_h_jnp,
    dct_crop_blocks,
    dct_downscale_2x,
)


def _rgb_to_ycbcr_dc(background):
    """Constant-color 8x8 block DC coefficients (orthonormal DCT of the
    level-shifted plane): DC = 8 * (value - 128), AC = 0."""
    r, g, b = (float(v) for v in background)
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return 8.0 * (yy - 128.0), 8.0 * (cb - 128.0), 8.0 * (cr - 128.0)


def _background_maps(y_shape, cbcr_shape, background, dtype):
    """Constant-color coefficient maps (luma, stacked CbCr)."""
    dc_y, dc_cb, dc_cr = _rgb_to_ycbcr_dc(background)
    c_y = jnp.zeros((64,), dtype).at[0].set(dc_y)
    c_c = (
        jnp.zeros((128,), dtype).at[0].set(dc_cb).at[64].set(dc_cr)
    )
    return (
        jnp.broadcast_to(c_y, y_shape),
        jnp.broadcast_to(c_c, cbcr_shape),
    )


def dct_detection_expand(
    y: jax.Array,
    cbcr: jax.Array,
    gt: jax.Array,
    gt_mask: jax.Array,
    rng: jax.Array,
    prob: float = 0.5,
    background=(123, 117, 104),
):
    """Device-side zoom-out in coefficient space — the analog of the
    reference's `SSDExpand` (`data_augmentation_chain_original_ssd.py:103-144`:
    place the image on a mean-color canvas of 1-4x with p=0.5, boxes
    shifted).  Block-granular version: with probability `prob` the image is
    downscaled exactly 2x in the DCT domain (`dct_downscale_2x` — a fixed
    linear map, no recompression) and placed at a random 16px-aligned offset
    on a same-size canvas filled with the background color; GT boxes are
    halved and shifted.  The canvas factor is fixed at 2 (vs the reference's
    continuous U(1,4)) because arbitrary rescales are not exactly expressible
    block-wise; the zoom-out training signal (small objects) is preserved.

    Shapes: y (B, H8, W8, 64) with H8, W8 divisible by 4; cbcr
    (B, H8/2, W8/2, 128); gt (B, max_gt, 5) absolute pixels; gt_mask (B, max_gt).
    """
    B, H8, W8, _ = y.shape
    if H8 % 4 or W8 % 4:
        raise ValueError(f"expand requires H8, W8 divisible by 4, got {y.shape}")
    k1, k2, k3 = jax.random.split(rng, 3)
    do = jax.random.bernoulli(k1, prob, (B,))
    # placement offset of the half-size image, in chroma-block (16 px) units
    oy = jax.random.randint(k2, (B,), 0, H8 // 4 + 1)
    ox = jax.random.randint(k3, (B,), 0, W8 // 4 + 1)

    y_small = dct_downscale_2x(y)        # (B, H8/2, W8/2, 64)
    c_small = dct_downscale_2x(cbcr)     # (B, H8/4, W8/4, 128)
    bg_y, bg_c = _background_maps(y.shape[1:], cbcr.shape[1:],
                                  background, y.dtype)

    def place_one(ys, cs, oy_c, ox_c):
        yc = jax.lax.dynamic_update_slice(
            bg_y, ys, (2 * oy_c, 2 * ox_c, 0)
        )
        cc = jax.lax.dynamic_update_slice(bg_c, cs, (oy_c, ox_c, 0))
        return yc, cc

    y_exp, c_exp = jax.vmap(place_one)(y_small, c_small, oy, ox)
    y_out = jnp.where(do[:, None, None, None], y_exp, y)
    c_out = jnp.where(do[:, None, None, None], c_exp, cbcr)

    dx = (16.0 * ox)[:, None].astype(gt.dtype)
    dy = (16.0 * oy)[:, None].astype(gt.dtype)
    gt_exp = jnp.concatenate(
        [
            gt[..., 0:1],
            (gt[..., 1:2] * 0.5 + dx[..., None]),
            (gt[..., 2:3] * 0.5 + dy[..., None]),
            (gt[..., 3:4] * 0.5 + dx[..., None]),
            (gt[..., 4:5] * 0.5 + dy[..., None]),
        ],
        axis=-1,
    )
    gt_out = jnp.where(do[:, None, None], gt_exp, gt)
    return y_out, c_out, gt_out, gt_mask


# Caffe-SSD min-IoU sample space (`data_augmentation_chain_original_ssd.py:36`);
# -1 encodes "no requirement".  Kept as a NumPy constant: a module-level jnp
# array would become a leaked tracer if this module is first imported while a
# jit trace is active.
_IOU_BOUNDS = np.asarray([-1.0, 0.1, 0.3, 0.5, 0.7, 0.9], np.float32)


def _patch_gt_iou(x0px, y0px, w_px, h_px, gt, gt_mask):
    """Max IoU between the patch [x0, y0, x0+w, y0+h] and the valid GT."""
    ix = jnp.maximum(
        0.0,
        jnp.minimum(x0px + w_px, gt[:, 3]) - jnp.maximum(x0px, gt[:, 1]),
    )
    iy = jnp.maximum(
        0.0,
        jnp.minimum(y0px + h_px, gt[:, 4]) - jnp.maximum(y0px, gt[:, 2]),
    )
    inter = ix * iy
    a_p = w_px * h_px
    a_b = (gt[:, 3] - gt[:, 1]) * (gt[:, 4] - gt[:, 2])
    union = a_p + a_b - inter
    iou = jnp.where((union > 0) & gt_mask, inter / union, 0.0)
    return jnp.max(iou, initial=0.0)


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


@functools.partial(
    jax.jit, static_argnames=("out_y_blocks", "n_trials")
)
def dct_detection_min_iou_crop_flip(
    y: jax.Array,
    cbcr: jax.Array,
    gt: jax.Array,
    gt_mask: jax.Array,
    rng: jax.Array,
    out_y_blocks: int = 38,
    n_trials: int = 8,
):
    """Bounded-trials min-IoU random crop + hflip, fully on device.

    The Caffe-SSD random crop (`data_augmentation_chain_original_ssd.py:29-101`
    / `SSDRandomCrop`) samples a lower IoU bound from
    {none, .1, .3, .5, .7, .9} and rejection-samples patches until one has
    IoU >= bound with at least one GT box.  Rejection loops are host-think;
    the TPU analog samples the bound and `n_trials` candidate 16px-aligned
    offsets per image UP FRONT, scores every candidate's max patch-GT IoU in
    parallel (a (trials, max_gt) elementwise block — trivial next to the conv
    stack), and selects the first satisfying candidate; if none satisfies,
    the highest-IoU candidate is used (vs the reference returning the image
    uncropped — impossible here since the source map is oversized and the
    output shape is static; the argmax fallback is the closest
    distribution-preserving choice).  Crop scale is fixed by
    out_y_blocks/source size (the host ships an oversized map) rather than
    the reference's U(0.3, 1) patch scale — see `dct_detection_expand` for
    the scale axis of the distribution.

    Returns (y_out, cbcr_out, gt_out, mask_out), gt in the crop frame.
    """
    B, H8, W8, _ = y.shape
    max_y0 = (H8 - out_y_blocks) // 2
    max_x0 = (W8 - out_y_blocks) // 2
    out_px = out_y_blocks * 8
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    bounds = jnp.asarray(_IOU_BOUNDS)[
        jax.random.randint(k1, (B,), 0, _IOU_BOUNDS.shape[0])
    ]
    y0s = jax.random.randint(k2, (B, n_trials), 0, max_y0 + 1)
    x0s = jax.random.randint(k3, (B, n_trials), 0, max_x0 + 1)
    flip = jax.random.bernoulli(k4, 0.5, (B,))

    def choose_one(y0t, x0t, bound, gt_i, mask_i):
        ious = jax.vmap(
            lambda y0, x0: _patch_gt_iou(
                (16 * x0).astype(jnp.float32),
                (16 * y0).astype(jnp.float32),
                float(out_px), float(out_px), gt_i, mask_i,
            )
        )(y0t, x0t)  # (n_trials,)
        ok = (ious >= bound) | (bound < 0.0) | ~jnp.any(mask_i)
        first_ok = jnp.argmax(ok)          # first True (argmax of bools)
        best = jnp.argmax(ious)            # fallback: highest-IoU candidate
        pick = jnp.where(jnp.any(ok), first_ok, best)
        return y0t[pick], x0t[pick]

    y0c, x0c = jax.vmap(choose_one)(y0s, x0s, bounds, gt, gt_mask)
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_y_blocks", "n_trials", "expand_prob", "expand_max",
        "scale_min", "scale_max", "identity_prob", "background",
    ),
)
def dct_detection_random_resized_crop(
    y: jax.Array,
    cbcr: jax.Array,
    gt: jax.Array,
    gt_mask: jax.Array,
    rng: jax.Array,
    out_y_blocks: int = 38,
    n_trials: int = 8,
    expand_prob: float = 0.5,
    expand_max: float = 4.0,
    scale_min: float = 0.3,
    scale_max: float = 1.0,
    identity_prob: float = 0.3,
    background=(123, 117, 104),
):
    """CONTINUOUS-scale expand + min-IoU crop + resize, fully on device.

    The complete scale semantics of the reference chain
    (`data_augmentation_chain_original_ssd.py:29-144`): with p=`expand_prob`
    the image is placed at a random offset on a U(1, expand_max)-times
    background canvas, then `n_trials` candidate patches with per-dimension
    scales U(scale_min, scale_max) of the canvas and aspect ratio in
    [0.5, 2] are scored against a min-IoU bound sampled from
    {none, .1, .3, .5, .7, .9}; the first satisfying candidate (else the
    highest-IoU one) is cropped AND resized to the fixed output frame in one
    linear DCT-domain op (`ops.dct_resize.dct_crop_resize` — exactly
    pixel-domain bilinear, no recompression, ~1.5% of the forward FLOPs).
    With probability `identity_prob` the crop is the FULL canvas instead —
    the analog of `RandomPatchInf`'s bail-out path
    (`object_detection_2d_patch_sampling_ops.py:591+`, hit for a large
    fraction of images), which keeps whole-scene views in the distribution.
    Unlike `dct_detection_min_iou_crop_flip` there is no block-alignment or
    fixed-crop-scale restriction — this closes the measured scale-
    distribution gap vs the host chain (BENCHMARK.md round-2 proxy A/B).

    Expand and crop compose WITHOUT materializing the canvas: a crop rect in
    canvas coordinates maps back to source coordinates by subtracting the
    placement offset, and out-of-source regions decode to the background
    color via the resample's residual mass.

    Returns (y_out, cbcr_out, gt_out, mask_out); gt in output-frame pixels.
    """
    B, H8, W8, _ = y.shape
    H, W = jnp.float32(H8 * 8), jnp.float32(W8 * 8)
    out_px = out_y_blocks * 8
    dc_y, dc_cb, dc_cr = _rgb_to_ycbcr_dc(background)
    # dct_crop_resize wants level-shifted pixel values (DC / 8)
    bg_y, bg_cb, bg_cr = dc_y / 8.0, dc_cb / 8.0, dc_cr / 8.0

    keys = jax.random.split(rng, 11)
    do_exp = jax.random.bernoulli(keys[0], expand_prob, (B,))
    # interpolation diversity (ResizeRandomInterp analog): uniform over the
    # SAME 5 cv2 modes the reference samples (bilinear/nearest/cubic/area/
    # lanczos4), all expressed as interpolation matrices in ops/dct_resize
    from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import N_INTERP_MODES

    interp_modes = jax.random.randint(keys[10], (B,), 0, N_INTERP_MODES)
    f = jnp.where(
        do_exp, jax.random.uniform(keys[1], (B,), minval=1.0,
                                   maxval=expand_max), 1.0
    )
    ch_canvas = f * H
    cw_canvas = f * W
    py = jax.random.uniform(keys[2], (B,)) * (ch_canvas - H)
    px = jax.random.uniform(keys[3], (B,)) * (cw_canvas - W)

    bounds = jnp.asarray(_IOU_BOUNDS)[
        jax.random.randint(keys[4], (B,), 0, _IOU_BOUNDS.shape[0])
    ]
    s_h = jax.random.uniform(keys[5], (B, n_trials), minval=scale_min,
                             maxval=scale_max)
    s_w = jax.random.uniform(keys[6], (B, n_trials), minval=scale_min,
                             maxval=scale_max)
    u_y = jax.random.uniform(keys[7], (B, n_trials, 2))
    flip = jax.random.bernoulli(keys[8], 0.5, (B,))

    def choose_one(s_h_t, s_w_t, u_t, bound, chc, cwc, py_i, px_i,
                   gt_i, mask_i):
        ph = s_h_t * chc
        pw = s_w_t * cwc
        ar_ok = (pw / ph >= 0.5) & (pw / ph <= 2.0)
        cy0 = u_t[:, 0] * (chc - ph) - py_i  # in SOURCE coords
        cx0 = u_t[:, 1] * (cwc - pw) - px_i

        ious = jax.vmap(
            lambda yy0, xx0, hh, ww: _patch_gt_iou(
                xx0, yy0, ww, hh, gt_i, mask_i
            )
        )(cy0, cx0, ph, pw)
        ok = ar_ok & (
            (ious >= bound) | (bound < 0.0) | ~jnp.any(mask_i)
        )
        first_ok = jnp.argmax(ok)
        best = jnp.argmax(jnp.where(ar_ok, ious, -1.0))
        pick = jnp.where(jnp.any(ok), first_ok, best)
        # no trial satisfied even the AR constraint (~p^n_trials): fall back
        # to the full canvas rather than a distorted out-of-range patch
        valid = jnp.any(ar_ok)
        return (
            jnp.where(valid, cy0[pick], -py_i),
            jnp.where(valid, cx0[pick], -px_i),
            jnp.where(valid, ph[pick], chc),
            jnp.where(valid, pw[pick], cwc),
        )

    ry0, rx0, ph, pw = jax.vmap(choose_one)(
        s_h, s_w, u_y, bounds, ch_canvas, cw_canvas, py, px, gt, gt_mask
    )

    # bail-out analog: keep the full (possibly expanded) canvas view
    ident = jax.random.bernoulli(keys[9], identity_prob, (B,))
    ry0 = jnp.where(ident, -py, ry0)
    rx0 = jnp.where(ident, -px, rx0)
    ph = jnp.where(ident, ch_canvas, ph)
    pw = jnp.where(ident, cw_canvas, pw)

    from jpeg_detection_resnet_ssd_tpu.ops.dct_resize import dct_crop_resize

    def one(y_i, c_i, ry, rx, hh, ww, fl, nn, gt_i, mask_i):
        y_out = dct_crop_resize(
            y_i, ry, rx, hh, ww, out_px, out_px, background=bg_y,
            interp_mode=nn,
        )
        c_out = dct_crop_resize(
            c_i, ry / 2.0, rx / 2.0, hh / 2.0, ww / 2.0,
            out_px // 2, out_px // 2,
            background=jnp.asarray([bg_cb, bg_cr], jnp.float32),
            interp_mode=nn,
        )
        y_out = jnp.where(fl, _flip_h_jnp(y_out), y_out)
        c_out = jnp.where(fl, _flip_h_jnp(c_out), c_out)

        sx = out_px / ww
        sy = out_px / hh
        xmin = (gt_i[:, 1] - rx) * sx
        ymin = (gt_i[:, 2] - ry) * sy
        xmax = (gt_i[:, 3] - rx) * sx
        ymax = (gt_i[:, 4] - ry) * sy
        fxmin = jnp.where(fl, out_px - xmax, xmin)
        fxmax = jnp.where(fl, out_px - xmin, xmax)
        xmin, xmax = fxmin, fxmax
        cx = (xmin + xmax) / 2.0
        cy = (ymin + ymax) / 2.0
        inside = (cx >= 0) & (cx < out_px) & (cy >= 0) & (cy < out_px)
        new_mask = mask_i & inside
        xmin = jnp.clip(xmin, 0.0, out_px - 1.0)
        xmax = jnp.clip(xmax, 0.0, out_px - 1.0)
        ymin = jnp.clip(ymin, 0.0, out_px - 1.0)
        ymax = jnp.clip(ymax, 0.0, out_px - 1.0)
        new_mask = new_mask & (xmax > xmin) & (ymax > ymin)
        new_gt = jnp.stack(
            [gt_i[:, 0], xmin, ymin, xmax, ymax], axis=-1
        )
        new_gt = jnp.where(new_mask[:, None], new_gt, 0.0)
        return y_out, c_out, new_gt, new_mask

    return jax.vmap(one)(
        y, cbcr, ry0, rx0, ph, pw, flip, interp_modes, gt, gt_mask
    )


def make_dct_detection_augment_v3(
    out_y_blocks: int = 38,
    n_trials: int = 8,
    expand_prob: float = 0.5,
    expand_max: float = 4.0,
    scale_range=(0.3, 1.0),
    identity_prob: float = 0.3,
    photometric: bool | str = True,
    background=(123, 117, 104),
    requantize_quality: int | None = None,
):
    """Device-side SSD augmentation with FULL continuous scale semantics:
    photometric -> [expand U(1,4) + min-IoU crop U(0.3,1) + bilinear resize,
    one linear DCT op] -> hflip.  See `dct_detection_random_resized_crop`.

    `photometric`: True/"dct" = coefficient-domain brightness/contrast +
    chroma-rotation hue/sat (`dct_random_photometric`, fastest);
    "pixel_hsv" = exact reference semantics via on-device pixel
    reconstruction (`pixel_photometric.dct_pixel_photometric` — true
    hexagonal HSV walk and per-op clips); False = none.

    `requantize_quality`: if set, snap the output coefficients to that JPEG
    quality's quantization grid (`ops/jpeg_quant.jpeg_requantize`) —
    reproducing the host chain's per-view re-encode quantization, the last
    distributional difference between the chains."""
    from jpeg_detection_resnet_ssd_tpu.ops.dct_augment import (
        dct_random_photometric,
    )
    from jpeg_detection_resnet_ssd_tpu.ops.pixel_photometric import (
        dct_pixel_photometric,
    )

    if photometric not in (True, False, "dct", "pixel_hsv"):
        raise ValueError(f"unknown photometric mode {photometric!r}")
    photometric_fn = (
        dct_pixel_photometric if photometric == "pixel_hsv"
        else dct_random_photometric
    )

    def augment(batch, rng):
        y, cbcr = batch["inputs"]
        y = y.astype(jnp.float32)
        cbcr = cbcr.astype(jnp.float32)
        gt, mask = batch["gt"], batch["gt_mask"]
        k1, k2 = jax.random.split(rng)
        if photometric:
            y, cbcr = photometric_fn(y, cbcr, k1)
        y, cbcr, gt, mask = dct_detection_random_resized_crop(
            y, cbcr, gt, mask, k2,
            out_y_blocks=out_y_blocks, n_trials=n_trials,
            expand_prob=expand_prob, expand_max=expand_max,
            scale_min=scale_range[0], scale_max=scale_range[1],
            identity_prob=identity_prob,
            background=background,
        )
        if requantize_quality is not None:
            from jpeg_detection_resnet_ssd_tpu.ops.jpeg_quant import (
                jpeg_requantize,
            )

            y, cbcr = jpeg_requantize(y, cbcr, requantize_quality)
        out = dict(batch)
        out["inputs"] = (y, cbcr)
        out["gt"], out["gt_mask"] = gt, mask
        return out

    return augment


def make_dct_detection_augment_v2(
    out_y_blocks: int = 38,
    expand_prob: float = 0.5,
    n_trials: int = 8,
    photometric: bool = True,
    background=(123, 117, 104),
):
    """The COMPLETE device-side analog of the reference's SSD training chain
    (`SSDDataAugmentation`, `data_augmentation_chain_original_ssd.py:208-280`:
    photometric -> expand -> min-IoU random crop -> hflip -> resize), compiled
    into the train step:

      * photometric: DCT-domain brightness/contrast (`dct_random_photometric`);
      * expand: 2x zoom-out onto a mean-color canvas (`dct_detection_expand`);
      * crop+flip: bounded-trials min-IoU crop (`dct_detection_min_iou_crop_flip`);
      * resize: subsumed by the fixed out_y_blocks frame contract.

    Usage mirrors `make_dct_detection_augment`; the host ships oversized
    coefficient maps whose side is a multiple of 4 blocks (e.g. 44 -> 352 px).
    """
    from jpeg_detection_resnet_ssd_tpu.ops.dct_augment import (
        dct_random_photometric,
    )

    def augment(batch, rng):
        y, cbcr = batch["inputs"]
        # accept int16-shipped coefficients (half the host->device bytes,
        # data/packed.py ship_dtype): cast on device, inside the step
        y = y.astype(jnp.float32)
        cbcr = cbcr.astype(jnp.float32)
        gt, mask = batch["gt"], batch["gt_mask"]
        k1, k2, k3 = jax.random.split(rng, 3)
        if photometric:
            y, cbcr = dct_random_photometric(y, cbcr, k1)
        if expand_prob > 0:
            y, cbcr, gt, mask = dct_detection_expand(
                y, cbcr, gt, mask, k2,
                prob=expand_prob, background=background,
            )
        y, cbcr, gt, mask = dct_detection_min_iou_crop_flip(
            y, cbcr, gt, mask, k3,
            out_y_blocks=out_y_blocks, n_trials=n_trials,
        )
        out = dict(batch)
        out["inputs"] = (y, cbcr)
        out["gt"], out["gt_mask"] = gt, mask
        return out

    return augment
