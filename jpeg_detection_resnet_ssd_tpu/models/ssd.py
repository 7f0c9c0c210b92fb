"""SSD300 detector families over DCT / RGB backbones.

Re-designs the reference's 10 SSD model files (`localisation_part/models/`)
as five parametrized flax modules sharing one head/neck implementation:

  SSDResNetCustom       — `ssd_resnet_EF_layers_custom`
                          (`keras_ssd300_dct_j2d_resnet.py:167-932`): the
                          best-mAP "ssd_custom" architecture; late-concat-RFA-
                          thinner ResNet trunk at 38x38/19x19 with remapped
                          extra-feature predictor sources.
  SSDResNetIdentical    — `ssd_resnet_EF_layers_identical` (`:935-1588`):
                          DCT ResNet backbones + the original SSD300 extra
                          layers; first predictor taps the RAW Y input through
                          L2Normalization (`:1221`).
  SSDVGG                — `ssd_300` (`keras_ssd300.py`): original VGG16-SSD300
                          incl. in-graph mean-subtraction / channel swap.
  SSDVGGDCT             — `ssd_300DCT` j2d variant (`keras_ssd300_dct_j2d.py:31`):
                          dual DCT inputs, VGG-D-style blocks 4-5.
  SSDVGGDCTImage        — `keras_ssd300_dct.py`: single 300x300x3 "DCT image"
                          through a stride-8 8x8 stem.

All modules return the raw training-mode prediction tensor
`(B, n_boxes_total, n_classes + 1 + 12)` = [softmax conf, loc offsets, anchor
coords, variances] — identical layout to the reference's `predictions_ssd`
output.  The reference's 'inference'/'inference_fast' modes are NOT separate
graphs here: compose with `boxes.decode_detections` (see
`make_inference_fn`), which is the XLA-native equivalent of the
DecodeDetections layer.

L2 regularization note: the reference attaches l2(5e-4) to SSD-neck/head conv
kernels via Keras layer regularizers; in this framework the equivalent penalty
is applied by the trainer (optax masked weight decay over the same parameter
names), keeping the model pure.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.linen.dtypes import promote_dtype

from jpeg_detection_resnet_ssd_tpu.boxes.anchors import (
    AnchorSpec,
    build_anchors,
    n_boxes_per_cell,
)
from jpeg_detection_resnet_ssd_tpu.boxes.decode import decode_detections
from jpeg_detection_resnet_ssd_tpu.models.layers import (
    HE_NORMAL,
    L2Normalization,
    batch_norm,
    conv,
    max_pool,
    pallas_wgrad_enabled,
    zero_pad2d,
)
from jpeg_detection_resnet_ssd_tpu.models.resnet import DCTStem, ResNetBlocks

DETECTION_ARCHIS = ("ssd_custom", "deconv", "up_sampling", "cb5_only", "y_cb4_cbcr_cb5")

# Predictor layer base names — kept from the original VGG-SSD for H5 weight
# compatibility even where the source feature maps were remapped
# (`keras_ssd300_dct_j2d_resnet.py:551-556`).
_HEAD_NAMES = ("conv4_3_norm", "fc7", "conv6_2", "conv7_2", "conv8_2", "conv9_2")


def ssd_predictor_sizes(family: str) -> tuple[tuple[int, int], ...]:
    """Static predictor feature-map sizes per model family (300x300 input)."""
    if family in ("vgg", "vgg_dct", "vgg_dct_image", "resnet_custom"):
        return ((38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1))
    if family == "resnet_identical":
        return ((38, 38), (10, 10), (5, 5), (5, 5), (3, 3), (1, 1))
    raise ValueError(f"unknown SSD family {family!r}")


class _ConvParams(nn.Module):
    """Owns an nn.Conv-shaped (kernel, bias) pair without applying it.

    Param tree, names, shapes, and initializers match `layers.conv`
    (`nn.Conv`: kernel (kh, kw, Cin, Cout) he_normal, bias zeros), so H5
    import, checkpoints, and the TP sharding rule are unaffected when a
    call site fuses several convs into one `lax.conv_general_dilated`.
    """

    features: int
    in_features: int
    kernel_size: tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            HE_NORMAL,
            self.kernel_size + (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _SSDHead(nn.Module):
    """Shared conf/loc predictor heads + prediction tensor assembly.

    The conf and loc predictors on each source are OWNED as two separate
    parameter groups (reference head names, H5-compatible) but EXECUTED as
    one conv over the concatenated output channels: per output channel the
    contraction is unchanged (exact same math), while the MXU sees one
    lane-padded output block instead of two (conf Cout 84/126 and loc Cout
    16/24 each round up to the 128-lane tile separately) and the source
    activations are read from HBM once instead of twice.
    """

    n_classes: int  # positive classes
    spec: AnchorSpec
    class_suffixed_conf_names: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sources: Sequence[jnp.ndarray]):
        n_total = self.n_classes + 1
        n_boxes = [
            n_boxes_per_cell(ar, self.spec.two_boxes_for_ar1)
            for ar in self.spec.aspect_ratios
        ]
        confs, locs = [], []
        for i, (name, src) in enumerate(zip(_HEAD_NAMES, sources)):
            conf_name = (
                f"{name}_mbox_conf_{n_total}"
                if self.class_suffixed_conf_names
                else f"{name}_mbox_conf"
            )
            n_conf = n_boxes[i] * n_total
            cin = src.shape[-1]
            kc, bc = _ConvParams(n_conf, cin, name=conf_name)()
            kl, bl = _ConvParams(n_boxes[i] * 4, cin, name=f"{name}_mbox_loc")()
            kernel = jnp.concatenate([kc, kl], axis=-1)
            bias = jnp.concatenate([bc, bl], axis=-1)
            src, kernel, bias = promote_dtype(src, kernel, bias, dtype=self.dtype)
            if pallas_wgrad_enabled():
                # Pallas filter-grad path (layers.set_pallas_wgrad); the dW
                # cotangent flows back through the concat to both param
                # groups unchanged.
                from jpeg_detection_resnet_ssd_tpu.ops.pallas_conv_grad import (
                    conv3x3_same_pallas_wgrad,
                )

                out = conv3x3_same_pallas_wgrad(
                    src, kernel, jax.default_backend() == "cpu"
                ) + bias
            else:
                out = jax.lax.conv_general_dilated(
                    src, kernel, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bias
            c, l = out[..., :n_conf], out[..., n_conf:]
            confs.append(c.reshape(c.shape[0], -1, n_total))
            locs.append(l.reshape(l.shape[0], -1, 4))
        mbox_conf = jnp.concatenate(confs, axis=1)
        mbox_loc = jnp.concatenate(locs, axis=1)

        predictor_sizes = [tuple(s.shape[1:3]) for s in sources]
        anchors = build_anchors(self.spec, predictor_sizes, coords="centroids")
        anchors = jnp.broadcast_to(
            jnp.asarray(anchors, self.dtype)[None], (mbox_conf.shape[0],) + anchors.shape
        )
        mbox_conf = nn.softmax(mbox_conf.astype(jnp.float32), axis=-1)
        return jnp.concatenate(
            [mbox_conf, mbox_loc.astype(jnp.float32), anchors.astype(jnp.float32)],
            axis=-1,
        )


class _FC6CenterTap(nn.Module):
    """fc6's 3x3 dilation-6 conv on a map too small for the dilated taps.

    With SAME padding, kernel 3, dilation d, the off-center taps read input
    positions offset exactly +-d from the output pixel; when the input's
    static H and W are both <= d those positions are ALWAYS inside the zero
    padding, so the conv equals its center-tap 1x1 conv at 1/9 the FLOPs
    (exactness asserted on TPU: `scripts/profile_conv_bwd.py`
    fc6_center_tap_exact; accumulating the 8 all-zero tap products is exact
    in floating point).  On the flagship `ssd_custom` the neck map is 5x5
    (`keras_ssd300_dct_j2d_resnet.py:481-495` at ResNet stage-5 scale), so
    this removes ~27 of the step's GFLOPs for free.  The full (3,3,Cin,Cout)
    kernel is still owned — same param tree as `nn.Conv`, H5 import and
    checkpoints unchanged; the off-center taps get exactly the zero gradient
    the dilated conv gives them.
    """

    features: int
    dilation: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert x.shape[1] <= self.dilation and x.shape[2] <= self.dilation, (
            f"center-tap rewrite invalid: map {x.shape[1]}x{x.shape[2]} vs "
            f"dilation {self.dilation}"
        )
        kernel = self.param(
            "kernel", HE_NORMAL, (3, 3, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        return jax.lax.conv_general_dilated(
            x, kernel[1:2, 1:2], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias


class _SSDNeckMixin(ResNetBlocks):
    """pool5 -> dilated fc6 -> fc7 (shared by every SSD variant)."""

    def _fc_neck(self, x, train):
        x = max_pool(x, 3, 1, "SAME")  # 'pool5_ssd'
        if x.shape[1] <= 6 and x.shape[2] <= 6:
            # ssd_custom's 5x5 neck: the dilated taps never land in-bounds.
            fc6 = _FC6CenterTap(1024, dilation=6, dtype=self.dtype, name="fc6")
        else:
            fc6 = conv(1024, 3, 1, "SAME", dilation=6, name="fc6", dtype=self.dtype)
        x = nn.relu(fc6(x))
        x = nn.relu(conv(1024, 1, 1, "SAME", name="fc7", dtype=self.dtype)(x))
        return x

    def _extra_block(self, x, n1, n2, idx, strides, pad):
        """conv{idx}_1 (1x1) [-> zero-pad] -> conv{idx}_2 (3x3, valid)."""
        x = nn.relu(
            conv(n1, 1, 1, "SAME", name=f"conv{idx}_1", dtype=self.dtype)(x)
        )
        if pad:
            x = zero_pad2d(x, 1)
        x = nn.relu(
            conv(n2, 3, strides, "VALID", name=f"conv{idx}_2", dtype=self.dtype)(x)
        )
        return x


class SSDResNetCustom(_SSDNeckMixin):
    """The flagship "ssd_custom" detector (best reference mAP 0.630 VOC07).

    Trunk = late-concat-RFA-thinner at detection scale with three L2-normalized
    taps; predictor sources (reference remapping,
    `keras_ssd300_dct_j2d_resnet.py:440-556`):
      conv4_3(resnet, 38x38x384), conv3_3(19x19x512), conv4_6(10x10x1024),
      fc7(5x5x1024), conv6_2(3x3x256), conv9_2(1x1x256).

    Inputs: (y, cbcr) with y (B,38,38,64) and cbcr (B,19,19,128).
    """

    n_classes: int = 20
    spec: AnchorSpec = AnchorSpec()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        y, cbcr = inputs
        y = jnp.asarray(y, self.dtype)
        cbcr = jnp.asarray(cbcr, self.dtype)

        yb = batch_norm(train, name="bn_y_in", dtype=self.dtype)(y)
        yb = self._conv_block(yb, 1, [256, 256, 384], 1, "a2", train, (1, 1))
        yb = self._identity_block(yb, 2, [256, 256, 384], 1, "b2", train)
        yb = self._identity_block(yb, 3, [256, 256, 384], 1, "c2", train)
        yb = self._conv_block(yb, 3, [128, 128, 384], 2, "a3", train, (1, 1))
        yb = self._identity_block(yb, 3, [128, 128, 384], 2, "b3", train)
        yb = self._identity_block(yb, 3, [128, 128, 384], 2, "c3", train)
        conv4_3 = self._identity_block(yb, 3, [128, 128, 384], 2, "d3", train)

        yb = self._conv_block(conv4_3, 3, [256, 256, 384], 2, "a4", train)  # -> 19x19
        cb = batch_norm(train, name="bn_cbcr_in", dtype=self.dtype)(cbcr)
        cb = self._conv_block(cb, 1, [256, 256, 128], 2, "a5", train, (1, 1))
        x = jnp.concatenate([yb, cb], axis=-1)

        x = self._identity_block(x, 3, [128, 128, 512], 3, "b", train)
        x = self._identity_block(x, 3, [128, 128, 512], 3, "c", train)
        conv3_3 = self._identity_block(x, 3, [128, 128, 512], 3, "d", train)

        x = self._conv_block(conv3_3, 3, [256, 256, 1024], 4, "a", train)  # -> 10x10
        x = self._identity_block(x, 3, [256, 256, 1024], 4, "b", train)
        x = self._identity_block(x, 3, [256, 256, 1024], 4, "c", train)
        x = self._identity_block(x, 3, [256, 256, 1024], 4, "d", train)
        x = self._identity_block(x, 3, [256, 256, 1024], 4, "e", train)
        conv4_6 = self._identity_block(x, 3, [256, 256, 1024], 4, "f", train)

        x = self._block5(conv4_6, train)  # -> 5x5x2048
        fc7 = self._fc_neck(x, train)  # 5x5x1024
        conv6_2 = self._extra_block(fc7, 256, 256, 6, 2, pad=True)  # 3x3x256
        conv9_2 = self._extra_block(conv6_2, 128, 256, 9, 1, pad=False)  # 1x1x256

        sources = [
            L2Normalization(dtype=self.dtype, name="conv4_3_norm")(conv4_3),
            L2Normalization(dtype=self.dtype, name="conv3_3_norm")(conv3_3),
            L2Normalization(dtype=self.dtype, name="conv4_6_norm")(conv4_6),
            fc7,
            conv6_2,
            conv9_2,
        ]
        return _SSDHead(self.n_classes, self.spec, dtype=self.dtype, name="head")(
            sources
        )


class SSDResNetIdentical(_SSDNeckMixin):
    """DCT ResNet backbone + ORIGINAL SSD300 extra layers.

    Reference `ssd_resnet_EF_layers_identical`
    (`keras_ssd300_dct_j2d_resnet.py:935-1588`).  Backbone switch:
    deconv / y_cb4_cbcr_cb5 / up_sampling (-> RFA variant, `:1103-1104`) /
    cb5_only; predictor sources: L2Norm(RAW input_y) (38x38x64!), fc7 (10x10),
    conv6_2 (5x5), conv7_2 (5x5), conv8_2 (3x3), conv9_2 (1x1).
    """

    archi: str = "deconv"
    n_classes: int = 20
    spec: AnchorSpec = AnchorSpec()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        stem_archi = "up_sampling_rfa" if self.archi == "up_sampling" else self.archi
        x, _ = DCTStem(archi=stem_archi, dtype=self.dtype,
                       remat=self.remat, name="stem")(
            inputs, train=train
        )
        x = self._block5(x, train)  # -> 10x10x2048
        fc7 = self._fc_neck(x, train)  # 10x10
        conv6_2 = self._extra_block(fc7, 256, 512, 6, 2, pad=True)  # 5x5x512
        conv7_2 = self._extra_block(conv6_2, 128, 256, 7, 1, pad=True)  # 5x5x256
        conv8_2 = self._extra_block(conv7_2, 128, 256, 8, 1, pad=False)  # 3x3x256
        conv9_2 = self._extra_block(conv8_2, 128, 256, 9, 1, pad=False)  # 1x1x256

        input_y = inputs[0]
        sources = [
            L2Normalization(dtype=self.dtype, name="conv4_3_norm")(
                jnp.asarray(input_y, self.dtype)
            ),
            fc7,
            conv6_2,
            conv7_2,
            conv8_2,
            conv9_2,
        ]
        return _SSDHead(self.n_classes, self.spec, dtype=self.dtype, name="head")(
            sources
        )


class SSDVGG(_SSDNeckMixin):
    """Original VGG16 SSD300 on RGB images (`keras_ssd300.py`).

    In-graph preprocessing (mean subtraction + BGR swap, `:263-273`) is kept so
    raw uint8-range images can be fed directly, as in the reference.
    """

    n_classes: int = 20
    spec: AnchorSpec = AnchorSpec()
    subtract_mean: tuple = (123, 117, 104)
    swap_channels: tuple = (2, 1, 0)
    class_suffixed_conf_names: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        if self.subtract_mean is not None:
            x = x - jnp.asarray(self.subtract_mean, self.dtype)
        if self.swap_channels:
            x = x[..., jnp.asarray(self.swap_channels)]

        depths = ((64, 2), (128, 2), (256, 3), (512, 3))
        taps = {}
        for bi, (width, n) in enumerate(depths, start=1):
            for j in range(1, n + 1):
                x = nn.relu(
                    conv(width, 3, 1, "SAME", name=f"conv{bi}_{j}", dtype=self.dtype)(x)
                )
            if bi == 4:
                taps["conv4_3"] = x
            x = max_pool(x, 2, 2, "SAME")
        for j in range(1, 4):
            x = nn.relu(
                conv(512, 3, 1, "SAME", name=f"conv5_{j}", dtype=self.dtype)(x)
            )
        fc7 = self._fc_neck(x, train)  # 19x19
        conv6_2 = self._extra_block(fc7, 256, 512, 6, 2, pad=True)  # 10x10
        conv7_2 = self._extra_block(conv6_2, 128, 256, 7, 2, pad=True)  # 5x5
        conv8_2 = self._extra_block(conv7_2, 128, 256, 8, 1, pad=False)  # 3x3
        conv9_2 = self._extra_block(conv8_2, 128, 256, 9, 1, pad=False)  # 1x1

        sources = [
            L2Normalization(dtype=self.dtype, name="conv4_3_norm")(taps["conv4_3"]),
            fc7,
            conv6_2,
            conv7_2,
            conv8_2,
            conv9_2,
        ]
        return _SSDHead(
            self.n_classes,
            self.spec,
            class_suffixed_conf_names=self.class_suffixed_conf_names,
            dtype=self.dtype,
            name="head",
        )(sources)


class SSDVGGDCT(_SSDNeckMixin):
    """Dual DCT-input VGG SSD300 (`keras_ssd300_dct_j2d.py:31`, 'ssd_300DCT').

    Y (38,38,64): BN -> conv1_1_dct_256 -> conv4_1..3 -> tap conv4_3 -> pool4;
    concat BN'd CbCr (19,19,128); conv5_1..3; then standard SSD neck.
    """

    n_classes: int = 20
    spec: AnchorSpec = AnchorSpec()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        y, cbcr = inputs
        y = jnp.asarray(y, self.dtype)
        cbcr = jnp.asarray(cbcr, self.dtype)
        norm_cbcr = batch_norm(train, name="b_norm_128", dtype=self.dtype)(cbcr)
        x = batch_norm(train, name="b_norm_64", dtype=self.dtype)(y)
        x = nn.relu(
            conv(256, 3, 1, "SAME", name="conv1_1_dct_256", dtype=self.dtype)(x)
        )
        for j in range(1, 4):
            x = nn.relu(
                conv(512, 3, 1, "SAME", name=f"conv4_{j}", dtype=self.dtype)(x)
            )
        conv4_3 = x
        x = max_pool(x, 2, 2)  # 38 -> 19
        x = jnp.concatenate([x, norm_cbcr], axis=-1)
        for j in range(1, 4):
            x = nn.relu(
                conv(512, 3, 1, "SAME", name=f"conv5_{j}", dtype=self.dtype)(x)
            )
        fc7 = self._fc_neck(x, train)  # 19x19
        conv6_2 = self._extra_block(fc7, 256, 512, 6, 2, pad=True)
        conv7_2 = self._extra_block(conv6_2, 128, 256, 7, 2, pad=True)
        conv8_2 = self._extra_block(conv7_2, 128, 256, 8, 1, pad=False)
        conv9_2 = self._extra_block(conv8_2, 128, 256, 9, 1, pad=False)

        sources = [
            L2Normalization(dtype=self.dtype, name="conv4_3_norm")(conv4_3),
            fc7,
            conv6_2,
            conv7_2,
            conv8_2,
            conv9_2,
        ]
        return _SSDHead(self.n_classes, self.spec, dtype=self.dtype, name="head")(
            sources
        )


class SSDVGGDCTImage(_SSDNeckMixin):
    """Single "DCT image" SSD300 (`keras_ssd300_dct.py`).

    A (300,300,3) plane of spatially-laid-out DCT coefficients through a
    stride-8 8x8 stem (38x38x196), then VGG blocks 4-5 + standard SSD neck.
    """

    n_classes: int = 20
    spec: AnchorSpec = AnchorSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        x = batch_norm(train, name="b_norm", dtype=self.dtype)(x)
        x = nn.relu(
            conv(196, 8, 8, "SAME", name="conv1_1_dct", dtype=self.dtype)(x)
        )  # 300 -> 38
        for j in range(1, 4):
            x = nn.relu(
                conv(512, 3, 1, "SAME", name=f"conv4_{j}", dtype=self.dtype)(x)
            )
        conv4_3 = x
        x = max_pool(x, 2, 2, "SAME")  # 38 -> 19
        for j in range(1, 4):
            x = nn.relu(
                conv(512, 3, 1, "SAME", name=f"conv5_{j}", dtype=self.dtype)(x)
            )
        fc7 = self._fc_neck(x, train)
        conv6_2 = self._extra_block(fc7, 256, 512, 6, 2, pad=True)
        conv7_2 = self._extra_block(conv6_2, 128, 256, 7, 2, pad=True)
        conv8_2 = self._extra_block(conv7_2, 128, 256, 8, 1, pad=False)
        conv9_2 = self._extra_block(conv8_2, 128, 256, 9, 1, pad=False)

        sources = [
            L2Normalization(dtype=self.dtype, name="conv4_3_norm")(conv4_3),
            fc7,
            conv6_2,
            conv7_2,
            conv8_2,
            conv9_2,
        ]
        return _SSDHead(self.n_classes, self.spec, dtype=self.dtype, name="head")(
            sources
        )


def make_inference_fn(
    n_classes: int,
    spec: AnchorSpec,
    confidence_thresh: float = 0.01,
    iou_threshold: float = 0.45,
    top_k: int = 200,
    nms_max_output_size: int = 400,
    nms_impl: str = "auto",
    candidate_selector: str = "exact",
    shared_pool_size: int = 1024,
    pool_topk_impl: str = "sort",
):
    """Decode hook turning training-mode output into (B, top_k, 6) detections.

    Equivalent of rebuilding the reference model with `mode='inference'`
    (`keras_ssd300_dct_j2d_resnet.py:884-896`) — compose as
    `decode_fn(model.apply(params, inputs))`.

    The library default keeps the reference's literal per-class semantics
    (`candidate_selector='exact'`); serving/bench call sites opt into the
    ~2.5x-cheaper shared candidate pool (`candidate_selector='shared'` — see
    `boxes.decode.decode_detections`; exact for trained, background-dominant
    heads, measured-equal mAP on the convergence-proxy checkpoints, and may
    differ only in dense scenes where more than `shared_pool_size` boxes clear
    the confidence threshold).  `nms_impl='auto'` picks the Pallas NMS kernel
    on TPU; pass `'xla'` for the pure-XLA loop.
    """
    return functools.partial(
        decode_detections,
        n_classes=n_classes,
        confidence_thresh=confidence_thresh,
        iou_threshold=iou_threshold,
        top_k=top_k,
        nms_max_output_size=nms_max_output_size,
        normalize_coords=spec.normalize_coords,
        img_height=spec.img_height,
        img_width=spec.img_width,
        nms_impl=nms_impl,
        candidate_selector=candidate_selector,
        shared_pool_size=shared_pool_size,
        pool_topk_impl=pool_topk_impl,
    )
