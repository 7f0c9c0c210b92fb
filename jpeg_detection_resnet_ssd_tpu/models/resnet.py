"""ResNet-50 backbones: RGB baseline + the 7 DCT-input stem variants.

Re-designs `classification_part/vgg_jpeg_keras/networks/resnet_dct.py` as
parametrized flax modules.  The reference builds each DCT architecture as a
separate Keras graph-builder function (`resnet_dct.py:454-711`); here one
`DCTStem` module switches on `archi`, and the SSD detection models reuse it at
38x38/19x19 scale (the reference duplicates the same code at
`localisation_part/models/keras_ssd300_dct_j2d_resnet.py:1591-1771`).

Parameter naming matches the reference's Keras layer names
(`res{stage}{block}_branch2a` / `bn{stage}{block}_branch2a` ...) so the H5
importer can transfer pretrained weights by name (the reference relies on
`load_weights(by_name=True)`, `resnet_dct.py:448`).

Input contracts (classification, 224x224 source images):
  RGB:   (B, 224, 224, 3)
  DCT:   y (B, 28, 28, 64), cbcr (B, 14, 14, 128)   [jpeg2dct layout]
  deconv: y + cb (B, 14, 14, 64) + cr (B, 14, 14, 64)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from jpeg_detection_resnet_ssd_tpu.models.layers import (
    HE_NORMAL,
    batch_norm,
    conv,
    max_pool,
    upsample2x,
    zero_pad2d,
)

CLASSIFICATION_ARCHIS = (
    "deconv",
    "up_sampling",
    "up_sampling_rfa",
    "late_concat_rfa_thinner",
    "late_concat_more_channels",
    "cb5_only",
    "y_cb4_cbcr_cb5",
)


class ResNetBlocks(nn.Module):
    """Mixin providing Keras-parity bottleneck blocks.

    `_identity_block` / `_conv_block` mirror `resnet_dct.py:59-163`: 1x1 ->
    kxk('same') -> 1x1 bottleneck with BatchNorm after each conv, residual add,
    final relu; the conv variant adds a strided 1x1 projection shortcut.

    `remat=True` rematerializes each bottleneck branch on the backward pass
    (`jax.checkpoint` via flax's lifted transform): activations inside the
    branch are recomputed instead of stored, trading ~30% extra forward FLOPs
    for O(depth) less activation memory — the lever for scaling batch size or
    input resolution past HBM limits.
    """

    dtype: Any = jnp.float32
    remat: bool = False

    def _branch_fn(self):
        if self.remat:
            # static args: filters/kernel/stage/block/strides/train
            return nn.remat(
                type(self)._branch, static_argnums=(2, 3, 4, 5, 6, 7)
            )
        return type(self)._branch

    def _branch(self, x, filters, kernel, stage, block, strides, train):
        f1, f2, f3 = filters
        cn = f"res{stage}{block}_branch"
        bn = f"bn{stage}{block}_branch"
        y = conv(f1, 1, strides, "VALID", name=cn + "2a", dtype=self.dtype)(x)
        y = batch_norm(train, name=bn + "2a", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = conv(f2, kernel, 1, "SAME", name=cn + "2b", dtype=self.dtype)(y)
        y = batch_norm(train, name=bn + "2b", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = conv(f3, 1, 1, "VALID", name=cn + "2c", dtype=self.dtype)(y)
        y = batch_norm(train, name=bn + "2c", dtype=self.dtype)(y)
        return y

    def _identity_block(self, x, kernel, filters, stage, block, train):
        y = self._branch_fn()(
            self, x, tuple(filters), kernel, stage, block, (1, 1), train
        )
        return nn.relu(y + x)

    def _conv_block(self, x, kernel, filters, stage, block, train, strides=(2, 2)):
        y = self._branch_fn()(
            self, x, tuple(filters), kernel, stage, block, tuple(strides), train
        )
        cn = f"res{stage}{block}_branch"
        bn = f"bn{stage}{block}_branch"
        sc = conv(filters[2], 1, strides, "VALID", name=cn + "1", dtype=self.dtype)(x)
        sc = batch_norm(train, name=bn + "1", dtype=self.dtype)(sc)
        return nn.relu(y + sc)

    def _block5(self, x, train):
        """Stage-5 [512, 512, 2048] (shared tail of every variant)."""
        x = self._conv_block(x, 3, [512, 512, 2048], 5, "a", train)
        x = self._identity_block(x, 3, [512, 512, 2048], 5, "b", train)
        x = self._identity_block(x, 3, [512, 512, 2048], 5, "c", train)
        return x


class DCTStem(ResNetBlocks):
    """The 7 DCT-input ResNet stems, ending just before stage 5.

    Scale-agnostic: classification feeds (28,28)/(14,14) coefficient maps,
    detection feeds (38,38)/(19,19).  Returns `(features, taps)` where `taps`
    exposes the intermediate maps the ssd_custom neck needs (`conv4_3`,
    `conv3_3`, `conv4_6` — `keras_ssd300_dct_j2d_resnet.py:547-556`).

    Reference graphs: `resnet_dct.py:454-711` (classification scale) and
    `keras_ssd300_dct_j2d_resnet.py:1591-1771` (detection scale).
    """

    archi: str = "late_concat_rfa_thinner"

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        taps: dict[str, jnp.ndarray] = {}
        archi = self.archi
        if archi == "deconv":
            y, cb, cr = inputs
        else:
            y, cbcr = inputs
        y = jnp.asarray(y, self.dtype)

        if archi in ("deconv", "up_sampling", "up_sampling_rfa"):
            if archi == "deconv":
                cb = nn.ConvTranspose(
                    64, (2, 2), strides=(2, 2), padding="VALID",
                    kernel_init=HE_NORMAL, dtype=self.dtype, name="deconv_cb",
                )(jnp.asarray(cb, self.dtype))
                cr = nn.ConvTranspose(
                    64, (2, 2), strides=(2, 2), padding="VALID",
                    kernel_init=HE_NORMAL, dtype=self.dtype, name="deconv_cr",
                )(jnp.asarray(cr, self.dtype))
                up = jnp.concatenate([cb, cr], axis=-1)
            else:
                up = upsample2x(jnp.asarray(cbcr, self.dtype))
            x = jnp.concatenate([y, up], axis=-1)
            x = batch_norm(train, name="bn_in", dtype=self.dtype)(x)
            if archi != "up_sampling":
                # receptive-field-aware entry blocks (`resnet_dct.py:583-585`)
                x = self._conv_block(x, 1, [256, 256, 1024], 4, "a2", train, (1, 1))
                x = self._identity_block(x, 2, [256, 256, 1024], 4, "b2", train)
                x = self._identity_block(x, 3, [256, 256, 1024], 4, "c2", train)
            # Block 3 (stride 1 entry) + Block 4
            x = self._conv_block(x, 3, [128, 128, 512], 3, "a1", train, (1, 1))
            x = self._identity_block(x, 3, [128, 128, 512], 3, "b", train)
            x = self._identity_block(x, 3, [128, 128, 512], 3, "c", train)
            x = self._identity_block(x, 3, [128, 128, 512], 3, "d", train)
            x = self._conv_block(x, 3, [256, 256, 1024], 4, "a", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "b", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "c", train)
            taps["conv4_3"] = x
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "d", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "e", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "f", train)
            return x, taps

        if archi in ("late_concat_rfa_thinner", "late_concat_more_channels"):
            wide = 768 if archi == "late_concat_more_channels" else 384
            yb = batch_norm(train, name="bn_y_in", dtype=self.dtype)(y)
            yb = self._conv_block(yb, 1, [256, 256, wide], 1, "a2", train, (1, 1))
            yb = self._identity_block(yb, 2, [256, 256, wide], 1, "b2", train)
            yb = self._identity_block(yb, 3, [256, 256, wide], 1, "c2", train)
            mid = (
                [256, 256, 768]
                if archi == "late_concat_more_channels"
                else [128, 128, 384]
            )
            yb = self._conv_block(yb, 3, mid, 2, "a3", train, (1, 1))
            yb = self._identity_block(yb, 3, mid, 2, "b3", train)
            yb = self._identity_block(yb, 3, mid, 2, "c3", train)
            yb = self._identity_block(yb, 3, mid, 2, "d3", train)
            yb = self._conv_block(yb, 3, [256, 256, 384], 2, "a4", train)
            cb = batch_norm(train, name="bn_cbcr_in", dtype=self.dtype)(
                jnp.asarray(cbcr, self.dtype)
            )
            cb = self._conv_block(cb, 1, [256, 256, 128], 2, "a5", train, (1, 1))
            x = jnp.concatenate([yb, cb], axis=-1)
            sfx = "1" if archi == "late_concat_more_channels" else ""
            x = self._identity_block(x, 3, [128, 128, 512], 3, "b" + sfx, train)
            x = self._identity_block(x, 3, [128, 128, 512], 3, "c" + sfx, train)
            x = self._identity_block(x, 3, [128, 128, 512], 3, "d" + sfx, train)
            x = self._conv_block(x, 3, [256, 256, 1024], 4, "a", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "b", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "c", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "d", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "e", train)
            x = self._identity_block(x, 3, [256, 256, 1024], 4, "f", train)
            return x, taps

        if archi == "cb5_only":
            yb = batch_norm(train, name="bn_y_in", dtype=self.dtype)(y)
            yb = self._conv_block(yb, 1, [256, 256, 768], 1, "a2", train, (1, 1))
            yb = self._identity_block(yb, 2, [256, 256, 768], 1, "b2", train)
            yb = self._identity_block(yb, 3, [256, 256, 768], 1, "c2", train)
            yb = self._conv_block(yb, 3, [256, 256, 768], 2, "a3", train, (1, 1))
            yb = self._identity_block(yb, 3, [256, 256, 768], 2, "b3", train)
            yb = self._identity_block(yb, 3, [256, 256, 768], 2, "c3", train)
            yb = self._identity_block(yb, 3, [256, 256, 768], 2, "d3", train)
            yb = self._conv_block(yb, 3, [256, 256, 768], 2, "a4", train)
            cb = batch_norm(train, name="bn_cbcr_in", dtype=self.dtype)(
                jnp.asarray(cbcr, self.dtype)
            )
            cb = self._conv_block(cb, 1, [256, 256, 256], 2, "a5", train, (1, 1))
            return jnp.concatenate([yb, cb], axis=-1), taps

        if archi == "y_cb4_cbcr_cb5":
            yb = batch_norm(train, name="bn_y_in", dtype=self.dtype)(y)
            yb = self._conv_block(yb, 1, [256, 256, 384], 1, "a2", train, (1, 1))
            yb = self._identity_block(yb, 2, [256, 256, 384], 1, "b2", train)
            yb = self._identity_block(yb, 3, [256, 256, 384], 1, "c2", train)
            yb = self._conv_block(yb, 3, [128, 128, 512], 2, "a3", train, (1, 1))
            yb = self._identity_block(yb, 3, [128, 128, 512], 2, "b3", train)
            yb = self._identity_block(yb, 3, [128, 128, 512], 2, "c3", train)
            conv4_3 = self._identity_block(yb, 3, [128, 128, 512], 2, "d3", train)
            taps["conv4_3"] = conv4_3
            x = self._conv_block(conv4_3, 3, [256, 256, 768], 4, "a2", train)
            x = self._identity_block(x, 3, [256, 256, 768], 4, "b2", train)
            x = self._identity_block(x, 3, [256, 256, 768], 4, "c2", train)
            x = self._identity_block(x, 3, [256, 256, 768], 4, "d2", train)
            x = self._identity_block(x, 3, [256, 256, 768], 4, "e2", train)
            conv4_6 = self._identity_block(x, 3, [256, 256, 768], 4, "f2", train)
            taps["conv4_6"] = conv4_6
            cb = batch_norm(train, name="bn_cbcr_in", dtype=self.dtype)(
                jnp.asarray(cbcr, self.dtype)
            )
            cb = self._conv_block(cb, 1, [256, 256, 256], 2, "a5", train, (1, 1))
            return jnp.concatenate([conv4_6, cb], axis=-1), taps

        raise ValueError(f"unknown DCT archi {archi!r}")


class ResNet50DCT(ResNetBlocks):
    """ImageNet classifier over DCT inputs: DCTStem + stage 5 + head.

    Role of `ResNet50Custom` (`resnet_dct.py:317-452`).  Returns logits
    (the reference emits softmax probabilities; apply `jax.nn.softmax` for
    probability parity).
    """

    archi: str = "late_concat_rfa_thinner"
    num_classes: int = 1000

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x, _ = DCTStem(archi=self.archi, dtype=self.dtype,
                       remat=self.remat, name="stem")(
            inputs, train=train
        )
        x = self._block5(x, train)
        x = jnp.mean(x, axis=(1, 2))  # GlobalAveragePooling2D 'avg_pool'
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc1000")(x)
        return x


class ResNet50RGB(ResNetBlocks):
    """Stock ResNet-50 (Keras fchollet weights layout), NHWC, logits output.

    Reference: `resnet_dct.py:165-314`.
    """

    num_classes: int = 1000
    include_top: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        x = zero_pad2d(x, 3)
        x = conv(64, 7, 2, "VALID", name="conv1", dtype=self.dtype)(x)
        x = batch_norm(train, name="bn_conv1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = zero_pad2d(x, 1)
        x = max_pool(x, 3, 2, "VALID")

        x = self._conv_block(x, 3, [64, 64, 256], 2, "a", train, (1, 1))
        x = self._identity_block(x, 3, [64, 64, 256], 2, "b", train)
        x = self._identity_block(x, 3, [64, 64, 256], 2, "c", train)

        x = self._conv_block(x, 3, [128, 128, 512], 3, "a", train)
        x = self._identity_block(x, 3, [128, 128, 512], 3, "b", train)
        x = self._identity_block(x, 3, [128, 128, 512], 3, "c", train)
        x = self._identity_block(x, 3, [128, 128, 512], 3, "d", train)

        x = self._conv_block(x, 3, [256, 256, 1024], 4, "a", train)
        for blk in "bcdef":
            x = self._identity_block(x, 3, [256, 256, 1024], 4, blk, train)

        x = self._block5(x, train)
        if not self.include_top:
            return x
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc1000")(x)
        return x
