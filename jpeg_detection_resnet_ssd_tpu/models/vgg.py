"""VGG-A / VGG-D classifiers: RGB baselines and the Deguerre DCT variants.

Re-designs `classification_part/vgg_jpeg_keras/networks/networks.py` (RGB) and
`networks_dct.py` (DCT) as three parametrized modules instead of six
copy-edited graph builders:

  VGG(variant)        — `vgga`/`vggd` (`networks.py:10-171`): plain VGG on
                        224x224x3 RGB.
  VGGDCT(variant)     — `vgga_dct`/`vggd_dct` (`networks_dct.py:9-119`):
                        dual-input; Y coefficients through a 256-wide entry
                        conv + block 4; BN'd CbCr concatenated before block 5.
  VGGDCT8x8(variant)  — `vgga_dct_8x8`/`vggd_dct_8x8` (`networks_dct.py:122-252`):
                        single 224x224x3 "DCT image" through a Conv2D(196, 8x8,
                        stride 8) stem.

All return logits (reference emits softmax).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from jpeg_detection_resnet_ssd_tpu.models.layers import batch_norm, conv, max_pool

# convs per block for each variant (blocks 1..5)
_BLOCK_DEPTH = {"a": (1, 1, 2, 2, 2), "d": (2, 2, 3, 3, 3)}
_BLOCK_WIDTH = (64, 128, 256, 512, 512)


class _VGGHead(nn.Module):
    """Flatten -> fc1(4096) -> dropout -> fc2(4096) -> dropout -> logits."""

    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc2")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="predictions")(x)


def _conv_stack(x, n: int, width: int, block: int, dtype, start: int = 1):
    for j in range(start, start + n):
        x = nn.relu(
            conv(width, 3, 1, "SAME", name=f"block{block}_conv{j}", dtype=dtype)(x)
        )
    return x


class VGG(nn.Module):
    """Plain VGG-A/D on RGB images (`networks.py:10-171`)."""

    variant: str = "a"
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        for block, (n, width) in enumerate(
            zip(_BLOCK_DEPTH[self.variant], _BLOCK_WIDTH), start=1
        ):
            x = _conv_stack(x, n, width, block, self.dtype)
            x = max_pool(x, 2, 2)
        return _VGGHead(self.num_classes, self.dtype, name="head")(x, train)


class VGGDCT(nn.Module):
    """Dual-input DCT VGG (`networks_dct.py:9-119`).

    Y (28,28,64): BN -> conv1_1_dct(256) -> block4 convs -> pool -> concat with
    BN'd CbCr (14,14,128) -> block5 convs -> pool -> head.
    """

    variant: str = "a"
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        y, cbcr = inputs
        y = jnp.asarray(y, self.dtype)
        cbcr = jnp.asarray(cbcr, self.dtype)
        n4 = 2 if self.variant == "a" else 3

        norm_cbcr = batch_norm(train, name="b_norm_128", dtype=self.dtype)(cbcr)
        x = batch_norm(train, name="b_norm_64", dtype=self.dtype)(y)
        x = nn.relu(
            conv(256, 3, 1, "SAME", name="conv1_1_dct_256", dtype=self.dtype)(x)
        )
        for j in range(1, n4 + 1):
            x = nn.relu(
                conv(512, 3, 1, "SAME", name=f"conv4_{j}", dtype=self.dtype)(x)
            )
        x = max_pool(x, 2, 2)  # 28 -> 14
        x = jnp.concatenate([x, norm_cbcr], axis=-1)
        for j in range(1, n4 + 1):
            x = nn.relu(
                conv(512, 3, 1, "SAME", name=f"conv5_{j}", dtype=self.dtype)(x)
            )
        x = max_pool(x, 2, 2)  # 14 -> 7
        return _VGGHead(self.num_classes, self.dtype, name="head")(x, train)


class VGGDCT8x8(nn.Module):
    """Single-input "DCT image" VGG (`networks_dct.py:122-252`).

    Consumes the jpegdecoder level-2 layout: a (224,224,3) plane holding DCT
    coefficients in 8x8 block positions; the stem is a stride-8 8x8 conv, so
    each kernel application reads exactly one JPEG block per component.
    """

    variant: str = "a"
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.asarray(x, self.dtype)
        n = 2 if self.variant == "a" else 3
        x = batch_norm(train, name="b_norm_input", dtype=self.dtype)(x)
        x = nn.relu(
            conv(196, 8, 8, "SAME", name="conv1_1_dct_8x8", dtype=self.dtype)(x)
        )  # 224 -> 28
        for j in range(1, n + 1):
            x = nn.relu(
                conv(512, 3, 1, "SAME", name=f"conv4_{j}", dtype=self.dtype)(x)
            )
        x = max_pool(x, 2, 2)
        for j in range(1, n + 1):
            x = nn.relu(
                conv(512, 3, 1, "SAME", name=f"conv5_{j}", dtype=self.dtype)(x)
            )
        x = max_pool(x, 2, 2)
        return _VGGHead(self.num_classes, self.dtype, name="head")(x, train)
