"""Model registry + input-shape contracts for every reference architecture.

Replaces the reference's per-experiment config-as-code model selection
(`classification_part/config/*/config_file.py`, archi switches at
`resnet_dct.py:392-408` and `keras_ssd300_dct_j2d_resnet.py:1096-1108`) with a
single factory: `build_model(name, **kwargs) -> (module, example_inputs_fn)`.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from jpeg_detection_resnet_ssd_tpu.models.resnet import (
    CLASSIFICATION_ARCHIS,
    ResNet50DCT,
    ResNet50RGB,
)
from jpeg_detection_resnet_ssd_tpu.models.ssd import (
    SSDResNetCustom,
    SSDResNetIdentical,
    SSDVGG,
    SSDVGGDCT,
    SSDVGGDCTImage,
)
from jpeg_detection_resnet_ssd_tpu.models.vgg import VGG, VGGDCT, VGGDCT8x8

# Input tensor contracts (jpeg2dct layout; SURVEY.md §2.3/§2.4):
#   classification (224x224 source): Y (28,28,64), CbCr (14,14,128),
#     deconv splits CbCr into Cb (14,14,64) + Cr (14,14,64).
#   detection (300x300 source): Y (38,38,64), CbCr (19,19,128) / split 19x19.
CLS_Y, CLS_CBCR = (28, 28, 64), (14, 14, 128)
CLS_CB = CLS_CR = (14, 14, 64)
DET_Y, DET_CBCR = (38, 38, 64), (19, 19, 128)
DET_CB = DET_CR = (19, 19, 64)


def _dct_inputs(batch, y_shape, cbcr_shape, split):
    def make(rng=None):
        rng = rng or np.random.default_rng(0)
        y = rng.normal(0, 100, (batch, *y_shape)).astype(np.float32)
        if split:
            cb = rng.normal(0, 30, (batch, *cbcr_shape)).astype(np.float32)
            cr = rng.normal(0, 30, (batch, *cbcr_shape)).astype(np.float32)
            return (y, cb, cr)
        cbcr = rng.normal(0, 30, (batch, *cbcr_shape)).astype(np.float32)
        return (y, cbcr)

    return make


def _image_inputs(batch, shape):
    def make(rng=None):
        rng = rng or np.random.default_rng(0)
        return rng.uniform(0, 255, (batch, *shape)).astype(np.float32)

    return make


def _cls_dct(archi):
    def build(**kw):
        module = ResNet50DCT(archi=archi, **kw)
        split = archi == "deconv"
        ex = _dct_inputs(2, CLS_Y, CLS_CB if split else CLS_CBCR, split)
        return module, ex

    return build


def _det_resnet(archi):
    def build(**kw):
        if archi == "ssd_custom":
            module = SSDResNetCustom(**kw)
            split = False
        else:
            module = SSDResNetIdentical(archi=archi, **kw)
            split = archi == "deconv"
        ex = _dct_inputs(2, DET_Y, DET_CB if split else DET_CBCR, split)
        return module, ex

    return build


MODEL_REGISTRY: dict[str, Callable[..., tuple[Any, Callable]]] = {
    # -- classification
    "resnet50_rgb": lambda **kw: (
        ResNet50RGB(**kw),
        _image_inputs(2, (224, 224, 3)),
    ),
    **{f"resnet50_dct_{a}": _cls_dct(a) for a in CLASSIFICATION_ARCHIS},
    "vgga": lambda **kw: (VGG(variant="a", **kw), _image_inputs(2, (224, 224, 3))),
    "vggd": lambda **kw: (VGG(variant="d", **kw), _image_inputs(2, (224, 224, 3))),
    "vgga_dct": lambda **kw: (
        VGGDCT(variant="a", **kw),
        _dct_inputs(2, CLS_Y, CLS_CBCR, False),
    ),
    "vggd_dct": lambda **kw: (
        VGGDCT(variant="d", **kw),
        _dct_inputs(2, CLS_Y, CLS_CBCR, False),
    ),
    "vgga_dct_8x8": lambda **kw: (
        VGGDCT8x8(variant="a", **kw),
        _image_inputs(2, (224, 224, 3)),
    ),
    "vggd_dct_8x8": lambda **kw: (
        VGGDCT8x8(variant="d", **kw),
        _image_inputs(2, (224, 224, 3)),
    ),
    # -- detection
    **{f"ssd300_{a}": _det_resnet(a) for a in
       ("ssd_custom", "deconv", "up_sampling", "cb5_only", "y_cb4_cbcr_cb5")},
    "ssd300_vgg": lambda **kw: (SSDVGG(**kw), _image_inputs(2, (300, 300, 3))),
    "ssd300_vgg_dct": lambda **kw: (
        SSDVGGDCT(**kw),
        _dct_inputs(2, DET_Y, DET_CBCR, False),
    ),
    "ssd300_vgg_dct_image": lambda **kw: (
        SSDVGGDCTImage(**kw),
        _image_inputs(2, (300, 300, 3)),
    ),
}


def build_model(name: str, **kwargs):
    """Instantiate a registered model: returns (flax module, example-inputs fn)."""
    try:
        factory = MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
    return factory(**kwargs)
