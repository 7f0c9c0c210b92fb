"""Flax model zoo: ResNet-50 (RGB + DCT stems), VGG (+DCT), SSD300 heads.

TPU-first re-design of the reference's Keras model files
(`classification_part/vgg_jpeg_keras/networks/`, `localisation_part/models/`):
the reference's 10 copy-edited SSD model files and 7 stem variants collapse
into parametrized flax modules.  Parameter names mirror the reference's Keras
layer names so H5 weight import (compat/) can map by name.
"""

from jpeg_detection_resnet_ssd_tpu.models.layers import L2Normalization
from jpeg_detection_resnet_ssd_tpu.models.resnet import (
    ResNet50RGB,
    ResNet50DCT,
    CLASSIFICATION_ARCHIS,
)
from jpeg_detection_resnet_ssd_tpu.models.vgg import (
    VGG,
    VGGDCT,
    VGGDCT8x8,
)
from jpeg_detection_resnet_ssd_tpu.models.ssd import (
    SSDResNetCustom,
    SSDResNetIdentical,
    SSDVGG,
    SSDVGGDCT,
    SSDVGGDCTImage,
    DETECTION_ARCHIS,
    make_inference_fn,
    ssd_predictor_sizes,
)
from jpeg_detection_resnet_ssd_tpu.models.zoo import build_model, MODEL_REGISTRY
