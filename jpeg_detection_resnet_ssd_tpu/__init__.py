"""TPU-native JPEG/DCT-domain classification & detection framework.

A from-scratch JAX / XLA / Pallas / pjit re-build of the capabilities of the
reference codebase Shulk97/JPEG_detection_Resnet_SSD (Keras 2 / TF-GPU 1.8):
CNNs that consume JPEG DCT coefficients directly (ImageNet classification with
ResNet-50/VGG DCT backbones; Pascal VOC detection with SSD300 heads), plus the
surrounding framework: native JPEG->block-DCT decode, data pipelines with
label-aware augmentation, jit-compiled target encoding / NMS decoding,
data-parallel training over a device mesh, checkpointing, and evaluators.

Subpackages
-----------
boxes     Box geometry, anchor generation, GT target encoding, NMS decode.
models    Flax model zoo: ResNet50 (RGB + DCT stems), VGG (+DCT), SSD300 heads.
ops       TPU compute ops (DCT-domain augmentation, NMS kernels, block DCT).
losses    SSD multibox loss, classification losses/metrics.
data      Datasets (ImageNet dirs, VOC XML, CSV/COCO), augmentation, loaders.
train     Trainer, schedules, checkpointing, experiment management.
parallel  Mesh construction and sharding rules (replaces the reference's Horovod).
eval      Pascal VOC mAP evaluator, top-k accuracy, VOC result writers.
compat    Keras H5 weight import for pretrained-parity.
dctjpeg   Native C++ JPEG -> DCT coefficient decoder (replaces jpeg2dct /
          jpegdecoder git submodules of the reference).
"""

__version__ = "0.1.0"
