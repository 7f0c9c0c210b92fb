from jpeg_detection_resnet_ssd_tpu.losses.ssd_loss import SSDLoss
from jpeg_detection_resnet_ssd_tpu.losses.classification import (
    softmax_cross_entropy,
    top_k_accuracy,
    l2_regularization_loss,
)
