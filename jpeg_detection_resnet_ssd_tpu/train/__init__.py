from jpeg_detection_resnet_ssd_tpu.train.schedules import (
    keras_inverse_time_decay,
    warmup_linear_scaling,
)
from jpeg_detection_resnet_ssd_tpu.train.trainer import (
    TrainState,
    Trainer,
    detection_loss_fn,
    classification_loss_fn,
)
from jpeg_detection_resnet_ssd_tpu.train.checkpoints import CheckpointManager
