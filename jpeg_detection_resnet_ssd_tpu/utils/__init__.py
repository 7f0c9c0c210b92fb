from jpeg_detection_resnet_ssd_tpu.utils.profiling import (
    profile_trace,
    StepTimer,
)
from jpeg_detection_resnet_ssd_tpu.utils.distributed import (
    maybe_initialize_distributed,
    is_primary_process,
)
