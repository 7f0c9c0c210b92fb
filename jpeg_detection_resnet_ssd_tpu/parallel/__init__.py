from jpeg_detection_resnet_ssd_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
    replicate_sharding,
    tensor_parallel_rule,
)
