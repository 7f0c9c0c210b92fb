from jpeg_detection_resnet_ssd_tpu.compat.h5_import import (
    load_keras_h5_weights,
    import_weights_by_name,
    list_h5_layers,
)
from jpeg_detection_resnet_ssd_tpu.compat.surgery import sample_tensors
from jpeg_detection_resnet_ssd_tpu.compat.h5_export import export_keras_h5
from jpeg_detection_resnet_ssd_tpu.compat.fetch import (
    ChecksumError,
    fetch_known_weights,
    fetch_weights,
    file_checksum,
    verify_checksum,
)
