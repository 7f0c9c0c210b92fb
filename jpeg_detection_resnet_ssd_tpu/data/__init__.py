from jpeg_detection_resnet_ssd_tpu.data.datasets import (
    ImageFolderDataset,
    DetectionDataset,
    parse_voc_xml,
    parse_detection_csv,
    parse_coco_json,
    VOC_CLASSES,
)
from jpeg_detection_resnet_ssd_tpu.data.dct_convert import (
    rgb_to_dct_tensors,
    rgb_to_dct_image,
    split_cbcr,
)
from jpeg_detection_resnet_ssd_tpu.data.pipeline import (
    ClassificationPipeline,
    DetectionPipeline,
    prefetch_to_device,
)
from jpeg_detection_resnet_ssd_tpu.data.packed import (
    PackedDctDataset,
    PackedDctPipeline,
)
