"""Command-line entry points (role of the reference's top-level scripts).

  train-classify   `classification_part/training.py`
  train-detect     `localisation_part/training_dct_pascal_j2d[_resnet].py`
  evaluate         `classification_part/evaluate.py` + `localisation_part/evaluation.py`
  infer            `localisation_part/inference.py`
  bench            `classification_part/inference_time.py` (+ throughput)
  compute-map      `localisation_part/compute_map.py`

All are subcommands of `python -m jpeg_detection_resnet_ssd_tpu.cli`.
"""
