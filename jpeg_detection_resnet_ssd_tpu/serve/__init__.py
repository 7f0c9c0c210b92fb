"""Deployment subsystem: inference-graph folding + AOT model export.

The reference's deployment story is "save the Keras H5 and rebuild the graph
in inference mode" (`localisation_part/models/keras_ssd300_dct_j2d_resnet.py:884-896`,
`classification_part/vgg_jpeg_keras/template_exp/.../training.py` save
callbacks).  The TPU-native equivalent built here is stronger:

  * `fold_batch_norm` — eval-mode BatchNorm is an affine map; fold it into
    the preceding conv's kernel/bias (or into a pure per-channel affine for
    input-normalizing BNs) so the serving graph carries no normalization
    arithmetic at all.
  * `export_serving_artifact` / `load_serving_artifact` — AOT-export the
    jitted serving function (weights baked in as constants) to a StableHLO
    artifact via `jax.export`: one self-contained file, loadable and
    runnable WITHOUT the model-building Python code, optionally lowered for
    several platforms (cpu + tpu) and with a symbolic batch dimension.
  * `quantize_for_serving` — post-training int8 trunk quantization
    (per-output-channel weights, max-calibrated per-tensor activations,
    int32 MXU accumulation) swapped in at trace time via flax method
    interception, so it needs no model-code changes and composes with
    folding + export.
"""

from jpeg_detection_resnet_ssd_tpu.serve.folding import (
    bn_fold_pairs,
    fold_batch_norm,
)
from jpeg_detection_resnet_ssd_tpu.serve.export import (
    build_serving_fn,
    export_serving_artifact,
    load_serving_artifact,
)
from jpeg_detection_resnet_ssd_tpu.serve.quantize import (
    calibrate_activation_scales,
    make_quantized_apply,
    quantize_conv_weights,
    quantize_for_serving,
)

__all__ = [
    "bn_fold_pairs",
    "fold_batch_norm",
    "build_serving_fn",
    "export_serving_artifact",
    "load_serving_artifact",
    "calibrate_activation_scales",
    "make_quantized_apply",
    "quantize_conv_weights",
    "quantize_for_serving",
]
