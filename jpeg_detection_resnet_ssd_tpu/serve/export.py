"""AOT serving-artifact export/load via `jax.export` (StableHLO).

The exported artifact is one self-contained blob: the jitted serving
function — model forward (+ detection decode for SSD models) with the
weights baked in as constants — serialized as versioned StableHLO.  Loading
requires only jax (`export.deserialize(...).call`), not this package's
model-building code, so it is the deployment hand-off format (the TPU-native
counterpart of the reference shipping `.h5` files plus the graph-building
Python, e.g. `localisation_part/models/keras_ssd300_dct_j2d_resnet.py`).

Artifacts can be lowered for several platforms at once (`platforms=
('cpu', 'tpu')`) and with a symbolic batch dimension; a JSON manifest sits
next to the blob recording the input contract and decode parameters.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Sequence

import jax
import numpy as np

from jpeg_detection_resnet_ssd_tpu.serve.folding import fold_batch_norm

ARTIFACT_NAME = "model.stablehlo"
MANIFEST_NAME = "manifest.json"


def build_serving_fn(
    module,
    variables,
    decode_fn: Callable | None = None,
    fold_bn: bool = True,
) -> Callable:
    """Eval-mode forward (+ optional decode) with weights closed over.

    Returns `fn(*input_arrays)`; closing over the (optionally BN-folded)
    variables makes them compile-time constants, which `jax.export` bakes
    into the artifact and XLA constant-folds around.
    """
    if fold_bn and "batch_stats" in variables:
        variables = fold_batch_norm(variables)

    def fn(*inputs):
        args = inputs[0] if len(inputs) == 1 else inputs
        out = module.apply(variables, args, train=False)
        return decode_fn(out) if decode_fn is not None else out

    return fn


def _as_input_tuple(example_inputs) -> tuple:
    if isinstance(example_inputs, (tuple, list)):
        return tuple(example_inputs)
    return (example_inputs,)


def export_serving_artifact(
    serving_fn: Callable,
    example_inputs,
    out_dir: str,
    platforms: Sequence[str] | None = None,
    symbolic_batch: bool = False,
    manifest_extra: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """AOT-export `serving_fn` and write `model.stablehlo` + `manifest.json`.

    `example_inputs` (array or tuple of arrays) fixes shapes/dtypes; with
    `symbolic_batch=True` the leading dimension of every input is exported
    as one shared symbolic size, so a single artifact serves any batch.
    Returns the manifest dict.
    """
    from jax import export as jexport

    inputs = _as_input_tuple(example_inputs)
    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        specs = tuple(
            jax.ShapeDtypeStruct((b,) + np.shape(x)[1:], np.asarray(x).dtype)
            for x in inputs
        )
    else:
        specs = tuple(
            jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
            for x in inputs
        )

    kwargs = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)
    exported = jexport.export(jax.jit(serving_fn), **kwargs)(*specs)
    blob = exported.serialize()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_NAME), "wb") as f:
        f.write(blob)
    manifest = {
        "format": "jax.export/stablehlo",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "inputs": [
            {
                "shape": ["b" if symbolic_batch else int(np.shape(x)[0])]
                + [int(d) for d in np.shape(x)[1:]],
                "dtype": str(np.asarray(x).dtype),
            }
            for x in inputs
        ],
        "symbolic_batch": bool(symbolic_batch),
        "artifact": ARTIFACT_NAME,
        "bytes": len(blob),
        **(manifest_extra or {}),
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_serving_artifact(path: str) -> tuple[Callable, dict[str, Any]]:
    """Load an exported artifact directory -> (callable, manifest).

    The callable takes the input arrays positionally (see
    `manifest['inputs']`) and needs no model-building code.
    """
    from jax import export as jexport

    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    with open(os.path.join(path, manifest["artifact"]), "rb") as f:
        blob = f.read()
    exported = jexport.deserialize(blob)

    def fn(*inputs):
        return exported.call(*inputs)

    return fn, manifest
