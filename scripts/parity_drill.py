#!/usr/bin/env python
"""End-to-end drill of the real-data parity mechanics on FABRICATED data.

PARITY_PLAYBOOK.md documents the commands to run when real VOC/ImageNet data
and reference weights appear.  This script executes every mechanical link of
that chain today, offline, so the day real data lands nothing is untested
except the data itself (round-2 verdict item #7):

  1. fabricate a REFERENCE-FORMAT Keras H5 (the reference's exact layer
     names, via `compat.export_keras_h5`) from a seeded flagship model;
  2. `scripts/parity_check.py` loads that H5 by name and fingerprints the
     forward pass on a real JPEG (the playbook's step-1 command);
  3. the H5 is imported into a fresh model, saved as an orbax run dir
     (saved_config.json + checkpoint) — the transfer path of
     `--pretrained-weights`;
  4. the `evaluate` CLI runs the full mAP protocol over a small VOC-format
     dataset against that run dir and writes VOC prediction files;
  5. `compute-map` re-scores the written files offline and must agree with
     the evaluate CLI's mAP.

Usage:
  python scripts/parity_drill.py [--voc-root /tmp/mini_voc] [--platform cpu]

Prints one JSON line per stage and a final summary; exits nonzero on any
broken link.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mini_voc(root, n=5, size=(375, 500)):
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/JPEGImages", exist_ok=True)
    os.makedirs(f"{root}/Annotations", exist_ok=True)
    os.makedirs(f"{root}/ImageSets/Main", exist_ok=True)
    ids = []
    for i in range(n):
        iid = f"{i:06d}"
        ids.append(iid)
        arr = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(f"{root}/JPEGImages/{iid}.jpg", "jpeg")
        with open(f"{root}/Annotations/{iid}.xml", "w") as f:
            f.write(
                "<annotation><size><width>500</width><height>375</height>"
                "<depth>3</depth></size><object><name>dog</name>"
                "<difficult>0</difficult><bndbox><xmin>40</xmin>"
                "<ymin>60</ymin><xmax>260</xmax><ymax>300</ymax></bndbox>"
                "</object></annotation>"
            )
    with open(f"{root}/ImageSets/Main/test.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--voc-root", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np

    from jpeg_detection_resnet_ssd_tpu.compat import (
        export_keras_h5,
        import_weights_by_name,
        list_h5_layers,
    )
    from jpeg_detection_resnet_ssd_tpu.models import build_model
    from jpeg_detection_resnet_ssd_tpu.train.checkpoints import (
        CheckpointManager,
    )
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer

    work = args.workdir or tempfile.mkdtemp(prefix="parity_drill_")
    os.makedirs(work, exist_ok=True)
    voc = args.voc_root or _mini_voc(os.path.join(work, "voc"))

    # -- 1: fabricate a reference-format H5 from a seeded flagship model
    module, example = build_model("ssd300_ssd_custom", n_classes=20)
    src_vars = module.init(jax.random.PRNGKey(42), example(), train=False)
    h5_path = os.path.join(work, "reference_format.h5")
    export_keras_h5(src_vars, h5_path)
    layers = list_h5_layers(h5_path)
    # the reference's signature layer names must be present byte-for-byte
    for must in ("conv4_3_norm", "fc7"):
        assert any(must in l for l in layers), (must, layers[:10])
    print(json.dumps({"stage": "export_h5", "n_layers": len(layers)}),
          flush=True)

    # -- 2: the playbook's parity_check command on a real JPEG
    image = os.path.join(voc, "JPEGImages", "000000.jpg")
    cmd = [
        sys.executable, "scripts/parity_check.py",
        "--model", "ssd300_ssd_custom", "--weights", h5_path,
        "--image", image, "--decode",
    ]
    if args.platform:
        cmd += ["--platform", args.platform]
    res = subprocess.run(cmd, capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(res.stdout[res.stdout.index("{"):])
    assert report["loaded"] > 50, report
    assert report["mismatched"] == [], report["mismatched"]
    print(json.dumps({"stage": "parity_check", "n_loaded": report["loaded"],
                      "output_mean": report.get("output_mean")}), flush=True)

    # -- 3: H5 -> orbax run dir (the --pretrained-weights transfer path)
    config = ExperimentConfig(
        model="ssd300_ssd_custom", model_kwargs={"n_classes": 20},
        task="detection", input_format="dct", batch_size=4,
        output_dir=work, project="parity_drill",
        # bit-parity work runs f32 (the repo's training default is bf16)
        compute_dtype="float32",
    )
    trainer, module2, example2 = build_trainer(config)
    with trainer.mesh:
        state = trainer.init_state(jax.random.PRNGKey(0), example2())
        fresh_vars = {"params": state.params,
                      "batch_stats": state.batch_stats}
        imported, rep = import_weights_by_name(fresh_vars, h5_path)
        assert rep["mismatched"] == [] and len(rep["loaded"]) > 50, rep
        state = state.replace(params=imported["params"],
                              batch_stats=imported["batch_stats"])
        run_dir = os.path.join(work, "run")
        os.makedirs(os.path.join(run_dir, "checkpoints"), exist_ok=True)
        with open(os.path.join(run_dir, "saved_config.json"), "w") as f:
            f.write(config.to_json())
        CheckpointManager(os.path.join(run_dir, "checkpoints")).save(
            0, state
        )
    # imported forward must equal the source model's forward (same weights)
    out_src = np.asarray(module.apply(src_vars, example(), train=False))
    out_imp = np.asarray(module2.apply(imported, example2(), train=False))
    np.testing.assert_allclose(out_src, out_imp, atol=2e-5)
    print(json.dumps({"stage": "run_dir", "path": run_dir}), flush=True)

    # -- 4: evaluate CLI (full mAP protocol) against the run dir
    pred_dir = os.path.join(work, "preds")
    env = dict(os.environ)
    if args.platform:
        env["JPEG_DCT_PLATFORM"] = args.platform
    res = subprocess.run(
        [sys.executable, "-m", "jpeg_detection_resnet_ssd_tpu.cli",
         "evaluate", "--run-dir", run_dir, "--voc-root", voc,
         "--image-set", "test.txt", "--batch-size", "5",
         "--ap-mode", "sample", "--out-dir", pred_dir],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    ev = json.loads(res.stdout.strip().splitlines()[-1])
    print(json.dumps({"stage": "evaluate", "mAP": ev["mAP"]}), flush=True)

    # -- 5: compute-map on the written files agrees with the evaluate CLI
    res = subprocess.run(
        [sys.executable, "-m", "jpeg_detection_resnet_ssd_tpu.cli",
         "compute-map", "--pred-dir", pred_dir, "--voc-root", voc,
         "--image-set", "test.txt", "--ap-mode", "sample"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    cm = json.loads(res.stdout.strip().splitlines()[-1])
    delta = abs(cm["mAP"] - ev["mAP"])
    assert delta < 0.02, (cm["mAP"], ev["mAP"])
    print(json.dumps({
        "stage": "summary", "ok": True, "workdir": work,
        "evaluate_mAP": ev["mAP"], "compute_map_mAP": cm["mAP"],
        "note": "random-init weights: mAP value is meaningless; the drill "
                "validates the MECHANICS (H5 export/import by reference "
                "layer names, checkpointed run dir, evaluate CLI, VOC "
                "files, offline re-scoring agreement)",
    }))


if __name__ == "__main__":
    main()
