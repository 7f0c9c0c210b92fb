"""fit() loop: history/CSV/checkpoint/restart + compute-map CLI."""

import json
import os

import numpy as np
import pytest
from flax import linen as nn
from PIL import Image

import jax
import jax.numpy as jnp

from jpeg_detection_resnet_ssd_tpu.data import (
    ClassificationPipeline,
    ImageFolderDataset,
)
from jpeg_detection_resnet_ssd_tpu.models.zoo import MODEL_REGISTRY
from jpeg_detection_resnet_ssd_tpu.train.config import (
    ExperimentConfig,
    create_run_dir,
    find_latest_run,
)
from jpeg_detection_resnet_ssd_tpu.train.loop import NaNLossError, fit


class _TinyNet(nn.Module):
    num_classes: int = 3
    dtype: type = jnp.float32  # accepted so the zoo's dtype plumbing applies

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(
            nn.Conv(8, (3, 3), name="conv", dtype=self.dtype)(jnp.asarray(x))
        )
        x = jnp.mean(x, axis=(1, 2))
        out = nn.Dense(self.num_classes, name="fc", dtype=self.dtype)(x)
        return out.astype(jnp.float32)


def _tiny_factory(**kw):
    module = _TinyNet(**kw)

    def example(rng=None):
        return np.zeros((2, 32, 32, 3), np.float32)

    return module, example


MODEL_REGISTRY.setdefault("tiny_cls_test", _tiny_factory)


@pytest.fixture
def cls_root(tmp_path):
    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    for c in ["a", "b", "c"]:
        (root / c).mkdir(parents=True)
        for j in range(4):
            arr = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / c / f"{j}.jpeg")
    return str(root)


def make_config(tmp_path):
    return ExperimentConfig(
        model="tiny_cls_test",
        model_kwargs={"num_classes": 3},
        task="classification",
        input_format="rgb",
        learning_rate=0.01,
        l2_regularization=0.0,
        batch_size=8,
        epochs=2,
        steps_per_epoch=2,
        output_dir=str(tmp_path / "exp"),
        num_workers=2,
    )


def test_fit_history_csv_checkpoint_restart(cls_root, tmp_path):
    config = make_config(tmp_path)
    ds = ImageFolderDataset(cls_root)

    class Repeat:
        """Loop the pipeline forever (role of the reference's infinite
        generators)."""

        def __init__(self, make):
            self.make = make

        def __iter__(self):
            while True:
                yield from self.make()

    def pipeline():
        return ClassificationPipeline(
            ds, config.batch_size, train=True, input_format="rgb",
            image_size=32, num_workers=2,
        )

    run_dir = create_run_dir(config)
    assert os.path.exists(os.path.join(run_dir, "saved_config.json"))
    state, history = fit(config, Repeat(pipeline), run_dir=run_dir)
    assert len(history) == 2
    assert int(state.step) == 4
    csv_path = os.path.join(run_dir, "results", "results.csv")
    assert os.path.exists(csv_path)

    # restart: resumes from the saved checkpoint step
    config.restart = True
    config.epochs = 3
    state2, history2 = fit(config, Repeat(pipeline), run_dir=run_dir)
    assert int(state2.step) == 6  # 2 existing epochs + 1 new
    assert len(history2) == 1

    found = find_latest_run(config)
    assert found == run_dir


def test_fit_nan_guard(tmp_path):
    config = make_config(tmp_path)
    config.epochs = 3
    config.steps_per_epoch = 3

    def nan_pipeline():
        while True:
            yield {
                "inputs": np.full((8, 32, 32, 3), np.nan, np.float32),
                "labels": np.zeros(8, np.int32),
            }

    with pytest.raises(NaNLossError):
        fit(config, nan_pipeline(), run_dir=None, log_every=1)


def test_compute_map_cli(tmp_path):
    from jpeg_detection_resnet_ssd_tpu.cli.main import main
    from jpeg_detection_resnet_ssd_tpu.eval import write_voc_detection_files

    # mini VOC GT
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "Annotations" / "000001.xml").write_text(
        "<annotation><object><name>dog</name><difficult>0</difficult>"
        "<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>60</xmax>"
        "<ymax>60</ymax></bndbox></object></annotation>"
    )
    (root / "ImageSets" / "Main" / "test.txt").write_text("000001\n")
    preds = [[] for _ in range(21)]
    preds[12].append(("000001", 0.95, 10.0, 10.0, 60.0, 60.0))  # dog exact
    pred_dir = tmp_path / "preds"
    write_voc_detection_files(preds, str(pred_dir))

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main([
            "compute-map", "--pred-dir", str(pred_dir),
            "--voc-root", str(root), "--image-set", "test.txt",
            "--ap-mode", "sample",
        ])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["AP"][11] == pytest.approx(1.0)  # dog is class 12 -> index 11
    assert out["mAP"] == pytest.approx(1.0 / 20.0)


def test_device_augment_flag_guards():
    """--device-augment on a non-dct input format and --pack-cache without
    --device-augment fail loud instead of silently training a different
    recipe (ADVICE.md round 2)."""
    from types import SimpleNamespace

    from jpeg_detection_resnet_ssd_tpu.cli.main import (
        _check_device_augment_flags,
    )

    cfg_rgb = SimpleNamespace(input_format="rgb")
    cfg_dct = SimpleNamespace(input_format="dct")
    with pytest.raises(SystemExit, match="device-augment requires"):
        _check_device_augment_flags(
            SimpleNamespace(device_augment=True, pack_cache=None,
                            archi="rgb"),
            cfg_rgb,
        )
    with pytest.raises(SystemExit, match="pack-cache only"):
        _check_device_augment_flags(
            SimpleNamespace(device_augment=False, pack_cache="/tmp/x",
                            archi=None),
            cfg_dct,
        )
    # valid combination passes silently
    _check_device_augment_flags(
        SimpleNamespace(device_augment=True, pack_cache="/tmp/x",
                        archi=None),
        cfg_dct,
    )


def test_bf16_compute_dtype_plumbs(tmp_path):
    """config.compute_dtype='bfloat16' reaches the model's compute dtype."""
    import jax.numpy as jnp

    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer

    config = make_config(tmp_path)
    config.model = "vgga_dct"
    config.model_kwargs = {"num_classes": 3}
    config.input_format = "dct"
    config.compute_dtype = "bfloat16"
    trainer, module, example = build_trainer(config)
    assert module.dtype == jnp.bfloat16


def test_pallas_wgrad_config_plumbs(tmp_path):
    """config.pallas_wgrad=True flips the trace-time conv routing switch
    (and survives the JSON snapshot round-trip)."""
    from jpeg_detection_resnet_ssd_tpu.models import layers
    from jpeg_detection_resnet_ssd_tpu.train.config import ExperimentConfig
    from jpeg_detection_resnet_ssd_tpu.train.loop import build_trainer

    config = make_config(tmp_path)
    config.model = "vgga_dct"
    config.model_kwargs = {"num_classes": 3}
    config.input_format = "dct"
    config.pallas_wgrad = True
    assert ExperimentConfig.from_json(config.to_json()).pallas_wgrad is True

    assert not layers.pallas_wgrad_enabled()
    try:
        build_trainer(config)
        assert layers.pallas_wgrad_enabled()
    finally:
        layers.set_pallas_wgrad(False)


def test_validation_fn_and_lr_logging(cls_root, tmp_path):
    from jpeg_detection_resnet_ssd_tpu.train.loop import (
        build_trainer,
        make_validation_fn,
    )

    config = make_config(tmp_path)
    config.lr_decay = 1e-2
    ds = ImageFolderDataset(cls_root)

    def train_stream():
        while True:
            p = ClassificationPipeline(
                ds, config.batch_size, train=True, input_format="rgb",
                image_size=32, num_workers=2,
            )
            yield from p

    val_pipe = ClassificationPipeline(
        ds, config.batch_size, train=False, input_format="rgb",
        image_size=32, num_workers=2, drop_remainder=True,
    )
    trainer, module, example = build_trainer(config)
    val_fn = make_validation_fn(trainer, val_pipe)
    run_dir = create_run_dir(config)
    state, history = fit(config, train_stream(), val_fn=val_fn,
                         run_dir=run_dir, mesh=trainer.mesh)
    assert "val_loss" in history[-1] and np.isfinite(history[-1]["val_loss"])
    assert "val_top1" in history[-1]
    # lr column present and decayed from the base lr
    assert 0 < history[-1]["lr"] < config.learning_rate


def test_cli_restart_resumes_latest_run_dir(tmp_path):
    """CLI `--restart` must reuse the most recent run dir of the same
    workspace/project (reference `training.py:74-103`) — a fresh dir would
    silently train from scratch with empty checkpoints/."""
    from jpeg_detection_resnet_ssd_tpu.cli.main import (
        _resume_or_create_run_dir,
    )

    config = make_config(tmp_path)
    config.restart = False
    first = _resume_or_create_run_dir(config)
    assert os.path.isdir(os.path.join(first, "checkpoints"))

    config.restart = True
    resumed = _resume_or_create_run_dir(config)
    assert resumed == first

    # no prior run for a different project -> falls back to a new dir
    config.project = config.project + "_other"
    fresh = _resume_or_create_run_dir(config)
    assert fresh != first and os.path.isdir(fresh)
