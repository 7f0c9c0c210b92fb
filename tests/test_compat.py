"""H5 weight import (by-name semantics) + tensor-sampling surgery."""

import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax

from jpeg_detection_resnet_ssd_tpu.compat import (
    import_weights_by_name,
    list_h5_layers,
    sample_tensors,
)
from jpeg_detection_resnet_ssd_tpu.models import build_model


def write_keras_h5(path, layers):
    """Write a Keras-layout weights H5: {layer: {weight_name: array}}."""
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        g.attrs["layer_names"] = np.array(
            [n.encode() for n in layers], dtype="S64"
        )
        for lname, weights in layers.items():
            grp = g.create_group(lname)
            wnames = [f"{lname}/{w}:0" for w in weights]
            grp.attrs["weight_names"] = np.array(
                [w.encode() for w in wnames], dtype="S128"
            )
            for wn, (short, arr) in zip(wnames, weights.items()):
                grp.create_dataset(wn, data=arr)
    return path


@pytest.mark.slow
def test_import_by_name_resnet(tmp_path):
    module, example = build_model("resnet50_rgb", num_classes=10)
    variables = module.init(jax.random.PRNGKey(0), example(), train=False)

    conv1 = np.random.default_rng(0).normal(0, 1, (7, 7, 3, 64)).astype("f4")
    bn_gamma = np.full(64, 2.5, "f4")
    bn_mean = np.full(64, 0.3, "f4")
    h5 = write_keras_h5(
        str(tmp_path / "w.h5"),
        {
            "conv1": {"kernel": conv1, "bias": np.ones(64, "f4")},
            "bn_conv1": {
                "gamma": bn_gamma,
                "beta": np.zeros(64, "f4"),
                "moving_mean": bn_mean,
                "moving_variance": np.ones(64, "f4"),
            },
            "unknown_layer": {"kernel": np.ones((3, 3, 4, 4), "f4")},
            "fc1000": {"kernel": np.ones((2048, 1000), "f4"),
                       "bias": np.zeros(1000, "f4")},  # 10-class model: mismatch
        },
    )
    new_vars, report = import_weights_by_name(variables, h5)
    assert "conv1" in report["loaded"] and "bn_conv1" in report["loaded"]
    assert "unknown_layer" in report["skipped"]
    assert "fc1000" in report["mismatched"]  # shape mismatch -> untouched
    np.testing.assert_allclose(new_vars["params"]["conv1"]["kernel"], conv1)
    np.testing.assert_allclose(new_vars["params"]["bn_conv1"]["scale"], bn_gamma)
    np.testing.assert_allclose(
        new_vars["batch_stats"]["bn_conv1"]["mean"], bn_mean
    )
    # forward still works with imported weights
    out = module.apply(new_vars, example()[0:1][0] if False else example(),
                       train=False)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_import_nested_head_scope(tmp_path):
    module, example = build_model("ssd300_ssd_custom", n_classes=20)
    variables = module.init(jax.random.PRNGKey(0), example(), train=False)
    k = np.random.default_rng(1).normal(
        0, 1, variables["params"]["head"]["conv4_3_norm_mbox_loc"]["kernel"].shape
    ).astype("f4")
    gamma = np.full(384, 23.0, "f4")
    h5 = write_keras_h5(
        str(tmp_path / "w.h5"),
        {
            "conv4_3_norm_mbox_loc": {
                "kernel": k,
                "bias": np.zeros(k.shape[-1], "f4"),
            },
            "conv4_3_norm": {"conv4_3_norm_gamma": gamma},
        },
    )
    new_vars, report = import_weights_by_name(variables, h5)
    assert set(report["loaded"]) == {"conv4_3_norm_mbox_loc", "conv4_3_norm"}
    np.testing.assert_allclose(
        new_vars["params"]["head"]["conv4_3_norm_mbox_loc"]["kernel"], k
    )
    np.testing.assert_allclose(
        new_vars["params"]["conv4_3_norm"]["gamma"], gamma
    )


def test_list_h5_layers(tmp_path):
    h5 = write_keras_h5(
        str(tmp_path / "w.h5"),
        {"conv1": {"kernel": np.ones((3, 3, 3, 8), "f4")}},
    )
    layers = list_h5_layers(h5)
    assert layers["conv1"][0][1] == (3, 3, 3, 8)


class TestSurgery:
    def test_downsample(self):
        w = np.arange(24, dtype="f4").reshape(2, 3, 4)
        (out,), idx = sample_tensors([w], [2, 3, 2], axes=[2])
        assert out.shape == (2, 3, 2)
        assert idx[2] is not None and len(idx[2]) == 2

    def test_upsample(self):
        w = np.ones((3, 4), "f4")
        (out,), _ = sample_tensors([w], [3, 6], axes=[1])
        assert out.shape == (3, 6)
        np.testing.assert_allclose(out[:, :4], 1.0)

    def test_listed_indices(self):
        k = np.arange(12, dtype="f4").reshape(3, 4)
        (k2,), idx = sample_tensors([k], [3, [0, 2]], axes=[1])
        np.testing.assert_allclose(k2, k[:, [0, 2]])
        # bias sampled with the same explicit indices
        b = np.arange(4, dtype="f4")
        (b2,), _ = sample_tensors([b], [[0, 2]], axes=[0])
        np.testing.assert_allclose(b2, [0, 2])


@pytest.mark.slow
def test_h5_export_import_roundtrip(tmp_path):
    """Export our params to Keras layout, reimport into a fresh init, and
    check the forward pass is bit-identical."""
    from jpeg_detection_resnet_ssd_tpu.compat import (
        export_keras_h5,
        import_weights_by_name,
    )

    module, example = build_model("resnet50_dct_cb5_only", num_classes=7)
    inputs = example()
    v1 = module.init(jax.random.PRNGKey(1), inputs, train=False)
    path = str(tmp_path / "export.h5")
    exported = export_keras_h5(v1, path)
    assert "res1a2_branch2a" in exported
    assert "fc1000" in exported

    v2 = module.init(jax.random.PRNGKey(2), inputs, train=False)
    out_before = np.asarray(module.apply(v2, inputs, train=False))
    v2_loaded, report = import_weights_by_name(v2, path)
    assert not report["mismatched"]
    out_loaded = np.asarray(module.apply(v2_loaded, inputs, train=False))
    out_ref = np.asarray(module.apply(v1, inputs, train=False))
    assert not np.allclose(out_before, out_ref)  # different inits differ
    np.testing.assert_allclose(out_loaded, out_ref, atol=1e-6)


@pytest.mark.slow
def test_classification_to_detection_transfer(tmp_path):
    """The reference's transfer story (`training_dct_pascal_j2d_resnet.py:
    137-149`): classification-trained stem weights load by name into the
    detection model (conv kernels are input-size-agnostic)."""
    from jpeg_detection_resnet_ssd_tpu.compat import (
        export_keras_h5,
        import_weights_by_name,
    )

    cls_module, cls_example = build_model("resnet50_dct_cb5_only",
                                          num_classes=9)
    cls_vars = cls_module.init(jax.random.PRNGKey(3), cls_example(),
                               train=False)
    h5 = str(tmp_path / "cls.h5")
    export_keras_h5(cls_vars, h5)

    det_module, det_example = build_model("ssd300_cb5_only", n_classes=20)
    det_vars = det_module.init(jax.random.PRNGKey(4), det_example(),
                               train=False)
    new_vars, report = import_weights_by_name(det_vars, h5)
    # backbone blocks transfer; the classifier head (fc1000) does not
    assert "res1a2_branch2a" in report["loaded"]
    assert "res5a_branch2a" in report["loaded"]
    assert "fc1000" in report["skipped"]
    np.testing.assert_allclose(
        np.asarray(new_vars["params"]["stem"]["res1a2_branch2a"]["kernel"]),
        np.asarray(cls_vars["params"]["stem"]["res1a2_branch2a"]["kernel"]),
    )
    out = det_module.apply(new_vars, det_example(), train=False)
    assert np.isfinite(np.asarray(out)).all()


class TestWeightFetch:
    """Offline tests of the checksum-verified fetch (`compat/fetch.py`, the
    role of `keras_utils.get_file` + md5 in `resnet_dct.py:295-308`)."""

    def _make_source(self, tmp_path, data=b"weights-bytes-v1"):
        import hashlib

        src = tmp_path / "src" / "model.h5"
        src.parent.mkdir()
        src.write_bytes(data)
        return str(src), hashlib.md5(data).hexdigest()

    def test_fetch_verify_and_cache(self, tmp_path):
        from jpeg_detection_resnet_ssd_tpu.compat import fetch_weights

        src, md5 = self._make_source(tmp_path)
        cache = str(tmp_path / "cache")
        p1 = fetch_weights(src, checksum=md5, cache_dir=cache)
        assert p1 == os.path.join(cache, "model.h5")
        assert open(p1, "rb").read() == b"weights-bytes-v1"
        # second call hits the cache (delete the source to prove it)
        os.remove(src)
        p2 = fetch_weights(src, checksum=md5, cache_dir=cache)
        assert p2 == p1

    def test_checksum_mismatch_raises(self, tmp_path):
        from jpeg_detection_resnet_ssd_tpu.compat import (
            ChecksumError,
            fetch_weights,
        )

        src, _ = self._make_source(tmp_path)
        with pytest.raises(ChecksumError, match="md5 mismatch"):
            fetch_weights(src, checksum="0" * 32,
                          cache_dir=str(tmp_path / "cache"))
        # failed fetch leaves no partial or final file behind
        assert os.listdir(tmp_path / "cache") == []

    def test_corrupted_cache_refetched(self, tmp_path):
        from jpeg_detection_resnet_ssd_tpu.compat import fetch_weights

        src, md5 = self._make_source(tmp_path)
        cache = tmp_path / "cache"
        cache.mkdir()
        (cache / "model.h5").write_bytes(b"corrupted")
        p = fetch_weights(src, checksum="md5:" + md5, cache_dir=str(cache))
        assert open(p, "rb").read() == b"weights-bytes-v1"

    def test_sha256_and_file_url(self, tmp_path):
        import hashlib

        from jpeg_detection_resnet_ssd_tpu.compat import fetch_weights

        src, _ = self._make_source(tmp_path)
        sha = hashlib.sha256(b"weights-bytes-v1").hexdigest()
        p = fetch_weights("file://" + src, checksum="sha256:" + sha,
                          cache_dir=str(tmp_path / "cache"))
        assert os.path.exists(p)

    def test_known_weights_registry(self, tmp_path):
        from jpeg_detection_resnet_ssd_tpu.compat.fetch import (
            KNOWN_WEIGHTS,
            fetch_known_weights,
        )

        # the reference's two md5s are registered verbatim
        assert (KNOWN_WEIGHTS["resnet50_tf_kernels"]["checksum"]
                == "md5:a7b3fe01876f51b976af0dea6bc144eb")
        with pytest.raises(KeyError, match="unknown weights"):
            fetch_known_weights("nope")
