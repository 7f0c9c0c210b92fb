"""Serving subsystem: BatchNorm folding exactness + AOT export round-trips.

Folding is verified NUMERICALLY on every zoo family with a distinct BN
topology (bottleneck bn*/res* pairs, the bn_conv1/conv1 RGB stem, pure
input BNs, the deconv stem's post-concat bn_in) under randomized running
statistics — random-init stats (mean=0, var=1) would make folding trivially
exact and prove nothing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util


def _randomize_bn_stats(variables, rng):
    """Non-trivial running stats + BN params so folding has real work."""
    flat_s = dict(traverse_util.flatten_dict(variables["batch_stats"], sep="/"))
    flat_p = dict(traverse_util.flatten_dict(variables["params"], sep="/"))
    for path in list(flat_s):
        base = path.rsplit("/", 1)[0]
        shape = flat_s[path].shape
        if path.endswith("/mean"):
            flat_s[path] = jnp.asarray(rng.normal(0, 1.0, shape), jnp.float32)
        else:
            flat_s[path] = jnp.asarray(rng.uniform(0.5, 2.0, shape), jnp.float32)
        flat_p[f"{base}/scale"] = jnp.asarray(
            rng.uniform(0.5, 1.5, shape), jnp.float32
        )
        flat_p[f"{base}/bias"] = jnp.asarray(
            rng.normal(0, 0.2, shape), jnp.float32
        )
    out = dict(variables)
    out["batch_stats"] = traverse_util.unflatten_dict(flat_s, sep="/")
    out["params"] = traverse_util.unflatten_dict(flat_p, sep="/")
    return out


def _build(name):
    from jpeg_detection_resnet_ssd_tpu.models import build_model

    kw = {"n_classes": 20} if name.startswith("ssd300") else {}
    module, example_inputs = build_model(name, **kw)
    ex = example_inputs()
    ex = ex if isinstance(ex, tuple) else (ex,)
    inputs = tuple(x[:1] for x in ex)  # batch 1 keeps CPU compiles cheap
    model_in = inputs[0] if len(inputs) == 1 else inputs
    variables = module.init(jax.random.PRNGKey(0), model_in, train=False)
    return module, variables, inputs


class TestFolding:
    @pytest.mark.slow
    def test_pairs_discovered_ssd_custom(self):
        from jpeg_detection_resnet_ssd_tpu.serve import bn_fold_pairs

        _, variables, _ = _build("ssd300_ssd_custom")
        pairs, affine_only = bn_fold_pairs(variables)
        assert len(pairs) >= 50  # every bottleneck bn
        for bn, conv in pairs.items():
            assert bn.rsplit("/", 1)[-1].replace("bn", "res", 1) == (
                conv.rsplit("/", 1)[-1]
            )
        # the two raw-DCT input norms have no producing conv
        names = sorted(p.rsplit("/", 1)[-1] for p in affine_only)
        assert names == ["bn_cbcr_in", "bn_y_in"]

    def test_bn_conv1_pair_rgb(self):
        from jpeg_detection_resnet_ssd_tpu.serve import bn_fold_pairs

        _, variables, _ = _build("resnet50_rgb")
        pairs, _ = bn_fold_pairs(variables)
        assert any(
            bn.endswith("bn_conv1") and conv.endswith("conv1")
            for bn, conv in pairs.items()
        )

    @pytest.mark.parametrize(
        "name",
        [
            "ssd300_ssd_custom",   # bottleneck pairs + input BNs
            "resnet50_rgb",        # conv1/bn_conv1 stem
            "resnet50_dct_deconv", # post-concat bn_in (affine-only)
            "vggd_dct",            # input BNs only, no foldable conv
        ],
    )
    def test_fold_preserves_eval_outputs(self, name):
        from jpeg_detection_resnet_ssd_tpu.serve import fold_batch_norm

        module, variables, inputs = _build(name)
        variables = _randomize_bn_stats(variables, np.random.default_rng(7))
        folded = fold_batch_norm(variables)

        ref = jax.jit(
            lambda v: module.apply(v, inputs[0] if len(inputs) == 1 else inputs,
                                   train=False)
        )
        a = np.asarray(ref(variables), np.float64)
        b = np.asarray(ref(folded), np.float64)
        scale = max(np.abs(a).max(), 1.0)
        assert np.max(np.abs(a - b)) / scale < 1e-5

    def test_folded_bns_are_identity(self):
        from jpeg_detection_resnet_ssd_tpu.serve import (
            bn_fold_pairs,
            fold_batch_norm,
        )

        _, variables, _ = _build("resnet50_rgb")
        variables = _randomize_bn_stats(variables, np.random.default_rng(3))
        pairs, _ = bn_fold_pairs(variables)
        folded = fold_batch_norm(variables)
        p = traverse_util.flatten_dict(folded["params"], sep="/")
        s = traverse_util.flatten_dict(folded["batch_stats"], sep="/")
        for bn in pairs:
            np.testing.assert_array_equal(p[f"{bn}/scale"], 1.0)
            np.testing.assert_array_equal(p[f"{bn}/bias"], 0.0)
            np.testing.assert_array_equal(s[f"{bn}/mean"], 0.0)
            # var chosen so var + eps == 1.0 exactly -> rsqrt == 1.0
            v = np.asarray(s[f"{bn}/var"], np.float32)
            np.testing.assert_array_equal(
                v + np.float32(1e-3), np.float32(1.0)
            )


class TestExport:
    def test_roundtrip_matches_direct_call(self, tmp_path):
        from jpeg_detection_resnet_ssd_tpu.serve import (
            export_serving_artifact,
            load_serving_artifact,
        )

        W = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)),
                        jnp.float32)

        def fn(x, y):
            return jnp.tanh(x @ W) + y

        x = np.random.default_rng(1).normal(size=(4, 16)).astype(np.float32)
        y = np.random.default_rng(2).normal(size=(4, 8)).astype(np.float32)
        manifest = export_serving_artifact(fn, (x, y), str(tmp_path))
        assert manifest["bytes"] > 0 and not manifest["symbolic_batch"]
        loaded, m2 = load_serving_artifact(str(tmp_path))
        np.testing.assert_allclose(
            np.asarray(loaded(x, y)), np.asarray(fn(x, y)), rtol=1e-6
        )
        assert m2["inputs"][0]["shape"] == [4, 16]

    def test_symbolic_batch_serves_any_batch(self, tmp_path):
        from jpeg_detection_resnet_ssd_tpu.serve import (
            export_serving_artifact,
            load_serving_artifact,
        )

        def fn(x):
            return jnp.cumsum(x, axis=1) * 2.0

        ex = np.ones((2, 5), np.float32)
        export_serving_artifact(fn, ex, str(tmp_path), symbolic_batch=True)
        loaded, manifest = load_serving_artifact(str(tmp_path))
        assert manifest["symbolic_batch"] and manifest["inputs"][0]["shape"][0] == "b"
        for b in (1, 3, 7):
            x = np.random.default_rng(b).normal(size=(b, 5)).astype(np.float32)
            np.testing.assert_allclose(
                np.asarray(loaded(x)), np.asarray(fn(x)), rtol=1e-6
            )

    @pytest.mark.slow
    def test_detector_artifact_end_to_end(self, tmp_path):
        """Full flagship serving export: forward + folded BN + decode,
        reloaded and compared against the in-process inference path."""
        from jpeg_detection_resnet_ssd_tpu.boxes import AnchorSpec
        from jpeg_detection_resnet_ssd_tpu.models import make_inference_fn
        from jpeg_detection_resnet_ssd_tpu.serve import (
            build_serving_fn,
            export_serving_artifact,
            load_serving_artifact,
        )

        module, variables, inputs = _build("ssd300_ssd_custom")
        variables = _randomize_bn_stats(variables, np.random.default_rng(11))
        decode = make_inference_fn(
            n_classes=20, spec=AnchorSpec(), top_k=20, nms_impl="xla"
        )
        serving = build_serving_fn(module, variables, decode_fn=decode)
        export_serving_artifact(
            serving, inputs, str(tmp_path),
            manifest_extra={"model": "ssd300_ssd_custom", "task": "detection"},
        )
        loaded, manifest = load_serving_artifact(str(tmp_path))
        got = np.asarray(loaded(*inputs))
        want = np.asarray(
            jax.jit(lambda i: decode(module.apply(variables, i, train=False))
                    )(inputs)
        )
        assert got.shape == (1, 20, 6)
        # same function modulo BN folding's float re-association
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


class TestQuantize:
    def test_single_conv_error_bounded(self):
        import flax.linen as nn

        from jpeg_detection_resnet_ssd_tpu.serve import (
            calibrate_activation_scales,
            make_quantized_apply,
            quantize_conv_weights,
        )

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                return nn.Conv(32, (3, 3), name="c")(x)

        m = M()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 16)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        scales = calibrate_activation_scales(m, v, [x])
        assert list(scales) == ["c"]
        qw = quantize_conv_weights(v, scales, skip=())
        fn = make_quantized_apply(m, v, scales, qw)
        got = np.asarray(jax.jit(fn)(x), np.float64)
        want = np.asarray(m.apply(v, x), np.float64)
        rel_rms = np.sqrt(np.mean((got - want) ** 2)) / (
            np.sqrt(np.mean(want**2)) + 1e-12
        )
        assert rel_rms < 0.05, rel_rms
        # and it genuinely differs (int8 ran, not the float path)
        assert np.max(np.abs(got - want)) > 0

    @pytest.mark.slow
    def test_default_skip_keeps_sensitive_layers_float(self):
        from jpeg_detection_resnet_ssd_tpu.serve import quantize_for_serving

        module, variables, inputs = _build("ssd300_ssd_custom")
        fn, info = quantize_for_serving(
            module, variables, [inputs[0] if len(inputs) == 1 else inputs]
        )
        assert len(info["quantized"]) >= 50  # the ResNet trunk
        # box heads stay float: _SSDHead executes its conf/loc pairs as raw
        # fused lax convs that the quantizer never intercepts, so they can
        # appear in neither list
        assert not any("head/" in p for p in info["quantized"])
        assert not any("head/" in p for p in info["kept_float"])
        # fc6 (the _FC6CenterTap rewrite) must still quantize like a conv
        assert any(p.endswith("fc6") for p in info["quantized"])
        # ssd_custom's stem opens with BN (no raw-DCT conv), so no skip
        # pattern fires and kept_float is legitimately empty here; the
        # conv1_1_dct/deconv_cb skip patterns are covered by
        # test_default_skip_patterns_on_paths.
        assert info["kept_float"] == []
        out = np.asarray(jax.jit(fn)(inputs))
        assert np.isfinite(out).all()

    def test_default_skip_patterns_on_paths(self):
        """DEFAULT_SKIP must keep raw-DCT stem convs float by path alone."""
        from jpeg_detection_resnet_ssd_tpu.serve.quantize import (
            DEFAULT_SKIP,
            quantize_conv_weights,
        )

        paths = [
            "conv1_1_dct",        # VGG-DCT 8x8 stem
            "conv1_1_dct_256",    # dual-plane VGG-DCT stem
            "deconv_cb", "deconv_cr",  # deconv stem transposed convs
            "fc6", "fc7", "conv4_1",   # trunk convs: quantize
        ]
        variables = {
            "params": {
                p: {
                    "kernel": np.ones((3, 3, 4, 8), np.float32),
                    "bias": np.zeros((8,), np.float32),
                }
                for p in paths
            }
        }
        q = quantize_conv_weights(variables, paths, skip=DEFAULT_SKIP)
        assert sorted(q) == ["conv4_1", "fc6", "fc7"]

    @pytest.mark.slow
    def test_quantized_artifact_smaller_and_loadable(self, tmp_path):
        from jpeg_detection_resnet_ssd_tpu.serve import (
            export_serving_artifact,
            load_serving_artifact,
            quantize_for_serving,
        )

        module, variables, inputs = _build("ssd300_ssd_custom")
        fn, _ = quantize_for_serving(module, variables, [inputs])
        manifest = export_serving_artifact(fn, inputs, str(tmp_path))
        # int8 trunk kernels bake as int8 constants: well under the ~157MB
        # float artifact for the same model
        assert manifest["bytes"] < 100_000_000
        loaded, _ = load_serving_artifact(str(tmp_path))
        got = np.asarray(loaded(*inputs))
        # compare against the jitted fn (eager op-by-op execution rounds
        # differently through 50 conv layers + softmax)
        want = np.asarray(jax.jit(fn)(*inputs))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
