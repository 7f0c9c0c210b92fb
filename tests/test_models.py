"""Model zoo: init + forward shape contracts for every architecture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpeg_detection_resnet_ssd_tpu.models import build_model, MODEL_REGISTRY

N_BOXES = {
    # family -> total anchors (sum over predictor grids x boxes/cell)
    "resnet_custom": 8732,   # 38^2*4 + 19^2*6 + 10^2*6 + 5^2*6 + 3^2*4 + 4
    "resnet_identical": 6716,  # 38^2*4 + 10^2*6 + 5^2*6 + 5^2*6 + 3^2*4 + 4
    "vgg": 8732,
}

CLS_MODELS = [
    "resnet50_rgb",
    "resnet50_dct_deconv",
    "resnet50_dct_up_sampling",
    "resnet50_dct_up_sampling_rfa",
    "resnet50_dct_late_concat_rfa_thinner",
    "resnet50_dct_late_concat_more_channels",
    "resnet50_dct_cb5_only",
    "resnet50_dct_y_cb4_cbcr_cb5",
    "vgga",
    "vggd",
    "vgga_dct",
    "vggd_dct",
    "vgga_dct_8x8",
    "vggd_dct_8x8",
]

DET_MODELS = {
    "ssd300_ssd_custom": 8732,
    "ssd300_deconv": 6716,
    "ssd300_up_sampling": 6716,
    "ssd300_cb5_only": 6716,
    "ssd300_y_cb4_cbcr_cb5": 6716,
    "ssd300_vgg": 8732,
    "ssd300_vgg_dct": 8732,
    "ssd300_vgg_dct_image": 8732,
}


def _init_and_apply(name, n_classes_kw=None):
    kwargs = {} if n_classes_kw is None else n_classes_kw
    module, example = build_model(name, **kwargs)
    inputs = example()
    variables = module.init(jax.random.PRNGKey(0), inputs, train=False)
    out = module.apply(variables, inputs, train=False)
    return module, variables, out


@pytest.mark.parametrize("name", CLS_MODELS)
def test_classifier_forward(name):
    _, variables, out = _init_and_apply(name, {"num_classes": 10})
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", sorted(DET_MODELS))
def test_detector_forward(name):
    _, variables, out = _init_and_apply(name, {"n_classes": 20})
    n_boxes = DET_MODELS[name]
    assert out.shape == (2, n_boxes, 21 + 12)
    out = np.asarray(out)
    # conf block is softmaxed
    np.testing.assert_allclose(out[..., :21].sum(-1), 1.0, atol=1e-4)
    # variances block is constant (0.1, 0.1, 0.2, 0.2)
    np.testing.assert_allclose(
        out[..., -4:], np.broadcast_to([0.1, 0.1, 0.2, 0.2], out[..., -4:].shape),
        atol=1e-6,
    )
    # anchor w/h positive
    assert (out[..., -6:-4] > 0).all()


def test_registry_complete():
    # every reference architecture is present (SURVEY.md §2.3/§2.4)
    for required in CLS_MODELS + sorted(DET_MODELS):
        assert required in MODEL_REGISTRY


def test_batchnorm_mutable_train_step():
    module, example = build_model("resnet50_dct_late_concat_rfa_thinner",
                                  num_classes=10)
    inputs = example()
    variables = module.init(jax.random.PRNGKey(0), inputs, train=False)
    out, mutated = module.apply(
        variables, inputs, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.shape == (2, 10)
    assert "batch_stats" in mutated


def test_ssd_custom_param_names_match_reference():
    """H5-compat layer names exist in the param tree (by_name import contract)."""
    module, example = build_model("ssd300_ssd_custom", n_classes=20)
    variables = module.init(jax.random.PRNGKey(0), example(), train=False)
    params = variables["params"]
    for expected in [
        "res1a2_branch2a", "bn1a2_branch2a", "res2a4_branch1",
        "res5a_branch2a", "fc6", "fc7", "conv6_2", "conv9_2",
        "conv4_3_norm", "conv3_3_norm", "conv4_6_norm",
    ]:
        assert expected in params, f"missing param scope {expected}"
    head = params["head"]
    assert "conv4_3_norm_mbox_conf_21" in head
    assert "conv9_2_mbox_loc" in head


@pytest.mark.slow
def test_identical_family_gradients_flow():
    """Gradient smoke through the DCTStem + identical-EF SSD path."""
    import jax.numpy as jnp

    module, example = build_model("ssd300_y_cb4_cbcr_cb5", n_classes=3)
    inputs = example()
    variables = module.init(jax.random.PRNGKey(0), inputs, train=False)

    def loss(params):
        out = module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            inputs, train=False,
        )
        return jnp.mean(out[..., :4] ** 2) + jnp.mean(out[..., -12:-8] ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # stems actually receive gradient signal
    stem_grads = jax.tree_util.tree_leaves(grads["stem"])
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in stem_grads)


@pytest.mark.slow
def test_remat_equivalence():
    """remat=True preserves the param tree, outputs, and gradients."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    y = rng.normal(0, 1, (2, 28, 28, 64)).astype(np.float32)
    cbcr = rng.normal(0, 1, (2, 14, 14, 128)).astype(np.float32)
    m1, _ = build_model("resnet50_dct_cb5_only", num_classes=5)
    m2, _ = build_model("resnet50_dct_cb5_only", num_classes=5, remat=True)
    v1 = m1.init(jax.random.PRNGKey(0), (y, cbcr), train=False)
    v2 = m2.init(jax.random.PRNGKey(0), (y, cbcr), train=False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    o1 = np.asarray(m1.apply(v1, (y, cbcr), train=False))
    o2 = np.asarray(m2.apply(v2, (y, cbcr), train=False))
    np.testing.assert_allclose(o1, o2, atol=1e-5)

    def grad_of(m, v):
        def f(p):
            out = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                (y, cbcr), train=False,
            )
            return jnp.mean(out ** 2)
        return jax.grad(f)(v["params"])

    g1 = jax.tree_util.tree_leaves(grad_of(m1, v1))
    g2 = jax.tree_util.tree_leaves(grad_of(m2, v2))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
