"""Pallas conv filter-grad kernel vs NumPy oracle and XLA autodiff.

Interpret mode (CPU): the kernel's math must match the direct 6-loop
contraction and `jax.vjp` of the XLA conv bit-for-bit in f32 (both
accumulate in f32; only reduction order may differ, so allclose with a
tight tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jpeg_detection_resnet_ssd_tpu.ops.pallas_conv_grad import (
    conv3x3_filter_grad,
    conv3x3_filter_grad_xla_dots,
    conv3x3_same_pallas_wgrad,
    reference_filter_grad,
)


@pytest.mark.parametrize(
    "b,h,w,c,k",
    [
        (2, 6, 6, 8, 8),
        (4, 5, 7, 16, 8),   # non-square, odd sizes
        (1, 8, 8, 4, 12),
    ],
)
def test_filter_grad_matches_oracle(b, h, w, c, k):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (b, h, w, c)).astype(np.float32)
    dy = rng.normal(0, 1, (b, h, w, k)).astype(np.float32)
    got = np.asarray(conv3x3_filter_grad(x, dy, interpret=True))
    want = reference_filter_grad(x, dy)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("b,h,w,c,k", [(2, 6, 6, 8, 8), (4, 5, 7, 16, 8)])
def test_xla_dots_filter_grad_matches_oracle(b, h, w, c, k):
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (b, h, w, c)).astype(np.float32)
    dy = rng.normal(0, 1, (b, h, w, k)).astype(np.float32)
    got = np.asarray(conv3x3_filter_grad_xla_dots(x, dy))
    want = reference_filter_grad(x, dy)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_custom_vjp_matches_xla_grads():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (4, 9, 9, 8)).astype(np.float32)
    w = rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32)
    ct = rng.normal(0, 1, (4, 9, 9, 16)).astype(np.float32)

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    out_ref, vjp_ref = jax.vjp(xla_conv, x, w)
    out_got, vjp_got = jax.vjp(
        lambda x, w: conv3x3_same_pallas_wgrad(x, w, True), x, w
    )
    np.testing.assert_array_equal(np.asarray(out_got), np.asarray(out_ref))
    dx_ref, dw_ref = vjp_ref(ct)
    dx_got, dw_got = vjp_got(ct)
    np.testing.assert_allclose(
        np.asarray(dx_got), np.asarray(dx_ref), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dw_got), np.asarray(dw_ref), rtol=1e-5, atol=1e-3
    )


def test_bf16_inputs_accumulate_f32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 6, 6, 8)), jnp.bfloat16)
    dy = jnp.asarray(rng.normal(0, 1, (2, 6, 6, 8)), jnp.bfloat16)
    got = conv3x3_filter_grad(x, dy, interpret=True)
    assert got.dtype == jnp.float32
    want = reference_filter_grad(
        np.asarray(x, np.float32), np.asarray(dy, np.float32)
    )
    # bf16 operands: tolerance scales with the ~3 decimal digits of bf16
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.02, atol=0.3)


def test_layers_conv_pallas_wgrad_wiring():
    """`layers.set_pallas_wgrad(True)` must swap eligible convs for the
    Pallas-backward module with an IDENTICAL param tree, identical forward,
    and matching gradients (ineligible convs — 1x1, strided, dilated — stay
    on nn.Conv)."""
    from flax import linen as nn

    from jpeg_detection_resnet_ssd_tpu.models import layers

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(layers.conv(8, 3, 1, "SAME", name="c3")(x))
            x = nn.relu(layers.conv(8, 1, 1, "SAME", name="c1")(x))
            x = layers.conv(8, 3, 2, "SAME", name="c3s2")(x)
            return x

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 4)), jnp.float32)
    key = jax.random.PRNGKey(0)

    params_off = Net().init(key, x)
    with layers.pallas_wgrad():
        params_on = Net().init(key, x)
        assert jax.tree_util.tree_structure(
            params_on
        ) == jax.tree_util.tree_structure(params_off)
        for a, b in zip(
            jax.tree_util.tree_leaves(params_on),
            jax.tree_util.tree_leaves(params_off),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(p):
            return jnp.sum(Net().apply(p, x) ** 2)

        out_on = Net().apply(params_on, x)
        g_on = jax.grad(loss)(params_on)
    out_off = Net().apply(params_off, x)
    g_off = jax.grad(loss)(params_off)

    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), rtol=1e-6, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
    assert not layers.pallas_wgrad_enabled()


@pytest.mark.slow
def test_ssd_head_pallas_wgrad_wiring():
    """The fused conf/loc head conv must produce an identical forward and
    matching grads under `layers.pallas_wgrad()` (same param tree: the
    Pallas path only swaps the filter-grad computation)."""
    from jpeg_detection_resnet_ssd_tpu.boxes.anchors import AnchorSpec
    from jpeg_detection_resnet_ssd_tpu.models import layers
    from jpeg_detection_resnet_ssd_tpu.models.ssd import _SSDHead

    rng = np.random.default_rng(5)
    spec = AnchorSpec(img_height=64, img_width=64)
    sizes = [(8, 8), (4, 4), (2, 2), (2, 2), (1, 1), (1, 1)]
    sources = [
        jnp.asarray(rng.normal(0, 1, (2, h, w, 8)), jnp.float32)
        for h, w in sizes
    ]
    head = _SSDHead(n_classes=3, spec=spec)
    key = jax.random.PRNGKey(0)

    params_off = head.init(key, sources)
    out_off = head.apply(params_off, sources)

    def loss(p):
        return jnp.sum(head.apply(p, sources) ** 2)

    g_off = jax.grad(loss)(params_off)
    with layers.pallas_wgrad():
        params_on = head.init(key, sources)
        assert jax.tree_util.tree_structure(
            params_on
        ) == jax.tree_util.tree_structure(params_off)
        out_on = head.apply(params_on, sources)
        g_on = jax.grad(loss)(params_on)

    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), rtol=1e-6, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_grad_through_loss_scalar():
    """End-to-end: jax.grad of a scalar loss through the custom conv equals
    the XLA conv's grad (interpret mode)."""
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, 6, 6, 4)).astype(np.float32)
    w = rng.normal(0, 0.1, (3, 3, 4, 4)).astype(np.float32)

    def loss_pallas(w):
        return jnp.sum(conv3x3_same_pallas_wgrad(x, w, True) ** 2)

    def loss_xla(w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(y ** 2)

    g_got = np.asarray(jax.grad(loss_pallas)(w))
    g_ref = np.asarray(jax.grad(loss_xla)(w))
    np.testing.assert_allclose(g_got, g_ref, rtol=1e-5, atol=1e-4)
