"""Parity tests for the exact pixel-space device photometric op.

Pins `ops/pixel_photometric.py` against the HOST chain (cv2-based ops in
`data/augment.py`, themselves parity-tested against the reference's
`object_detection_2d_photometric_ops.py`): colour conversions, the
hexagonal HSV walk, and the full brightness/contrast/sat/hue chain applied
between real JPEG codecs — including the requirement that it beats the
coefficient-domain chroma-rotation approximation on every tried setting.
"""

import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

cv2 = pytest.importorskip("cv2")
from PIL import Image  # noqa: E402

from jpeg_detection_resnet_ssd_tpu.data import augment as ha
from jpeg_detection_resnet_ssd_tpu.data.dct_convert import rgb_to_dct_tensors
from jpeg_detection_resnet_ssd_tpu.ops.dct_augment import (
    dct_brightness_contrast,
    dct_chroma_hue_saturation,
)
from jpeg_detection_resnet_ssd_tpu.ops.pixel_photometric import (
    blocks_to_plane,
    dct_pixel_photometric,
    dct_pixel_photometric_apply,
    hsv_to_rgb,
    plane_to_blocks,
    rgb_to_hsv,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


def _structured_image(seed=1, size=96):
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size, 3), np.uint8)
    img[:] = (140, 120, 100)
    cv2.circle(img, (size // 3, size // 3), size // 5, (200, 40, 40), -1)
    cv2.rectangle(img, (size // 2, size // 2), (size - 6, size - 6),
                  (30, 180, 90), -1)
    return np.clip(
        img.astype(np.float32) + rng.normal(0, 12, img.shape), 0, 255
    ).astype(np.uint8)


def test_colour_roundtrips():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (64, 64, 3)).astype(np.float32)
    h, s, v = rgb_to_hsv(jnp.asarray(rgb))
    assert np.abs(np.asarray(hsv_to_rgb(h, s, v)) - rgb).max() < 1e-2
    y, cb, cr = rgb_to_ycbcr(jnp.asarray(rgb))
    assert np.abs(np.asarray(ycbcr_to_rgb(y, cb, cr)) - rgb).max() < 1e-2


def test_block_plane_roundtrip():
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(rng.normal(0, 40, (2, 4, 5, 64)), jnp.float32)
    back = plane_to_blocks(blocks_to_plane(blocks))
    assert np.abs(np.asarray(back - blocks)).max() < 1e-3


@pytest.mark.parametrize("delta,sat", [(18, 1.0), (-18, 1.0), (0, 1.5),
                                       (0, 0.5), (9, 1.3)])
def test_hue_sat_matches_cv2(delta, sat):
    """The continuous hexagonal walk vs cv2's 8-bit HSV path: residual is
    the uint8 H quantization (2-degree bins), well under 1/255 mean."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    hsv8 = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv8 = ha.saturation_scale_hsv(hsv8, sat)
    hsv8 = ha.hue_shift_hsv(hsv8, delta)
    ref = cv2.cvtColor(
        np.clip(hsv8, 0, 255).astype(np.uint8), cv2.COLOR_HSV2RGB
    ).astype(np.float32)
    h, s, v = rgb_to_hsv(jnp.asarray(img, jnp.float32))
    s = jnp.clip(s * sat, 0, 255)
    h = (h + 2.0 * delta) % 360.0
    mine = np.asarray(jnp.clip(hsv_to_rgb(h, s, v), 0, 255))
    err = np.abs(mine - ref)
    assert err.mean() < 1.0 and err.max() < 8.0


def test_identity_params_preserve_coefficients():
    yb, cbcrb = rgb_to_dct_tensors(_structured_image(), quality=95)
    yj = jnp.asarray(yb, jnp.float32)[None]
    cj = jnp.asarray(cbcrb, jnp.float32)[None]
    one = np.ones(1, np.float32)
    yo, co = dct_pixel_photometric_apply(yj, cj, 0 * one, one, one, one,
                                         0 * one)
    # luma: IDCT -> clip -> DCT is exact for in-range pixels
    assert float(jnp.abs(yo - yj).mean()) < 0.05
    assert float(jnp.abs(yo - yj).max()) < 1.0
    # chroma additionally pays the 4:2:0 resample pair (triangle up, box
    # down) — the same pair every host decode/re-encode applies
    assert float(jnp.abs(co - cj).mean()) < 2.0


def _host_chain(img, bright, contrast, early, sat, hue):
    out = ha.brightness_shift(img, bright)
    if early:
        out = ha.contrast_scale(out, contrast)
    hsv = cv2.cvtColor(out, cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv = ha.saturation_scale_hsv(hsv, sat)
    hsv = ha.hue_shift_hsv(hsv, hue)
    out = cv2.cvtColor(
        np.clip(hsv, 0, 255).astype(np.uint8), cv2.COLOR_HSV2RGB
    )
    if not early:
        out = ha.contrast_scale(out, contrast)
    return out


def _plane_err(a, b):
    if a.shape[-1] == 128:
        return 0.5 * (_plane_err(a[..., :64], b[..., :64])
                      + _plane_err(a[..., 64:], b[..., 64:]))
    return float(jnp.abs(blocks_to_plane(a) - blocks_to_plane(b)).mean())


@pytest.mark.parametrize("params", [
    (20.0, 1.3, True, 1.4, 12.0),
    (-25.0, 0.7, False, 0.6, -15.0),
    (0.0, 1.0, True, 1.0, 18.0),
])
def test_full_chain_parity_vs_host(params):
    """From a SHARED starting point (the same q95 4:2:0 JPEG), the exact
    device op lands within ~10% of the host chain's effect size — and
    strictly closer than the coefficient-domain approximation on both
    planes."""
    bright, contrast, early, sat, hue = params
    img = _structured_image()
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "jpeg", quality=95, subsampling=2)
    img_dec = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    yb, cbcrb = rgb_to_dct_tensors(img, quality=95)
    yj = jnp.asarray(yb, jnp.float32)[None]
    cj = jnp.asarray(cbcrb, jnp.float32)[None]

    y_ref, c_ref = (
        jnp.asarray(t, jnp.float32)[None]
        for t in rgb_to_dct_tensors(
            _host_chain(img_dec, bright, contrast, early, sat, hue),
            quality=95,
        )
    )
    yo, co = dct_pixel_photometric_apply(
        yj, cj, np.float32([bright]), np.float32([contrast]),
        np.float32([early]), np.float32([sat]), np.float32([hue]),
    )
    y_old = dct_brightness_contrast(
        yj, jnp.float32(bright), jnp.float32(contrast), is_luma=True
    )
    c_old = dct_chroma_hue_saturation(
        dct_brightness_contrast(cj, 0.0, jnp.float32(contrast),
                                is_luma=False),
        jnp.float32(hue * 2 * np.pi / 180.0), jnp.float32(sat),
    )

    eff_y, eff_c = _plane_err(y_ref, yj), _plane_err(c_ref, cj)
    err_y, err_c = _plane_err(y_ref, yo), _plane_err(c_ref, co)
    assert err_y < 2.5 and err_c < 2.5
    assert err_y < 0.2 * eff_y + 0.5 and err_c < 0.25 * eff_c + 0.5
    assert err_y < _plane_err(y_ref, y_old)
    assert err_c < _plane_err(c_ref, c_old)


def test_random_wrapper_jits_and_batches():
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(0, 30, (2, 6, 6, 64)), jnp.float32)
    cbcr = jnp.asarray(rng.normal(0, 20, (2, 3, 3, 128)), jnp.float32)
    out_y, out_c = jax.jit(dct_pixel_photometric)(
        y, cbcr, jax.random.PRNGKey(0)
    )
    assert out_y.shape == y.shape and out_c.shape == cbcr.shape
    assert bool(jnp.isfinite(out_y).all()) and bool(jnp.isfinite(out_c).all())
    # different key -> different augmentation
    out_y2, _ = jax.jit(dct_pixel_photometric)(
        y, cbcr, jax.random.PRNGKey(7)
    )
    assert float(jnp.abs(out_y2 - out_y).max()) > 0.1


def test_pixel_photometric_under_mesh():
    """The op is batch-elementwise, so a data-sharded jit must produce the
    bit-identical result of the single-device run (no cross-image state)."""
    import jax.sharding as shd

    from jpeg_detection_resnet_ssd_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.normal(0, 30, (8, 6, 6, 64)), jnp.float32)
    cbcr = jnp.asarray(rng.normal(0, 20, (8, 3, 3, 128)), jnp.float32)
    key = jax.random.PRNGKey(0)

    ref_y, ref_c = jax.jit(dct_pixel_photometric)(y, cbcr, key)

    bs = batch_sharding(mesh)
    rep = shd.NamedSharding(mesh, shd.PartitionSpec())
    with mesh:
        out_y, out_c = jax.jit(
            dct_pixel_photometric,
            in_shardings=(bs, bs, rep),
            out_shardings=(bs, bs),
        )(jax.device_put(y, bs), jax.device_put(cbcr, bs),
          jax.device_put(key, rep))
    assert np.allclose(np.asarray(out_y), np.asarray(ref_y), atol=1e-4)
    assert np.allclose(np.asarray(out_c), np.asarray(ref_c), atol=1e-4)
