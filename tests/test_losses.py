"""SSD loss vs a loop-based NumPy oracle; classification metrics."""

import jax
import jax.numpy as jnp
import numpy as np

from jpeg_detection_resnet_ssd_tpu.losses import (
    SSDLoss,
    l2_regularization_loss,
    softmax_cross_entropy,
    top_k_accuracy,
)


def ssd_loss_oracle(y_true, y_pred, neg_pos_ratio=3, n_neg_min=0, alpha=1.0):
    """Direct NumPy restatement of `keras_ssd_loss.py:98-211` semantics,
    returning the batch-summed scalar (reference: per-item / n_pos * B, then
    Keras means over B)."""
    B, N, _ = y_true.shape
    cls = -np.sum(y_true[..., :-12] * np.log(np.maximum(y_pred[..., :-12], 1e-15)),
                  axis=-1)
    diff = np.abs(y_true[..., -12:-8] - y_pred[..., -12:-8])
    loc = np.sum(np.where(diff < 1, 0.5 * diff ** 2, diff - 0.5), axis=-1)

    negatives = y_true[..., 0]
    positives = y_true[..., 1:-12].max(axis=-1)
    n_pos = positives.sum()

    pos_cls = (cls * positives).sum()
    neg_all = (cls * negatives).reshape(-1)
    n_neg_losses = int((neg_all > 0).sum())
    k = int(min(max(neg_pos_ratio * n_pos, n_neg_min), n_neg_losses))
    neg_cls = np.sort(neg_all)[::-1][:k].sum() if k > 0 else 0.0

    total = (pos_cls + neg_cls + alpha * (loc * positives).sum()) / max(1.0, n_pos)
    return total


def make_fake_batch(rng, B=3, N=50, C=5):
    """Random y_true with pos/neg/neutral anchors + random softmax y_pred."""
    y_true = np.zeros((B, N, C + 12), dtype=np.float32)
    kinds = rng.choice(3, size=(B, N), p=[0.1, 0.8, 0.1])  # pos, neg, neutral
    for b in range(B):
        for n in range(N):
            if kinds[b, n] == 0:
                y_true[b, n, rng.integers(1, C)] = 1.0
                y_true[b, n, -12:-8] = rng.normal(0, 1, 4)
            elif kinds[b, n] == 1:
                y_true[b, n, 0] = 1.0
    logits = rng.normal(0, 1, (B, N, C)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    y_pred = np.concatenate(
        [probs, rng.normal(0, 1, (B, N, 12)).astype(np.float32)], axis=-1
    ).astype(np.float32)
    return y_true, y_pred


class TestSSDLoss:
    def test_matches_oracle(self, rng):
        loss_fn = SSDLoss()
        for _ in range(3):
            y_true, y_pred = make_fake_batch(rng)
            ours = float(jax.jit(loss_fn.__call__)(jnp.asarray(y_true),
                                                   jnp.asarray(y_pred)))
            ref = ssd_loss_oracle(y_true, y_pred)
            np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_no_positives_no_nan(self, rng):
        y_true, y_pred = make_fake_batch(rng)
        y_true[..., 1:-12] = 0.0  # no positives anywhere
        y_true[..., 0] = 1.0
        out = float(SSDLoss()(jnp.asarray(y_true), jnp.asarray(y_pred)))
        assert np.isfinite(out)
        ref = ssd_loss_oracle(y_true, y_pred)
        np.testing.assert_allclose(out, ref, rtol=1e-4)

    def test_n_neg_min(self, rng):
        y_true, y_pred = make_fake_batch(rng)
        y_true[..., 1:-12] = 0.0
        y_true[..., 0] = 1.0  # all negative -> n_pos = 0
        ours = float(SSDLoss(n_neg_min=7)(jnp.asarray(y_true), jnp.asarray(y_pred)))
        ref = ssd_loss_oracle(y_true, y_pred, n_neg_min=7)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)
        assert ours > 0  # 7 negatives enter the loss

    def test_differentiable(self, rng):
        y_true, y_pred = make_fake_batch(rng)
        g = jax.grad(lambda p: SSDLoss()(jnp.asarray(y_true), p))(
            jnp.asarray(y_pred)
        )
        assert np.isfinite(np.asarray(g)).all()


class TestClassification:
    def test_cross_entropy_matches_manual(self, rng):
        logits = rng.normal(0, 1, (4, 10)).astype(np.float32)
        labels = rng.integers(0, 10, 4)
        onehot = np.eye(10, dtype=np.float32)[labels]
        ours = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(onehot)))
        p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        ref = -np.mean(np.log(p[np.arange(4), labels]))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_topk(self):
        logits = jnp.asarray(
            [[0.1, 0.5, 0.4], [0.9, 0.05, 0.05]], dtype=jnp.float32
        )
        labels = jnp.asarray([2, 0])
        assert float(top_k_accuracy(logits, labels, 1)) == 0.5
        assert float(top_k_accuracy(logits, labels, 2)) == 1.0

    def test_l2_reg_selects_ssd_layers(self):
        params = {
            "fc6": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
            "res2a_branch2a": {"kernel": jnp.ones((2, 2))},
            "head": {"conv4_3_norm_mbox_loc": {"kernel": jnp.ones((3,))}},
        }
        val = float(l2_regularization_loss(params, scale=0.5))
        # fc6 kernel (4 ones) + mbox kernel (3 ones) = 7; resnet excluded
        np.testing.assert_allclose(val, 0.5 * 7.0)


class TestTopKSum:
    """`top_k_sum` (binary-search k-th-largest threshold) vs numpy sort."""

    def test_matches_sorted_sum(self):
        rng = np.random.default_rng(0)
        flat = np.abs(rng.normal(0, 3, (4096,))).astype(np.float32)
        from jpeg_detection_resnet_ssd_tpu.losses.ssd_loss import top_k_sum

        for k in (0, 1, 7, 100, 4095, 4096):
            want = np.sort(flat)[::-1][:k].sum()
            got = float(top_k_sum(jnp.asarray(flat), jnp.float32(k)))
            np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_ties_and_fractional_k(self):
        from jpeg_detection_resnet_ssd_tpu.losses.ssd_loss import top_k_sum

        flat = jnp.asarray([5.0, 3.0, 3.0, 3.0, 1.0, 0.0])
        # k=2: 5 + one tie-copy of 3
        np.testing.assert_allclose(float(top_k_sum(flat, 2.0)), 8.0)
        # fractional n_keep behaves like ceil (rank < 2.5 keeps 3 ranks)
        np.testing.assert_allclose(float(top_k_sum(flat, 2.5)), 11.0)
        # k spanning all ties
        np.testing.assert_allclose(float(top_k_sum(flat, 4.0)), 14.0)

    def test_gradient_is_topk_mask(self):
        from jpeg_detection_resnet_ssd_tpu.losses.ssd_loss import top_k_sum

        flat = jnp.asarray([4.0, 2.0, 9.0, 1.0, 7.0])
        g = jax.grad(lambda x: top_k_sum(x, 3.0))(flat)
        np.testing.assert_allclose(np.asarray(g), [1, 0, 1, 0, 1])

    def test_loss_value_unchanged_vs_argsort_formulation(self, ):
        """The SSDLoss total with the threshold selection equals the original
        rank-threshold/argsort formulation on random batches."""
        rng = np.random.default_rng(3)
        y_true, y_pred = make_fake_batch(rng)
        loss = SSDLoss()
        got = float(loss(jnp.asarray(y_true), jnp.asarray(y_pred)))

        # argsort reference formulation, inline
        yt, yp = jnp.asarray(y_true), jnp.asarray(y_pred)
        cls = -jnp.sum(yt[..., :-12] * jnp.log(jnp.maximum(yp[..., :-12],
                                                           1e-15)), -1)
        diff = jnp.abs(yt[..., -12:-8] - yp[..., -12:-8])
        loc = jnp.sum(jnp.where(diff < 1, 0.5 * diff * diff, diff - 0.5), -1)
        negs = yt[..., 0]
        poss = jnp.max(yt[..., 1:-12], -1)
        n_pos = jnp.sum(poss)
        flat = (cls * negs).reshape(-1)
        n_keep = jnp.minimum(3.0 * n_pos, jnp.sum(flat > 0).astype(jnp.float32))
        order = jnp.argsort(-flat)
        ranks = jnp.zeros_like(flat).at[order].set(
            jnp.arange(flat.shape[0], dtype=flat.dtype))
        keep = (ranks < n_keep) & (flat > 0)
        want = float((jnp.sum(cls * poss) + jnp.sum(jnp.where(keep, flat, 0.0))
                      + jnp.sum(loc * poss)) / jnp.maximum(1.0, n_pos))
        np.testing.assert_allclose(got, want, rtol=1e-6)
