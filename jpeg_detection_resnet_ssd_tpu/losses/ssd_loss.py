"""SSD multibox loss with online hard-negative mining, as a pure jnp function.

Semantics mirror the reference
(`localisation_part/keras_loss_function/keras_ssd_loss.py:98-211`):

  * softmax log loss over the one-hot class block, smooth-L1 over the 4 offset
    coords (last 8 entries of the final axis — anchors + variances — ignored);
  * positives = anchors with a non-background one-hot; neutral anchors (all-
    zero one-hot) contribute to neither term;
  * hard-negative mining keeps the k background anchors with the highest
    classification loss, k = min(max(neg_pos_ratio * n_pos, n_neg_min),
    #nonzero negative losses), selected GLOBALLY across the batch;
  * total = sum_batch(class + alpha * loc) / max(1, n_positive).  (The
    reference also multiplies by batch_size to undo Keras' mean-over-batch,
    `keras_ssd_loss.py:204-209` — we return the already-correct scalar.)

The reference's dynamic `tf.nn.top_k(k=n_negative_keep)` is data-dependent and
cannot be jitted; here the same selection is computed via the EXACT k-th
largest loss value, found by a 31-step binary search over the bit patterns of
the nonnegative float losses (for x >= 0, the IEEE-754 bit pattern is
monotone in x).  That is 31 compare-and-count passes over the flat loss
vector — all data-parallel VPU work — versus the full argsort a rank-
threshold formulation needs (a ~280k-element sort per step dominated the
loss's cost on TPU).  The selected SUM is identical to top-k for any
tie-breaking: sum(top k) = sum(x > t) + t * (k - #{x > t}) where t is the
k-th largest value.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _kth_largest_nonneg(flat: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exact k-th largest value of a NONNEGATIVE float32 vector, data-
    dependent k >= 1 (traced int32), via binary search on bit patterns.

    For x >= 0 the int32 bit pattern is monotone in x, so the largest
    threshold m with #{bits >= m} >= k is exactly the k-th largest value's
    pattern; 31 iterations cover the nonnegative pattern range.
    """
    bits = jax.lax.bitcast_convert_type(flat, jnp.int32)

    def body(_, state):
        lo, hi = state
        mid = lo + (hi - lo + 1) // 2
        cnt = jnp.sum(bits >= mid)
        ok = cnt >= k
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    lo, _ = jax.lax.fori_loop(
        0, 31, body, (jnp.int32(0), jnp.int32(0x7F800000))
    )
    return jax.lax.bitcast_convert_type(lo, jnp.float32)


def top_k_sum(flat: jnp.ndarray, n_keep: jnp.ndarray) -> jnp.ndarray:
    """Sum of the `ceil(n_keep)` largest entries of a nonnegative vector,
    with data-dependent n_keep (float, 0 <= n_keep <= len(flat)).

    Equivalent to the rank-threshold/argsort formulation for every
    tie-breaking choice (ties at the threshold contribute their common
    value times the remaining count).  Gradient: 1 on entries strictly
    above the threshold; ties share the remaining weight equally (the
    argsort version picks arbitrary tie winners — same measure-zero set).
    """
    k = jnp.ceil(n_keep).astype(jnp.int32)
    t = _kth_largest_nonneg(
        jax.lax.stop_gradient(flat), jnp.maximum(k, 1)
    )
    above = flat > t
    n_above = jnp.sum(above)
    tie_w = (k - n_above).astype(flat.dtype)
    ties = flat == t
    n_ties = jnp.maximum(jnp.sum(ties), 1)
    w = above.astype(flat.dtype) + ties.astype(flat.dtype) * (
        tie_w / n_ties.astype(flat.dtype)
    )
    total = jnp.sum(flat * jax.lax.stop_gradient(w))
    return jnp.where(k > 0, total, 0.0)


def smooth_l1(y_true, y_pred):
    """Huber/smooth-L1 summed over the last axis (`keras_ssd_loss.py:53-75`)."""
    diff = jnp.abs(y_true - y_pred)
    loss = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    return jnp.sum(loss, axis=-1)


def softmax_log_loss(y_true, y_pred_probs):
    """-sum(y_true * log(max(p, 1e-15))) (`keras_ssd_loss.py:77-96`)."""
    return -jnp.sum(y_true * jnp.log(jnp.maximum(y_pred_probs, 1e-15)), axis=-1)


@dataclasses.dataclass(frozen=True)
class SSDLoss:
    """Configured SSD loss; reference defaults neg_pos_ratio=3, alpha=1.0."""

    neg_pos_ratio: float = 3.0
    n_neg_min: int = 0
    alpha: float = 1.0

    def __call__(self, y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        """y_true/y_pred: (B, n_boxes, n_classes+12) -> scalar loss."""
        batch_size = y_true.shape[0]

        cls_loss = softmax_log_loss(y_true[..., :-12], y_pred[..., :-12])
        loc_loss = smooth_l1(y_true[..., -12:-8], y_pred[..., -12:-8])

        negatives = y_true[..., 0]  # (B, n_boxes)
        positives = jnp.max(y_true[..., 1:-12], axis=-1)  # (B, n_boxes)
        n_positive = jnp.sum(positives)

        pos_class_loss = jnp.sum(cls_loss * positives)

        neg_class_loss_all = cls_loss * negatives
        flat = neg_class_loss_all.reshape(-1)
        n_neg_losses = jnp.sum(flat > 0)
        n_keep = jnp.minimum(
            jnp.maximum(
                self.neg_pos_ratio * n_positive, jnp.float32(self.n_neg_min)
            ),
            n_neg_losses.astype(jnp.float32),
        )
        # Exact top-n_keep sum via the k-th-largest threshold (no sort; see
        # module docstring).  n_keep <= #nonzero losses, so the threshold is
        # > 0 whenever n_keep >= 1 and the reference's `flat > 0` guard is
        # implied.
        neg_class_loss = top_k_sum(flat, n_keep)

        class_loss = pos_class_loss + neg_class_loss
        loc = jnp.sum(loc_loss * positives)
        total = (class_loss + self.alpha * loc) / jnp.maximum(1.0, n_positive)
        return total

    def per_item(self, y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        """Per-batch-item breakdown matching the Keras per-sample output
        (before Keras' batch mean); useful for metrics/debugging."""
        cls_loss = softmax_log_loss(y_true[..., :-12], y_pred[..., :-12])
        loc_loss = smooth_l1(y_true[..., -12:-8], y_pred[..., -12:-8])
        positives = jnp.max(y_true[..., 1:-12], axis=-1)
        n_positive = jnp.sum(positives)
        pos_cls = jnp.sum(cls_loss * positives, axis=-1)
        loc = jnp.sum(loc_loss * positives, axis=-1)
        return (pos_cls + self.alpha * loc) / jnp.maximum(1.0, n_positive)
