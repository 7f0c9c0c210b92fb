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
cannot be jitted; here the same selection is a rank threshold over a
descending argsort — shape-static and TPU-friendly.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


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
        # Rank-threshold selection == top-k with data-dependent k: an element is
        # kept iff its descending rank < n_keep AND its loss is nonzero.
        order = jnp.argsort(-flat)
        ranks = jnp.zeros_like(flat).at[order].set(
            jnp.arange(flat.shape[0], dtype=flat.dtype)
        )
        keep = (ranks < n_keep) & (flat > 0)
        neg_class_loss = jnp.sum(jnp.where(keep, flat, 0.0))

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
