"""GT<->anchor matching as shape-static, jit-able jnp programs.

The reference implements these as data-dependent NumPy loops
(`localisation_part/ssd_encoder_decoder/matching_utils.py:52-116`).  On TPU the
shapes must be static, so:

* `match_bipartite_greedy` runs a fixed `max_gt`-iteration `lax.fori_loop`
  over a padded (max_gt, n_anchors) similarity matrix; invalid (padding) GT
  rows are pre-masked to -inf so they can never win an argmax, and their match
  output is flagged invalid.
* `match_multi` is a masked argmax over the GT axis — embarrassingly parallel.

Both return dense per-anchor / per-gt index tensors plus validity masks
instead of the reference's ragged index lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-1.0)  # IoU is >= 0, so -1 marks consumed/invalid entries.


def match_bipartite_greedy(similarities: jax.Array, gt_mask: jax.Array):
    """Greedy bipartite matching, maximizing similarity.

    Replicates the semantics of the reference's O(m^2 n) loop
    (`matching_utils.py:52-79`): in each of `max_gt` rounds, the (gt, anchor)
    pair with the globally highest remaining similarity is matched; then that
    GT row and anchor column are removed from contention.

    Args:
      similarities: (max_gt, n_anchors) float — IoU matrix, rows for padded /
        invalid GT boxes may contain garbage.
      gt_mask: (max_gt,) bool — True for valid GT rows.

    Returns:
      matches: (max_gt,) int32 — matched anchor index per GT row (garbage for
        invalid rows).
      match_valid: (max_gt,) bool — True where the row was a valid GT.
    """
    max_gt, n_anchors = similarities.shape
    sims = jnp.where(gt_mask[:, None], similarities, _NEG)

    def body(_, state):
        sims, matches = state
        # Global argmax in two reductions (same tie-breaking as the reference:
        # argmax over anchors first, then over GT rows; np.argmax picks the
        # first maximal index, as does jnp.argmax).
        anchor_idx = jnp.argmax(sims, axis=1)  # (max_gt,)
        row_best = jnp.take_along_axis(sims, anchor_idx[:, None], axis=1)[:, 0]
        gt_idx = jnp.argmax(row_best)
        a_idx = anchor_idx[gt_idx]
        # Only commit the match if the winning value is a real similarity
        # (>= 0); once all valid rows are consumed, row_best is all -1.
        valid = row_best[gt_idx] >= 0.0
        matches = matches.at[gt_idx].set(
            jnp.where(valid, a_idx.astype(jnp.int32), matches[gt_idx])
        )
        # Zero out the matched row and column (reference sets them to 0; we use
        # -1 so a fully-zero IoU row can still be "consumed").
        row_kill = jnp.where(valid, jnp.arange(max_gt) == gt_idx, False)
        col_kill = jnp.where(valid, jnp.arange(n_anchors) == a_idx, False)
        sims = jnp.where(row_kill[:, None] | col_kill[None, :], _NEG, sims)
        return sims, matches

    matches0 = jnp.zeros((max_gt,), dtype=jnp.int32)
    _, matches = jax.lax.fori_loop(0, max_gt, body, (sims, matches0))
    return matches, gt_mask


def match_multi(similarities: jax.Array, gt_mask: jax.Array, threshold: float):
    """Per-anchor thresholded argmax matching (`matching_utils.py:81-116`).

    Args:
      similarities: (max_gt, n_anchors) float.
      gt_mask: (max_gt,) bool.
      threshold: minimum similarity for a match.

    Returns:
      best_gt: (n_anchors,) int32 — best GT index per anchor.
      matched: (n_anchors,) bool — True where best similarity >= threshold.
    """
    sims = jnp.where(gt_mask[:, None], similarities, _NEG)
    best_gt = jnp.argmax(sims, axis=0).astype(jnp.int32)
    best_sim = jnp.max(sims, axis=0)
    return best_gt, best_sim >= threshold
