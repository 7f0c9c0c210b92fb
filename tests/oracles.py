"""Plain-NumPy oracles for box math, matching, encoding and NMS.

These re-state the reference algorithms (`localisation_part/
bounding_box_utils/`, `ssd_encoder_decoder/`) as simple, loop-based NumPy so
the vectorized jnp implementations can be checked against an independent,
easy-to-audit formulation.

A restated oracle can share a misreading with the implementation; the
authoritative cross-check against the reference's OWN runnable code lives
in `tests/test_reference_parity.py` (it imports the genuine modules from
/root/reference).  These oracles remain as a third, human-auditable leg.
"""

from __future__ import annotations

import numpy as np

_D = {"half": 0.0, "include": 1.0, "exclude": -1.0}


def iou_corners(a: np.ndarray, b: np.ndarray, border: str = "half") -> np.ndarray:
    """(m,4) x (n,4) corner boxes -> (m,n) IoU, double loop."""
    d = _D[border]
    m, n = a.shape[0], b.shape[0]
    out = np.zeros((m, n))
    for i in range(m):
        for j in range(n):
            ix = max(0.0, min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]) + d)
            iy = max(0.0, min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]) + d)
            inter = ix * iy
            area_a = (a[i, 2] - a[i, 0] + d) * (a[i, 3] - a[i, 1] + d)
            area_b = (b[j, 2] - b[j, 0] + d) * (b[j, 3] - b[j, 1] + d)
            u = area_a + area_b - inter
            out[i, j] = inter / u if u > 0 else 0.0
    return out


def bipartite_greedy(weights: np.ndarray) -> np.ndarray:
    """Reference-semantics greedy bipartite matching (maximize)."""
    w = weights.copy()
    m = w.shape[0]
    matches = np.zeros(m, dtype=np.int64)
    for _ in range(m):
        anchor_idx = np.argmax(w, axis=1)
        overlaps = w[np.arange(m), anchor_idx]
        g = int(np.argmax(overlaps))
        a = int(anchor_idx[g])
        matches[g] = a
        w[g, :] = -1.0  # consume row
        w[:, a] = -1.0  # consume column
    return matches


def encode_targets_oracle(
    gt: np.ndarray,
    anchors_cent: np.ndarray,
    variances: np.ndarray,
    n_classes: int,
    img_h: int,
    img_w: int,
    pos_iou: float = 0.5,
    neg_limit: float = 0.3,
) -> np.ndarray:
    """Loop-based SSD target encoding for ONE image.

    gt: (k, 5) rows (class_id >= 1, xmin, ymin, xmax, ymax), absolute corners.
    Returns (n_anchors, n_classes + 1 + 12).
    """
    n_total = n_classes + 1
    n_anchors = anchors_cent.shape[0]
    out = np.zeros((n_anchors, n_total + 12), dtype=np.float64)
    out[:, 0] = 1.0  # background
    out[:, -8:-4] = anchors_cent
    out[:, -4:] = variances

    if gt.shape[0] == 0:
        out[:, -12:-8] = 0.0
        return out.astype(np.float32)

    corners = gt[:, 1:5] / np.array([img_w, img_h, img_w, img_h])
    cent = np.stack(
        [
            (corners[:, 0] + corners[:, 2]) / 2,
            (corners[:, 1] + corners[:, 3]) / 2,
            corners[:, 2] - corners[:, 0],
            corners[:, 3] - corners[:, 1],
        ],
        axis=1,
    )
    # IoU in corner space (equivalent to 'centroids' mode with half borders)
    anchors_corn = np.stack(
        [
            anchors_cent[:, 0] - anchors_cent[:, 2] / 2,
            anchors_cent[:, 1] - anchors_cent[:, 3] / 2,
            anchors_cent[:, 0] + anchors_cent[:, 2] / 2,
            anchors_cent[:, 1] + anchors_cent[:, 3] / 2,
        ],
        axis=1,
    )
    sims = iou_corners(corners, anchors_corn)

    assigned = np.full(n_anchors, -1, dtype=np.int64)
    w = sims.copy()
    for _ in range(gt.shape[0]):
        anchor_idx = np.argmax(w, axis=1)
        overlaps = w[np.arange(w.shape[0]), anchor_idx]
        g = int(np.argmax(overlaps))
        a = int(anchor_idx[g])
        if overlaps[g] < 0:
            break
        assigned[a] = g
        w[g, :] = -1.0
        w[:, a] = -1.0

    # Reference semantics (`ssd_input_encoder.py:366-390`): the bipartite
    # row/col kills live only inside `match_bipartite_greedy`'s copy; multi
    # matching and the neutral zone see the ORIGINAL similarities with just
    # the matched anchor COLUMNS cleared — all GT rows stay alive.
    w = sims.copy()
    w[:, assigned >= 0] = -1.0

    # multi matching
    best_gt = np.argmax(w, axis=0)
    best_sim = w[best_gt, np.arange(n_anchors)]
    multi = (assigned < 0) & (best_sim >= pos_iou)
    assigned[multi] = best_gt[multi]
    w[:, multi] = -1.0

    # neutral
    max_bg = w.max(axis=0)
    neutral = (assigned < 0) & (max_bg >= neg_limit)

    for a in range(n_anchors):
        g = assigned[a]
        if g >= 0:
            out[a, : n_total] = 0.0
            out[a, int(gt[g, 0])] = 1.0
            cxa, cya, wa, ha = anchors_cent[a]
            v = variances[a]
            out[a, -12] = (cent[g, 0] - cxa) / wa / v[0]
            out[a, -11] = (cent[g, 1] - cya) / ha / v[1]
            out[a, -10] = np.log(cent[g, 2] / wa) / v[2]
            out[a, -9] = np.log(cent[g, 3] / ha) / v[3]
        elif neutral[a]:
            out[a, : n_total] = 0.0
    return out.astype(np.float32)


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thr: float) -> list[int]:
    """Classic greedy NMS: returns kept indices (into the given arrays)."""
    order = np.argsort(-scores, kind="stable")
    kept: list[int] = []
    alive = np.ones(len(scores), dtype=bool)
    for i in order:
        if not alive[i] or scores[i] <= 0:
            continue
        kept.append(int(i))
        ious = iou_corners(boxes[i : i + 1], boxes)[0]
        alive &= ious <= iou_thr  # kill overlapping (later-in-order) boxes
        alive[i] = False
    return kept
