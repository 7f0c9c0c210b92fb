"""Axis-aligned box coordinate conversions and IoU, as pure jnp functions.

Semantics mirror the reference's NumPy helpers
(`localisation_part/bounding_box_utils/bounding_box_utils.py:24-383`):

* three coordinate formats —
  'corners'   = (xmin, ymin, xmax, ymax)
  'minmax'    = (xmin, xmax, ymin, ymax)
  'centroids' = (cx, cy, w, h)
* a `border_pixels` convention in {'half','include','exclude'} that adds
  d in {0, +1, -1} to widths/heights computed from corner differences.

Everything here is vectorized, shape-static, and differentiable, so it can be
used inside jit-compiled encode/decode/NMS programs on TPU.  Functions accept
either jnp or np arrays (jnp.asarray on entry) and operate on the LAST axis,
broadcasting over any leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

_BORDER_DELTA = {"half": 0.0, "include": 1.0, "exclude": -1.0}


def _delta(border_pixels: str) -> float:
    try:
        return _BORDER_DELTA[border_pixels]
    except KeyError:
        raise ValueError(
            f"border_pixels must be one of {list(_BORDER_DELTA)}, got {border_pixels!r}"
        )


def corners_to_centroids(boxes, border_pixels: str = "half"):
    """(..., 4) corners -> centroids. w = xmax - xmin + d, h likewise."""
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    d = _delta(border_pixels)
    xmin, ymin, xmax, ymax = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [(xmin + xmax) / 2.0, (ymin + ymax) / 2.0, xmax - xmin + d, ymax - ymin + d],
        axis=-1,
    )


def centroids_to_corners(boxes):
    """(..., 4) centroids -> corners."""
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    cx, cy, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1
    )


def corners_to_minmax(boxes):
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    return boxes[..., jnp.array([0, 2, 1, 3])]


def minmax_to_corners(boxes):
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    return boxes[..., jnp.array([0, 2, 1, 3])]


def minmax_to_centroids(boxes, border_pixels: str = "half"):
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    d = _delta(border_pixels)
    xmin, xmax, ymin, ymax = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [(xmin + xmax) / 2.0, (ymin + ymax) / 2.0, xmax - xmin + d, ymax - ymin + d],
        axis=-1,
    )


def centroids_to_minmax(boxes):
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    cx, cy, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [cx - w / 2.0, cx + w / 2.0, cy - h / 2.0, cy + h / 2.0], axis=-1
    )


_CONVERTERS = {
    ("corners", "centroids"): corners_to_centroids,
    ("corners", "minmax"): lambda b, border_pixels="half": corners_to_minmax(b),
    ("minmax", "corners"): lambda b, border_pixels="half": minmax_to_corners(b),
    ("minmax", "centroids"): minmax_to_centroids,
    ("centroids", "corners"): lambda b, border_pixels="half": centroids_to_corners(b),
    ("centroids", "minmax"): lambda b, border_pixels="half": centroids_to_minmax(b),
}


def convert(boxes, src: str, dst: str, border_pixels: str = "half"):
    """Generic conversion between the three formats."""
    if src == dst:
        return jnp.asarray(boxes, dtype=jnp.float32)
    return _CONVERTERS[(src, dst)](boxes, border_pixels=border_pixels)


def _as_corners(boxes, coords: str, border_pixels: str = "half"):
    if coords == "corners":
        return jnp.asarray(boxes, dtype=jnp.float32)
    if coords == "minmax":
        return minmax_to_corners(boxes)
    if coords == "centroids":
        return centroids_to_corners(boxes)
    raise ValueError(f"unknown coords format {coords!r}")


def box_area(corners, border_pixels: str = "half"):
    """Area of (..., 4) corner-format boxes under the given border convention."""
    corners = jnp.asarray(corners, dtype=jnp.float32)
    d = _delta(border_pixels)
    return (corners[..., 2] - corners[..., 0] + d) * (
        corners[..., 3] - corners[..., 1] + d
    )


def intersection_area_matrix(boxes1, boxes2, coords="corners", border_pixels="half"):
    """Pairwise intersection areas: (m, 4) x (n, 4) -> (m, n)."""
    b1 = _as_corners(boxes1, coords)[..., :, None, :]  # (m, 1, 4)
    b2 = _as_corners(boxes2, coords)[..., None, :, :]  # (1, n, 4)
    d = _delta(border_pixels)
    min_xy = jnp.maximum(b1[..., :2], b2[..., :2])
    max_xy = jnp.minimum(b1[..., 2:], b2[..., 2:])
    side = jnp.maximum(0.0, max_xy - min_xy + d)
    return side[..., 0] * side[..., 1]


def intersection_area_elementwise(boxes1, boxes2, coords="corners", border_pixels="half"):
    """Broadcast element-wise intersection areas: (..., 4) x (..., 4) -> (...)."""
    b1 = _as_corners(boxes1, coords)
    b2 = _as_corners(boxes2, coords)
    d = _delta(border_pixels)
    min_xy = jnp.maximum(b1[..., :2], b2[..., :2])
    max_xy = jnp.minimum(b1[..., 2:], b2[..., 2:])
    side = jnp.maximum(0.0, max_xy - min_xy + d)
    return side[..., 0] * side[..., 1]


def iou_matrix(boxes1, boxes2, coords="corners", border_pixels="half"):
    """Pairwise Jaccard overlap: (m, 4) x (n, 4) -> (m, n).

    Matches `bounding_box_utils.iou(..., mode='outer_product')`.  Leading batch
    axes broadcast: (..., m, 4) x (..., n, 4) -> (..., m, n).
    """
    inter = intersection_area_matrix(boxes1, boxes2, coords, border_pixels)
    a1 = box_area(_as_corners(boxes1, coords), border_pixels)[..., :, None]
    a2 = box_area(_as_corners(boxes2, coords), border_pixels)[..., None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / union, 0.0)


def iou_elementwise(boxes1, boxes2, coords="corners", border_pixels="half"):
    """Broadcast element-wise Jaccard overlap (mode='element-wise')."""
    inter = intersection_area_elementwise(boxes1, boxes2, coords, border_pixels)
    a1 = box_area(_as_corners(boxes1, coords), border_pixels)
    a2 = box_area(_as_corners(boxes2, coords), border_pixels)
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / union, 0.0)
