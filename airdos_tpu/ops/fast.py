"""FAST-16 segment-test corner detection, fully vectorized for the VPU.

Behavioral equivalent of the reference's per-cell cv::FAST calls
(ORBextractor.cc:767-864) — but computed dense over the whole level in one
shot: 16 shifted copies of the image instead of per-pixel pointer chasing.

Score definition matches OpenCV: the corner response is the maximum
threshold at which the segment test (9 contiguous circle pixels all brighter
than p+t or all darker than p-t) still passes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV's Bresenham circle of radius 3, clockwise from (0, -3): (dx, dy).
CIRCLE = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], np.int32)

ARC_LEN = 9  # contiguous arc length for FAST-9/16


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift so out[y, x] = img[y + dy, x + dx] (border values are garbage;
    callers must invalidate a 3px border)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


def fast_score_map(img: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9/16 response.

    img: [H, W] float32 (0..255).
    Returns scores [H, W] float32: the maximum threshold t for which the
    pixel passes the segment test (0 where not a corner at any t > 0).
    A pixel is a FAST corner at threshold ``t`` iff ``score > t``.
    """
    diffs = jnp.stack(
        [_shift2d(img, int(dy), int(dx)) - img for dx, dy in CIRCLE], axis=0)
    # circular pad so windows wrap: [16 + 8, H, W]
    d = jnp.concatenate([diffs, diffs[:ARC_LEN - 1]], axis=0)

    # min over each window of 9 consecutive entries (bright arcs)
    def window_min(a):
        r = a[:16]
        for s in range(1, ARC_LEN):
            r = jnp.minimum(r, a[s:s + 16])
        return r

    def window_max(a):
        r = a[:16]
        for s in range(1, ARC_LEN):
            r = jnp.maximum(r, a[s:s + 16])
        return r

    bright = jnp.max(window_min(d), axis=0)        # max over arc starts of (min over arc)
    dark = -jnp.min(window_max(d), axis=0)         # symmetric for dark arcs
    score = jnp.maximum(bright, dark)
    score = jnp.maximum(score, 0.0)

    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(interior, score, 0.0)


def nms_strict(score: jnp.ndarray) -> jnp.ndarray:
    """Non-max suppression matching cv2.FAST: keep a pixel only if its score
    is strictly greater than all 8 neighbours' scores.  Threshold BEFORE
    calling (cv2 only lets corners-at-threshold compete)."""
    neigh = [
        _shift2d(score, dy, dx)
        for dy in (-1, 0, 1) for dx in (-1, 0, 1) if not (dy == 0 and dx == 0)
    ]
    m = neigh[0]
    for n in neigh[1:]:
        m = jnp.maximum(m, n)
    return jnp.where(score > m, score, 0.0)


def fast_corners(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Thresholded + NMS'd FAST corner map (cv2.FAST(..., nms=True) parity)."""
    score = fast_score_map(img)
    score = jnp.where(score > threshold, score, 0.0)
    return nms_strict(score)
