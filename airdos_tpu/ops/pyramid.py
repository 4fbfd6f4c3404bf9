"""Scale pyramid with parallel mask pyramid.

Behavioral equivalent of the reference's ComputePyramid
(ORBextractor.cc:1121-1156): ``n_levels`` levels at scale factor ~1.2, and —
the AirDOS modification — a segmentation-mask pyramid where the level-0 mask
is eroded 10x10 before downscaling, so dynamic (human) regions are excluded
from FAST with a safety margin.

Level shapes are static Python ints (computed from the level-0 shape at trace
time) so everything jits with fixed shapes.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from airdos_tpu.ops.filters import erode, resize_bilinear

# Keypoints are only detected this many pixels inside each level (the
# reference's EDGE_THRESHOLD=19 ensures the 31x31 descriptor patch fits).
PYRAMID_EDGE = 19


def level_shapes(h: int, w: int, n_levels: int, scale_factor: float) -> List[Tuple[int, int]]:
    shapes = []
    for lvl in range(n_levels):
        s = 1.0 / (scale_factor ** lvl)
        shapes.append((int(round(h * s)), int(round(w * s))))
    return shapes


class Pyramid(NamedTuple):
    images: Tuple[jnp.ndarray, ...]          # per-level [h_l, w_l] float32
    masks: Tuple[jnp.ndarray, ...]           # per-level [h_l, w_l] float32 (1 = usable)
    scales: Tuple[float, ...]                # scale of each level (>= 1: factor ** lvl)


def build_pyramid(img: jnp.ndarray,
                  mask: Optional[jnp.ndarray],
                  n_levels: int = 8,
                  scale_factor: float = 1.2,
                  mask_erode: int = 10) -> Pyramid:
    """img: [H, W] float32.  mask: [H, W] with 1 = usable pixel (static), or
    None for no masking."""
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale_factor)
    if mask is None:
        m0 = jnp.ones((h, w), jnp.float32)
    else:
        m0 = erode(mask.astype(jnp.float32), mask_erode)
    images = [img]
    masks = [m0]
    for lvl in range(1, n_levels):
        hl, wl = shapes[lvl]
        # Resize from the previous level (reference resizes level-to-level).
        images.append(resize_bilinear(images[-1], hl, wl))
        masks.append((resize_bilinear(masks[-1], hl, wl) > 0.999).astype(jnp.float32))
    scales = tuple(scale_factor ** lvl for lvl in range(n_levels))
    return Pyramid(tuple(images), tuple(masks), scales)
