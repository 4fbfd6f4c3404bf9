"""Intensity-centroid keypoint orientation (rBRIEF's IC angle).

The reference computes per-keypoint circular-patch moments with hand-rolled
row loops (ORBextractor.cc IC_Angle, 78-105).  TPU-native formulation: the
patch moments m10 and m01 are *convolutions* of the image with fixed
weight kernels (dx and dy over the circular patch), so we compute dense
moment maps once per level on the MXU/VPU and gather them at keypoint
locations — no per-keypoint loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # reference: HALF_PATCH_SIZE (ORBextractor.cc:74)


@functools.lru_cache(maxsize=1)
def _umax() -> np.ndarray:
    """Per-row circular patch half-width, exactly as the reference builds it
    (ORBextractor.cc:456-471): symmetric Bresenham circle of radius 15."""
    umax = np.zeros(HALF_PATCH + 2, np.int32)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax[:HALF_PATCH + 1]


@functools.lru_cache(maxsize=1)
def _moment_kernels() -> tuple:
    """31x31 kernels K10[dy, dx] = dx, K01[dy, dx] = dy over the circular
    patch |dx| <= umax[|dy|]."""
    umax = _umax()
    size = 2 * HALF_PATCH + 1
    k10 = np.zeros((size, size), np.float32)
    k01 = np.zeros((size, size), np.float32)
    for dy in range(-HALF_PATCH, HALF_PATCH + 1):
        u = umax[abs(dy)]
        for dx in range(-u, u + 1):
            k10[dy + HALF_PATCH, dx + HALF_PATCH] = dx
            k01[dy + HALF_PATCH, dx + HALF_PATCH] = dy
    return k10, k01


def ic_angle_maps(img: jnp.ndarray) -> tuple:
    """Dense moment maps (m10, m01), each [H, W] float32.
    out[y, x] = sum over circular patch of weight * img[y+dy, x+dx].

    NOTE: single-channel 31x31 convolutions tile terribly on the MXU
    (~100 ms/level on v5e) — prefer ``keypoint_angles`` which gathers
    patches only at the (few hundred) keypoints."""
    k10, k01 = _moment_kernels()
    k = jnp.stack([jnp.asarray(k10), jnp.asarray(k01)])[:, None]   # [2,1,31,31]
    x = img[None, None]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[0, 0], out[0, 1]


def sample_angles(m10_map: jnp.ndarray, m01_map: jnp.ndarray,
                  xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Gather angles (degrees, [0, 360) like cv::fastAtan2) at integer
    keypoint coords.  xs, ys: [N] int32."""
    m10 = m10_map[ys, xs]
    m01 = m01_map[ys, xs]
    ang = jnp.degrees(jnp.arctan2(m01, m10))
    return jnp.where(ang < 0, ang + 360.0, ang)


def keypoint_angles(img: jnp.ndarray, xs: jnp.ndarray,
                    ys: jnp.ndarray) -> jnp.ndarray:
    """IC angles computed only at keypoints.

    Keypoints are guaranteed >= MIN_BORDER=16 > HALF_PATCH from the image
    edge by the extractor; padded slots (xs=ys=0) produce garbage angles
    that are masked by the validity flags downstream.

    Two lowerings, chosen at trace time:
    - CPU: gather each 31x31 patch and contract with the moment kernels
      (pointer-chasing gathers are what CPUs are good at).
    - TPU: XLA lowers vmapped 2-D gathers to per-element scalar gathers
      (~17 ms/frame measured on v5e across levels) — instead select the
      31 patch rows with a one-hot matmul on the MXU and reduce with
      iota-derived dx/|dx|<=umax masks, zero gathers."""
    if jax.default_backend() == "cpu":
        return _angles_gather(img, xs, ys)
    return _angles_onehot(img, xs, ys)


def _angles_gather(img, xs, ys):
    k10, k01 = _moment_kernels()
    h, w = img.shape
    dy = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)
    gy = jnp.clip(ys[:, None] + dy[None, :], 0, h - 1)           # [N, 31]
    gx = jnp.clip(xs[:, None] + dy[None, :], 0, w - 1)           # [N, 31]
    patch = img[gy[:, :, None], gx[:, None, :]]                  # [N, 31, 31]
    kk = jnp.stack([jnp.asarray(k10), jnp.asarray(k01)])         # [2, 31, 31]
    m = jnp.einsum("nij,kij->nk", patch, kk)                     # [N, 2]
    ang = jnp.degrees(jnp.arctan2(m[:, 1], m[:, 0]))
    return jnp.where(ang < 0, ang + 360.0, ang)


def _angles_onehot(img, xs, ys):
    h, w = img.shape
    n = xs.shape[0]
    size = 2 * HALF_PATCH + 1
    dy = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)
    gy = jnp.clip(ys[:, None] + dy[None, :], 0, h - 1)           # [N, 31]
    hh = jax.lax.broadcasted_iota(jnp.int32, (n * size, h), 1)
    onehot = (hh == gy.reshape(-1)[:, None]).astype(img.dtype)
    rows = (onehot @ img).reshape(n, size, w)                    # [N, 31, W]
    ww = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    dx = ww - xs[:, None, None]                                  # [N, 1, W]
    u = jnp.asarray(_umax())[jnp.abs(dy)]                        # [31]
    mask = (jnp.abs(dx) <= u[None, :, None]).astype(img.dtype)
    m10 = jnp.sum(rows * (dx.astype(img.dtype) * mask), axis=(1, 2))
    m01 = jnp.sum(rows * (dy.astype(img.dtype)[None, :, None] * mask),
                  axis=(1, 2))
    ang = jnp.degrees(jnp.arctan2(m01, m10))
    return jnp.where(ang < 0, ang + 360.0, ang)
