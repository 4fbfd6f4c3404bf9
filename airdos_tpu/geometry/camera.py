"""Pinhole stereo camera model.

Covers the reference's camera usage: rectified-stereo projection producing
(u_left, v, u_right) measurements (cf. EdgeStereoSE3ProjectXYZ in the
reference's g2o types), stereo unprojection via depth = bf / disparity
(src/Frame.cc:1006-1020), radial-tangential keypoint undistortion
(src/Frame.cc:722-752), and frustum/bounds checks (src/Frame.cc:587-643).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from airdos_tpu.config import CameraConfig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StereoCamera:
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bf: jnp.ndarray           # baseline * fx (pixels·metres/metre)
    width: int = 640
    height: int = 360
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0

    # -- pytree plumbing -------------------------------------------------
    def tree_flatten(self):
        children = (self.fx, self.fy, self.cx, self.cy, self.bf)
        aux = (self.width, self.height, self.k1, self.k2, self.p1, self.p2, self.k3)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        fx, fy, cx, cy, bf = children
        w, h, k1, k2, p1, p2, k3 = aux
        return cls(fx, fy, cx, cy, bf, w, h, k1, k2, p1, p2, k3)

    # --------------------------------------------------------------------
    @classmethod
    def from_config(cls, cam: CameraConfig) -> "StereoCamera":
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f32(cam.fx), f32(cam.fy), f32(cam.cx), f32(cam.cy), f32(cam.bf),
                   cam.width, cam.height, cam.k1, cam.k2, cam.p1, cam.p2, cam.k3)

    @property
    def baseline(self):
        return self.bf / self.fx

    # --------------------------------------------------------------------
    def project(self, xc: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame points [..., 3] -> pixel coords [..., 2] (no distortion;
        the pipeline operates on undistorted keypoints like the reference)."""
        z = xc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = self.fx * xc[..., 0] * inv_z + self.cx
        v = self.fy * xc[..., 1] * inv_z + self.cy
        return jnp.stack([u, v], axis=-1)

    def project_stereo(self, xc: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame points [..., 3] -> (u, v, u_right) [..., 3]."""
        z = xc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = self.fx * xc[..., 0] * inv_z + self.cx
        v = self.fy * xc[..., 1] * inv_z + self.cy
        ur = u - self.bf * inv_z
        return jnp.stack([u, v, ur], axis=-1)

    def unproject(self, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """Pixels [..., 2] + depth [...] -> camera-frame points [..., 3]."""
        x = (uv[..., 0] - self.cx) * depth / self.fx
        y = (uv[..., 1] - self.cy) * depth / self.fy
        return jnp.stack([x, y, depth], axis=-1)

    def depth_from_disparity(self, disp: jnp.ndarray) -> jnp.ndarray:
        """disparity (u_left - u_right) -> depth; invalid (<=0) -> -1."""
        valid = disp > 1e-6
        return jnp.where(valid, self.bf / jnp.where(valid, disp, 1.0), -1.0)

    def disparity_from_depth(self, depth: jnp.ndarray) -> jnp.ndarray:
        valid = depth > 1e-6
        return jnp.where(valid, self.bf / jnp.where(valid, depth, 1.0), -1.0)

    def in_image(self, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
        u, v = uv[..., 0], uv[..., 1]
        return ((u >= margin) & (u < self.width - margin) &
                (v >= margin) & (v < self.height - margin))

    # -- distortion ------------------------------------------------------
    def distort(self, xn: jnp.ndarray) -> jnp.ndarray:
        """Normalized coords [..., 2] -> distorted normalized coords."""
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
        xd = x * radial + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        yd = y * radial + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return jnp.stack([xd, yd], axis=-1)

    def undistort_points(self, uv: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
        """Iteratively invert the distortion model (cv::undistortPoints
        semantics).  No-op when the model has no distortion."""
        if self.k1 == 0 and self.k2 == 0 and self.p1 == 0 and self.p2 == 0 and self.k3 == 0:
            return uv
        xn = jnp.stack([(uv[..., 0] - self.cx) / self.fx,
                        (uv[..., 1] - self.cy) / self.fy], axis=-1)

        def body(_, x):
            d = self.distort(x) - x          # distortion delta at current estimate
            return xn - d

        x_und = jax.lax.fori_loop(0, iters, body, xn)
        return jnp.stack([x_und[..., 0] * self.fx + self.cx,
                          x_und[..., 1] * self.fy + self.cy], axis=-1)
