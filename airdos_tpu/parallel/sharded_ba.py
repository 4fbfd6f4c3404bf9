"""Multi-chip sharded optimization steps.

The reference is single-node (its only parallelism is 4 OS threads,
System.cc:87-96).  The TPU-native scaling axis for this workload is
edge-parallel bundle adjustment and hypothesis-parallel RANSAC over an ICI
mesh: each device evaluates residuals/Jacobians for its shard of the edge
table, the tiny normal-equation system is psum-reduced over the mesh, and
the solve + state update happen replicated.  Communication is O(dim^2) per
iteration (a few KB) regardless of edge count — exactly the pattern that
rides ICI with XLA collectives instead of NCCL calls.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from airdos_tpu.geometry.se3 import se3_compose, se3_exp, so3_hat


def make_mesh(n_devices: int | None = None, axis: str = "edges") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _stereo_system(R, t, xw, obs, w, fx, fy, cx, cy, bf):
    """Edge-shard H (6x6) and b (6) for pose-only GN."""
    xc = jnp.einsum("ij,nj->ni", R, xw) + t
    x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    pred = jnp.stack([fx * x * iz + cx, fy * y * iz + cy,
                      fx * x * iz + cx - bf * iz], axis=-1)
    e = obs - pred
    zero = jnp.zeros_like(x)
    Jp = jnp.stack([
        jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
        jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        jnp.stack([fx * iz, zero, (-fx * x + bf) * iz2], axis=-1),
    ], axis=-2)
    Jxc = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), (xw.shape[0], 3, 3)),
        -so3_hat(xc)], axis=-1)
    J = -jnp.einsum("nij,njk->nik", Jp, Jxc)
    H = jnp.einsum("nik,n,nij->kj", J, w, J)
    b = -jnp.einsum("nik,n,ni->k", J, w, e)
    return H, b


def sharded_pose_optimize_step(mesh: Mesh, axis: str = "edges"):
    """Returns a jitted function (R, t, xw, obs, w) -> (R', t') performing
    one Gauss-Newton step with the edge table sharded over the mesh and the
    6x6 system psum-reduced over ICI."""

    def step(R, t, xw, obs, w, fx, fy, cx, cy, bf):
        def shard_fn(R, t, xw_s, obs_s, w_s):
            H, b = _stereo_system(R, t, xw_s, obs_s, w_s, fx, fy, cx, cy, bf)
            H = jax.lax.psum(H, axis)
            b = jax.lax.psum(b, axis)
            dx = jnp.linalg.solve(H + 1e-6 * jnp.eye(6, dtype=R.dtype), b)
            dR, dt = se3_exp(dx)
            return se3_compose(dR, dt, R, t)

        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()))(R, t, xw, obs, w)

    return jax.jit(step, static_argnames=())


def sharded_local_ba_step(mesh: Mesh, n_cams: int, axis: str = "edges"):
    """One damped GN step of multi-camera BA with landmarks eliminated
    locally per shard is not possible (points span shards), so this step
    shards the *edge Hessian assembly* of the reduced camera system:
    each device computes partial Hcc/bc for its edges with landmarks held
    fixed; psum yields the full system; cameras update replicated.
    (Landmark refinement alternates on-device; see solvers.local_ba for the
    single-chip full Schur path.)"""

    def step(cam_R, cam_t, cam_fixed, points, e_cam, e_pt, e_obs, e_w,
             fx, fy, cx, cy, bf):
        C = n_cams

        def shard_fn(cam_R, cam_t, cam_fixed, points, e_cam_s, e_pt_s,
                     e_obs_s, e_w_s):
            Rc = cam_R[e_cam_s]
            tc = cam_t[e_cam_s]
            xw = points[e_pt_s]
            xc = jnp.einsum("eij,ej->ei", Rc, xw) + tc
            x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]
            zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
            iz = 1.0 / zs
            iz2 = iz * iz
            pred = jnp.stack([fx * x * iz + cx, fy * y * iz + cy,
                              fx * x * iz + cx - bf * iz], axis=-1)
            e = e_obs_s - pred
            zero = jnp.zeros_like(x)
            Jp = jnp.stack([
                jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
                jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
                jnp.stack([fx * iz, zero, (-fx * x + bf) * iz2], axis=-1),
            ], axis=-2)
            Jxc = jnp.concatenate([
                jnp.broadcast_to(jnp.eye(3, dtype=cam_R.dtype),
                                 (xw.shape[0], 3, 3)),
                -so3_hat(xc)], axis=-1)
            Jc = -jnp.einsum("eij,ejk->eik", Jp, Jxc)
            Hcc = jnp.zeros((C, 6, 6), cam_R.dtype).at[e_cam_s].add(
                jnp.einsum("eik,e,eil->ekl", Jc, e_w_s, Jc))
            bc = jnp.zeros((C, 6), cam_R.dtype).at[e_cam_s].add(
                -jnp.einsum("eik,e,ei->ek", Jc, e_w_s, e))
            Hcc = jax.lax.psum(Hcc, axis)
            bc = jax.lax.psum(bc, axis)
            # freeze fixed cameras, solve block-diagonal (motion-only per
            # camera — the full coupled solve lives in solvers.local_ba)
            free = (~cam_fixed).astype(cam_R.dtype)
            Hcc = Hcc * free[:, None, None] + \
                jnp.eye(6, dtype=cam_R.dtype)[None] * (1.0 - free)[:, None, None]
            bc = bc * free[:, None]
            dx = jnp.linalg.solve(
                Hcc + 1e-5 * jnp.eye(6, dtype=cam_R.dtype)[None], bc[..., None])[..., 0]
            dR, dt = se3_exp(dx)
            return se3_compose(dR, dt, cam_R, cam_t)

        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()))(cam_R, cam_t, cam_fixed, points,
                                  e_cam, e_pt, e_obs, e_w)

    return jax.jit(step)
