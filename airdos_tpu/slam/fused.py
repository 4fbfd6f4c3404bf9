"""Fused per-frame device programs.

Each tracking stage (projection matching -> association gather -> pose-only
LM) is one jit program, so a tracked frame costs ~3 device dispatches
instead of dozens — critical when the TPU sits behind a high-latency
transport, and good for XLA fusion regardless.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from airdos_tpu.matching.projection import match_last_frame, match_local_points
from airdos_tpu.solvers.pose_opt import pose_optimize


class TrackStepResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    point_of_feat: jnp.ndarray   # [N] source index (-1 none); post-opt inliers only
    n_matches: jnp.ndarray       # matches before optimization
    n_real_inliers: jnp.ndarray  # inliers to real map points


def motion_model_step(xw_p, desc_p, oct_p, ang_p, valid_p, real_p,
                      R0, t0,
                      feat_xy_un, feat_ur, feat_oct, feat_ang, feat_desc,
                      feat_valid, inv_sigma2_feat,
                      fx, fy, cx, cy, bf, width, height,
                      scale_factors, th, forward, backward) -> TrackStepResult:
    """SearchByProjection(cur, last, th) + PoseOptimization, fused."""
    taken = jnp.zeros(feat_xy_un.shape[0], bool)
    m = match_last_frame(xw_p, desc_p, oct_p, ang_p, valid_p,
                         R0, t0, feat_xy_un, feat_ur, feat_oct, feat_ang,
                         feat_desc, feat_valid, taken,
                         fx, fy, cx, cy, bf, width, height,
                         scale_factors, th, forward, backward)
    pof = m.point_of_feat
    has = pof >= 0
    src = jnp.maximum(pof, 0)
    xw = xw_p[src]
    obs = jnp.concatenate([feat_xy_un, feat_ur[:, None]], axis=1)
    res = pose_optimize(R0, t0, xw, obs, inv_sigma2_feat, has,
                        fx, fy, cx, cy, bf)
    inl = res.inlier & has
    n_real = jnp.sum(inl & real_p[src]).astype(jnp.int32)
    return TrackStepResult(R=res.R, t=res.t,
                           point_of_feat=jnp.where(inl, pof, -1),
                           n_matches=m.n_matches, n_real_inliers=n_real)


def local_map_step(xw_c, desc_c, valid_c, normal_c, maxd_c, mind_c,
                   exist_xw, exist_valid, exist_real,
                   R0, t0, ow,
                   feat_xy_un, feat_ur, feat_oct, feat_desc, feat_valid,
                   inv_sigma2_feat,
                   fx, fy, cx, cy, bf, width, height,
                   scale_factors, log_scale, n_levels, th) -> TrackStepResult:
    """SearchLocalPoints + PoseOptimization (TrackLocalMap), fused.

    exist_xw/exist_valid: the frame's current associations (by feature).
    Returns point_of_feat for NEW candidate matches only; inliers of
    existing associations are reported via n_real_inliers and the caller
    re-checks with the returned pose."""
    m = match_local_points(xw_c, desc_c, valid_c, normal_c, maxd_c, mind_c,
                           R0, t0, ow,
                           feat_xy_un, feat_ur, feat_oct, feat_desc,
                           feat_valid, exist_valid,
                           fx, fy, cx, cy, bf, width, height,
                           scale_factors, log_scale, n_levels, th)
    pof = m.point_of_feat
    cand_has = pof >= 0
    src = jnp.maximum(pof, 0)
    xw = jnp.where(exist_valid[:, None], exist_xw, xw_c[src])
    valid = exist_valid | cand_has
    obs = jnp.concatenate([feat_xy_un, feat_ur[:, None]], axis=1)
    res = pose_optimize(R0, t0, xw, obs, inv_sigma2_feat, valid,
                        fx, fy, cx, cy, bf)
    inl = res.inlier & valid
    is_real = jnp.where(exist_valid, exist_real, cand_has)
    n_real = jnp.sum(inl & is_real).astype(jnp.int32)
    # inlier mask for existing associations is folded into point_of_feat:
    # -2 marks "existing association is an outlier, drop it"
    pof_out = jnp.where(cand_has & inl, pof,
                        jnp.where(exist_valid & ~inl, -2, -1))
    return TrackStepResult(R=res.R, t=res.t, point_of_feat=pof_out,
                           n_matches=m.n_matches, n_real_inliers=n_real)
