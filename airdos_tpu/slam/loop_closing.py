"""Loop detection and correction.

Rebuild of LoopClosing (reference: src/LoopClosing.cc): BoW candidate
detection with 3-consecutive covisibility-group consistency (103-229),
per-candidate Sim3 computation — SearchByBoW >= 20 matches -> Sim3 RANSAC
-> guided re-match -> OptimizeSim3 >= 20 inliers -> loop-neighborhood
projection >= 40 (231-400) — and loop correction: propagate the corrected
Sim3 through covisible KFs, correct their points, fuse duplicates, optimize
the essential graph, then (in the reference, in a thread; here inline)
global bundle adjustment (402-749).

In the reference this runs as its own OS thread in online mode only
(System.cc:173-174) so tracking and mapping proceed while a Sim3 is being
computed.  Here the System drives ``process()`` from the mapping worker
(online) or inline (offline), and the same non-blocking property is
recovered through lock granularity: detection and Sim3 computation take
the shared map lock only around their short host-side map reads and
RELEASE it across every device dispatch; only ``correct()`` — the actual
map surgery — runs under the lock for its whole duration.  The tracking
thread therefore never waits on a loop closure longer than one host map
section or the final correction itself.
"""
from __future__ import annotations

import contextlib
from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from airdos_tpu.config import SlamConfig
from airdos_tpu.utils.gate import gate_wait
from airdos_tpu.matching.bow_match import match_by_bow
from airdos_tpu.matching.projection import match_local_points
from airdos_tpu.matching.sim3_match import match_by_sim3
from airdos_tpu.slam.keyframe_db import KeyFrameDatabase
from airdos_tpu.slam.map import KeyFrame, SlamMap
from airdos_tpu.solvers.pose_graph import optimize_essential_graph
from airdos_tpu.solvers.sim3 import optimize_sim3, sim3_ransac


class LoopCloser:
    def __init__(self, config: SlamConfig, slam_map: SlamMap,
                 db: KeyFrameDatabase, extractor, fuser=None, global_ba=None,
                 map_lock=None):
        self.config = config
        self.map = slam_map
        self.db = db
        self.fuser = fuser
        self.global_ba = global_ba
        # online mode: run GBA concurrently like the reference's GBA thread
        # (LoopClosing.cc:579); offline mode stays synchronous/deterministic
        self.async_gba = not config.system.is_offline
        self.map_lock = map_lock
        cam = config.camera
        self.fx, self.fy, self.cx, self.cy, self.bf = \
            cam.fx, cam.fy, cam.cx, cam.cy, cam.bf
        self.sigma2 = extractor.sigma2
        self.consistency_th = 3
        self._consistent_groups: List[Tuple[Set[int], int]] = []
        self._last_loop_kf = -1e9
        self._jit_bow = jax.jit(match_by_bow, static_argnames=("check_rotation",))
        self._jit_sim3_match = jax.jit(match_by_sim3)
        self._jit_proj = jax.jit(match_local_points,
                                 static_argnames=("n_levels",))
        self.scale_factors = np.asarray(extractor.scales, np.float32)
        self.log_scale = float(np.log(config.orb.scale_factor))
        self.n_levels = config.orb.n_levels
        self.width, self.height = cam.width, cam.height
        self.rng = np.random.default_rng(0)
        self.gate = None          # online: see utils/gate.py
        self.n_loops_closed = 0
        # sticky-bucket shapes for the essential-graph solve: repeat
        # closures on a growing map reuse the compiled program instead of
        # recompiling at every new (K, E)
        from airdos_tpu.slam.ba_driver import _StickyBucket
        self._kb = _StickyBucket(32, 4096)
        self._epb = _StickyBucket(128, 1 << 16)

    def _lockctx(self):
        return self.map_lock if self.map_lock is not None \
            else contextlib.nullcontext()

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
        """Returns (R12, t12, s12, matches {fid_kf: pid}) or None.

        Takes the map lock only around host-side map reads; every device
        dispatch (BoW match, Sim3 RANSAC, OptimizeSim3, projection match)
        runs with the lock released, so online tracking/mapping proceed
        during the expensive parts (the reference gets the same overlap
        from LoopClosing's dedicated thread, System.cc:173-174)."""
        lock = self._lockctx()
        with lock:
            ckf = self.map.kfs.get(cand_id)
            if ckf is None or ckf.bad:
                return None
            self.db.ensure_bow(kf)
            self.db.ensure_bow(ckf)
        # feature arrays (descriptors, BoW nodes, angles) are immutable
        # after KF construction — the match dispatch needs no lock
        gate_wait(self.gate)          # tracking dispatches first
        m = self._jit_bow(jnp.asarray(kf.desc32), jnp.asarray(kf.feat_nodes),
                          jnp.asarray(kf.valid), jnp.asarray(kf.angle),
                          jnp.asarray(ckf.desc32), jnp.asarray(ckf.feat_nodes),
                          jnp.asarray(ckf.valid), jnp.asarray(ckf.angle))
        idx2 = np.asarray(m.idx2)
        pt = self.map.points

        def pair_arrays(prs):
            """Camera-frame points + per-feature sigma2 for (f1, f2, p1, p2)
            pair rows (feature ids index octaves; point ids index positions).
            Caller must hold the map lock (reads poses + point table)."""
            f1 = [p[0] for p in prs]
            f2 = [p[1] for p in prs]
            x1 = np.asarray([kf.Rcw @ pt.pos[p1] + kf.tcw
                             for _, _, p1, _ in prs], np.float32)
            x2 = np.asarray([ckf.Rcw @ pt.pos[p2] + ckf.tcw
                             for _, _, _, p2 in prs], np.float32)
            return x1, x2, self.sigma2[kf.octave[f1]], self.sigma2[ckf.octave[f2]]

        with lock:
            pairs = []
            for f1 in np.nonzero(idx2 >= 0)[0]:
                f2 = int(idx2[f1])
                p1 = int(kf.mp_idx[f1])
                p2 = int(ckf.mp_idx[f2])
                if p1 >= 0 and p2 >= 0 and not pt.bad[p1] and not pt.bad[p2]:
                    pairs.append((f1, f2, p1, p2))
            if len(pairs) < 20:
                return None
            n = len(pairs)
            x1, x2, s1, s2 = pair_arrays(pairs)
        n_hyp = self.config.device.ransac_hypotheses
        samples = self.rng.integers(0, n, (n_hyp, 3)).astype(np.int32)
        res = sim3_ransac(jnp.asarray(x1), jnp.asarray(x2),
                          jnp.ones(n, bool), jnp.asarray(samples),
                          jnp.asarray(9.21 * s1), jnp.asarray(9.21 * s2),
                          self.fx, self.fy, self.cx, self.cy, fix_scale=True)
        n_inl, Rr, tr, sr = jax.device_get(
            (res.n_inliers, res.R, res.t, res.s))
        if int(n_inl) < 12:
            return None

        # --- SearchBySim3: grow matches through the RANSAC Sim3 ----------
        # (reference ORBmatcher::SearchBySim3, ORBmatcher.cc:1102-1326)
        grown = self._search_by_sim3(kf, ckf, Rr, tr, float(sr),
                                     {p[0] for p in pairs},
                                     {p[3] for p in pairs})

        with lock:
            # a point culled while the lock was released drops its pair
            pairs = [p for p in pairs + grown
                     if not pt.bad[p[2]] and not pt.bad[p[3]]]
            if len(pairs) < 20:
                return None
            n = len(pairs)
            x1, x2, s1, s2 = pair_arrays(pairs)
            obs1 = kf.xy_un[[p[0] for p in pairs]].astype(np.float32)
            obs2 = ckf.xy_un[[p[1] for p in pairs]].astype(np.float32)
        valid0 = np.ones(n, bool)
        R, t, s, inl, n_in = optimize_sim3(
            res.R, res.t, res.s,
            jnp.asarray(x1), jnp.asarray(obs1), jnp.asarray(s1),
            jnp.asarray(x2), jnp.asarray(obs2), jnp.asarray(s2),
            jnp.asarray(valid0), self.fx, self.fy, self.cx, self.cy)
        if int(n_in) < 20:
            return None
        R, t, s = np.asarray(R), np.asarray(t), float(s)
        matches = {p[0]: p[3] for p, keep in zip(pairs, np.asarray(inl)) if keep}

        # --- loop-neighborhood projection gate ---------------------------
        # gather the candidate group's points and project them into the
        # current KF through the corrected Scw; demand >= 40 total matches
        # (reference LoopClosing.cc:350-390)
        with lock:
            loop_points = self._gather_loop_points(ckf)
        n_total, proj_matches = self._project_loop_points(
            kf, loop_points, R, t, s, ckf, matches)
        if n_total < 40:
            return None
        matches.update(proj_matches)
        return (R, t, s, matches, cand_id, loop_points)

    def _search_by_sim3(self, kf: KeyFrame, ckf: KeyFrame,
                        R12, t12, s12,
                        matched_f1: Set[int], matched_p2: Set[int]):
        """Grow (f1, f2, p1, p2) pairs via mutual Sim3 projection."""
        pt = self.map.points

        def point_tables(k, skip_pid):
            n = k.n_slots
            x = np.zeros((n, 3), np.float32)
            desc = np.zeros((n, 8), np.uint32)
            maxd = np.zeros(n, np.float32)
            val = np.zeros(n, bool)
            rows = np.nonzero(k.mp_idx >= 0)[0]
            for fid in rows:
                pid = int(k.mp_idx[fid])
                if pt.bad[pid] or pid in skip_pid:
                    continue
                x[fid] = k.Rcw @ pt.pos[pid] + k.tcw    # own camera frame
                desc[fid] = pt.desc32[pid]
                maxd[fid] = pt.max_dist[pid]
                val[fid] = True
            return x, desc, maxd, val

        with self._lockctx():
            x1c, desc1, maxd1, val1 = point_tables(kf, set())
            x2c, desc2, maxd2, val2 = point_tables(ckf, matched_p2)
        val1 &= ~np.isin(np.arange(kf.n_slots), list(matched_f1))
        # transform: KF2 points -> cam1 via S12; KF1 points -> cam2 via S21
        x2_in_c1 = s12 * (x2c @ R12.T) + t12
        x1_in_c2 = ((x1c - t12) @ R12) / s12
        gate_wait(self.gate)          # tracking dispatches first
        m = self._jit_sim3_match(
            jnp.asarray(x2_in_c1), jnp.asarray(val2), jnp.asarray(desc2),
            jnp.asarray(maxd2),
            jnp.asarray(x1_in_c2), jnp.asarray(val1), jnp.asarray(desc1),
            jnp.asarray(maxd1),
            jnp.asarray(kf.xy_un), jnp.asarray(kf.octave),
            jnp.asarray(kf.desc32), jnp.asarray(kf.valid),
            jnp.asarray(ckf.xy_un), jnp.asarray(ckf.octave),
            jnp.asarray(ckf.desc32), jnp.asarray(ckf.valid),
            self.fx, self.fy, self.cx, self.cy, self.width, self.height,
            jnp.asarray(self.scale_factors), self.log_scale, self.n_levels)
        idx2 = np.asarray(m.idx2_of_1)
        grown = []
        with self._lockctx():
            for f1 in np.nonzero(idx2 >= 0)[0]:
                f1 = int(f1)
                f2 = int(idx2[f1])
                p1 = int(kf.mp_idx[f1])
                p2 = int(ckf.mp_idx[f2])
                if p1 >= 0 and p2 >= 0 and not pt.bad[p1] \
                        and not pt.bad[p2] \
                        and f1 not in matched_f1 and p2 not in matched_p2:
                    grown.append((f1, f2, p1, p2))
        return grown

    def _gather_loop_points(self, ckf: KeyFrame) -> List[int]:
        """Candidate KF + its covisible neighbours' map points
        (reference LoopClosing.cc:350-368 mvpLoopMapPoints)."""
        pt = self.map.points
        out, seen = [], set()
        for kid in [ckf.id] + list(ckf.ordered_covis):
            k = self.map.kfs.get(kid)
            if k is None or k.bad:
                continue
            for pid in k.mp_idx[k.mp_idx >= 0]:
                p = int(pid)
                if p not in seen and not pt.bad[p]:
                    seen.add(p)
                    out.append(p)
        return out

    def _project_loop_points(self, kf: KeyFrame, loop_points: List[int],
                             R12, t12, s12, ckf: KeyFrame,
                             matches: Dict[int, int]):
        """SearchByProjection of the loop points through the corrected Scw
        (th=10); returns (total match count, {fid: pid} new projections)."""
        pt = self.map.points
        # corrected current-KF pose: Scw = S12 * T2w (scale folded into t)
        Rcw = (R12 @ ckf.Rcw).astype(np.float32)
        tcw = (s12 * (R12 @ ckf.tcw) + t12).astype(np.float32)
        ow = (-Rcw.T @ tcw / max(s12, 1e-9)).astype(np.float32)

        matched_pids = set(matches.values())
        with self._lockctx():
            cand = [p for p in loop_points
                    if p not in matched_pids and not pt.bad[p]]
            if not cand:
                return len(matches), {}
            n = len(cand)
            ids = np.asarray(cand)
            xw = pt.pos[ids].astype(np.float32)
            desc = pt.desc32[ids]
            normal = pt.normal[ids].astype(np.float32)
            mind = pt.min_dist[ids].astype(np.float32)
            maxd = pt.max_dist[ids].astype(np.float32)
        taken = np.zeros(kf.n_slots, bool)
        for fid in matches:
            taken[fid] = True
        gate_wait(self.gate)          # tracking dispatches first
        out = self._jit_proj(
            jnp.asarray(xw), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(normal), jnp.asarray(maxd), jnp.asarray(mind),
            jnp.asarray(Rcw), jnp.asarray(tcw), jnp.asarray(ow),
            jnp.asarray(kf.xy_un), jnp.asarray(kf.u_right),
            jnp.asarray(kf.octave), jnp.asarray(kf.desc32),
            jnp.asarray(kf.valid), jnp.asarray(taken),
            self.fx, self.fy, self.cx, self.cy, self.bf,
            self.width, self.height,
            jnp.asarray(self.scale_factors), self.log_scale,
            self.n_levels, 10.0)
        feat_idx = np.asarray(out.feat_idx)
        proj = {}
        for i in np.nonzero(feat_idx >= 0)[0]:
            fid = int(feat_idx[i])
            if fid not in matches and fid not in proj:
                proj[fid] = int(ids[i])
        return len(matches) + len(proj), proj

    # ------------------------------------------------------- correct loop
    def correct(self, kf: KeyFrame, sim3_result) -> bool:
        """CorrectLoop (reference LoopClosing.cc:402-749).

        Locking (the caller must NOT hold the map lock): the map surgery —
        pose propagation to the covisible group, loop-point merging,
        SearchAndFuse, essential-graph assembly — runs under the lock; the
        essential-graph device solve runs UNLOCKED on the assembled
        snapshot; the write-back re-acquires the lock and propagates the
        correction to keyframes/points created while the solve ran through
        their parents (the reference's mTcwBefGBA spanning-tree walk,
        LoopClosing.cc:682-743, applied to the pose graph)."""
        import jax as _jax
        lock = self._lockctx()
        R12, t12, s12, matches, cand_id, loop_points = sim3_result
        # pre-warm the SearchAndFuse program OUTSIDE the lock: the first
        # closure otherwise compiles it while tracking is blocked
        if self.fuser is not None:
            self.fuser.warmup(len(loop_points))
        with lock:
            problem = self._correct_map(kf, sim3_result)
        if problem is None:
            return False
        index, R0, t0, fixed, e_i, e_j, Rm, tm = problem

        # ---- essential-graph solve: unlocked, bucket-padded shapes ----
        K, E = len(R0), len(e_i)
        Kp = self._kb.fit(K)
        Ep = self._epb.fit(E)
        kf_R = np.tile(np.eye(3, dtype=np.float32), (Kp, 1, 1))
        kf_t = np.zeros((Kp, 3), np.float32)
        kf_R[:K] = R0
        kf_t[:K] = t0
        fx = np.ones(Kp, bool)
        fx[:K] = fixed
        ei = np.zeros(Ep, np.int32)
        ej = np.zeros(Ep, np.int32)
        eR = np.tile(np.eye(3, dtype=np.float32), (Ep, 1, 1))
        et = np.zeros((Ep, 3), np.float32)
        ev = np.zeros(Ep, bool)
        ei[:E], ej[:E], eR[:E], et[:E], ev[:E] = \
            e_i, e_j, np.stack(Rm), np.stack(tm), True
        R_sol, t_sol, _ = optimize_essential_graph(
            jnp.asarray(kf_R), jnp.asarray(kf_t),
            jnp.ones(Kp, jnp.float32), jnp.asarray(fx),
            jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(eR), jnp.asarray(et),
            jnp.ones(Ep, jnp.float32), jnp.asarray(ev))
        R_out, t_out = _jax.device_get((R_sol, t_sol))
        R_out, t_out = np.asarray(R_out)[:K], np.asarray(t_out)[:K]

        with lock:
            self._write_back_pose_graph(kf, cand_id, index, R0, t0,
                                        R_out, t_out)
            kf.loop_edges.add(cand_id)
            ckf2 = self.map.kfs.get(cand_id)
            if ckf2 is not None:       # culled while the solve ran
                ckf2.loop_edges.add(kf.id)
            self._last_loop_kf = kf.id
            self.n_loops_closed += 1
            from airdos_tpu.utils.obs import get_logger
            get_logger().emit("loop_closed", kf=kf.id, candidate=cand_id,
                              n_matches=len(matches),
                              n_loop_points=len(loop_points))
            if self.global_ba is not None:
                if self.async_gba and self.map_lock is not None:
                    # a new loop aborts any GBA already running
                    # (LoopClosing.cc:435-446), then spawns a fresh one
                    self.global_ba.launch(self.map_lock)
                else:
                    self.global_ba()
        return True

    def _correct_map(self, kf: KeyFrame, sim3_result):
        """Map surgery under the lock: propagate the corrected Sim3 to the
        covisible group + their points, merge/fuse loop points, assemble
        the essential-graph problem.  Returns (index, R0, t0, fixed, e_i,
        e_j, Rm, tm) or None."""
        R12, t12, s12, matches, cand_id, loop_points = sim3_result
        ckf = self.map.kfs.get(cand_id)
        if kf.bad or ckf is None or ckf.bad:
            return None
        m = self.map
        pt = m.points

        # snapshot NON-corrected poses of every keyframe: essential-graph
        # edge measurements must come from the pre-correction geometry
        # (reference NonCorrectedSim3, LoopClosing.cc:438-567,
        # Optimizer.cc:2330-2400) — otherwise every residual starts at zero
        # and the pose graph is a no-op
        live = sorted((k for k in m.kfs.values() if not k.bad),
                      key=lambda k: k.id)
        nc_R = {k.id: k.Rcw.copy() for k in live}
        nc_t = {k.id: k.tcw.copy() for k in live}

        # corrected pose of kf: T_kf<-world = S12 * T_cand<-world
        # (S12 maps points in ckf's camera frame into kf's camera frame;
        # scale = 1 for stereo)
        Rcw_new = R12 @ ckf.Rcw
        tcw_new = s12 * (R12 @ ckf.tcw) + t12

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

        # SearchAndFuse: project the loop-neighborhood points into every
        # corrected-group KF and fuse, loop points winning conflicts
        # (reference LoopClosing::SearchAndFuse, LoopClosing.cc:587,
        # ORBmatcher::Fuse(Scw), ORBmatcher.cc:290-403)
        if self.fuser is not None:
            for gid in group:
                gkf = m.kfs.get(gid)
                if gkf is not None and not gkf.bad:
                    self.fuser._fuse_into(loop_points, gkf,
                                          prefer_candidates=True)
            m.update_connections(kf)

        # essential-graph optimization over all keyframes: vertices start at
        # the CURRENT (group-corrected) poses, measurements come from the
        # NON-corrected snapshot; only the new loop edge uses corrected ones
        kfs = live
        index = {k.id: i for i, k in enumerate(kfs)}
        K = len(kfs)
        kf_R = np.stack([k.Rcw for k in kfs]).astype(np.float32)
        kf_t = np.stack([k.tcw for k in kfs]).astype(np.float32)
        fixed = np.zeros(K, bool)
        fixed[index[cand_id]] = True
        e_i, e_j, Rm, tm = [], [], [], []
        added = set()

        def add_edge(a, b, corrected=False):
            if a == b or (a, b) in added or (b, a) in added:
                return
            ia, ib = index.get(a), index.get(b)
            if ia is None or ib is None:
                return
            added.add((a, b))
            if corrected:
                Ra, ta = kf_R[ia], kf_t[ia]
                Rb, tb = kf_R[ib], kf_t[ib]
            else:
                Ra, ta = nc_R[a], nc_t[a]
                Rb, tb = nc_R[b], nc_t[b]
            Rrel = Rb @ Ra.T
            trel = tb - Rrel @ ta
            e_i.append(ia)
            e_j.append(ib)
            Rm.append(Rrel)
            tm.append(trel)

        add_edge(kf.id, cand_id, corrected=True)   # the new loop edge
        for k in kfs:
            if k.parent is not None:
                add_edge(k.id, k.parent)
            for nid, wgt in k.covis.items():
                if wgt >= 100:
                    add_edge(k.id, nid)
            for lid in k.loop_edges:
                add_edge(k.id, lid)
        if len(e_i) < 2:
            return None
        return (index, kf_R, kf_t, fixed,
                np.asarray(e_i, np.int32), np.asarray(e_j, np.int32),
                Rm, tm)

    def _write_back_pose_graph(self, kf: KeyFrame, cand_id: int, index,
                               R0, t0, R_out, t_out):
        """Apply the essential-graph solution under the lock.  Keyframes
        created while the solve ran (online mode) are corrected through
        their parents; points through their reference keyframes."""
        m = self.map
        pt = m.points
        old_pose = {kid: (R0[i], t0[i]) for kid, i in index.items()}
        new_pose = {kid: (R_out[i], t_out[i]) for kid, i in index.items()}
        # children have larger ids than parents, so increasing-id order
        # guarantees the parent is corrected first
        for k in sorted((k for k in m.kfs.values() if not k.bad),
                        key=lambda k: k.id):
            if k.id in new_pose:
                continue
            old_pose[k.id] = (k.Rcw.copy(), k.tcw.copy())
            par = k.parent
            if par is None or par not in new_pose:
                new_pose[k.id] = (k.Rcw.copy(), k.tcw.copy())
                continue
            Rp_o, tp_o = old_pose[par]
            Rp_n, tp_n = new_pose[par]
            # Tcp = Tcw_old * Twp_old ; Tcw_new = Tcp * Tpw_new
            Rcp = k.Rcw @ Rp_o.T
            tcp = k.tcw - Rcp @ tp_o
            new_pose[k.id] = (Rcp @ Rp_n, Rcp @ tp_n + tcp)

        # correct points via their reference keyframes (batched)
        live = np.asarray(list(pt.live_ids()), np.int64)
        if live.size:
            ids_all = np.asarray(sorted(new_pose), np.int64)
            max_id = int(ids_all.max())
            lut = np.full(max_id + 2, -1, np.int64)
            lut[ids_all] = np.arange(len(ids_all))
            refs = pt.ref_kf[live].astype(np.int64)
            refs = np.where((refs >= 0) & (refs <= max_id), refs, max_id + 1)
            ki = lut[refs]
            sel = ki >= 0
            live, ki = live[sel], ki[sel]
            R_old = np.stack([old_pose[k][0] for k in ids_all])
            t_old = np.stack([old_pose[k][1] for k in ids_all])
            R_new = np.stack([new_pose[k][0] for k in ids_all])
            t_new = np.stack([new_pose[k][1] for k in ids_all])
            xc = np.einsum("nij,nj->ni", R_old[ki], pt.pos[live]) + t_old[ki]
            pt.pos[live] = np.einsum(
                "nji,nj->ni", R_new[ki], xc - t_new[ki])
        for k in m.kfs.values():
            if not k.bad and k.id in new_pose:
                k.set_pose(*new_pose[k.id])

    # ---------------------------------------------------------------- run
    def process(self, kf: KeyFrame) -> bool:
        """Full DetectLoop -> ComputeSim3 -> CorrectLoop pass for one KF.

        Locking: the caller must NOT hold the map lock.  Detection and the
        final correction take it; Sim3 computation locks fine-grained
        around its host map reads (device dispatches run unlocked)."""
        with self._lockctx():
            cands = self.detect(kf)
        for cand in cands:
            res = self.compute_sim3(kf, cand)
            if res is not None:
                # correct() manages the lock itself (solve runs unlocked)
                return self.correct(kf, res)
        return False
