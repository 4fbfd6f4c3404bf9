"""Loop correction on a fabricated drifted keyframe chain (no images):
CorrectLoop must distribute the closure over the whole trajectory through
the essential graph — measurements from NON-corrected poses (reference
NonCorrectedSim3; a regression here makes the pose graph a no-op and
leaves the drift discontinuity at the covisible-group boundary)."""
import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import small_camera
from airdos_tpu.slam.loop_closing import LoopCloser
from airdos_tpu.slam.map import KeyFrame, SlamMap


class _FakeFrame:
    def __init__(self, idx, n_slots, Rcw, tcw):
        self.index = idx
        self.timestamp = idx * 0.5
        self.xy = np.zeros((n_slots, 2), np.float32)
        self.xy_un = np.zeros((n_slots, 2), np.float32)
        self.octave = np.zeros(n_slots, np.int32)
        self.angle = np.zeros(n_slots, np.float32)
        self.response = np.ones(n_slots, np.float32)
        self.desc32 = np.zeros((n_slots, 8), np.uint32)
        self.u_right = np.full(n_slots, -1.0, np.float32)
        self.depth = np.full(n_slots, -1.0, np.float32)
        self.valid = np.ones(n_slots, bool)
        self.mp_idx = np.full(n_slots, -1, np.int64)
        self.Rcw = Rcw.astype(np.float32)
        self.tcw = tcw.astype(np.float32)


def _yaw(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def test_loop_correction_distributes_drift():
    cfg = SlamConfig()
    cfg.camera = small_camera()
    m = SlamMap()
    N = 24
    n_slots = 8

    # true poses on a circle; estimated poses accumulate yaw+translation
    # drift that reaches ~0.6 m / 6 deg at the loop end
    true_Rcw, true_tcw = [], []
    est_Rcw, est_tcw = [], []
    for i in range(N):
        th = 2 * np.pi * i / N
        Rwc = _yaw(th)
        twc = np.array([4 * (1 - np.cos(th)), 0.0, 4 * np.sin(th)])
        Rcw = Rwc.T
        tcw = -Rcw @ twc
        true_Rcw.append(Rcw)
        true_tcw.append(tcw.astype(np.float32))
        frac = i / (N - 1)
        dR = _yaw(0.1 * frac)
        d_t = np.array([0.6 * frac, 0.1 * frac, 0.3 * frac], np.float32)
        est_Rcw.append((dR @ Rcw).astype(np.float32))
        est_tcw.append((dR @ tcw + d_t).astype(np.float32))

    # keyframes with a parent chain and consecutive covisibility >= 100
    for i in range(N):
        kf = KeyFrame(i, _FakeFrame(i, n_slots, est_Rcw[i], est_tcw[i]))
        m.add_keyframe(kf)
        m.next_kf_id = i + 1
        if i > 0:
            kf.parent = i - 1
            m.kfs[i - 1].children.add(i)
            kf.covis = {i - 1: 150}
            m.kfs[i - 1].covis[i] = 150
            kf.ordered_covis = [i - 1]
            m.kfs[i - 1].ordered_covis.append(i)

    # a few map points anchored to each keyframe (world positions from the
    # ESTIMATED geometry so correction moves them consistently)
    for i in range(N):
        kf = m.kfs[i]
        pos = (-kf.Rcw.T @ kf.tcw)[None, :] + \
            np.asarray([[0.0, 0.0, 2.0 + 0.1 * j] for j in range(3)])
        pids = m.create_points(kf, np.arange(3), pos.astype(np.float32))

    class _DummyVoc:
        def score(self, a, b):
            return 0.0

    class _DummyDB:
        voc = _DummyVoc()

        def ensure_bow(self, kf):
            pass

        def add(self, kf):
            pass

    class _Ext:
        scales = tuple(1.2 ** i for i in range(4))
        sigma2 = np.asarray([1.2 ** (2 * i) for i in range(4)], np.float32)

    lc = LoopCloser(cfg, m, _DummyDB(), _Ext())

    # loop: last KF revisits KF0.  S12 maps cand-camera -> kf-camera using
    # the TRUE relative geometry (what ComputeSim3 would estimate).
    kf = m.kfs[N - 1]
    cand = m.kfs[0]
    R12 = true_Rcw[N - 1] @ cand.Rcw.T           # cand pose is drift-free
    t12 = true_tcw[N - 1] - R12 @ cand.tcw

    # measurements implied by the pre-correction (drifted) geometry — the
    # essential graph must preserve these relative poses while absorbing
    # the loop discontinuity
    meas = []
    for i in range(1, N):
        Ra, ta = m.kfs[i - 1].Rcw, m.kfs[i - 1].tcw
        Rb, tb = m.kfs[i].Rcw, m.kfs[i].tcw
        Rrel = Rb @ Ra.T
        meas.append((Rrel, tb - Rrel @ ta))
    pose_before = [m.kfs[i].tcw.copy() for i in range(N)]

    ok = lc.correct(kf, (R12.astype(np.float32), t12.astype(np.float32),
                         1.0, {}, 0, []))
    assert ok
    err_after = [np.linalg.norm(m.kfs[i].tcw - true_tcw[i]) for i in range(N)]

    # the loop keyframe snaps to its corrected (true) pose
    assert err_after[N - 1] < 0.1, err_after[N - 1]
    # no discontinuity survives: every chain edge's relative translation
    # stays close to its odometry measurement (the pre-fix no-op essential
    # graph left the whole ~0.6 m loop error on one edge at the covisible-
    # group boundary)
    max_res = 0.0
    for i in range(1, N):
        Rr = m.kfs[i].Rcw @ m.kfs[i - 1].Rcw.T
        tr = m.kfs[i].tcw - Rr @ m.kfs[i - 1].tcw
        max_res = max(max_res, float(np.linalg.norm(tr - meas[i - 1][1])))
    assert max_res < 0.08, max_res
    # the correction propagates beyond the rigidly-shifted covisible group:
    # mid-chain keyframes (not covisible with kf) actually moved
    mid_moved = [np.linalg.norm(m.kfs[i].tcw - pose_before[i])
                 for i in range(N // 3, 2 * N // 3)]
    assert np.mean(mid_moved) > 0.05, np.mean(mid_moved)
    # loop edge recorded both ways
    assert 0 in kf.loop_edges and (N - 1) in m.kfs[0].loop_edges
