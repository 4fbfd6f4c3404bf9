"""Asynchronous, interruptible global BA (reference: the GBA thread of
LoopClosing.cc:579,645-749 with the mbStopGBA abort protocol):

- the solve runs in a background thread in abortable chunks; the map lock
  is held only for assembly and write-back, so tracking never blocks for
  the duration of the solve;
- a second launch aborts the first (new loop arrives mid-GBA) without
  deadlocking even while the caller holds the map lock;
- keyframes created while the solve runs are corrected afterwards through
  their spanning-tree parent (relative pose preserved)."""
import threading
import time

import numpy as np

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import small_camera
from airdos_tpu.slam.ba_driver import GlobalBA
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


class _Ext:
    scales = tuple(1.2 ** i for i in range(4))
    sigma2 = np.asarray([1.2 ** (2 * i) for i in range(4)], np.float32)


def _build_map(rng, N=20, P=60, n_chips=1):
    """Corridor of N keyframes with noisy poses observing P points."""
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.device.n_chips = n_chips
    fx, fy, cx, cy, bf = (cfg.camera.fx, cfg.camera.fy, cfg.camera.cx,
                          cfg.camera.cy, cfg.camera.bf)
    m = SlamMap()
    pts_gt = np.stack([rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
                       rng.uniform(4, 20, P)], axis=1).astype(np.float32)
    gt_tcw = []
    n_slots = P
    for i in range(N):
        twc = np.array([0.02 * i, 0.0, 0.25 * i], np.float32)
        tcw_true = -twc
        gt_tcw.append(tcw_true)
        # noisy estimated pose (KF0 stays exact: it is the gauge anchor)
        noise = 0.0 if i == 0 else 0.05 * i / N
        tcw_est = tcw_true + rng.normal(0, noise, 3).astype(np.float32)
        fr = _FakeFrame(i, n_slots, np.eye(3, dtype=np.float32), tcw_est)
        # observations from the TRUE geometry
        xc = pts_gt + tcw_true
        z = xc[:, 2]
        fr.xy_un[:, 0] = fx * xc[:, 0] / z + cx
        fr.xy_un[:, 1] = fy * xc[:, 1] / z + cy
        fr.u_right[:] = fr.xy_un[:, 0] - bf / z
        kf = KeyFrame(i, fr)
        m.add_keyframe(kf)
        m.next_kf_id = i + 1
        if i == 0:
            pids = m.create_points(
                kf, np.arange(P),
                pts_gt + rng.normal(0, 0.05, pts_gt.shape).astype(np.float32))
        else:
            kf.parent = i - 1
            m.kfs[i - 1].children.add(i)
            for j, pid in enumerate(pids):
                m.add_observation(int(pid), kf, j)
    return cfg, m, pts_gt, gt_tcw, pids


import pytest


@pytest.mark.parametrize("n_chips", [1, 8])
def test_async_gba_runs_and_improves(rng, n_chips):
    """Both the single-chip and the SHARDED (8-device mesh) GBA run in
    abortable chunks off-thread — a pending abort can interrupt a running
    multi-chip solve between dispatches (mbStopGBA polling,
    Optimizer.cc:121-129)."""
    cfg, m, pts_gt, gt_tcw, pids = _build_map(rng, n_chips=n_chips)
    gba = GlobalBA(cfg, m, _Ext())
    lock = threading.Lock()
    err_before = np.mean([np.linalg.norm(m.kfs[i].tcw - gt_tcw[i])
                          for i in range(1, 20)])
    gba.launch(lock, n_iters=20)
    # "tracking" keeps acquiring the lock while GBA solves: it must never
    # block for the duration of the whole solve
    max_wait = 0.0
    for _ in range(20):
        t0 = time.perf_counter()
        with lock:
            pass
        max_wait = max(max_wait, time.perf_counter() - t0)
        time.sleep(0.01)
    gba.join()
    err_after = np.mean([np.linalg.norm(m.kfs[i].tcw - gt_tcw[i])
                         for i in range(1, 20)])
    assert err_after < 0.5 * err_before, (err_before, err_after)
    # lock was only ever held for assembly/write-back, not the solve
    assert max_wait < 2.0, max_wait


def test_new_keyframe_during_gba_gets_propagated(rng):
    cfg, m, pts_gt, gt_tcw, pids = _build_map(rng)
    gba = GlobalBA(cfg, m, _Ext())
    lock = threading.Lock()
    gba.launch(lock, n_iters=20)
    # insert a new KF mid-solve, child of the last solved one, with a
    # known relative pose
    with lock:
        last = m.kfs[19]
        rel_t = np.array([0.0, 0.0, -0.25], np.float32)
        fr = _FakeFrame(20, 4, np.eye(3, dtype=np.float32),
                        (last.tcw + rel_t).astype(np.float32))
        kf_new = KeyFrame(20, fr)
        m.add_keyframe(kf_new)
        m.next_kf_id = 21
        kf_new.parent = 19
        last.children.add(20)
    gba.join()
    # after write-back the new KF must keep its relative pose to the
    # (corrected) parent
    rel_after = m.kfs[20].tcw - m.kfs[19].tcw
    np.testing.assert_allclose(rel_after, rel_t, atol=1e-4)


@pytest.mark.parametrize("n_chips", [1, 8])
def test_second_launch_aborts_first_without_deadlock(rng, n_chips):
    cfg, m, pts_gt, gt_tcw, pids = _build_map(rng, n_chips=n_chips)
    gba = GlobalBA(cfg, m, _Ext())
    lock = threading.Lock()
    t0 = time.perf_counter()
    with lock:
        gba.launch(lock, n_iters=20)   # blocked on the lock we hold
        gba.launch(lock, n_iters=20)   # aborts the first — must not hang
    gba.join()
    assert time.perf_counter() - t0 < 120.0
    # the surviving run still wrote back an improved map
    err_after = np.mean([np.linalg.norm(m.kfs[i].tcw - gt_tcw[i])
                         for i in range(1, 20)])
    assert np.isfinite(err_after)
