"""Online loop closing must not stall the tracking thread (VERDICT r4 #3).

The reference runs DetectLoop -> ComputeSim3 -> CorrectLoop in a dedicated
thread (System.cc:173-174, LoopClosing.cc:57-88) so tracking proceeds
while a Sim3 is being computed.  This rebuild runs loop closing on the
mapping worker, and recovers the same property through lock granularity:
detection + Sim3 hold the shared map lock only for short host-side map
reads (every device dispatch runs unlocked); only correct() — the actual
map surgery — holds the lock throughout.

This test drives the pillar-orbit loop world ONLINE, waits for a genuine
image-level loop closure mid-run, and asserts the tracking thread's
per-frame time around the closure stays within a small factor of the
run median (before the fix the whole detect+Sim3+correct pass sat inside
the map lock, stalling tracking for its full multi-dispatch duration)."""
import numpy as np
import pytest

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.io.tum import ate_rmse
from airdos_tpu.slam.system import System


@pytest.mark.slow
def test_online_loop_closure_does_not_stall_tracking():
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.camera.fps = 5.0
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.human.ok = False
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    cfg.system.is_offline = False        # mapping worker thread ON
    cfg.enable_loop_closing = True

    world = SyntheticStereoWorld(seed=1, n_points=300, cam=cfg.camera,
                                 centered=True, world_size=(16.0, 3.0, 16.0),
                                 clear_ring=(1.35, 0.0, 1.35, 0.7),
                                 ring_outside_only=True, room_radius=4.5,
                                 pillar=(1.35, 0.0, 0.55, 8))
    slam = System(cfg)
    N = 110
    Rwc, twc = world.orbit_loop_trajectory(N, radius=1.35, laps=1.6)
    for i in range(N):
        data = world.frame(i, Rwc[i], twc[i], i * 0.2, with_humans=False)
        slam.track_stereo(data)
    assert slam.tracking.state.name == "OK"
    slam.shutdown()

    assert slam.loop_closer.n_loops_closed >= 1

    frames = slam.events.events("frame")
    loops = slam.events.events("loop_closed")
    assert frames and loops
    # skip the compile-bearing head of the run for the median
    times = np.asarray([f["track_s"] for f in frames])
    stamps = np.asarray([f["t"] for f in frames])
    warm = times[20:]
    med = float(np.median(warm))

    # tracking frames that overlapped a loop-closure pass: from a little
    # before the closure event landed to a little after
    stalled = []
    for ev in loops:
        sel = (stamps > ev["t"] - 8.0) & (stamps < ev["t"] + 2.0)
        sel[:20] = False
        stalled.extend(times[sel].tolist())
    if stalled:      # loop may close during shutdown drain on slow CI
        worst = max(stalled)
        # detect+Sim3 run unlocked; only correct() (one essential-graph
        # dispatch + host write-back) can block a frame
        assert worst < max(3.0 * med, med + 0.5), (worst, med)

    ts, _, twc_e = slam.tracking.trajectory_tum()
    err = float(ate_rmse(twc_e, np.asarray(twc)[: len(twc_e)]))
    assert err < 0.15, err
