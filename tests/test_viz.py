"""FrameDrawer overlay + map figure rendering (reference FrameDrawer.cc /
MapDrawer.cc surfaces)."""
import numpy as np

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera
from airdos_tpu.slam.system import System
from airdos_tpu.viz.frame_drawer import draw_frame, save_frame_overlay
from airdos_tpu.viz.viewer import Viewer


def test_frame_overlay_and_map_figure(tmp_path):
    cfg = SlamConfig()
    cfg.camera = small_camera()
    cfg.orb.n_features = 600
    cfg.orb.n_levels = 4
    cfg.device.max_keypoints = 1024
    cfg.device.max_local_kfs = 8
    cfg.device.max_fixed_kfs = 4
    cfg.device.max_local_points = 1024
    cfg.device.max_ba_edges = 4096
    world = SyntheticStereoWorld(seed=0, n_points=200, cam=cfg.camera)
    slam = System(cfg)
    viewer = Viewer(slam.map, slam.tracking)
    frame = None
    for data, _, _ in world.sequence(6, dt=0.1):
        frame = slam.track_stereo(data)
        if data.index >= 4:          # exercise update without per-frame cost
            viewer.update(frame)

    img = draw_frame(frame, slam.tracking.state.name,
                     slam.map.n_keyframes(), slam.map.n_points(),
                     image=data.image_left)
    h, w = data.image_left.shape
    assert img.shape == (h, w, 3) and img.dtype == np.uint8
    # green match boxes were drawn
    green = (img[..., 1] > 180) & (img[..., 0] < 100)
    assert green.sum() > 50
    out = tmp_path / "overlay.ppm"
    save_frame_overlay(str(out), frame, image=data.image_left)
    assert out.exists() and out.stat().st_size > 100

    fig = tmp_path / "map.png"
    viewer.save_map_figure(str(fig))
    assert fig.exists() and fig.stat().st_size > 1000
    slam.shutdown()


def test_depth_map_matches_geometry():
    """The synthetic z-buffer depth is consistent with stereo geometry on
    billboard pixels (validates the IsGroundTruthDepth test fixture)."""
    cam = small_camera()
    world = SyntheticStereoWorld(seed=0, n_points=0, cam=cam)
    Rwc, twc = world.trajectory(1, 0.1)
    data = world.frame(0, Rwc[0], twc[0], 0.0, with_humans=False,
                       with_depth=True)
    zb = data.depth
    assert zb is not None and zb.shape == data.image_left.shape
    # ground-plane rows (bottom of image, below any billboard): depth must
    # equal the analytic ground distance 1.6 / y_dir
    v = zb.shape[0] - 5
    u = np.arange(10, zb.shape[1] - 10, 25)
    y_dir = (v - cam.cy) / cam.fy
    # ray length t satisfies y: t * y_dir = 1.6
    t_exp = 1.6 / y_dir
    got = zb[v, u]
    mask = got > 0
    assert mask.mean() > 0.8
    np.testing.assert_allclose(got[mask], t_exp, rtol=0.08)
