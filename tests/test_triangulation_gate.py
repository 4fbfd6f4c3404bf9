"""Stereo triangulation short-baseline gate (reference
LocalMapping.cc:259-266: skip neighbor keyframes whose baseline is below
the stereo rig's own baseline mb = bf/fx)."""
import numpy as np

from airdos_tpu.config import SlamConfig
from airdos_tpu.io.synthetic import default_camera
from airdos_tpu.slam.ba_driver import Triangulator


class _Ext:
    scales = np.asarray([1.2 ** i for i in range(8)], np.float32)
    sigma2 = np.asarray([1.2 ** (2 * i) for i in range(8)], np.float32)


class _KF:
    def __init__(self, ow):
        self.Ow = np.asarray(ow, np.float32)


def test_baseline_gate():
    cfg = SlamConfig()
    cfg.camera = default_camera()        # bf/fx = 0.25 m stereo baseline
    tri = Triangulator(cfg, None, _Ext(), None)
    kf = _KF([0.0, 0.0, 0.0])
    # a 2 mm baseline pair (e.g. consecutive frames at 10 m scene depth)
    # must be skipped: it would triangulate pure noise
    assert not tri.baseline_ok(kf, _KF([0.002, 0.0, 0.0]))
    # a pair separated by at least the stereo baseline passes
    assert tri.baseline_ok(kf, _KF([0.0, 0.0, 0.26]))
    assert not tri.baseline_ok(kf, _KF([0.1, 0.0, 0.0]))
