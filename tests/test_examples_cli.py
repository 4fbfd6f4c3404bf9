"""CLI driver smoke test: the reference's only test shape is its example
binaries (SURVEY §4, Examples/Stereo/stereo_human.cc) — run the
stereo_human.py driver end-to-end over a synthetic sequence written in the
TartanAir-Shibuya directory layout, through the reference-format YAML."""
import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

from airdos_tpu.io.synthetic import SyntheticStereoWorld, small_camera

YAML = """%YAML:1.0
Camera.fx: 320.0
Camera.fy: 320.0
Camera.cx: 160.0
Camera.cy: 120.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 320
Camera.height: 240
Camera.fps: 5.0
Camera.bf: 80.0
Camera.RGB: 1
ThDepth: 30
ORBextractor.nFeatures: 600
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
ORBextractor.iniThFAST: 12
ORBextractor.minThFAST: 7
System.IsOffline: 1
System.IsMask: 0
Human.OK: 0
Optimizer.SigmaStatic: 1
Optimizer.IsHuber: 1
Device.MaxKeypoints: 1024
Device.MaxLocalKFs: 8
Device.MaxFixedKFs: 4
Device.MaxLocalPoints: 1024
Device.MaxBAEdges: 4096
Schedular.nStartImage: 0
Schedular.nEndImage: 0
"""


def test_stereo_human_cli_runs_synthetic_sequence(tmp_path):
    cv2 = pytest.importorskip("cv2")
    cam = small_camera()
    world = SyntheticStereoWorld(seed=0, n_points=200, cam=cam)
    n = 8
    seq = tmp_path / "seq"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir()
    ts_lines = []
    for i, (data, Rwc, twc) in enumerate(world.sequence(n, dt=0.1)):
        cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"),
                    data.image_left.astype(np.uint8))
        cv2.imwrite(str(seq / "image_1" / f"{i:06d}.png"),
                    data.image_right.astype(np.uint8))
        ts_lines.append(f"{data.timestamp:.6f}")
    (seq / "times.txt").write_text("\n".join(ts_lines) + "\n")

    yaml = tmp_path / "settings.yaml"
    yaml.write_text(YAML)
    traj = tmp_path / "traj.txt"
    dump = tmp_path / "dump"

    argv_saved = sys.argv
    sys.argv = ["stereo_human.py", str(yaml), str(seq), str(traj), str(dump)]
    try:
        with pytest.raises(SystemExit) as ex:
            runpy.run_path(str(Path("examples/stereo_human.py")),
                           run_name="__main__")
        assert ex.value.code == 0
    finally:
        sys.argv = argv_saved

    lines = traj.read_text().strip().splitlines()
    assert len(lines) >= n - 1
    assert len(lines[0].split()) == 8          # TUM 8-column
    # SaveMap dump written (Tracking::SaveMap schema)
    for f in ("KF.txt", "MP.txt", "Match.txt"):
        assert (dump / f).exists(), f
