"""EuRoC loader: opencv-matrix YAML parsing + rectification maps."""
import numpy as np
import pytest

from airdos_tpu.io.datasets import (EurocStereoSequence,
                                    read_opencv_yaml_matrices)

YAML = """%YAML:1.0
Camera.fx: 435.2046959714599
LEFT.height: 48
LEFT.width: 64
RIGHT.height: 48
RIGHT.width: 64
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28, 0.07, 0.0002, 0.00002, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [45.0, 0.0, 32.0, 0.0, 45.0, 24.0, 0.0, 0.0, 1.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1, 0, 0, 0, 1, 0, 0, 0, 1]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [43.0, 0, 32.0, 0, 0, 43.0, 24.0, 0, 0, 0, 1, 0]
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28, 0.07, 0.0002, 0.00002, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [45.5, 0.0, 32.0, 0.0, 45.5, 24.0, 0.0, 0.0, 1.0]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1, 0, 0, 0, 1, 0, 0, 0, 1]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [43.0, 0, 32.0, 0, 0, 43.0, 24.0, 0, 0, 0, 1, 0]
"""


def test_opencv_matrix_yaml(tmp_path):
    p = tmp_path / "euroc.yaml"
    p.write_text(YAML)
    c = read_opencv_yaml_matrices(p)
    assert c["LEFT.K"].shape == (3, 3)
    assert c["LEFT.K"][0, 0] == 45.0
    assert c["LEFT.P"].shape == (3, 4)
    assert c["LEFT.D"].shape == (1, 5)
    assert c["LEFT.height"] == 48
    assert abs(c["Camera.fx"] - 435.2046959714599) < 1e-9


def test_rectification_maps(tmp_path):
    cv2 = pytest.importorskip("cv2")
    p = tmp_path / "euroc.yaml"
    p.write_text(YAML)
    # dataset layout with one image pair
    ts = tmp_path / "ts.txt"
    ts.write_text("1000000000\n")
    for cam in ("cam0", "cam1"):
        d = tmp_path / "mav0" / cam / "data"
        d.mkdir(parents=True)
        im = (np.arange(48 * 64).reshape(48, 64) % 251).astype(np.uint8)
        cv2.imwrite(str(d / "1000000000.png"), im)
    seq = EurocStereoSequence(tmp_path, ts, settings_yaml=p)
    fd = seq[0]
    assert fd.image_left is not None and fd.image_left.shape == (48, 64)
    assert fd.image_right is not None
    # rectified output differs from the raw (distortion was applied)
    raw = cv2.imread(str(tmp_path / "mav0/cam0/data/1000000000.png"),
                     cv2.IMREAD_GRAYSCALE).astype(np.float32)
    assert not np.allclose(fd.image_left, raw)


def test_missing_rect_blocks_raise(tmp_path):
    pytest.importorskip("cv2")
    p = tmp_path / "bad.yaml"
    p.write_text("%YAML:1.0\nCamera.fx: 400.0\n")
    ts = tmp_path / "ts.txt"
    ts.write_text("5\n")
    with pytest.raises(ValueError):
        EurocStereoSequence(tmp_path, ts, settings_yaml=p)
