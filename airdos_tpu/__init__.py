"""airdos_tpu — TPU-native stereo dynamic SLAM framework.

A ground-up rebuild of the capabilities of AirDOS (haleqiu/AirDOS, ICRA 2022:
stereo dynamic visual SLAM with articulated human trajectory optimization),
designed TPU-first:

- Host Python owns the sequential state machine (tracking states, map
  bookkeeping, covisibility graphs) — tiny, pointer-rich, latency-bound.
- The TPU owns every dense per-frame computation (image pyramid, FAST,
  rBRIEF descriptors, Hamming matching, stereo disparity) and every
  iterative-numeric inner loop (pose-only LM, local bundle adjustment with
  Schur complement, dynamic human-trajectory BA, vmapped RANSAC solvers)
  as jit-compiled XLA/Pallas programs with static shapes.

Public API mirrors the reference surface (src/System.h:75-149):
``System``, ``track_stereo``, ``track_stereo_human``, ``shutdown``,
``save_trajectory_tum`` with identical 8-column output.
"""

__version__ = "0.1.0"

from airdos_tpu.config import SlamConfig  # noqa: F401
