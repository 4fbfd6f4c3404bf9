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

import os as _os

import jax as _jax

if _os.environ.get("AIRDOS_TPU_DISABLE_COMPILE_CACHE") != "1":
    # persistent XLA compilation cache: first compile of each program is
    # slow (~seconds); every later process reuses it
    try:
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                           "/tmp/airdos_jax_cache"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

# SLAM estimation is cancellation-heavy (Schur complements subtract
# near-equal ~1e7-magnitude normal-equation blocks down to ~1e4).  The
# MXU's default matmul precision (bf16 passes, ~3e-3 relative error on f32
# contractions) makes the bundle-adjustment steps diverge, so full-f32
# matmul precision is the framework default.  Hot image-plane kernels that
# tolerate bf16 opt down locally via precision= / dot_general.
try:
    _jax.config.update("jax_default_matmul_precision", "highest")
except Exception:
    pass

from airdos_tpu.config import SlamConfig  # noqa: F401
