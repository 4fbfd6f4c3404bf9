"""Pallas TPU kernels for the hot matching primitives.

The dense 256-bit Hamming matrix is the inner loop of every matcher
(stereo, projection, BoW).  The XLA formulation materialises an
[N, M, 8] xor tensor in HBM before reducing; this kernel keeps the
accumulation in VMEM tiles and streams the 8 descriptor words through the
VPU's popcount, one [TN, TM] tile per grid step.

Descriptors are passed transposed ([8, N] / [8, M] uint32) so every block
has a 128-lane last dimension (TPU tiling rule).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _hamming_kernel(a_ref, b_ref, o_ref):
    # a_ref: [8, TN] u32; b_ref: [8, TM] u32; o_ref: [TN, TM] i32
    acc = jnp.zeros((a_ref.shape[1], b_ref.shape[1]), jnp.int32)
    for k in range(8):
        a = a_ref[k, :][:, None]
        b = b_ref[k, :][None, :]
        acc = acc + jax.lax.population_count(
            jnp.bitwise_xor(a, b)).astype(jnp.int32)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(a_t: jnp.ndarray, b_t: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """a_t: [8, N] uint32 (transposed descriptors), b_t: [8, M].
    N and M must be multiples of 128.  Returns int32 [N, M]."""
    n = a_t.shape[1]
    m = b_t.shape[1]
    grid = (n // TILE, m // TILE)
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TILE), lambda i, j: (0, i),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(a_t, b_t)


def hamming_matrix_auto(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas tile kernel when shapes align on a TPU backend,
    XLA broadcast-reduce otherwise.  a: [N, 8], b: [M, 8] uint32."""
    n, m = a.shape[0], b.shape[0]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and n % TILE == 0 and m % TILE == 0:
        return hamming_matrix_pallas(a.T, b.T)
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
