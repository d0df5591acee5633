"""Pallas TPU kernel: batched Hamming distance over packed binary descriptors.

The descriptor database stays packed in HBM (32 bytes per ORB descriptor
instead of 256/512 bytes unpacked) and is unpacked to ±1 tiles in VMEM
inside the kernel, then contracted on the MXU:

    D[i, j] = (nbits - sum_k pm1(a)[k, i] * pm1(b)[k, j]) / 2

This is the TPU-native replacement for the reference's 8-thread brute-force
Hamming matcher (`covins_backend/src/dense_matcher/`, ThreadPool.hpp:57-95)
and the popcount loop in `feature_matcher_be.cpp:49-64`.

Layout: descriptors are stored TRANSPOSED, shape (BYTES, N) uint8, so the
large N dimension lies on TPU lanes (128-wide) and the tiny BYTES dimension
on sublanes.  The in-kernel unpack expands sublanes BYTES -> 8*BYTES.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unpack_pm1_T(tile_u8, dtype):
    """(BYTES, T) uint8 -> (8*BYTES, T) ±1 values of ``dtype``.

    Row order: bit b of byte k lands at row 8*k + b (byte-major, LSB-first)
    — matches `descriptors.unpack_to_pm1` applied to the transpose.
    """
    nbytes, t = tile_u8.shape
    # Mosaic can't shift or cast i8 vectors directly; widen to i32 first.
    x = tile_u8.astype(jnp.int32)
    planes = [((x >> b) & 1) for b in range(8)]  # 8 x (BYTES, T)
    stacked = jnp.stack(planes, axis=1)  # (BYTES, 8, T)
    bits = stacked.reshape(nbytes * 8, t)
    return (bits * 2 - 1).astype(dtype)


def _hamming_kernel(a_ref, b_ref, out_ref, *, nbits, dtype):
    a = _unpack_pm1_T(a_ref[:], dtype)  # (nbits, BM)
    b = _unpack_pm1_T(b_ref[:], dtype)  # (nbits, BN)
    dot = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BM, BN)
    out_ref[:] = ((nbits - dot) * 0.5).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def hamming_distance_packed_T(
    a_t_u8,
    b_t_u8,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
):
    """Hamming distances from TRANSPOSED packed descriptors.

    Args:
      a_t_u8: (BYTES, M) uint8 — query descriptors, transposed.
      b_t_u8: (BYTES, N) uint8 — database descriptors, transposed.
      block_m, block_n: output tile sizes (M, N must be divisible; pad
        with `pad_transposed` first).
      interpret: run in interpreter mode (CPU tests).

    Returns: (M, N) int32 exact Hamming distances.
    """
    nbytes, m = a_t_u8.shape
    _, n = b_t_u8.shape
    nbits = nbytes * 8
    assert m % block_m == 0 and n % block_n == 0, (m, n, block_m, block_n)
    dtype = jnp.float32 if interpret else jnp.bfloat16

    grid = (m // block_m, n // block_n)
    return pl.pallas_call(
        functools.partial(_hamming_kernel, nbits=nbits, dtype=dtype),
        grid=grid,
        in_specs=[
            # NOTE: the leading block index is `i * 0`, not the literal 0 —
            # under jax_enable_x64 a Python 0 traces as i64 while program
            # ids stay i32, and Mosaic rejects the mixed-type index map
            # (`func.return (i64, i32)` legalization failure).
            pl.BlockSpec(
                (nbytes, block_m), lambda i, j: (i * 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nbytes, block_n), lambda i, j: (j * 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * nbits,
            bytes_accessed=m * nbytes + n * nbytes + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_t_u8, b_t_u8)


def pad_transposed(desc_u8, multiple):
    """(N, BYTES) uint8 -> transposed (BYTES, N_pad) with zero padding and
    the original count. Zero-padded columns produce garbage distances —
    mask them out downstream (they are at indices >= n)."""
    n, nbytes = desc_u8.shape
    n_pad = -(-n // multiple) * multiple
    out = jnp.zeros((nbytes, n_pad), jnp.uint8)
    out = out.at[:, :n].set(desc_u8.T)
    return out, n


def hamming_distance_auto(a_u8, b_u8, block_m=256, block_n=512):
    """Convenience wrapper: row-major packed inputs, auto padding, auto
    interpret-mode on non-TPU backends. Returns (M, N) int32."""
    interpret = jax.default_backend() != "tpu"
    a_t, m = pad_transposed(a_u8, block_m)
    b_t, n = pad_transposed(b_u8, block_n)
    d = hamming_distance_packed_T(
        a_t, b_t, block_m=block_m, block_n=block_n, interpret=interpret
    )
    return d[:m, :n]
