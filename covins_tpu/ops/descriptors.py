"""Batched descriptor distance + matching kernels — the framework's
north-star compute path.

Replaces the reference's threaded brute-force matcher stack
(`covins_backend/src/dense_matcher/` ThreadPool + DenseMatcher,
`src/matcher/*` matching algorithms, and the Hamming popcount loop in
`feature_matcher_be.cpp:49-64`) with a single MXU-shaped formulation:

    Hamming(a, b) = (nbits - <±1(a), ±1(b)>) / 2

Binary descriptors are unpacked to ±1 and multiplied on the MXU with f32
accumulation — products are ±1 so the result is EXACT integer Hamming
distance, at matmul throughput.  SIFT (COVINS-G) uses the standard
||a||² + ||b||² - 2ab L2 expansion, also a matmul.

Matching post-processing (mutual nearest-neighbor, Lowe ratio test,
absolute distance gate) is vectorized argmin/gather — no per-point loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ORB_BYTES = 32  # 256-bit ORB/BRIEF descriptors (config: feat.desc_length)


def unpack_to_pm1(desc_u8, dtype=jnp.float32):
    """(N, B) uint8 -> (N, 8B) in {-1, +1}: bit=1 -> +1, bit=0 -> -1.

    Bit order: byte-major, LSB-first within each byte (consistent between
    both operands, so any fixed order gives correct distances).
    """
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_u8[..., :, None] >> shifts[None, :]) & 1  # (N, B, 8)
    bits = bits.reshape(desc_u8.shape[:-1] + (desc_u8.shape[-1] * 8,))
    return (bits.astype(dtype) * 2 - 1).astype(dtype)


def hamming_distance(a_u8, b_u8, dtype=jnp.float32):
    """(M, B) x (N, B) uint8 -> (M, N) int32 exact Hamming distance.

    MXU path: unpack to ±1, matmul with f32 accumulation.  On TPU pass
    dtype=jnp.bfloat16 for full MXU rate (±1 and sums ≤ 4096 are exact
    in the f32 accumulator regardless of input dtype).
    """
    nbits = a_u8.shape[-1] * 8
    a = unpack_to_pm1(a_u8, dtype)
    b = unpack_to_pm1(b_u8, dtype)
    dot = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((a.ndim - 1,), (b.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return ((nbits - dot) * 0.5).astype(jnp.int32)


def hamming_distance_best(a_u8, b_u8, dtype=jnp.bfloat16):
    """Hamming distance for the PRODUCT hot paths (vocabulary assignment,
    retrieval-database scoring, dense matching): the unpack-±1 bf16
    matmul, unconditionally.

    A Pallas packed-descriptor kernel (keep descriptors packed in HBM,
    unpack to ±1 tiles in VMEM, contract on the MXU) was A/B-tested
    against this path for three rounds and DELETED in round 5: at the
    retrieval-realistic 65536x1024x256-bit shape it measured 3.19 ms vs
    3.23 ms (1.01x, BENCH_r05) — XLA's own unpack+matmul fusion already
    covers the traffic the kernel was built to save, and the kernel added
    a compile-churn surface for no win.  If a future shape regime makes
    packed HBM residency matter (databases >> VMEM), revisit with a
    fused unpack+popcount+top-k design rather than a distance-matrix
    kernel (see BENCH_r04/r05 hamming_ab for the evidence trail).
    """
    return hamming_distance(a_u8, b_u8, dtype=dtype)


def hamming_distance_xor(a_u8, b_u8):
    """Reference implementation: XOR + popcount over uint32 words."""
    a32 = jax.lax.bitcast_convert_type(
        a_u8.reshape(a_u8.shape[0], -1, 4), jnp.uint32
    ).reshape(a_u8.shape[0], -1)
    b32 = jax.lax.bitcast_convert_type(
        b_u8.reshape(b_u8.shape[0], -1, 4), jnp.uint32
    ).reshape(b_u8.shape[0], -1)
    x = jax.lax.population_count(a32[:, None, :] ^ b32[None, :, :])
    return jnp.sum(x, axis=-1).astype(jnp.int32)


def l2_distance_sq(a, b):
    """(M, D) x (N, D) float -> (M, N) squared L2 distance via matmul."""
    aa = jnp.sum(a * a, axis=-1, keepdims=True)  # (M, 1)
    bb = jnp.sum(b * b, axis=-1, keepdims=True).T  # (1, N)
    ab = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(aa + bb - 2.0 * ab, 0.0)


BIG = jnp.int32(2**30)


def masked_dist(dist, row_mask=None, col_mask=None, big=None):
    """Fill masked rows/cols with a large sentinel so argmin ignores them."""
    if big is None:
        big = jnp.asarray(BIG, dist.dtype)
    if row_mask is not None:
        dist = jnp.where(row_mask[:, None], dist, big)
    if col_mask is not None:
        dist = jnp.where(col_mask[None, :], dist, big)
    return dist


def knn2(dist):
    """Best and second-best along axis=1.

    Returns (idx_best (M,), d_best (M,), d_second (M,)).
    """
    neg = -dist.astype(jnp.float32)
    top2, idx2 = jax.lax.top_k(neg, 2)
    return idx2[:, 0], (-top2[:, 0]).astype(dist.dtype), (-top2[:, 1]).astype(dist.dtype)


def match_ratio(dist, max_dist, ratio):
    """knn2 + Lowe ratio + absolute gate (COVINS-G matching semantics,
    `placerec_gen_be.cpp:82-126`: BFMatcher knn2, dist < max_dist,
    d1 < ratio * d2).

    Returns idx (M,) int32 — column index of the match or -1.
    """
    idx, d1, d2 = knn2(dist)
    ok = (d1.astype(jnp.float32) < max_dist) & (
        d1.astype(jnp.float32) < ratio * d2.astype(jnp.float32)
    )
    return jnp.where(ok, idx, -1)


def match_mutual_nn(dist, max_dist):
    """Mutual nearest-neighbor matching with absolute distance gate
    (the DenseMatcher best-pair assignment semantics,
    `DenseMatcher.cpp:62-105`, without the greedy recursion: mutual-NN is
    the order-free equivalent).

    Returns idx (M,) int32 — column index or -1.
    """
    fwd = jnp.argmin(dist, axis=1)  # (M,)
    bwd = jnp.argmin(dist, axis=0)  # (N,)
    m = jnp.arange(dist.shape[0])
    mutual = bwd[fwd] == m
    dbest = dist[m, fwd]
    ok = mutual & (dbest.astype(jnp.float32) < max_dist)
    return jnp.where(ok, fwd, -1)


def match_mutual_nn_ratio(dist, max_dist, ratio):
    """Mutual NN + ratio + absolute gates combined."""
    idx_r = match_ratio(dist, max_dist, ratio)
    idx_m = match_mutual_nn(dist, max_dist)
    return jnp.where((idx_r == idx_m) & (idx_r >= 0), idx_r, -1)
