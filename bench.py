"""Headline benchmark: back-end keyframe ingest throughput (KF/s per chip).

Measures the per-keyframe server compute path on device — the work the
reference does per ingested keyframe on a 16-vCPU server (BoW transform +
DBoW2 inverted-index query + 8-thread brute-force descriptor matching +
covisibility update, `communicator_be.cpp:181-205`, `kf_database.cpp:47-187`,
`placerec_be.cpp:63-113`) — re-expressed as batched TPU kernels:

  1. vocabulary assignment: Hamming matmul (F x V) + argmin -> tf-idf BoW
  2. retrieval: BoW matvec against the HBM-resident database + top-k
  3. descriptor matching vs the top candidate: Hamming matmul + mutual-NN
  4. covisibility weights: two segment-sums over the observation COO
  5. database row update

One jit'd `lax.scan` processes a batch of keyframes; KF/s = batch / time.

Baseline: the C++ server's per-KF pipeline costs ~20 ms single-stream
(DBoW2 transform ~5 ms + query + ThreadPool dense match ~10 ms on the
reference's 16-vCPU sizing, readme.md:264) => ~50 KF/s. `vs_baseline`
is measured KF/s / 50.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# shapes representative of the EuRoC 5-agent workload
N_FEAT = 512        # ORB features per keyframe
DESC_BYTES = 32     # 256-bit ORB
VOCAB = 1024        # vocabulary words
DB_KFS = 4096       # keyframes in the retrieval database
N_OBS = 65536       # observation COO length
N_LM = 16384
BATCH = 256         # keyframes per timed dispatch
TOPK = 10


def build_state(key):
    ks = jax.random.split(key, 6)
    vocab = jax.random.randint(ks[0], (VOCAB, DESC_BYTES), 0, 256, jnp.int32
                               ).astype(jnp.uint8)
    db_desc = jax.random.randint(ks[1], (DB_KFS, N_FEAT, DESC_BYTES), 0, 256,
                                 jnp.int32).astype(jnp.uint8)
    db_bow = jax.random.uniform(ks[2], (DB_KFS, VOCAB), jnp.float32)
    db_bow = db_bow / jnp.linalg.norm(db_bow, axis=-1, keepdims=True)
    queries = jax.random.randint(ks[3], (BATCH, N_FEAT, DESC_BYTES), 0, 256,
                                 jnp.int32).astype(jnp.uint8)
    obs_kf = jax.random.randint(ks[4], (N_OBS,), 0, DB_KFS, jnp.int32)
    obs_lm = jax.random.randint(ks[5], (N_OBS,), 0, N_LM, jnp.int32)
    return vocab, db_desc, db_bow, queries, obs_kf, obs_lm


def make_ingest_fn():
    from covins_tpu.ops import bow as bow_ops
    from covins_tpu.ops import descriptors as d_ops

    def one_kf(carry, q_desc):
        db_bow, db_desc, obs_kf, obs_lm, cursor = carry
        # 1. BoW transform (MXU Hamming against the vocabulary)
        dist_v = d_ops.hamming_distance(q_desc, VOCAB_U8, dtype=jnp.bfloat16)
        words = jnp.argmin(dist_v, axis=1).astype(jnp.int32)
        bowv = jnp.zeros(VOCAB, jnp.float32).at[words].add(1.0)
        bowv = bowv / jnp.maximum(jnp.linalg.norm(bowv), 1e-12)
        # 2. retrieval against the whole database + top-k
        scores = db_bow @ bowv
        top_s, top_i = jax.lax.top_k(scores, TOPK)
        cand = top_i[0]
        # 3. descriptor matching vs the best candidate
        cdesc = db_desc[cand]
        dist = d_ops.hamming_distance(q_desc, cdesc, dtype=jnp.bfloat16)
        midx = d_ops.match_mutual_nn(dist, max_dist=50.0)
        n_matches = jnp.sum(midx >= 0)
        # 4. covisibility weights of the candidate over the obs COO
        seen = jnp.zeros((N_LM,), jnp.int32).at[obs_lm].max(
            (obs_kf == cand).astype(jnp.int32))
        covis = jnp.zeros((DB_KFS,), jnp.int32).at[obs_kf].add(seen[obs_lm])
        # 5. insert the query into the database ring
        db_bow = jax.lax.dynamic_update_index_in_dim(db_bow, bowv, cursor, 0)
        db_desc = jax.lax.dynamic_update_index_in_dim(db_desc, q_desc, cursor, 0)
        cursor = (cursor + 1) % DB_KFS
        stats = (top_s[0], n_matches, covis.max())
        return (db_bow, db_desc, obs_kf, obs_lm, cursor), stats

    @jax.jit
    def ingest_batch(db_bow, db_desc, queries, obs_kf, obs_lm):
        carry = (db_bow, db_desc, obs_kf, obs_lm, jnp.asarray(0, jnp.int32))
        carry, stats = jax.lax.scan(one_kf, carry, queries)
        return carry[0], carry[1], stats

    return ingest_batch


def main():
    global VOCAB_U8
    key = jax.random.PRNGKey(0)
    vocab, db_desc, db_bow, queries, obs_kf, obs_lm = build_state(key)
    VOCAB_U8 = vocab
    ingest = make_ingest_fn()

    # warmup / compile
    out = ingest(db_bow, db_desc, queries, obs_kf, obs_lm)
    jax.block_until_ready(out)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ingest(db_bow, db_desc, queries, obs_kf, obs_lm)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    kfs_per_s = BATCH / dt

    baseline = 50.0  # C++ server per-KF pipeline estimate (see module doc)
    print(json.dumps({
        "metric": "backend_keyframe_ingest_throughput",
        "value": round(kfs_per_s, 2),
        "unit": "keyframes/s/chip",
        "vs_baseline": round(kfs_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
