"""Place-recognition retrieval: binary-descriptor vocabulary + batched
keyframe similarity scoring.

TPU-native replacement for DBoW2's vocabulary tree + inverted-file index
(`covins_backend/thirdparty/DBoW2`, used by `KeyframeDatabase`,
`covins_backend/src/covins_backend/kf_database.cpp:41-187`).  Instead of a
pointer-chasing tree and an inverted index, we keep:

* a flat vocabulary of K binary word centers (trained by Hamming k-medians,
  or imported), assignment = one Hamming-matmul + argmin;
* per-keyframe tf-idf BoW vectors, L2-normalized, stored as a dense
  (N_kf, K) matrix resident in HBM;
* retrieval = one (K,) x (N_kf, K)^T matmul -> cosine scores + top-k.
  Cosine on L2-normalized tf-idf is monotonically equivalent to DBoW2's
  L1 score ranking for retrieval purposes; `common_words` (for the
  min-common-words gate) comes from a binarized dot product.

Everything is fixed-shape and jit-friendly; the database matrix grows by
capacity doubling on the host side (see `models/map_store.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from covins_tpu.ops import descriptors as desc


def train_vocabulary(descs_u8, k=1024, iters=8, seed=0):
    """Hamming k-medians over binary descriptors -> (k, BYTES) uint8 words.

    Bitwise majority vote as the cluster-center update (the binary analog
    of the k-means mean).  Deterministic given `seed`.
    """
    n, nbytes = descs_u8.shape
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (k,), replace=n < k)
    centers = descs_u8[init_idx]
    bits = jnp.unpackbits(descs_u8, axis=-1).astype(jnp.float32)  # (n, 8B)

    def step(centers, _):
        d = desc.hamming_distance(descs_u8, centers)  # (n, k)
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # (n, k)
        counts = one_hot.sum(0)  # (k,)
        bit_sums = one_hot.T @ bits  # (k, 8B)
        maj = bit_sums > 0.5 * counts[:, None]
        new_centers = jnp.packbits(maj.astype(jnp.uint8), axis=-1)
        # keep old center for empty clusters
        new_centers = jnp.where(counts[:, None] > 0, new_centers, centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def assign_words(descs_u8, vocab_u8, mask=None):
    """(N, BYTES) descriptors -> (N,) word ids (argmin Hamming to vocab).
    Masked descriptors get word id -1."""
    d = desc.hamming_distance_best(descs_u8, vocab_u8)
    w = jnp.argmin(d, axis=1).astype(jnp.int32)
    if mask is not None:
        w = jnp.where(mask, w, -1)
    return w


def train_vocabulary_l2(descs, k=1024, iters=8, seed=0):
    """Standard k-means over float descriptors (SIFT mode,
    `config_backend.yaml` feat.type: SIFT / desc_length 128)."""
    n = descs.shape[0]
    key = jax.random.PRNGKey(seed)
    centers = descs[jax.random.choice(key, n, (k,), replace=n < k)]

    def step(centers, _):
        d = desc.l2_distance_sq(descs, centers)  # (n, k)
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=descs.dtype)
        counts = one_hot.sum(0)
        sums = one_hot.T @ descs
        new = sums / jnp.maximum(counts[:, None], 1.0)
        new = jnp.where(counts[:, None] > 0, new, centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def assign_words_l2(descs, vocab, mask=None):
    """Float descriptors -> word ids by L2 argmin."""
    d = desc.l2_distance_sq(descs, vocab)
    w = jnp.argmin(d, axis=1).astype(jnp.int32)
    if mask is not None:
        w = jnp.where(mask, w, -1)
    return w


def bow_vector(word_ids, k, idf=None):
    """Word ids (N,) (−1 = invalid) -> L2-normalized tf-idf vector (k,)."""
    valid = word_ids >= 0
    counts = jnp.zeros(k, jnp.float32).at[jnp.where(valid, word_ids, 0)].add(
        valid.astype(jnp.float32)
    )
    v = counts if idf is None else counts * idf
    n = jnp.linalg.norm(v)
    return v / jnp.maximum(n, 1e-12)


def bow_vectors_batch(word_ids_batch, k, idf=None):
    """(B, N) word ids -> (B, k) normalized tf-idf vectors."""
    return jax.vmap(lambda w: bow_vector(w, k, idf))(word_ids_batch)


def compute_idf(db_bow_binary, db_mask):
    """idf weights from the database: log(N / (1 + df))."""
    n = jnp.maximum(jnp.sum(db_mask), 1.0)
    df = jnp.sum(db_bow_binary * db_mask[:, None], axis=0)
    return jnp.log(n / (1.0 + df) + 1.0)


def retrieval_scores(query_bow, db_bow, db_mask=None):
    """Cosine similarity of one query BoW against the whole database.

    Args:
      query_bow: (K,) normalized.
      db_bow: (N_kf, K) normalized rows.
      db_mask: (N_kf,) validity.

    Returns: (N_kf,) scores in [0, 1]; masked rows get -1.
    """
    s = db_bow @ query_bow
    if db_mask is not None:
        s = jnp.where(db_mask, s, -1.0)
    return s


def common_words(query_bow, db_bow):
    """Number of shared vocabulary words (the analog of DBoW2's
    common-words gate in `kf_database.cpp:75-123`)."""
    return jnp.sum((db_bow > 0) & (query_bow[None, :] > 0), axis=-1)


def topk_candidates(scores, k):
    """Top-k retrieval: returns (scores_k, idx_k) sorted descending."""
    return jax.lax.top_k(scores, k)
