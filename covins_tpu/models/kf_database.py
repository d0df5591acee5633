"""Keyframe retrieval database: HBM-resident BoW matrix + batched scoring.

TPU-native replacement for the reference's DBoW2 inverted-file index
(`covins_backend/src/covins_backend/kf_database.cpp:41-187`): instead of a
word -> keyframe-list scan, the database is one dense L2-normalized tf-idf
matrix; a query is a single matvec (cosine scores, rank-equivalent to
DBoW2's L1 similarity) plus a binarized dot product for the common-words
gate.  Candidate filtering (exclusion set, same-agent distance, min-score
fractions, top-k) mirrors `DetectCandidates` semantics.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.ops import bow as bow_ops


@partial(jax.jit, donate_argnums=(0,))
def _set_row(db, row, vec):
    return db.at[row].set(vec)


@partial(jax.jit, static_argnames=("metric",), donate_argnums=(0,))
def _insert_and_score(db, vocab, descs, feat_mask, rows, metric: str):
    """Insert a WINDOW of keyframes and score each against the database.

    One device dispatch replaces the per-keyframe transform+query+insert
    loop (`kf_database.cpp:41-187` runs per KF on the reference server):

      1. word assignment for all W*F descriptors (one Hamming/L2 matmul)
      2. W tf-idf BoW vectors
      3. scatter the W rows into the database
      4. scores = (W, V) x (cap, V)^T cosine matmul
      5. common-words counts via a binarized matmul

    Sequential query semantics (each query sees only rows inserted before
    it) are restored host-side by masking rows >= the query's own row.

    Args:
      db: (cap, V) database matrix (donated).
      descs: (W, F, B) padded descriptor window.
      feat_mask: (W, F) validity.
      rows: (W,) destination rows; entries >= cap are dropped (pads).
    Returns (db', scores (W, cap), common (W, cap)).
    """
    w, f, b = descs.shape
    flat = descs.reshape(w * f, b)
    from covins_tpu.ops import descriptors as d_ops
    if metric == "hamming":
        # Pallas packed kernel on TPU (flat is W*F x B — MXU-sized), ±1
        # matmul elsewhere (`ops/descriptors.hamming_distance_best`)
        dist = d_ops.hamming_distance_best(flat, vocab)
    else:
        dist = d_ops.l2_distance_sq(flat.astype(vocab.dtype), vocab)
    words = jnp.argmin(dist, axis=1).astype(jnp.int32)
    words = jnp.where(feat_mask.reshape(-1), words, -1).reshape(w, f)
    vecs = bow_ops.bow_vectors_batch(words, vocab.shape[0])  # (W, V)
    db = db.at[rows].set(vecs, mode="drop")
    scores = vecs @ db.T  # (W, cap)
    common = (vecs > 0).astype(jnp.float32) @ (db > 0).astype(jnp.float32).T
    return db, scores, common.astype(jnp.int32)


class KeyframeDatabase:
    """Append-only BoW database over all keyframes of all maps."""

    def __init__(self, vocabulary: np.ndarray, capacity: int = 1024):
        """vocabulary: (V, B) uint8 binary word centers (ORB) or (V, D)
        float centers (SIFT mode, `feat.type: SIFT`) — the metric is
        selected by the vocabulary dtype."""
        self.vocab = jnp.asarray(vocabulary)
        self.metric = "hamming" if vocabulary.dtype == np.uint8 else "l2"
        self.k_words = vocabulary.shape[0]
        self._db = jnp.zeros((capacity, self.k_words), jnp.float32)
        self._mask = np.zeros(capacity, bool)
        self.n = 0
        # row -> (kf_id, client_id); parallel host bookkeeping.  Kept BOTH
        # as a dict (O(1) id lookup, `row_of`) and as flat arrays so the
        # exclusion masks of `DetectCandidates` (`kf_database.cpp:47-187`)
        # are vectorized rather than Python scans over all rows.
        self.row_ids: list[tuple[int, int]] = []
        self.row_of: dict[tuple, int] = {}
        self.row_kf = np.full(capacity, -1, np.int64)      # kf id per row
        self.row_client = np.full(capacity, -1, np.int64)  # client id per row

    def _ensure(self, n):
        cap = self._db.shape[0]
        if n <= cap:
            return
        new_cap = max(2 * cap, n)
        db = jnp.zeros((new_cap, self.k_words), jnp.float32)
        self._db = db.at[:cap].set(self._db)
        for name in ("_mask", "row_kf", "row_client"):
            old = getattr(self, name)
            new = np.full(new_cap, -1, old.dtype) if old.dtype == np.int64 \
                else np.zeros(new_cap, old.dtype)
            new[:cap] = old
            setattr(self, name, new)

    def bow_vector(self, descriptors: np.ndarray) -> jnp.ndarray:
        # pad the descriptor count to a power-of-two bucket so the jitted
        # assignment kernel compiles once per bucket, not once per count
        n = descriptors.shape[0]
        bucket = 128
        while bucket < n:
            bucket *= 2
        padded = np.zeros((bucket,) + descriptors.shape[1:], descriptors.dtype)
        padded[:n] = descriptors
        mask = jnp.arange(bucket) < n
        if self.metric == "hamming":
            words = bow_ops.assign_words(jnp.asarray(padded), self.vocab, mask=mask)
        else:
            words = bow_ops.assign_words_l2(
                jnp.asarray(padded, self.vocab.dtype), self.vocab, mask=mask
            )
        return bow_ops.bow_vector(words, self.k_words)

    def add_keyframe(self, kf_id: tuple, descriptors_u8: np.ndarray) -> int:
        """`MapManager::AddToDatabase` (`map_be.cpp:68-107`)."""
        kf_id = tuple(int(x) for x in kf_id)
        existing = self.row_of.get(kf_id, -1)
        if existing >= 0:
            return existing
        row = self.n
        self._ensure(row + 1)
        vec = self.bow_vector(descriptors_u8)
        self._db = _set_row(self._db, row, vec)
        self._mask[row] = True
        self.row_ids.append(kf_id)
        self.row_of[kf_id] = row
        self.row_kf[row] = kf_id[0]
        self.row_client[row] = kf_id[1]
        self.n = row + 1
        return row

    def erase(self, row: int):
        self._mask[row] = False

    def erase_id(self, kf_id: tuple) -> bool:
        """`MapManager::EraseFromDatabase` (`map_be.cpp:169-177`): drop a
        culled keyframe from the retrieval index."""
        row = self.row_of.pop(tuple(int(x) for x in kf_id), -1)
        if row < 0:
            return False
        self._mask[row] = False
        return True

    def add_and_query_batch(self, kf_ids: list, descs_list: list,
                            lazy: bool = False):
        """Insert a window of keyframes in one device dispatch and return
        per-query RAW retrieval data with sequential-query semantics.

        Returns a list of dicts (parallel to inputs), each with:
          row      — the inserted database row,
          scores   — (n,) float raw cosine scores over all live rows,
          common   — (n,) int shared-word counts,
          valid    — (n,) bool: live rows inserted BEFORE this query
        (already-present ids are scored in place without re-insertion).
        """
        w = len(kf_ids)
        if w == 0:
            return []
        kf_ids = [tuple(int(x) for x in k) for k in kf_ids]
        rows = np.full(w, -1, np.int64)
        fresh = []
        for i, kid in enumerate(kf_ids):
            existing = self.row_of.get(kid, -1)
            if existing >= 0:
                rows[i] = existing
            else:
                rows[i] = self.n + len(fresh)
                fresh.append(i)
        n_after = self.n + len(fresh)
        self._ensure(n_after)
        cap = self._db.shape[0]

        # pad the window: W and F to power-of-two buckets for stable jit
        f_need = max(int(d.shape[0]) for d in descs_list)
        f_bucket = 128
        while f_bucket < f_need:
            f_bucket *= 2
        w_bucket = 4
        while w_bucket < w:
            w_bucket *= 2
        descs = np.zeros((w_bucket, f_bucket) + descs_list[0].shape[1:],
                         descs_list[0].dtype)
        feat_mask = np.zeros((w_bucket, f_bucket), bool)
        dest = np.full(w_bucket, cap, np.int64)  # cap => dropped by scatter
        for i in range(w):
            n = descs_list[i].shape[0]
            descs[i, :n] = descs_list[i]
            feat_mask[i, :n] = True
            if rows[i] >= self.n:  # fresh insertion
                dest[i] = rows[i]
        db, scores, common = _insert_and_score(
            self._db, self.vocab, jnp.asarray(descs), jnp.asarray(feat_mask),
            jnp.asarray(dest), self.metric,
        )
        self._db = db
        if lazy:
            # leave the score/common slices on device (async); the
            # deferred-placerec drain fetches all queued windows in one
            # device_get — the ingest path never blocks on the chip
            scores = scores[:w, :n_after]
            common = common[:w, :n_after]
        else:
            import jax
            scores, common = jax.device_get(  # one sync, not two
                (scores[:w, :n_after], common[:w, :n_after]))

        # host bookkeeping for the fresh rows
        for i in fresh:
            r = int(rows[i])
            self._mask[r] = True
            self.row_ids.append(kf_ids[i])
            self.row_of[kf_ids[i]] = r
            self.row_kf[r] = kf_ids[i][0]
            self.row_client[r] = kf_ids[i][1]
        self.n = n_after

        out = []
        live = self._mask[:n_after].copy()
        for i in range(w):
            valid = live.copy()
            valid[int(rows[i]):] = False  # sequential: only earlier rows
            out.append({
                "row": int(rows[i]),
                "scores": scores[i],
                "common": common[i],
                "valid": valid,
            })
        return out

    def query(
        self,
        descriptors_u8: np.ndarray,
        exclude_rows: Optional[np.ndarray] = None,
        min_common_words_frac: float = 0.8,
    ):
        """Score the query against the whole database.

        Mirrors `DetectCandidates` (`kf_database.cpp:47-187`): keyframes
        sharing < 0.8 * max common words are dropped; returns (scores,
        common_words) as numpy over database rows (invalid rows = -1).
        """
        qv = self.bow_vector(descriptors_u8)
        # query at CAPACITY shape (stable jit signature); invalid rows are
        # masked, results sliced to the live prefix afterwards
        db = self._db
        mask = jnp.asarray(self._mask)
        if exclude_rows is not None and len(exclude_rows):
            mask = mask.at[jnp.asarray(exclude_rows, jnp.int32)].set(False)
        scores = bow_ops.retrieval_scores(qv, db, mask)
        common = bow_ops.common_words(qv, db)
        max_common = jnp.max(jnp.where(mask, common, 0))
        keep = common >= min_common_words_frac * max_common
        scores = jnp.where(keep & mask, scores, -1.0)
        return np.asarray(scores[: self.n]), np.asarray(common[: self.n])


def train_vocabulary_from_maps(descriptor_batches, k=512, iters=6, seed=0):
    """Train a Hamming k-medians vocabulary from descriptor samples."""
    descs = np.concatenate([np.asarray(d).reshape(-1, descriptor_batches[0].shape[-1])
                            for d in descriptor_batches], axis=0)
    return np.asarray(bow_ops.train_vocabulary(jnp.asarray(descs), k=k, iters=iters, seed=seed))
