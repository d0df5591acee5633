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
