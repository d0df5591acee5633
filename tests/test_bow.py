import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.ops import bow, descriptors as desc


def make_clustered_descriptors(key, n_clusters=8, per_cluster=40, flip_bits=6):
    """Descriptors in tight Hamming clusters around random prototypes."""
    protos = jax.random.randint(key, (n_clusters, 32), 0, 256, dtype=jnp.uint8)
    protos_np = np.asarray(protos)
    rng = np.random.RandomState(0)
    out, labels = [], []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            d = protos_np[c].copy()
            for _ in range(flip_bits):
                byte, bit = rng.randint(32), rng.randint(8)
                d[byte] ^= 1 << bit
            out.append(d)
            labels.append(c)
    return jnp.asarray(np.stack(out)), np.asarray(labels), protos


class TestVocabulary:
    def test_kmedians_separates_clusters(self):
        descs, labels, _ = make_clustered_descriptors(jax.random.PRNGKey(0))
        vocab = bow.train_vocabulary(descs, k=8, iters=10, seed=1)
        words = np.asarray(bow.assign_words(descs, vocab))
        # same-cluster descriptors must map to the same word (allow the
        # trained vocab to split one cluster, but assignments must be pure)
        for c in np.unique(labels):
            w = words[labels == c]
            # dominant word covers the cluster
            assert (w == np.bincount(w).argmax()).mean() > 0.95

    def test_assign_words_masked(self):
        descs, _, protos = make_clustered_descriptors(jax.random.PRNGKey(2))
        mask = jnp.ones(descs.shape[0], bool).at[5].set(False)
        w = bow.assign_words(descs, protos, mask)
        assert int(w[5]) == -1
        assert int(w[4]) >= 0


class TestRetrieval:
    def _kf_words(self, key, vocab_k=64, n_kf=20, feats=50):
        """Random per-KF word sets; KF i and KF i+10 share most words."""
        words = jax.random.randint(key, (n_kf, feats), 0, vocab_k)
        words = words.at[10:, : feats // 10 * 9].set(words[:10, : feats // 10 * 9])
        return words

    def test_self_retrieval_is_best(self):
        k = 64
        words = self._kf_words(jax.random.PRNGKey(3), vocab_k=k)
        vecs = bow.bow_vectors_batch(words, k)
        scores = bow.retrieval_scores(vecs[0], vecs)
        assert int(jnp.argmax(scores)) == 0
        np.testing.assert_allclose(float(scores[0]), 1.0, atol=1e-6)

    def test_overlapping_kf_ranks_high(self):
        k = 64
        words = self._kf_words(jax.random.PRNGKey(4), vocab_k=k)
        vecs = bow.bow_vectors_batch(words, k)
        mask = jnp.ones(20, bool).at[0].set(False)  # exclude self
        scores = bow.retrieval_scores(vecs[0], vecs, mask)
        # KF 10 shares 90% of words with KF 0 -> top candidate
        assert int(jnp.argmax(scores)) == 10

    def test_masked_rows_excluded(self):
        k = 16
        words = jax.random.randint(jax.random.PRNGKey(5), (5, 20), 0, k)
        vecs = bow.bow_vectors_batch(words, k)
        mask = jnp.zeros(5, bool)
        scores = bow.retrieval_scores(vecs[0], vecs, mask)
        assert float(scores.max()) == -1.0

    def test_common_words(self):
        k = 8
        w1 = jnp.array([0, 1, 2, -1])
        w2 = jnp.array([[2, 3, 3, -1], [5, 6, 7, -1]])
        v1 = bow.bow_vector(w1, k)
        v2 = bow.bow_vectors_batch(w2, k)
        cw = bow.common_words(v1, v2)
        np.testing.assert_array_equal(cw, [1, 0])

    def test_idf_downweights_common(self):
        # word 0 appears in every KF, word 1 in one
        binary = jnp.array([[1, 1, 0], [1, 0, 0], [1, 0, 0]], jnp.float32)
        mask = jnp.ones(3, bool)
        idf = bow.compute_idf(binary, mask)
        assert float(idf[0]) < float(idf[1])

    def test_topk(self):
        s = jnp.array([0.1, 0.9, -1.0, 0.5])
        sk, ik = bow.topk_candidates(s, 2)
        np.testing.assert_array_equal(ik, [1, 3])
