import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.ops import descriptors as desc


def rand_desc(key, n, nbytes=32):
    return jax.random.randint(key, (n, nbytes), 0, 256, dtype=jnp.uint8)


def np_hamming(a, b):
    a_bits = np.unpackbits(np.asarray(a), axis=-1)
    b_bits = np.unpackbits(np.asarray(b), axis=-1)
    return (a_bits[:, None, :] != b_bits[None, :, :]).sum(-1).astype(np.int32)


class TestHamming:
    def test_matmul_vs_numpy(self):
        a = rand_desc(jax.random.PRNGKey(0), 37)
        b = rand_desc(jax.random.PRNGKey(1), 53)
        np.testing.assert_array_equal(desc.hamming_distance(a, b), np_hamming(a, b))

    def test_xor_vs_numpy(self):
        a = rand_desc(jax.random.PRNGKey(2), 17)
        b = rand_desc(jax.random.PRNGKey(3), 23)
        np.testing.assert_array_equal(
            desc.hamming_distance_xor(a, b), np_hamming(a, b)
        )

    def test_self_distance_zero(self):
        a = rand_desc(jax.random.PRNGKey(4), 10)
        d = desc.hamming_distance(a, a)
        np.testing.assert_array_equal(jnp.diagonal(d), jnp.zeros(10, jnp.int32))

    def test_bf16_exact(self):
        a = rand_desc(jax.random.PRNGKey(5), 64)
        b = rand_desc(jax.random.PRNGKey(6), 64)
        np.testing.assert_array_equal(
            desc.hamming_distance(a, b, dtype=jnp.bfloat16), np_hamming(a, b)
        )



class TestL2:
    def test_l2_vs_numpy(self):
        a = jax.random.normal(jax.random.PRNGKey(9), (20, 128), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(10), (30, 128), jnp.float32)
        expected = np.sum(
            (np.asarray(a)[:, None] - np.asarray(b)[None]) ** 2, -1
        )
        np.testing.assert_allclose(desc.l2_distance_sq(a, b), expected, rtol=1e-4)


class TestMatching:
    def _shifted_pair(self, key, m=40, noise_bits=4):
        """B is a permutation of A with a few flipped bits (ground-truth
        matches = the permutation)."""
        a = rand_desc(key, m)
        perm = jax.random.permutation(jax.random.PRNGKey(99), m)
        b = a[perm]
        # flip `noise_bits` bits in each row of b
        k2 = jax.random.PRNGKey(100)
        byte_idx = jax.random.randint(k2, (m, noise_bits), 0, 32)
        bit_idx = jax.random.randint(jax.random.PRNGKey(101), (m, noise_bits), 0, 8)
        b_np = np.asarray(b).copy()
        for i in range(m):
            for j in range(noise_bits):
                b_np[i, byte_idx[i, j]] ^= 1 << int(bit_idx[i, j])
        return a, jnp.asarray(b_np), np.argsort(np.asarray(perm))

    def test_mutual_nn_recovers_permutation(self):
        a, b, inv_perm = self._shifted_pair(jax.random.PRNGKey(11))
        d = desc.hamming_distance(a, b)
        idx = desc.match_mutual_nn(d, max_dist=50.0)
        np.testing.assert_array_equal(idx, inv_perm)

    def test_ratio_test_rejects_ambiguous(self):
        # two identical rows in B: ratio test must reject the query
        a = rand_desc(jax.random.PRNGKey(12), 1)
        b = jnp.concatenate([a, a, rand_desc(jax.random.PRNGKey(13), 3)], 0)
        d = desc.hamming_distance(a, b)
        idx = desc.match_ratio(d, max_dist=50.0, ratio=0.75)
        assert int(idx[0]) == -1

    def test_max_dist_gate(self):
        a = rand_desc(jax.random.PRNGKey(14), 5)
        b = rand_desc(jax.random.PRNGKey(15), 5)
        d = desc.hamming_distance(a, b)
        idx = desc.match_mutual_nn(d, max_dist=0.5)  # impossible threshold
        np.testing.assert_array_equal(idx, -jnp.ones(5, jnp.int32))

    def test_masked_dist(self):
        a = rand_desc(jax.random.PRNGKey(16), 4)
        d = desc.hamming_distance(a, a)
        row_mask = jnp.array([True, True, False, True])
        col_mask = jnp.array([True, False, True, True])
        dm = desc.masked_dist(d, row_mask, col_mask)
        assert int(dm[2, 0]) >= int(desc.BIG)
        assert int(dm[0, 1]) >= int(desc.BIG)
        assert int(dm[0, 0]) == 0

    def test_knn2(self):
        d = jnp.array([[3, 1, 2], [5, 9, 0]], jnp.int32)
        idx, d1, d2 = desc.knn2(d)
        np.testing.assert_array_equal(idx, [1, 2])
        np.testing.assert_array_equal(d1, [1, 0])
        np.testing.assert_array_equal(d2, [2, 5])
