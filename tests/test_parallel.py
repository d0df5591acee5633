"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covins_tpu.ops import descriptors as d_ops
from covins_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return sh.make_mesh(8)


def test_sharded_retrieval_matches_local(mesh):
    key = jax.random.PRNGKey(0)
    db = jax.random.uniform(key, (512, 128), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    q = db[37]
    mask = jnp.ones(512, bool)
    s_local, i_local = sh.sharded_topk_scores(db, q, mask, k=5)
    db_sh = sh.shard_rows(mesh, db)
    with mesh:
        s_sh, i_sh = sh.sharded_topk_scores(db_sh, sh.replicate(mesh, q),
                                            sh.replicate(mesh, mask), k=5)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_local), atol=1e-6)
    assert int(i_sh[0]) == 37


def test_sharded_hamming_knn_exact(mesh):
    key = jax.random.PRNGKey(1)
    db_u8 = jax.random.randint(key, (256, 32), 0, 256, jnp.int32).astype(jnp.uint8)
    q_u8 = db_u8[:16]
    ref = np.asarray(d_ops.hamming_distance(q_u8, db_u8))
    db_pm1 = d_ops.unpack_to_pm1(db_u8)
    q_pm1 = d_ops.unpack_to_pm1(q_u8)
    with mesh:
        dist_k, idx_k = sh.sharded_hamming_knn(
            sh.shard_rows(mesh, db_pm1), sh.replicate(mesh, q_pm1), k=2
        )
    # best match of each query is itself at distance 0
    assert (np.asarray(dist_k[:, 0]) == 0).all()
    assert (np.asarray(idx_k[:, 0]) == np.arange(16)).all()
    # second-best matches the dense reference
    ref_sorted = np.sort(ref, axis=1)
    np.testing.assert_array_equal(np.asarray(dist_k[:, 1]), ref_sorted[:, 1])


@pytest.mark.slow
def test_sharded_gba_step_matches_single_device(mesh):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as ge

    p = ge._build_problem()
    lam = jnp.asarray(1e-4, p.poses.dtype)
    state = (p.poses, p.vels, p.biases, p.lms)

    from covins_tpu.ops import gba as gba_mod
    st_ref, lam_ref, cost_ref = gba_mod._gn_schur_step(p, state, lam, 15, False)

    p8 = sh.pad_to_multiple(p, 8)
    p8 = sh.shard_gba_problem(mesh, p8)
    state8 = (p8.poses, p8.vels, p8.biases, p8.lms)
    st_sh, lam_sh, cost_sh = sh.gba_step_sharded(mesh, p8, state8, lam, n_cg=15)

    # identical math up to padding: compare costs and pose updates
    np.testing.assert_allclose(float(cost_sh), float(cost_ref), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(st_sh[0]), np.asarray(st_ref[0]), atol=1e-9
    )
    # landmark updates match on the original (unpadded) rows
    np.testing.assert_allclose(
        np.asarray(st_sh[3])[: st_ref[3].shape[0]], np.asarray(st_ref[3]),
        atol=1e-9,
    )


@pytest.mark.slow
def test_driver_dryrun_multichip_entry():
    """The driver's graded entry path: __graft_entry__.dryrun_multichip(8).

    Covers the exact code the round driver executes (GBA train-step,
    sharded retrieval, edge-sharded PGO, sharded Hamming kNN) so an edit
    to any leg cannot land without this lane executing it.
    """
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
