"""SIFT / L2 feature mode (COVINS-G only, `feat.type: SIFT`,
`feat.desc_length: 128` — `config_backend.yaml:28-29`)."""

import numpy as np
import pytest
import jax.numpy as jnp

from covins_tpu.agents.synthetic_agent import SyntheticAgent, SyntheticWorld
from covins_tpu.models.map_manager import MapManager
from covins_tpu.models.session import AgentSession
from covins_tpu.ops import bow as bow_ops
from covins_tpu.utils.config import Config


def test_l2_vocabulary_and_retrieval():
    world = SyntheticWorld.create(n_landmarks=300, desc_bytes=128, seed=4,
                                  feat_type="SIFT")
    assert world.lm_descs.dtype == np.float32
    vocab = np.asarray(bow_ops.train_vocabulary_l2(
        jnp.asarray(world.lm_descs), k=64, iters=4))
    w = np.asarray(bow_ops.assign_words_l2(
        jnp.asarray(world.lm_descs[:50]), jnp.asarray(vocab)))
    assert w.min() >= 0 and w.max() < 64


@pytest.mark.slow
def test_sift_covins_g_loop():
    world = SyntheticWorld.create(n_landmarks=600, desc_bytes=128, seed=4,
                                  feat_type="SIFT")
    vocab = np.asarray(bow_ops.train_vocabulary_l2(
        jnp.asarray(world.lm_descs), k=128, iters=4))
    # thresholds scaled to the synthetic SIFT world: fewer features per
    # keyframe than a real extractor, and the circle trajectory revisits
    # at a few meters offset, so the per-pair gates
    # (`RelNonCentralPosSolver.cpp:119,368`) and the translation gate
    # (`placerec_gen_be.cpp:156-167`) use proportionally smaller values
    cfg = Config(
        feat_type="SIFT", desc_length=128,
        placerec_type="COVINS_G",
        img_match_thres=500.0,  # the reference's SIFT threshold
        start_after_kf=2, consecutive_loop_dist=6, min_loop_dist=6,
        exclude_kfs_with_id_less_than=2, cov_consistency_thres=2,
        nc_min_inliers=30, nc_cov_thres=100.0,
        rel_min_img_matches=10, rel_min_inliers=10, max_trans=8.0,
        perform_pgo=False, activate_lm_culling=False,
    )
    mgr = MapManager(vocab, cfg)
    sess = AgentSession(0, mgr, cfg)
    agent = SyntheticAgent(world, client_id=0, n_keyframes=30)
    outcomes = []
    for m in agent.messages():
        out = sess.ingest(m)
        if out:
            outcomes.append(out)
    out = sess.flush()
    if out:
        outcomes.append(out)
    assert outcomes.count("loop") >= 1
    mp = mgr.map_of(0)
    assert mp.descriptors.dtype == np.float32
    assert len(mp.loops) >= 1 and mp.loops[0]["cov"] is not None
