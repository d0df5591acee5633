"""Place recognition end-to-end: loop detection, loop transform accuracy,
map merging, both COVINS and COVINS-G modes."""

import numpy as np
import jax.numpy as jnp
import pytest

from covins_tpu.agents.synthetic_agent import SyntheticAgent, SyntheticWorld
from covins_tpu.models.map_manager import MapManager
from covins_tpu.models.session import AgentSession
from covins_tpu.ops import bow as bow_ops
from covins_tpu.utils import geometry as geo
from covins_tpu.utils.config import Config


@pytest.fixture(scope="module")
def world():
    return SyntheticWorld.create(n_landmarks=500, seed=1)


@pytest.fixture(scope="module")
def vocab(world):
    return np.asarray(
        bow_ops.train_vocabulary(jnp.asarray(world.lm_descs), k=128, iters=4)
    )


def _test_config(**kw):
    base = dict(
        placerec_type="COVINS",
        start_after_kf=2,
        consecutive_loop_dist=6,
        min_loop_dist=6,
        exclude_kfs_with_id_less_than=2,
        cov_consistency_thres=2,
        matches_thres=12,
        matches_thres_merge=12,
        inliers_thres=12,
        ransac_min_inliers=5,
        perform_pgo=False,
        activate_lm_culling=False,
    )
    base.update(kw)
    return Config(**base)


def _run_agent(session, agent):
    outcomes = []
    for m in agent.messages():
        out = session.ingest(m)
        if out:
            outcomes.append(out)
    out = session.flush()
    if out:
        outcomes.append(out)
    return outcomes


def test_intra_map_loop_detection(world, vocab):
    # trajectory period = 4s; kf_dt=0.5 -> revisit every 8 KFs
    cfg = _test_config()
    mgr = MapManager(vocab, cfg)
    sess = AgentSession(0, mgr, cfg)
    agent = SyntheticAgent(world, client_id=0, n_keyframes=30)
    outcomes = _run_agent(sess, agent)
    assert outcomes.count("loop") >= 1
    mp = mgr.map_of(0)
    assert len(mp.loops) >= 1
    # loop transform accuracy: drift-free agent => T_12 equals the GT
    # relative pose between the two keyframes
    lc = mp.loops[0]
    T_gt = np.asarray(geo.pose_relative(
        jnp.asarray(mp.kf_pose_vio[lc["kf1"]]),
        jnp.asarray(mp.kf_pose_vio[lc["kf2"]]),
    ))
    err = np.asarray(geo.pose_boxminus(jnp.asarray(lc["T_12"]), jnp.asarray(T_gt)))
    assert np.abs(err).max() < 0.05, err


def test_two_agent_map_merge(world, vocab):
    cfg = _test_config()
    mgr = MapManager(vocab, cfg)
    s0 = AgentSession(0, mgr, cfg)
    s1 = AgentSession(1, mgr, cfg)
    a0 = SyntheticAgent(world, client_id=0, n_keyframes=16)
    a1 = SyntheticAgent(world, client_id=1, n_keyframes=16, t0=1.0)
    # interleave the two agents' streams like the real server
    m0 = list(a0.messages())
    m1 = list(a1.messages())
    outcomes = []
    i = j = 0
    while i < len(m0) or j < len(m1):
        if i < len(m0):
            out = s0.ingest(m0[i]); i += 1
            if out: outcomes.append(out)
        if j < len(m1):
            out = s1.ingest(m1[j]); j += 1
            if out: outcomes.append(out)
    for s in (s0, s1):
        out = s.flush()
        if out: outcomes.append(out)
    assert "merge" in outcomes
    # both clients now share one map
    assert mgr.map_of_client[0] == mgr.map_of_client[1]
    merged = mgr.map_of(0)
    assert {0, 1} <= merged.associated_clients
    # merged map geometry: agent-1 KF poses should land near their GT
    # world poses (both agents fly the same GT world)
    a1_rows = merged.live_kf_rows(client_id=1)
    est = merged.kf_pose[a1_rows][:, 4:7]
    gt = np.asarray(a1.traj.poses)[merged.kf_ids[a1_rows, 0]][:, 4:7]
    rmse = float(np.sqrt(np.mean(np.sum((est - gt) ** 2, -1))))
    assert rmse < 0.3, rmse


@pytest.mark.slow
def test_covins_g_mode(world, vocab):
    cfg = _test_config(
        placerec_type="COVINS_G",
        nc_min_inliers=30,
        nc_cov_thres=100.0,
        rel_min_img_matches=17,
    )
    mgr = MapManager(vocab, cfg)
    sess = AgentSession(0, mgr, cfg)
    agent = SyntheticAgent(world, client_id=0, n_keyframes=30)
    outcomes = _run_agent(sess, agent)
    assert outcomes.count("loop") >= 1
    mp = mgr.map_of(0)
    lc = mp.loops[0]
    assert lc["cov"] is not None  # COVINS-G carries the sampling covariance
    T_gt = np.asarray(geo.pose_relative(
        jnp.asarray(mp.kf_pose_vio[lc["kf1"]]),
        jnp.asarray(mp.kf_pose_vio[lc["kf2"]]),
    ))
    err = np.asarray(geo.pose_boxminus(jnp.asarray(lc["T_12"]), jnp.asarray(T_gt)))
    # 17pt translation from a small virtual rig is the noisy axis — that is
    # exactly why COVINS-G weights loop edges by the sampling covariance
    assert np.abs(err[:3]).max() < 0.02, err  # rotation: tight
    assert np.abs(err[3:]).max() < 0.20, err  # translation: covariance-gated


def test_pgo_after_loop_reduces_drift(world, vocab):
    cfg = _test_config(perform_pgo=True)
    mgr = MapManager(vocab, cfg)
    sess = AgentSession(0, mgr, cfg)
    agent = SyntheticAgent(world, client_id=0, n_keyframes=30, pose_drift=0.004)
    gt = np.asarray(agent.traj.poses)[:, 4:7]
    # drift visible before
    drift0 = float(np.linalg.norm(agent._vio_poses[:, 4:7] - gt, axis=-1).max())
    _run_agent(sess, agent)
    mp = mgr.map_of(0)
    if len(mp.loops) == 0:
        pytest.skip("no loop found under drift; detection tested elsewhere")
    rows = mp.live_kf_rows(0)
    est = mp.kf_pose[rows][:, 4:7]
    rmse, _ = geo.ate_rmse(jnp.asarray(est), jnp.asarray(gt[mp.kf_ids[rows, 0]]),
                           align_scale=False)
    assert float(rmse) < max(0.8 * drift0, 0.05)
