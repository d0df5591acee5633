"""Map store tests: ingest, covisibility, culling, merge, persistence,
trajectory output, optimizer snapshots."""

import numpy as np
import jax.numpy as jnp
import pytest

from covins_tpu.agents.synthetic_agent import SyntheticAgent, SyntheticWorld
from covins_tpu.comm import messages as msgs
from covins_tpu.models.map_store import Map
from covins_tpu.ops import covisibility as cov
from covins_tpu.utils import geometry as geo


@pytest.fixture(scope="module")
def world():
    return SyntheticWorld.create(n_landmarks=400, seed=0)


def _ingest(mp: Map, agent: SyntheticAgent):
    for m in agent.messages():
        if isinstance(m, msgs.MsgKeyframe):
            mp.add_keyframe(m)
        else:
            mp.add_landmark(m)


def test_ingest_single_agent(world):
    agent = SyntheticAgent(world, client_id=0, n_keyframes=20)
    mp = Map(0)
    _ingest(mp, agent)
    assert mp.n_kf == 20
    assert mp.n_lm > 50
    assert mp.n_obs > mp.n_lm  # re-observations exist
    # chain connectivity
    assert mp.kf_pred[0] == -1
    assert all(mp.kf_pred[1:20] == np.arange(0, 19))
    # poses composed from relative messages track the VIO trajectory
    np.testing.assert_allclose(
        mp.kf_pose[:20], agent._vio_poses, atol=1e-9
    )


def test_covisibility_weights(world):
    agent = SyntheticAgent(world, client_id=0, n_keyframes=15)
    mp = Map(0)
    _ingest(mp, agent)
    w = np.asarray(
        cov.covis_weights_for(
            jnp.asarray(5), jnp.asarray(mp.obs_kf[: mp.n_obs]),
            jnp.asarray(mp.obs_lm[: mp.n_obs]),
            jnp.asarray(mp.obs_mask[: mp.n_obs]),
            n_kf=mp.n_kf, n_lm=mp.n_lm,
        )
    )
    assert w[5] == 0
    # temporal neighbors share the most landmarks
    assert w[4] > 0 and w[6] > 0
    assert w[4] >= w[0] and w[6] >= w[14]


def test_landmark_culling(world):
    agent = SyntheticAgent(world, client_id=0, n_keyframes=15)
    mp = Map(0)
    _ingest(mp, agent)
    # fabricate a stale single-obs landmark
    fake = msgs.MsgLandmark(
        id=(99999, 0), id_reference=(0, 0), pos_ref=np.asarray([0.0, 0.0, 5.0]),
        observations={(0, 0): 0},
    )
    # bind to a fresh obs slot (feature 0 of KF0 may already be used; ok)
    mp.add_landmark(fake)
    row = mp.lm_row((99999, 0))
    n = mp.landmark_culling(min_obs=2, max_gap=5)
    assert n >= 1
    assert not mp.lm_mask[row]


def test_redundancy_removal(world):
    agent = SyntheticAgent(world, client_id=0, n_keyframes=25, kf_dt=0.2)
    mp = Map(0)
    _ingest(mp, agent)
    n_before = int(mp.kf_mask[: mp.n_kf].sum())
    removed = mp.remove_redundant_keyframes(
        threshold=0.0, max_time_dist=0.5, target_kf_count=n_before - 5
    )
    assert removed == 5
    # chain still consistent
    live = np.where(mp.kf_mask[: mp.n_kf])[0]
    for r in live:
        s = mp.kf_succ[r]
        if s >= 0:
            assert mp.kf_pred[s] == r


def test_merge_two_maps(world):
    a0 = SyntheticAgent(world, client_id=0, n_keyframes=12)
    a1 = SyntheticAgent(world, client_id=1, n_keyframes=12, t0=3.0)
    m0, m1 = Map(0), Map(1)
    _ingest(m0, a0)
    _ingest(m1, a1)
    nk0, nl0 = m0.n_kf, m0.n_lm
    T = np.asarray(geo.pose_from_qt(
        geo.quat_exp(jnp.asarray([0.0, 0.0, 0.3])), jnp.asarray([1.0, -2.0, 0.5])
    ))
    m0.merge_from(m1, T)
    assert m0.n_kf == nk0 + 12
    assert 1 in m0.associated_clients
    # fused poses transformed: check one
    r = m0.kf_row((0, 1))
    expect = np.asarray(geo.pose_compose(jnp.asarray(T), jnp.asarray(m1.kf_pose[0])))
    np.testing.assert_allclose(m0.kf_pose[r], expect, atol=1e-12)
    # observation indices remapped into valid ranges
    o = m0.n_obs
    assert (m0.obs_kf[:o] < m0.n_kf).all()
    assert (m0.obs_lm[:o] < m0.n_lm).all()


def test_save_load_roundtrip(world, tmp_path):
    agent = SyntheticAgent(world, client_id=0, n_keyframes=10)
    mp = Map(0)
    _ingest(mp, agent)
    mp.add_loop_constraint(0, 9, np.asarray(geo.pose_relative(
        jnp.asarray(mp.kf_pose[0]), jnp.asarray(mp.kf_pose[9]))))
    path = str(tmp_path / "map.npz")
    mp.save(path)
    mp2 = Map.load(path)
    assert mp2.n_kf == mp.n_kf and mp2.n_lm == mp.n_lm
    np.testing.assert_allclose(mp2.kf_pose[: mp.n_kf], mp.kf_pose[: mp.n_kf])
    np.testing.assert_array_equal(
        mp2.descriptors[: mp.n_kf], mp.descriptors[: mp.n_kf]
    )
    assert len(mp2.loops) == 1
    assert mp2.kf_row((5, 0)) == mp.kf_row((5, 0))


def test_trajectory_formats(world, tmp_path):
    agent = SyntheticAgent(world, client_id=0, n_keyframes=8)
    mp = Map(0)
    _ingest(mp, agent)
    mp.write_trajectories(str(tmp_path), fmt="TUM")
    tum = (tmp_path / "KF_0_ftum.csv").read_text().strip().splitlines()
    assert len(tum) == 8
    parts = tum[0].split(" ")
    assert len(parts) == 8  # stamp tx ty tz qx qy qz qw
    # qw is last in TUM
    np.testing.assert_allclose(float(parts[7]), mp.kf_pose[0, 0], rtol=1e-12)

    mp.write_trajectories(str(tmp_path), fmt="EUROC")
    eu = (tmp_path / "KF_0_feuroc.csv").read_text().strip().splitlines()
    parts = eu[0].split(",")
    assert len(parts) == 17  # ns stamp + t(3) + q(4) + v(3) + bg(3) + ba(3)
    assert abs(float(parts[0]) - mp.kf_stamp[0] * 1e9) < 1.0
    combined = (tmp_path / "stamped_traj_estimate.txt").read_text().splitlines()
    assert len(combined) == 8


def test_pose_graph_snapshot_and_apply(world):
    agent = SyntheticAgent(world, client_id=0, n_keyframes=10, pose_drift=0.01)
    mp = Map(0)
    _ingest(mp, agent)
    g = mp.to_pose_graph(use_nbr_kfs=False)
    assert int(g.edge_mask.sum()) == 9  # successor chain
    g_nbr = mp.to_pose_graph(use_nbr_kfs=True)
    # neighbors 2..5 add 8+7+6+5 edges for a 10-KF chain
    assert int(g_nbr.edge_mask.sum()) == 9 + 8 + 7 + 6 + 5
    # apply identity "optimization": landmarks/poses unchanged
    lm_before = mp.lm_pos[: mp.n_lm].copy()
    mp.apply_pose_graph_result(np.asarray(g.poses))
    np.testing.assert_allclose(mp.lm_pos[: mp.n_lm], lm_before, atol=1e-9)


def test_gba_problem_from_map(world):
    agent = SyntheticAgent(world, client_id=0, n_keyframes=10)
    mp = Map(0)
    _ingest(mp, agent)
    p = mp.to_gba_problem()
    assert p.poses.shape == (10, 7)
    assert int(p.imu_mask.sum()) == 9
    # preintegrated deltas consistent with GT motion (exact IMU): residual
    # at the ingested states should be small
    from covins_tpu.ops import gba as gba_mod
    r_f, _ = gba_mod._imu_r_J(p)
    assert float(jnp.abs(r_f).max()) < 50.0  # whitened units


def test_update_landmark_attributes(world):
    agent = SyntheticAgent(world, client_id=0, n_keyframes=8)
    mp = Map(0)
    _ingest(mp, agent)
    mp.update_landmark_attributes()
    live = np.where(mp.lm_mask[: mp.n_lm])[0]
    # representative descriptor close to the world signature (few bit flips)
    from covins_tpu.ops import descriptors as d_ops
    world_idx = np.asarray([agent.lm_world_idx[int(i)] for i in mp.lm_ids[live, 0]])
    sig = world.lm_descs[world_idx]
    dist = np.asarray(d_ops.hamming_distance(
        jnp.asarray(mp.lm_desc[live]), jnp.asarray(sig)))
    diag = dist[np.arange(len(live)), np.arange(len(live))]
    assert np.median(diag) <= 8  # <= 2x bit flips
    # normals are unit for observed landmarks
    norms = np.linalg.norm(mp.lm_normal[live], axis=-1)
    obs_counts = np.zeros(mp.n_lm)
    np.add.at(obs_counts, mp.obs_lm[: mp.n_obs][mp.obs_mask[: mp.n_obs]], 1)
    has_obs = obs_counts[live] > 0
    np.testing.assert_allclose(norms[has_obs], 1.0, atol=1e-6)
