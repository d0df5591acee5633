"""Loop-closure verification, landmark fusion, and corrected-pose PGO.

Covers the reference pipeline stages added in round 2:
* `FeatureMatcher::SearchByProjection` equivalent (`ops/projmatch.py`)
* landmark fusion on loop acceptance (`placerec_be.cpp:465-501`)
* corrected-pose seeding of PGO (`placerec_be.cpp:222-285`,
  `map_be.cpp:411-431`, `optimization_be.cpp:875-887`)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from covins_tpu.agents.synthetic_agent import SyntheticAgent, SyntheticWorld
from covins_tpu.models.map_manager import MapManager
from covins_tpu.models.map_store import Map
from covins_tpu.models.session import AgentSession
from covins_tpu.ops import bow as bow_ops, projmatch
from covins_tpu.utils import cameras as cam_mod
from covins_tpu.utils import geometry as geo
from covins_tpu.utils.config import Config


@pytest.fixture(scope="module")
def world():
    return SyntheticWorld.create(n_landmarks=500, seed=5)


@pytest.fixture(scope="module")
def vocab(world):
    return np.asarray(
        bow_ops.train_vocabulary(jnp.asarray(world.lm_descs), k=128, iters=4)
    )


def _cfg(**kw):
    base = dict(
        placerec_type="COVINS", start_after_kf=2, consecutive_loop_dist=6,
        min_loop_dist=6, exclude_kfs_with_id_less_than=2,
        cov_consistency_thres=2, matches_thres=12, matches_thres_merge=12,
        inliers_thres=12, ransac_min_inliers=5, total_matches_thres=15,
        perform_pgo=True, activate_lm_culling=False,
    )
    base.update(kw)
    return Config(**base)


# ---------------------------------------------------------------- projmatch


def test_project_match_recovers_exact_matches():
    """Landmarks projected with the true pose must match their own
    features; a landmark behind the camera must not match."""
    rng = np.random.default_rng(3)
    cam = cam_mod.make_pinhole_radtan(458.0, 457.0, 376.0, 240.0, [0, 0, 0, 0])
    L = 32
    # points in front of the camera (z in 2..8)
    p_c = np.stack([
        rng.uniform(-1.5, 1.5, L), rng.uniform(-0.8, 0.8, L),
        rng.uniform(2.0, 8.0, L),
    ], axis=1)
    uv, valid = cam_mod.project3(cam, jnp.asarray(p_c))
    uv = np.asarray(uv)
    ok = (
        np.asarray(valid) & (uv[:, 0] > 5) & (uv[:, 0] < 747)
        & (uv[:, 1] > 5) & (uv[:, 1] < 475)
    )
    descs = rng.integers(0, 256, (L, 32)).astype(np.uint8)
    T_cw = np.asarray(geo.pose_identity(np.float64))  # world == camera

    match, dist = projmatch.project_match(
        cam, jnp.asarray(T_cw), jnp.asarray(p_c), jnp.asarray(descs),
        jnp.zeros((L, 3)), jnp.asarray(ok),
        jnp.asarray(uv, jnp.float64), jnp.asarray(descs),
        jnp.zeros(L, jnp.float64), jnp.ones(L, bool),
        radius_px=5.0, max_dist=20.0, img_w=752, img_h=480,
        check_view_angle=False,
    )
    match = np.asarray(match)
    assert (match[ok] == np.arange(L)[ok]).all()

    # flip one landmark behind the camera: it must not match
    p_bad = p_c.copy()
    p_bad[0, 2] = -3.0
    match2, _ = projmatch.project_match(
        cam, jnp.asarray(T_cw), jnp.asarray(p_bad), jnp.asarray(descs),
        jnp.zeros((L, 3)), jnp.asarray(ok),
        jnp.asarray(uv, jnp.float64), jnp.asarray(descs),
        jnp.zeros(L, jnp.float64), jnp.ones(L, bool),
        radius_px=5.0, max_dist=20.0, img_w=752, img_h=480,
        check_view_angle=False,
    )
    assert int(np.asarray(match2)[0]) == -1


def test_project_match_distance_invariance_gate():
    """Reference parity (`landmark_base.cpp:68-133`,
    `feature_matcher_be.cpp:216-238`): a landmark whose camera distance
    falls outside [0.8 min, 1.2 max] of its invariance range must not
    match; inside the range it must; (0, 0) = unknown skips the gate."""
    rng = np.random.default_rng(5)
    cam = cam_mod.make_pinhole_radtan(458.0, 457.0, 376.0, 240.0, [0, 0, 0, 0])
    L = 8
    p_c = np.stack([
        rng.uniform(-0.5, 0.5, L), rng.uniform(-0.4, 0.4, L),
        np.full(L, 5.0),
    ], axis=1)  # all at distance ~5
    uv = np.asarray(cam_mod.project3(cam, jnp.asarray(p_c))[0])
    descs = rng.integers(0, 256, (L, 32)).astype(np.uint8)
    T_cw = np.asarray(geo.pose_identity(np.float64))
    dists = np.linalg.norm(p_c, axis=1)

    def run(rng_arr):
        m, _ = projmatch.project_match(
            cam, jnp.asarray(T_cw), jnp.asarray(p_c), jnp.asarray(descs),
            jnp.zeros((L, 3)), jnp.ones(L, bool),
            jnp.asarray(uv, jnp.float64), jnp.asarray(descs),
            jnp.zeros(L, jnp.float64), jnp.ones(L, bool),
            radius_px=5.0, max_dist=20.0, img_w=752, img_h=480,
            check_view_angle=False, lm_dist_rng=jnp.asarray(rng_arr),
        )
        return np.asarray(m)

    # range consistent with the actual distance (octave-0 features =>
    # max_dist ~ dist): matches kept
    good = np.stack([dists / 1.2**7, dists], axis=1)
    assert (run(good) == np.arange(L)).all()
    # range far BELOW the actual distance: all rejected
    bad = np.stack([dists / 100.0 / 1.2**7, dists / 100.0], axis=1)
    assert (run(bad) == -1).all()
    # unknown range: gate skipped
    assert (run(np.zeros((L, 2))) == np.arange(L)).all()


def test_project_match_conflict_resolution():
    """Two landmarks projecting onto the same feature: only the closer
    descriptor wins."""
    cam = cam_mod.make_pinhole_radtan(458.0, 457.0, 376.0, 240.0, [0, 0, 0, 0])
    p_c = np.asarray([[0.0, 0.0, 4.0], [0.001, 0.0, 4.0]])
    uv, _ = cam_mod.project3(cam, jnp.asarray(p_c[:1]))
    d_feat = np.zeros((1, 32), np.uint8)
    d_lm = np.zeros((2, 32), np.uint8)
    d_lm[1, 0] = 0xFF  # 8 bits worse
    T_cw = np.asarray(geo.pose_identity(np.float64))
    match, _ = projmatch.project_match(
        cam, jnp.asarray(T_cw), jnp.asarray(p_c), jnp.asarray(d_lm),
        jnp.zeros((2, 3)), jnp.ones(2, bool),
        jnp.asarray(np.asarray(uv), jnp.float64), jnp.asarray(d_feat),
        jnp.zeros(1, jnp.float64), jnp.ones(1, bool),
        radius_px=8.0, max_dist=50.0, img_w=752, img_h=480,
        check_view_angle=False,
    )
    match = np.asarray(match)
    assert match[0] == 0 and match[1] == -1


# ------------------------------------------------------------------- fusion


def _mini_map():
    mp = Map(0, max_features=8, kf_capacity=8, lm_capacity=8, obs_capacity=32)
    for k in range(3):
        import covins_tpu.comm.messages as msgs
        mp.add_keyframe(msgs.MsgKeyframe(
            id=(k, 0), timestamp=float(k), calibration=None,
            keypoints=np.zeros((4, 2), np.float32),
            keypoints_undist=np.zeros((4, 2), np.float32),
            keypoints_aors=np.zeros((4, 4), np.float32),
            descriptors=np.zeros((4, 32), np.uint8),
            T_w_s_vio=np.asarray(geo.pose_identity(np.float64)),
        ))
    return mp


def test_fuse_landmark_repoints_and_erases():
    import covins_tpu.comm.messages as msgs
    mp = _mini_map()
    # lm A observed by KF0(f0) + KF1(f1); lm B observed by KF2(f2)
    a = mp.add_landmark(msgs.MsgLandmark(
        id=(0, 0), id_reference=(0, 0), pos_ref=np.zeros(3),
        observations={(0, 0): 0, (1, 0): 1},
    ))
    b = mp.add_landmark(msgs.MsgLandmark(
        id=(1, 0), id_reference=(2, 0), pos_ref=np.zeros(3),
        observations={(2, 0): 2},
    ))
    assert mp.fuse_landmark(target=a, tofuse=b)
    # B's observation moved to A; B erased (0 non-moved obs)
    assert not mp.lm_mask[b]
    obs_kfs = set(int(k) for k in mp.observing_kfs(a))
    assert obs_kfs == {0, 1, 2}
    assert mp.kf_feat_lm[2, 2] == a


def test_fuse_landmark_keeps_conflicted():
    import covins_tpu.comm.messages as msgs
    mp = _mini_map()
    # A and B both observed by KF0 and KF1 at different features: nothing
    # can move (2 non-moved obs) -> B survives
    a = mp.add_landmark(msgs.MsgLandmark(
        id=(0, 0), id_reference=(0, 0), pos_ref=np.zeros(3),
        observations={(0, 0): 0, (1, 0): 0},
    ))
    b = mp.add_landmark(msgs.MsgLandmark(
        id=(1, 0), id_reference=(0, 0), pos_ref=np.zeros(3),
        observations={(0, 0): 1, (1, 0): 1},
    ))
    assert mp.fuse_landmark(target=a, tofuse=b)
    assert mp.lm_mask[b]


# -------------------------------------------------- end-to-end loop + fusion


@pytest.mark.slow
def test_loop_closure_fuses_duplicate_landmarks(world, vocab):
    """A single agent revisiting the same area mints duplicate landmark
    ids (track loss); the loop closure must fuse them (`FuseLandmark`) —
    the round-1 pipeline kept both copies forever."""
    # the synthetic pose period is 16 KFs (yaw period = 2x position
    # period), so genuine revisits need >= ~20 keyframes
    cfg = _cfg()
    mgr = MapManager(vocab, cfg)
    sess = AgentSession(0, mgr, cfg)
    agent = SyntheticAgent(world, 0, n_keyframes=22)
    for m in agent.messages():
        sess.ingest(m)
    sess.flush()
    assert mgr.n_loops >= 1
    assert mgr.n_fused >= 1
    # fused duplicates are erased from the map
    mp = mgr.map_of(0)
    live = int(mp.lm_mask[: mp.n_lm].sum())
    assert live < mp.n_lm


@pytest.mark.slow
def test_merge_shares_landmarks_across_agents(world, vocab):
    """After a two-agent merge with fusion, at least one landmark must be
    observed by keyframes of BOTH agents (the dedup criterion)."""
    cfg = _cfg()
    mgr = MapManager(vocab, cfg)
    sessions = {c: AgentSession(c, mgr, cfg) for c in (0, 1)}
    streams = {
        c: list(SyntheticAgent(world, c, n_keyframes=16, t0=c * 1.0).messages())
        for c in (0, 1)
    }
    i = {0: 0, 1: 0}
    done = set()
    while len(done) < 2:
        for c in (0, 1):
            if c in done:
                continue
            if i[c] >= len(streams[c]):
                sessions[c].flush()
                done.add(c)
                continue
            sessions[c].ingest(streams[c][i[c]])
            i[c] += 1
    assert mgr.n_merges >= 1
    mp = mgr.map_of(0)
    o = mp.n_obs
    shared = 0
    for lm in np.unique(mp.obs_lm[:o][mp.obs_mask[:o]]):
        sel = (mp.obs_lm[:o] == lm) & mp.obs_mask[:o]
        clients = set(mp.kf_ids[mp.obs_kf[:o][sel], 1].tolist())
        if len(clients) > 1:
            shared += 1
    assert shared >= 1


def test_large_drift_loop_corrected_pgo(world, vocab):
    """Heavy accumulated drift: the corrected-pose seeding must let PGO
    converge to a small ATE after closure (the reference initializes PGO
    from `ConnectLoop`'s corrected poses, `optimization_be.cpp:875-887`).
    Round 1 seeded from the uncorrected poses."""
    # robust loss off: with a SINGLE loop edge vs ~100 odometry edges the
    # Cauchy loss discounts the one informative constraint; the reference
    # default (Cauchy 0.5) targets EuRoC runs with many loop edges
    cfg = _cfg(matches_thres=10, inliers_thres=10, total_matches_thres=12,
               use_robust_loss=False)
    mgr = MapManager(vocab, cfg)
    sess = AgentSession(0, mgr, cfg)
    agent = SyntheticAgent(world, 0, n_keyframes=22, pose_drift=0.05)
    for m in agent.messages():
        sess.ingest(m)
    sess.flush()
    assert mgr.n_loops >= 1, "no loop closed on the drifted trajectory"
    mp = mgr.map_of(0)

    # (a) the measured loop transform must be drift-corrected, i.e. match
    # the GT relative pose, NOT the drifted map relative (the round-1
    # pipeline measured the drifted relative, making closure a no-op)
    lc = mp.loops[0]
    q_id = mp.kf_ids[lc["kf1"], 0]
    c_id = mp.kf_ids[lc["kf2"], 0]
    T_gt = np.asarray(geo.pose_relative(
        jnp.asarray(np.asarray(agent.traj.poses)[q_id]),
        jnp.asarray(np.asarray(agent.traj.poses)[c_id]),
    ))
    assert np.linalg.norm(lc["T_12"][4:7] - T_gt[4:7]) < 0.15

    # (b) PGO enforces the loop edge: post-solve relative == measurement
    T_rel = np.asarray(geo.pose_relative(
        jnp.asarray(mp.kf_pose[lc["kf1"]]), jnp.asarray(mp.kf_pose[lc["kf2"]])
    ))
    assert np.linalg.norm(T_rel[4:7] - lc["T_12"][4:7]) < 1e-3

    # (c) overall ATE improves vs the drift-only (VIO) trajectory; with a
    # single loop + genuinely wrong odometry the graph optimum cannot
    # reach GT, but it must reclaim a meaningful share
    rows = mp.live_kf_rows(0)
    gt = np.asarray(agent.traj.poses)[mp.kf_ids[rows, 0]][:, 4:7]
    est = mp.kf_pose[rows][:, 4:7]
    vio = agent._vio_poses[mp.kf_ids[rows, 0]][:, 4:7]
    ate = float(np.sqrt(np.mean(np.sum((est - gt) ** 2, -1))))
    ate_vio = float(np.sqrt(np.mean(np.sum((vio - gt) ** 2, -1))))
    assert ate_vio > 0.20, "drift did not accumulate; test is vacuous"
    assert ate < 0.85 * ate_vio, f"ATE {ate:.3f} vs drift-only {ate_vio:.3f}"
