"""Host-layer scale test: 5 agents x 500 keyframes through the REAL
session path (marked `slow`; run with --runslow / COVINS_RUN_SLOW=1).

Exercises what only shows up at size (and what a 30-KF test cannot):
capacity doubling of every SoA axis, retrieval-database growth +
erase-on-cull at size, multi-agent map merging, redundancy removal, and
a merged-map GBA — while asserting an ingest wall-clock budget so host-
layer regressions (the reference-scale analog of
`euroc_examples_mh12345_vigba.sh`) fail loudly.
"""

import time

import numpy as np
import jax.numpy as jnp
import pytest

from covins_tpu.agents.synthetic_agent import SyntheticAgent, SyntheticWorld
from covins_tpu.models.map_manager import MapManager
from covins_tpu.models.session import AgentSession
from covins_tpu.ops import bow as bow_ops
from covins_tpu.utils.config import Config

N_AGENTS = 5
N_KF = 500


@pytest.mark.slow
def test_five_agents_500kf_scale():
    world = SyntheticWorld.create(n_landmarks=2000, seed=3)
    vocab = np.asarray(
        bow_ops.train_vocabulary(jnp.asarray(world.lm_descs), k=256, iters=4)
    )
    cfg = Config(
        placerec_type="COVINS", start_after_kf=2,
        consecutive_loop_dist=30,  # bound PGO count at this length
        min_loop_dist=20, exclude_kfs_with_id_less_than=2,
        cov_consistency_thres=2, matches_thres=12, matches_thres_merge=12,
        inliers_thres=12, ransac_min_inliers=5, perform_pgo=False,
        activate_lm_culling=True,
    )
    mgr = MapManager(vocab, cfg)
    sessions = {c: AgentSession(c, mgr, cfg) for c in range(N_AGENTS)}
    streams = {
        c: list(SyntheticAgent(world, c, n_keyframes=N_KF,
                               t0=2.0 * c, pose_drift=0.01).messages())
        for c in range(N_AGENTS)
    }

    # interleave in server-drain windows of 64 messages per client turn
    t0 = time.perf_counter()
    cursors = {c: 0 for c in streams}
    while any(cursors[c] < len(streams[c]) for c in streams):
        for c, s in streams.items():
            i = cursors[c]
            if i >= len(s):
                continue
            sessions[c].ingest_many(s[i: i + 64])
            cursors[c] = i + 64
    for s in sessions.values():
        s.flush()
    dt = time.perf_counter() - t0
    n_kf_total = sum(s.stats["keyframes"] for s in sessions.values())
    kfs_per_s = n_kf_total / dt
    print(f"\n[scale] {n_kf_total} KFs / {dt:.1f}s = {kfs_per_s:.1f} KF/s; "
          f"loops={mgr.n_loops} merges={mgr.n_merges}", flush=True)

    assert n_kf_total == N_AGENTS * N_KF
    # wall-clock budget: the host layer must not be the bottleneck
    assert kfs_per_s > 5.0, f"ingest too slow at scale: {kfs_per_s:.2f} KF/s"

    # all five agents fused into one joint map via inter-map loops
    assert mgr.n_merges >= N_AGENTS - 1
    assert len(mgr.maps) == 1
    joint = next(iter(mgr.maps.values()))
    assert set(range(N_AGENTS)) <= joint.associated_clients

    # capacity doubling happened on every axis (init: 256 KF / 4096 LM /
    # 16384 obs)
    assert joint.kf_ids.shape[0] >= 2048
    assert joint.n_obs > 16384
    assert joint.n_lm > 4096

    # redundancy removal at size + database erase-on-cull
    db = mgr.database
    live_before = int(db._mask[: db.n].sum())
    removed = joint.remove_redundant_keyframes(threshold=0.5,
                                               max_time_dist=10.0)
    assert removed > 0
    live_after = int(db._mask[: db.n].sum())
    assert live_after == live_before - removed

    # merged-map visual-inertial GBA runs and improves (bounded budget)
    from covins_tpu.ops import gba as gba_mod
    p = joint.to_gba_problem()
    _, info = gba_mod.global_bundle_adjustment(p, n_gn=2, n_cg=20)
    costs = np.asarray(info["costs"])
    assert np.isfinite(costs[-1]) and costs[-1] < costs[0]
