"""Headline benchmark: REAL back-end keyframe ingest throughput.

Unlike a synthetic kernel loop, this times the actual product path the
server worker runs per drained message window
(`covins_tpu/comm/server.py::_work_loop` -> `AgentSession.ingest_many`):

  * map SoA bookkeeping per message (keyframe rows, landmark lifting,
    observation COO, landmark culling) — host numpy;
  * batched landmark attribute refresh (representative descriptor +
    normal) — device;
  * batched BoW vocabulary assignment + database insert + retrieval
    scoring for the whole window in ONE device dispatch
    (`KeyframeDatabase.add_and_query_batch`);
  * per-keyframe loop-detection gating, consistency grouping, and — when
    candidates survive — the full RANSAC/GN verification and PGO.

This is the work the reference server does per keyframe on a 16-vCPU box
(`communicator_be.cpp:181-205` ingest, `kf_database.cpp:47-187` DBoW2
transform+query, `placerec_be.cpp:63-113` dense matching), minus wire
decode (both sides measured on pre-decoded messages).

Baseline: the reference's single-stream per-KF pipeline costs ~20 ms
(DBoW2 transform ~5 ms + inverted-index query + 8-thread brute-force
match ~10 ms, per the paper's server sizing `readme.md:264`) => ~50 KF/s.
`vs_baseline` is measured KF/s / 50.
"""

import json
import time

import numpy as np


N_AGENTS = 2
N_KF = 128           # keyframes per agent
N_LANDMARKS = 2000
VOCAB_WORDS = 512
WINDOW = 256         # messages per drained window (= the server's drain cap)


def build_streams():
    from covins_tpu.agents.synthetic_agent import SyntheticAgent, SyntheticWorld

    world = SyntheticWorld.create(n_landmarks=N_LANDMARKS, seed=0)
    streams = []
    for cid in range(N_AGENTS):
        agent = SyntheticAgent(
            world, cid, n_keyframes=N_KF, t0=5.0 * cid, pose_drift=0.02
        )
        streams.append(list(agent.messages()))
    return world, streams


def make_windows(streams):
    """Interleave the agent streams into drained windows, the way the
    server worker sees them: per-client message order preserved."""
    windows = []
    cursors = [0] * len(streams)
    while any(c < len(s) for c, s in zip(cursors, streams)):
        window = {}
        budget = WINDOW
        while budget > 0:
            progressed = False
            for cid, s in enumerate(streams):
                if cursors[cid] < len(s) and budget > 0:
                    window.setdefault(cid, []).append(s[cursors[cid]])
                    cursors[cid] += 1
                    budget -= 1
                    progressed = True
            if not progressed:
                break
        windows.append(window)
    return windows


def run_pass(world, windows, cfg):
    """One full ingest pass through fresh sessions; returns (n_kf, dt)."""
    import jax.numpy as jnp

    from covins_tpu.models.map_manager import MapManager
    from covins_tpu.models.session import AgentSession
    from covins_tpu.ops import bow as bow_ops

    vocab = np.asarray(
        bow_ops.train_vocabulary(
            jnp.asarray(world.lm_descs), k=VOCAB_WORDS, iters=4
        )
    )
    manager = MapManager(vocab, cfg)
    sessions = {
        cid: AgentSession(cid, manager, cfg) for cid in range(N_AGENTS)
    }
    n_kf = 0
    t0 = time.perf_counter()
    for window in windows:
        for cid, msgs_ in window.items():
            sessions[cid].ingest_many(msgs_)
    for s in sessions.values():
        s.flush()
        n_kf += s.stats["keyframes"]
    dt = time.perf_counter() - t0
    return n_kf, dt, manager


def hamming_ab():
    """A/B: Pallas packed-descriptor kernel vs unpack-±1 matmul on a
    retrieval-shaped Hamming problem (8192 descriptors x 1024 words).
    Records both so the dispatcher's choice is evidence, not faith."""
    import jax
    import jax.numpy as jnp

    from covins_tpu.ops import descriptors as d_ops

    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (8192, 32), 0, 256, jnp.int32).astype(jnp.uint8)
    b = jax.random.randint(key, (1024, 32), 0, 256, jnp.int32).astype(jnp.uint8)

    def timeit(fn):
        out = fn(a, b)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(a, b)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 10

    matmul_fn = jax.jit(lambda x, y: d_ops.hamming_distance(x, y, jnp.bfloat16))
    t_matmul = timeit(matmul_fn)
    result = {"unpack_matmul_ms": round(1e3 * t_matmul, 3)}
    if jax.default_backend() == "tpu":
        from covins_tpu.ops import hamming_pallas as hp

        t_pallas = timeit(jax.jit(hp.hamming_distance_auto))
        result["pallas_packed_ms"] = round(1e3 * t_pallas, 3)
        result["pallas_speedup"] = round(t_matmul / t_pallas, 2)
    return result


def main():
    import os

    import jax

    jax.config.update("jax_enable_x64", True)
    # persistent executable cache: tunneled-TPU compiles cost minutes, and
    # the warmup pass only pays them once per cache lifetime this way
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("COVINS_TPU_COMPILE_CACHE",
                           "/tmp/covins_tpu_xla_cache_tpu"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    from covins_tpu.utils.config import Config

    cfg = Config()
    world, streams = build_streams()
    windows = make_windows(streams)

    # pass 1: compile warmup (all jit signatures of the steady-state path)
    run_pass(world, windows, cfg)
    # pass 2: timed, fresh server state, warm executables
    n_kf, dt, manager = run_pass(world, windows, cfg)

    kfs_per_s = n_kf / dt
    baseline = 50.0  # C++ per-KF pipeline estimate (see module docstring)
    print(json.dumps({
        "metric": "backend_keyframe_ingest_throughput",
        "value": round(kfs_per_s, 2),
        "unit": "keyframes/s/chip",
        "vs_baseline": round(kfs_per_s / baseline, 2),
        "detail": {
            "n_keyframes": int(n_kf),
            "n_agents": N_AGENTS,
            "wall_s": round(dt, 3),
            "loops_closed": int(manager.n_loops),
            "merges": int(manager.n_merges),
            "path": "AgentSession.ingest_many (real server worker path)",
            "hamming_ab": hamming_ab(),
        },
    }))


if __name__ == "__main__":
    main()
