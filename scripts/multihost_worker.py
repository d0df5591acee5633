"""One process of the multi-host scaling benchmark.

Launched N times by `scripts/run_multihost_bench.py` (or once per real
host).  Each process owns `--devices-per-host` local devices; together
they form one global mesh over `jax.distributed` (DCN plane — Gloo/gRPC
on CPU here, ICI/DCN on real TPU slices; SURVEY.md §2.5).  The workload
is the back-end's two scaling axes on a NON-TOY problem:

  * sharded visual-inertial GBA steps (observation COO + landmark blocks
    sharded over the global mesh, >=10^4 observations), and
  * sharded BoW retrieval (row-sharded database, replicated queries).

Process 0 writes a JSON result; the launcher combines per-N results into
the scaling-efficiency artifact (BASELINE target: >=70% at N>=2 hosts).
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", default="127.0.0.1:9920")
    ap.add_argument("--devices-per-host", type=int, default=2)
    ap.add_argument("--n-kf", type=int, default=64)
    ap.add_argument("--n-lm", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--db-rows", type=int, default=8192)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--out", default="")
    ap.add_argument("--cg-variant", default="fused",
                    choices=["fused", "classic"],
                    help="PCG recurrence: Chronopoulos-Gear fused "
                         "reductions (default) vs classic two-round")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.devices_per_host}"
        ).strip()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from covins_tpu.parallel import sharding as sh

    if args.num_processes > 1:
        sh.multihost_initialize(
            args.coordinator, args.num_processes, args.process_id
        )
    from jax.experimental import multihost_utils

    n_total = len(jax.devices())
    mesh = sh.make_mesh(n_total)

    # ---- workload 1: sharded GBA on >=10^4 observations -------------------
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    p = ge._build_problem(n_kf=args.n_kf, n_lm=args.n_lm)
    n_obs = int(np.asarray(p.obs_mask).sum())
    p = sh.pad_to_multiple(p, n_total)
    p = sh.shard_gba_problem_global(mesh, p)
    state = (p.poses, p.vels, p.biases, p.lms)
    lam = jnp.asarray(1e-4, p.poses.dtype)

    out = sh.gba_step_sharded(mesh, p, state, lam, n_cg=20,
                              cg_variant=args.cg_variant)
    jax.block_until_ready(out)
    if args.num_processes > 1:
        multihost_utils.sync_global_devices("gba_warm")
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = sh.gba_step_sharded(mesh, p, state, lam, n_cg=20,
                              cg_variant=args.cg_variant)
        jax.block_until_ready(out)
    if args.num_processes > 1:
        multihost_utils.sync_global_devices("gba_done")
    gba_step_s = (time.perf_counter() - t0) / args.steps
    cost = float(out[-1])

    # ---- workload 2: sharded retrieval ------------------------------------
    key = jax.random.PRNGKey(0)
    v = 512
    db = jax.random.uniform(key, (args.db_rows, v), jnp.float32)
    db = np.asarray(db / jnp.linalg.norm(db, axis=-1, keepdims=True))
    queries = db[np.arange(args.queries) * (args.db_rows // args.queries)]
    db_g = sh.shard_rows_global(mesh, db)
    q_g = sh.replicate_global(mesh, queries)

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def query_batch(db, qs, k):
        scores = qs @ db.T  # (Q, N), N sharded -> psum-merged top-k
        return jax.lax.top_k(scores, k)

    with mesh:
        outq = query_batch(db_g, q_g, 10)
        jax.block_until_ready(outq)
        if args.num_processes > 1:
            multihost_utils.sync_global_devices("ret_warm")
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            outq = query_batch(db_g, q_g, 10)
            jax.block_until_ready(outq)
        if args.num_processes > 1:
            multihost_utils.sync_global_devices("ret_done")
        retrieval_s = (time.perf_counter() - t0) / reps
    top1 = np.asarray(outq[1][:, 0])
    expect = np.arange(args.queries) * (args.db_rows // args.queries)
    assert (top1 == expect).all(), "sharded retrieval returned wrong top-1"

    if args.process_id == 0:
        result = {
            "num_processes": args.num_processes,
            "devices_per_host": args.devices_per_host,
            "total_devices": n_total,
            "cg_variant": args.cg_variant,
            "gba": {
                "n_kf": args.n_kf, "n_lm": args.n_lm, "n_obs": n_obs,
                "step_ms": round(1e3 * gba_step_s, 2),
                "final_cost": cost,
            },
            "retrieval": {
                "db_rows": args.db_rows, "batch": args.queries,
                "batch_ms": round(1e3 * retrieval_s, 3),
                "queries_per_s": round(args.queries / retrieval_s, 1),
            },
        }
        text = json.dumps(result)
        if args.out:
            with open(args.out, "w") as f:
                f.write(text + "\n")
        print(text, flush=True)


if __name__ == "__main__":
    main()
