"""Multi-host scaling benchmark launcher.

Spawns N worker processes (N in --process-counts), each a separate
`jax.distributed` participant with its own local devices — the CPU
simulation of N hosts on a DCN plane (on real TPU pods, run
`scripts/multihost_worker.py` once per host with the same flags).

Measures, per N: sharded GBA step wall-clock and sharded-retrieval
queries/s on the SAME global problem (strong scaling), and writes
`MULTIHOST.json` with speedups and parallel efficiencies vs the
single-process run (BASELINE target: >=70% at N>=2).

Usage:  python scripts/run_multihost_bench.py [--quick]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile


def run_n(n_procs: int, devices_per_host: int, cpus_per_host: int,
          extra: list) -> dict:
    port = 9920 + n_procs
    procs = []
    outs = []
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # strip the axon remote-compile hook
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for pid in range(n_procs):
        out = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f".mh{n_procs}.{pid}.json", delete=False
        )
        outs.append(out.name)
        cmd = [
            sys.executable, os.path.join(repo, "scripts/multihost_worker.py"),
            "--process-id", str(pid), "--num-processes", str(n_procs),
            "--coordinator", f"127.0.0.1:{port}",
            "--devices-per-host", str(devices_per_host),
            "--out", out.name, *extra,
        ]
        if cpus_per_host > 0:
            # each simulated host gets a DISJOINT physical core set —
            # without pinning, N processes time-share the same cores and
            # the measurement shows scheduler contention, not scaling
            lo = pid * cpus_per_host
            hi = lo + cpus_per_host - 1
            cmd = ["taskset", "-c", f"{lo}-{hi}" if hi > lo else str(lo)] + cmd
        procs.append(subprocess.Popen(
            cmd, cwd=repo, env=env,
            stdout=subprocess.DEVNULL if pid else None,
            stderr=subprocess.STDOUT if pid else None,
        ))
    rc = [p.wait(timeout=1800) for p in procs]
    if any(rc):
        raise RuntimeError(f"workers failed: rc={rc}")
    with open(outs[0]) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-counts", type=int, nargs="*", default=[1, 2])
    ap.add_argument("--devices-per-host", type=int, default=1)
    ap.add_argument("--cpus-per-host", type=int, default=1,
                    help="pin each simulated host to this many disjoint "
                         "cores (0 = no pinning)")
    ap.add_argument("--quick", action="store_true",
                    help="smaller problem (CI lane)")
    ap.add_argument("--cg-variant", default="fused",
                    choices=["fused", "classic"],
                    help="PCG recurrence A/B (SCALING r05)")
    ap.add_argument("--steps", type=int, default=0,
                    help="override worker GN-step count")
    ap.add_argument("--out", default="MULTIHOST.json")
    args = ap.parse_args()

    extra = (["--n-kf", "32", "--n-lm", "1024", "--steps", "5"]
             if args.quick else [])
    extra += ["--cg-variant", args.cg_variant]
    if args.steps:
        extra += ["--steps", str(args.steps)]
    results = {}
    for n in args.process_counts:
        print(f"--- running N={n} processes ---", flush=True)
        results[n] = run_n(n, args.devices_per_host, args.cpus_per_host,
                           extra)

    base = results[min(results)]
    report = {"runs": results, "scaling": {}}
    for n, r in results.items():
        if n == min(results):
            continue
        ratio = n // min(results)
        gba_speedup = base["gba"]["step_ms"] / r["gba"]["step_ms"]
        ret_speedup = (r["retrieval"]["queries_per_s"]
                       / base["retrieval"]["queries_per_s"])
        report["scaling"][n] = {
            "gba_speedup": round(gba_speedup, 3),
            "gba_efficiency": round(gba_speedup / ratio, 3),
            "retrieval_speedup": round(ret_speedup, 3),
            "retrieval_efficiency": round(ret_speedup / ratio, 3),
        }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
