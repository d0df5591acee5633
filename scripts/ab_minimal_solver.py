"""A/B: 5-pt (Nister) vs 8-pt central relative-pose RANSAC under outlier
sweeps — the evidence for `rel_minimal_solver`'s default (VERDICT r03 #5;
reference prefilter: OpenGV 5-pt STEWENIUS, `RelNonCentralPosSolver.cpp:
343-377`).

For each outlier ratio, run both solvers on T trials of a synthetic
central pair (same data, same hypothesis budget) and record success rate
(rotation error < 1 deg AND >= 80% of true inliers recovered) and wall
time.  Writes AB_MINIMAL_SOLVER.json.

Usage: JAX_PLATFORMS=cpu python scripts/ab_minimal_solver.py [--trials 20]
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
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--n-points", type=int, default=100)
    ap.add_argument("--hypotheses", type=int, default=64)
    ap.add_argument("--ratios", type=float, nargs="*",
                    default=[0.1, 0.2, 0.3, 0.4, 0.5, 0.6])
    ap.add_argument("--out", default="AB_MINIMAL_SOLVER.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from covins_tpu.ops import epipolar as epi
    from covins_tpu.utils import geometry as geo

    N = args.n_points

    def make_pair(key, n_out):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        pts = jax.random.uniform(k1, (N, 3), jnp.float64, -4.0, 4.0) \
            + jnp.asarray([0.0, 0.0, 10.0])
        w = jax.random.normal(k2, (3,), jnp.float64) * 0.2
        t = jax.random.normal(k3, (3,), jnp.float64)
        t = t / jnp.linalg.norm(t)
        T = geo.pose_from_qt(geo.quat_exp(w), t)
        fa = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        pb = geo.pose_apply(geo.pose_inverse(T)[None], pts)
        fb = pb / jnp.linalg.norm(pb, axis=-1, keepdims=True)
        bad = jax.random.normal(k4, (n_out, 3), jnp.float64)
        fb = fb.at[:n_out].set(bad / jnp.linalg.norm(bad, -1, keepdims=True))
        return fa, fb, T

    solvers = {
        "5pt": epi.relative_pose_ransac_central_5pt,
        "8pt": epi.relative_pose_ransac_central,
    }
    mask = jnp.ones(N, bool)
    report = {"n_points": N, "hypotheses": args.hypotheses,
              "trials": args.trials, "ratios": {}}
    for ratio in args.ratios:
        n_out = int(round(ratio * N))
        row = {}
        for name, fn in solvers.items():
            ok = 0
            t_total = 0.0
            for trial in range(args.trials):
                key = jax.random.PRNGKey(1000 * trial + int(ratio * 100))
                fa, fb, T_true = make_pair(key, n_out)
                t0 = time.perf_counter()
                out = fn(jax.random.PRNGKey(trial), fa, fb, mask,
                         n_hypotheses=args.hypotheses, threshold_rad=0.002)
                jax.block_until_ready(out["T_a_b"])
                t_total += time.perf_counter() - t0
                dq = geo.quat_multiply(
                    geo.quat_conjugate(geo.pose_q(out["T_a_b"])),
                    geo.pose_q(T_true))
                rot_err = float(jnp.linalg.norm(geo.quat_log(dq)))
                n_inl = int(out["n_inliers"])
                if rot_err < 0.0175 and n_inl >= 0.8 * (N - n_out):
                    ok += 1
            row[name] = {
                "success_rate": round(ok / args.trials, 3),
                "mean_ms": round(1e3 * t_total / args.trials, 1),
            }
        report["ratios"][str(ratio)] = row
        print(f"outliers={ratio:.1f}: " + "  ".join(
            f"{k}: {v['success_rate']:.2f} ({v['mean_ms']:.0f} ms)"
            for k, v in row.items()), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
