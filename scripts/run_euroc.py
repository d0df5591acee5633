"""EuRoC multi-agent collaborative run + ATE report.

The analog of the reference's canonical example scripts
(`orb_slam3/covins_examples/euroc_examples_mh12345_vigba.sh` +
`docs/run_COVINS.md:47-49`): starts the back-end server, replays N EuRoC
sequences as agents over TCP, triggers visual-inertial GBA, writes the
per-agent TUM trajectories, and evaluates ATE RMSE against each
sequence's ground truth (the `evo_ape euroc ... -vas` role,
`docs/run_COVINS.md:106-115`) into one JSON report.

Usage:
  python scripts/run_euroc.py --seqs datasets/euroc/MH_01_easy \
      [datasets/euroc/MH_02_easy ...] [--max-keyframes 400] \
      [--out output/euroc] [--placerec-type COVINS] [--no-gba]

Each --seqs entry must contain `mav0/` (see scripts/fetch_euroc.sh).
Reproduces BASELINE config #4 with all five MH sequences.
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _gt_tum(seq_dir: str, out_path: str) -> str:
    """EuRoC ground-truth state -> TUM file (stamp x y z qx qy qz qw)."""
    import csv

    gt = os.path.join(seq_dir, "mav0", "state_groundtruth_estimate0",
                      "data.csv")
    with open(gt) as f, open(out_path, "w") as o:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            t = float(row[0]) * 1e-9
            x, y, z = row[1:4]
            qw, qx, qy, qz = row[4:8]
            o.write(f"{t} {x} {y} {z} {qx} {qy} {qz} {qw}\n")
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", nargs="+", required=True,
                    help="EuRoC sequence dirs (each containing mav0/)")
    ap.add_argument("--port", type=int, default=9931)
    ap.add_argument("--out", default="output/euroc")
    ap.add_argument("--max-keyframes", type=int, default=0,
                    help="cap keyframes per agent (0 = full sequence)")
    ap.add_argument("--placerec-type", default="COVINS",
                    choices=["COVINS", "COVINS_G"])
    ap.add_argument("--no-gba", action="store_true")
    ap.add_argument("--drift", type=float, default=0.0,
                    help="synthetic odometry drift injected per agent")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop the axon remote-compile hook…
    # …and any platform that depended on it (JAX_PLATFORMS=axon)
    env["JAX_PLATFORMS"] = os.environ.get("COVINS_RUN_PLATFORM", "cpu")

    server_log = open(os.path.join(args.out, "server.log"), "w")
    server = subprocess.Popen(
        [sys.executable, "-m", "covins_tpu.cli", "server",
         "--port", str(args.port), "--output-dir", args.out,
         "--placerec-type", args.placerec_type],
        cwd=_REPO, env=env, stdout=server_log, stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.time() + 120
        logp = os.path.join(args.out, "server.log")
        while time.time() < deadline:
            if os.path.exists(logp) and "listening" in open(logp).read():
                break
            time.sleep(0.5)
        else:
            raise RuntimeError("server did not come up")

        agents = []
        for seq in args.seqs:
            cmd = [sys.executable, "-m", "covins_tpu.cli", "agent",
                   "--port", str(args.port), "--euroc", seq]
            if args.max_keyframes:
                cmd += ["--keyframes", str(args.max_keyframes)]
            if args.drift:
                cmd += ["--drift", str(args.drift)]
            log = open(os.path.join(
                args.out, f"agent_{os.path.basename(seq)}.log"), "w")
            agents.append(subprocess.Popen(
                cmd, cwd=_REPO, env=env, stdout=log,
                stderr=subprocess.STDOUT))
        rc = [a.wait() for a in agents]
        if any(rc):
            raise RuntimeError(f"agents failed: {rc}")

        def admin(*verb_args):
            return subprocess.run(
                [sys.executable, "-m", "covins_tpu.cli", "admin", *verb_args,
                 "--port", str(args.port)],
                cwd=_REPO, env=env, capture_output=True, text=True,
                timeout=3600,
            ).stdout

        stats = json.loads(admin("stats"))
        report = {"stats": stats.get("result", {}), "sequences": {}}
        if not args.no_gba:
            for mid in stats.get("result", {}).get("maps", {}):
                report[f"gba_map_{mid}"] = json.loads(
                    admin("gba", "--map-id", str(mid)))

        # ATE per agent vs its sequence's ground truth
        from covins_tpu.cli import main as cli_main  # noqa: F401 (env set up)
        for cid, seq in enumerate(args.seqs):
            est = os.path.join(args.out, f"KF_{cid}_ftum.csv")
            if not os.path.exists(est):
                report["sequences"][seq] = {"error": "no trajectory written"}
                continue
            gt = _gt_tum(seq, os.path.join(args.out, f"gt_{cid}_tum.txt"))
            out = subprocess.run(
                [sys.executable, "-m", "covins_tpu.cli", "ate",
                 "--est", est, "--gt", gt],
                cwd=_REPO, env=env, capture_output=True, text=True,
            ).stdout
            report["sequences"][seq] = json.loads(out)
        path = os.path.join(args.out, "euroc_report.json")
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report, indent=2))
        print(f"[run_euroc] report -> {path}")
    finally:
        server.terminate()
        server.wait(timeout=30)


if __name__ == "__main__":
    main()
