"""EuRoC replay-agent tests.

Always-run tests use a synthetic EuRoC-ASL sequence rendered to real PNGs
(`covins_tpu/utils/fake_euroc.py`) so the FULL EuRoC code path — image
loading, OpenCV ORB extraction, mutual-NN tracking, triangulation, the
orchestration driver — is exercised without a dataset download.  With a
real sequence available, set COVINS_EUROC_DIR (see
scripts/fetch_euroc.sh) to run the same tests against it.
"""

import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

SEQ = os.environ.get("COVINS_EUROC_DIR")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fake_seq(tmp_path_factory):
    from covins_tpu.utils.fake_euroc import write_fake_sequence

    d = tmp_path_factory.mktemp("fake_euroc")
    return {
        0: write_fake_sequence(str(d / "MH_01"), n_keyframes=26,
                               n_landmarks=400, seed=1, t0=0.0),
        1: write_fake_sequence(str(d / "MH_02"), n_keyframes=26,
                               n_landmarks=400, seed=1, t0=2.0),
    }


def _stream_stats(seq_dir, max_kf=15):
    from covins_tpu.agents.euroc_agent import EurocAgent
    from covins_tpu.comm import messages as msgs
    from covins_tpu.models.map_store import Map

    agent = EurocAgent(seq_dir, client_id=0, max_keyframes=max_kf)
    mp = Map(0)
    n_kf = n_lm = 0
    for m in agent.messages():
        if isinstance(m, msgs.MsgKeyframe):
            mp.add_keyframe(m)
            n_kf += 1
        elif isinstance(m, msgs.MsgLandmark):
            mp.add_landmark(m)
            n_lm += 1
    return mp, n_kf, n_lm


def test_fake_euroc_agent_stream(fake_seq):
    mp, n_kf, n_lm = _stream_stats(fake_seq[0])
    assert n_kf >= 8, n_kf
    assert n_lm >= 50, n_lm
    # observations bound through tracking (multi-view tracks exist)
    counts = np.bincount(mp.obs_lm[: mp.n_obs][mp.obs_mask[: mp.n_obs]])
    assert (counts >= 2).sum() > 20, "no multi-view tracks survived"


@pytest.mark.slow
def test_fake_euroc_two_agent_server_run(fake_seq, tmp_path):
    """The orchestration driver (scripts/run_euroc.py — the analog of
    `euroc_examples_mh12345_vigba.sh`) on two fake sequences: server +
    2 TCP agents + VI-GBA + ATE report artifact."""
    out = str(tmp_path / "run")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_euroc.py"),
         "--seqs", fake_seq[0], fake_seq[1], "--out", out,
         "--max-keyframes", "14", "--port", "9941"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    report = json.load(open(os.path.join(out, "euroc_report.json")))
    assert len(report["sequences"]) == 2
    for seq, res in report["sequences"].items():
        assert "ate_rmse" in res, res
        # fake world is metrically exact; replayed GT odometry must land
        # within centimeters after Sim(3) alignment
        assert res["ate_rmse"] < 0.25, (seq, res)
    assert os.path.exists(os.path.join(out, "KF_0_ftum.csv"))
    assert os.path.exists(os.path.join(out, "KF_1_ftum.csv"))


pytestmark_real = pytest.mark.skipif(
    not SEQ or not os.path.isdir(SEQ), reason="set COVINS_EUROC_DIR to run"
)


@pytestmark_real
def test_real_euroc_agent_stream():
    mp, n_kf, n_lm = _stream_stats(SEQ)
    assert n_kf >= 10
    assert n_lm > 100
