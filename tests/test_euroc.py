"""EuRoC replay agent test — runs only when a sequence directory is
provided via COVINS_EUROC_DIR (e.g. .../MH_01_easy).  The container has no
dataset download, so CI-by-default this is skipped; the synthetic scenarios
cover the same code paths."""

import os

import numpy as np
import pytest

SEQ = os.environ.get("COVINS_EUROC_DIR")

pytestmark = pytest.mark.skipif(
    not SEQ or not os.path.isdir(SEQ), reason="set COVINS_EUROC_DIR to run"
)


def test_euroc_agent_stream():
    import jax.numpy as jnp
    from covins_tpu.agents.euroc_agent import EurocAgent
    from covins_tpu.comm import messages as msgs
    from covins_tpu.models.map_store import Map

    agent = EurocAgent(SEQ, client_id=0, max_keyframes=15)
    mp = Map(0)
    n_kf = n_lm = 0
    for m in agent.messages():
        if isinstance(m, msgs.MsgKeyframe):
            mp.add_keyframe(m)
            n_kf += 1
        else:
            mp.add_landmark(m)
            n_lm += 1
    assert n_kf == 15
    assert n_lm > 50
    assert mp.n_obs > n_lm
    # IMU windows preintegrate to sane relative motions
    p = mp.to_gba_problem()
    assert int(p.imu_mask.sum()) >= 10
