"""Wire protocol + TCP server end-to-end tests."""

import asyncio
import socket
import threading
import time

import numpy as np
import jax.numpy as jnp
import pytest

from covins_tpu.agents.synthetic_agent import SyntheticAgent, SyntheticWorld
from covins_tpu.comm import messages as msgs, wire
from covins_tpu.comm.client import AgentClient
from covins_tpu.comm.server import CovinsServer
from covins_tpu.ops import bow as bow_ops
from covins_tpu.utils.config import Config


def test_record_roundtrip():
    rec = {
        "f64": np.arange(12, dtype=np.float64).reshape(3, 4),
        "u8": np.arange(8, dtype=np.uint8),
        "scalar": np.float64(3.5),
        "i64pair": np.asarray([3, 1], np.int64),
        "name": "hello world",
        "nothing": None,
    }
    buf = wire.encode_record(rec)
    out = wire.decode_record(memoryview(buf))
    assert set(out) == set(rec)
    np.testing.assert_array_equal(out["f64"], rec["f64"])
    np.testing.assert_array_equal(out["u8"], rec["u8"])
    assert float(out["scalar"]) == 3.5
    assert out["name"] == "hello world"
    assert out["nothing"] is None


def test_message_roundtrip():
    world = SyntheticWorld.create(n_landmarks=50, seed=3)
    agent = SyntheticAgent(world, client_id=2, n_keyframes=3)
    for msg in agent.messages():
        blob = wire.encode_message(msg)
        msg_type, plen = wire.parse_header(blob[: wire.HEADER_SIZE])
        out = wire.decode_message(msg_type, memoryview(blob[wire.HEADER_SIZE:]))
        assert type(out) is type(msg)
        assert tuple(out.id) == tuple(msg.id)
        if isinstance(msg, msgs.MsgKeyframe):
            np.testing.assert_array_equal(out.descriptors, msg.descriptors)
            np.testing.assert_allclose(out.keypoints, msg.keypoints)
            if msg.preintegration is not None:
                np.testing.assert_allclose(
                    out.preintegration.acc, msg.preintegration.acc
                )
            if msg.calibration is not None:
                np.testing.assert_allclose(
                    out.calibration.intrinsics, msg.calibration.intrinsics
                )
        else:
            np.testing.assert_allclose(out.pos_ref, msg.pos_ref)
            assert out.observations == msg.observations


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture()
def server(tmp_path):
    world = SyntheticWorld.create(n_landmarks=300, seed=1)
    vocab = np.asarray(
        bow_ops.train_vocabulary(jnp.asarray(world.lm_descs), k=64, iters=3)
    )
    cfg = Config(
        placerec_type="COVINS", start_after_kf=2, consecutive_loop_dist=6,
        min_loop_dist=6, exclude_kfs_with_id_less_than=2,
        cov_consistency_thres=2, matches_thres=12, matches_thres_merge=12,
        inliers_thres=12, ransac_min_inliers=5, perform_pgo=False,
        activate_lm_culling=False,
    )
    port = _free_port()
    srv = CovinsServer(vocab, cfg, host="127.0.0.1", port=port,
                       output_dir=str(tmp_path))
    srv.start_background()
    yield srv, port, world, str(tmp_path)
    srv.stop()


def test_agent_reconnect_resume(server):
    """An agent that drops mid-stream and reconnects with its old id
    replays from the start; duplicates are skipped (the reference fatals
    on this, readme.md:315-318 — here it is supported)."""
    srv, port, world, _ = server
    agent = SyntheticAgent(world, client_id=0, n_keyframes=10)
    stream = list(agent.messages())
    c1 = AgentClient("127.0.0.1", port)
    cid = c1.client_id
    for m in stream[: len(stream) // 2]:
        c1.send(m)
    c1.sock.close()  # abrupt hang-up, no FINISH
    time.sleep(0.5)

    c2 = AgentClient("127.0.0.1", port, resume_client_id=cid)
    assert c2.client_id == cid
    for m in stream:  # replay EVERYTHING from the start
        c2.send(m)
    deadline = time.time() + 60
    while time.time() < deadline:
        stats = c2.admin("stats")
        sess = stats["result"]["sessions"].get(str(cid), {})
        if sess.get("keyframes") == 10:
            break
        time.sleep(0.2)
    assert sess["keyframes"] == 10
    assert sess["duplicates"] > 0
    c2.finish()


@pytest.mark.slow
def test_update_planes_end_to_end(tmp_path):
    """Both update planes over real TCP:

    * agent->server: the synthetic agent re-sends its last
      `update_window_size` keyframes as `MsgKeyframeUpdate` + landmark
      position updates (`orb_slam3/src/comm/communicator.cpp:54-81`);
      the server consumes them under `comm.send_updates`.
    * server->agent: with `comm.data_to_client`, the server pushes the
      newest keyframe's pose back at `to_agent_freq`
      (`communicator_be.cpp:51-69`); the agent observes it via
      `poll_updates()` without desynchronizing the stream.
    """
    world = SyntheticWorld.create(n_landmarks=300, seed=1)
    vocab = np.asarray(
        bow_ops.train_vocabulary(jnp.asarray(world.lm_descs), k=64, iters=3)
    )
    cfg = Config(
        placerec_active=False, perform_pgo=False, activate_lm_culling=False,
        send_updates=True, data_to_client=True, to_agent_freq=20.0,
    )
    port = _free_port()
    srv = CovinsServer(vocab, cfg, host="127.0.0.1", port=port,
                       output_dir=str(tmp_path))
    srv.start_background()
    try:
        client = AgentClient("127.0.0.1", port)
        agent = SyntheticAgent(world, client_id=client.client_id,
                               n_keyframes=8, send_updates=True,
                               update_window_size=3)
        n_kf_updates = n_lm_updates = 0
        for m in agent.messages():
            if isinstance(m, msgs.MsgKeyframeUpdate):
                n_kf_updates += 1
            if isinstance(m, msgs.MsgLandmarkUpdate):
                n_lm_updates += 1
            client.send(m)
            client.poll_updates()  # interleave with the server push plane
        assert n_kf_updates > 0 and n_lm_updates > 0  # agent plane active
        # wait for ingest to drain, then for a pushed pose covering KF>=5
        deadline = time.time() + 60
        got_push = False
        while time.time() < deadline:
            stats = client.admin("stats")
            done = stats["result"]["maps"].get("0", {}).get("n_kf") == 8
            for u in client.poll_updates(timeout=0.1):
                if isinstance(u, msgs.MsgKeyframeUpdate) and u.id[0] >= 5:
                    got_push = True
            if done and got_push:
                break
            time.sleep(0.1)
        assert got_push, "no server->agent keyframe-update push observed"
        # the pushed pose matches the server's map state for that keyframe
        u = [m for m in client.updates
             if isinstance(m, msgs.MsgKeyframeUpdate)][-1]
        mp = srv.manager.map_of(client.client_id)
        from covins_tpu.utils import npgeo
        kf0 = mp.kf_row((0, client.client_id))
        row = mp.kf_row(tuple(u.id))
        expect = npgeo.pose_relative(mp.kf_pose[kf0], mp.kf_pose[row])
        np.testing.assert_allclose(np.asarray(u.T_sref_s), expect, atol=1e-9)
        # server consumed agent-plane updates without desync: session alive
        # and duplicate-free keyframe count
        sess_stats = stats["result"]["sessions"][str(client.client_id)]
        assert sess_stats["keyframes"] == 8
        client.finish()
    finally:
        srv.stop()


def test_server_end_to_end(server):
    srv, port, world, out_dir = server
    client = AgentClient("127.0.0.1", port)
    assert client.client_id == 0
    agent = SyntheticAgent(world, client_id=client.client_id, n_keyframes=12)
    for msg in agent.messages():
        client.send(msg)
    # admin stats over the same socket (messages are processed async,
    # admin waits for the worker, so a round trip flushes the queue)
    deadline = time.time() + 60
    while time.time() < deadline:
        stats = client.admin("stats")
        if stats["result"]["maps"].get("0", {}).get("n_kf") == 12:
            break
        time.sleep(0.2)
    assert stats["result"]["maps"]["0"]["n_kf"] == 12
    assert stats["result"]["maps"]["0"]["n_lm"] > 30
    client.finish()
    # finish triggers trajectory write-out (atomic: the file appears whole)
    deadline = time.time() + 20
    import os
    path = os.path.join(out_dir, "KF_0_ftum.csv")
    while time.time() < deadline and not os.path.exists(path):
        time.sleep(0.2)
    assert os.path.exists(path)
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 12


@pytest.mark.slow
def test_admin_default_map_after_merge(server):
    """After two agents merge into one map, the absorbed map id is gone;
    a default (no --map-id) gba/pgo/savemap must resolve to the live map
    instead of KeyError-ing on id 0 (found by the e2e drive)."""
    srv, port, world, out_dir = server
    # generous socket timeout: the worker may be mid-verification (RANSAC
    # compiles on first hit) when the admin frame lands
    c0 = AgentClient("127.0.0.1", port, timeout=300.0)
    c1 = AgentClient("127.0.0.1", port, timeout=300.0)
    a0 = SyntheticAgent(world, client_id=c0.client_id, n_keyframes=14)
    a1 = SyntheticAgent(world, client_id=c1.client_id, n_keyframes=14,
                        t0=3.0)
    for m in a0.messages():
        c0.send(m)
    for m in a1.messages():
        c1.send(m)
    deadline = time.time() + 120
    merged = False
    while time.time() < deadline and not merged:
        stats = c0.admin("stats")
        merged = any(s.get("merges", 0) > 0
                     for s in stats["result"]["sessions"].values())
        if not merged:
            time.sleep(0.3)
    assert merged, stats
    assert len(stats["result"]["maps"]) == 1
    live_id = int(next(iter(stats["result"]["maps"])))
    # default verbs resolve to the surviving map, whatever its id
    r = c0.admin("gba", visual_only=True)
    assert r.get("result", {}).get("ok"), r
    r = c0.admin("pgo")
    assert r.get("result", {}).get("ok"), r
    # an explicit dead id reports the live ids instead of crashing
    dead = 1 - live_id if live_id in (0, 1) else 0
    r = c0.admin("gba", map_id=dead)
    assert "error" in r and "live" in r["error"], r
    c0.finish()
    c1.finish()
