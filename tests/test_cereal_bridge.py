"""Reference-protocol (cereal/TCP) bridge tests.

The decode path is the product surface (`comm/cereal_bridge.py` +
`CovinsServer(cereal_port=...)`): a stock C++ COVINS front-end's framed
containers and cereal BinaryArchive payloads
(`communicator_base.cpp:276-315`, `msg_keyframe.hpp:128-287`) must ingest
into the TPU back-end.  The encoder here is the byte-layout mirror used
to record reference-protocol streams without the C++ toolchain.
"""

import socket
import time

import numpy as np
import pytest

from covins_tpu.comm import cereal_bridge as cb
from covins_tpu.comm import messages as msgs


def _stream(n_kf=8, n_lm=300):
    from covins_tpu.agents.synthetic_agent import SyntheticAgent, SyntheticWorld

    world = SyntheticWorld.create(n_landmarks=n_lm, seed=0)
    agent = SyntheticAgent(world, 0, n_keyframes=n_kf)
    return world, [m for m in agent.messages()
                   if isinstance(m, (msgs.MsgKeyframe, msgs.MsgLandmark))]


def test_keyframe_roundtrip():
    _, stream = _stream(n_kf=3)
    kf = next(m for m in stream if isinstance(m, msgs.MsgKeyframe))
    out = cb.decode_keyframe(cb.encode_keyframe(kf), is_update=False)
    assert out.id == tuple(kf.id)
    assert out.timestamp == kf.timestamp
    np.testing.assert_allclose(out.keypoints, kf.keypoints, atol=1e-5)
    np.testing.assert_array_equal(out.descriptors, kf.descriptors)
    np.testing.assert_allclose(out.T_sref_s, kf.T_sref_s, atol=1e-9)
    np.testing.assert_allclose(out.velocity, kf.velocity, atol=1e-12)
    # landmark binding survives the std::map<int, idpair> layout
    if kf.landmark_ids is not None:
        np.testing.assert_array_equal(
            out.landmark_ids, kf.landmark_ids[: len(out.landmark_ids)])
    # calibration core fields
    np.testing.assert_allclose(out.calibration.intrinsics[:4],
                               kf.calibration.intrinsics[:4])
    np.testing.assert_allclose(out.calibration.T_s_c, kf.calibration.T_s_c,
                               atol=1e-9)
    if kf.preintegration is not None:
        np.testing.assert_allclose(out.preintegration.acc,
                                   kf.preintegration.acc)
        np.testing.assert_allclose(out.preintegration.dts,
                                   kf.preintegration.dts)


def test_landmark_roundtrip():
    _, stream = _stream(n_kf=3)
    lm = next(m for m in stream if isinstance(m, msgs.MsgLandmark))
    out = cb.decode_landmark(cb.encode_landmark(lm), is_update=False)
    assert out.id == tuple(lm.id)
    assert out.id_reference == tuple(lm.id_reference)
    np.testing.assert_allclose(out.pos_ref, lm.pos_ref, atol=1e-12)
    assert out.observations == {tuple(k): int(v)
                                for k, v in lm.observations.items()}


def test_recorded_stream_roundtrip(tmp_path):
    _, stream = _stream(n_kf=4)
    path = str(tmp_path / "ref_stream.bin")
    n_containers = cb.record_stream(stream, path)
    assert n_containers >= 1
    decoded = list(cb.iter_stream(path))
    assert len(decoded) == len(stream)
    kinds = [type(m).__name__ for m in decoded]
    assert kinds == [type(m).__name__ for m in stream]


def test_cereal_port_ingests_end_to_end(tmp_path):
    """A recorded reference-protocol stream ingests through the server's
    cereal listener into a live map (VERDICT r04 #7 'done' criterion)."""
    import jax.numpy as jnp

    from covins_tpu.comm.server import CovinsServer
    from covins_tpu.ops import bow as bow_ops
    from covins_tpu.utils.config import Config

    world, stream = _stream(n_kf=6)
    path = str(tmp_path / "ref_stream.bin")
    cb.record_stream(stream, path)

    vocab = np.asarray(bow_ops.train_vocabulary(
        jnp.asarray(world.lm_descs), k=64, iters=2))
    cfg = Config()
    cfg.placerec_active = False

    import random
    port = random.randint(20000, 29000)
    server = CovinsServer(vocab, cfg, host="127.0.0.1", port=port,
                          cereal_port=port + 1)
    server.start_background()
    try:
        with open(path, "rb") as f:
            blob = f.read()
        s = socket.create_connection(("127.0.0.1", port + 1), timeout=10)
        hs = s.recv(cb.HEADER_BYTES)  # id-assignment container
        assert len(hs) == cb.HEADER_BYTES
        import struct
        vals = struct.unpack(f">{cb.CONTAINER_ENTRIES * 5}I", hs)
        assert vals[0] == 1  # id-assignment flag
        s.sendall(blob)
        s.close()  # hang-up == finish
        deadline = time.time() + 30
        while time.time() < deadline:
            sess = server.sessions.get(vals[1])
            if sess and sess.stats["keyframes"] >= 6:
                break
            time.sleep(0.2)
        sess = server.sessions.get(vals[1])
        assert sess is not None and sess.stats["keyframes"] == 6
        assert sess.stats["landmarks"] > 0
        mp = server.manager.map_of(vals[1])
        assert int(mp.kf_mask[: mp.n_kf].sum()) == 6
        # landmark observations were bound through the decoded
        # std::map<idpair,int> observation sets
        assert int(mp.obs_mask[: mp.n_obs].sum()) > 0
    finally:
        server.stop()
