"""Native C++ wire codec: byte-compatibility with the Python codec."""

import numpy as np
import pytest

from covins_tpu.comm import messages as msgs, wire
from covins_tpu.comm import native_codec


@pytest.fixture(scope="module")
def codec():
    c = native_codec.load()
    if c is None:
        pytest.skip("native codec unavailable (g++/make missing?)")
    return c


def _sample_record():
    return {
        "f64": np.arange(12, dtype=np.float64).reshape(3, 4),
        "u8": np.arange(64, dtype=np.uint8).reshape(2, 32),
        "scalar": np.float64(2.75),
        "pair": np.asarray([7, 3], np.int64),
        "label": "covins",
        "missing": None,
    }


def test_encode_matches_python(codec):
    rec = _sample_record()
    assert codec.encode_record(rec) == wire.encode_record(rec)


def test_decode_matches_python(codec):
    buf = wire.encode_record(_sample_record())
    out_n = codec.decode_record(buf)
    out_p = wire.decode_record(memoryview(buf))
    assert set(out_n) == set(out_p)
    for k in out_p:
        if out_p[k] is None:
            assert out_n[k] is None
        elif isinstance(out_p[k], str):
            assert out_n[k] == out_p[k]
        else:
            np.testing.assert_array_equal(np.asarray(out_n[k]),
                                          np.asarray(out_p[k]))


def test_cross_roundtrip_full_message(codec):
    from covins_tpu.agents.synthetic_agent import SyntheticAgent, SyntheticWorld
    world = SyntheticWorld.create(n_landmarks=40, seed=5)
    agent = SyntheticAgent(world, client_id=1, n_keyframes=2)
    for msg in agent.messages():
        blob = wire.encode_message(msg)
        # native decode of the python-encoded payload
        msg_type, plen = wire.parse_header(blob[: wire.HEADER_SIZE])
        rec_native = codec.decode_record(blob[wire.HEADER_SIZE:])
        rec_python = wire.decode_record(memoryview(blob[wire.HEADER_SIZE:]))
        assert set(rec_native) == set(rec_python)


def test_stream_reassembly(codec):
    frames = [
        wire.frame(1, wire.encode_record({"x": np.arange(5, dtype=np.int32)})),
        wire.frame(2, wire.encode_record({"y": "hello"})),
        wire.frame(3, b""),
    ]
    blob = b"".join(frames)
    s = codec.stream_new()
    try:
        # feed in awkward chunk sizes
        got = []
        for i in range(0, len(blob), 7):
            codec.stream_feed(s, blob[i : i + 7])
            while True:
                nxt = codec.stream_next(s)
                if nxt is None:
                    break
                got.append(nxt)
        assert [mt for mt, _ in got] == [1, 2, 3]
        rec = codec.decode_record(got[0][1])
        np.testing.assert_array_equal(rec["x"], np.arange(5, dtype=np.int32))
        rec2 = codec.decode_record(got[1][1])
        assert rec2["y"] == "hello"
        assert got[2][1] == b""
    finally:
        codec.stream_free(s)


def test_use_native_switch():
    ok = wire.use_native()
    if not ok:
        pytest.skip("native codec unavailable")
    try:
        rec = _sample_record()
        buf = wire.encode_record(rec)
        out = wire.decode_record(buf)
        np.testing.assert_array_equal(out["f64"], rec["f64"])
    finally:
        # restore python path for other tests
        import importlib
        importlib.reload(wire)
