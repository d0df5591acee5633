"""Front-end attachment path: CFS stream format, generic FrontendWrapper
(the `covins_frontend` role, `frontend_wrapper.cpp:16-310`), and DBoW2
`ORBvoc.txt` vocabulary import (`backend.cpp:411-429`)."""

import numpy as np
import pytest

from covins_tpu.agents.frontend_adapter import FrontendWrapper
from covins_tpu.comm import messages as msgs
from covins_tpu.io import stream as cfs
from covins_tpu.utils import npgeo


def _calib():
    return msgs.VICalibration(
        T_s_c=npgeo.pose_identity(),
        cam_model=0, dist_model=0,
        intrinsics=np.asarray([400.0, 400.0, 320.0, 240.0, 0.0]),
        dist=np.zeros(4),
        img_w=640, img_h=480,
    )


def _pose(x, yaw=0.0):
    q = npgeo.quat_exp(np.asarray([0.0, 0.0, yaw]))
    return np.concatenate([q, [x, 0.0, 0.0]])


# ---------------------------------------------------------------- stream IO


def test_stream_roundtrip(tmp_path):
    path = str(tmp_path / "a.cfs")
    rng = np.random.default_rng(0)
    kp = rng.uniform(0, 640, (40, 2)).astype(np.float32)
    de = rng.integers(0, 256, (40, 32)).astype(np.uint8)
    acc = rng.normal(size=(5, 3))
    with cfs.StreamWriter(path) as w:
        w.write_calibration(_calib())
        w.write_frame(0.1, _pose(0.0), keypoints=kp, descriptors=de,
                      acc=acc, gyro=acc * 2, imu_dts=np.full(5, 0.01))
        w.write_frame(0.2, _pose(1.0),
                      image=rng.integers(0, 255, (48, 64)).astype(np.uint8))

    recs = list(cfs.read_stream(path))
    assert [r["kind"] for r in recs] == ["calib", "frame", "frame"]
    calib = cfs.read_calibration(recs[0])
    assert calib.img_w == 640 and calib.cam_model == 0
    np.testing.assert_array_equal(recs[1]["keypoints"], kp)
    np.testing.assert_array_equal(recs[1]["descriptors"], de)
    np.testing.assert_allclose(recs[1]["acc"], acc)
    assert recs[1]["timestamp"] == pytest.approx(0.1)
    assert recs[2]["image"].shape == (48, 64)


def test_stream_bad_magic(tmp_path):
    p = tmp_path / "bad.cfs"
    p.write_bytes(b"NOTASTREAM")
    with pytest.raises(ValueError):
        list(cfs.read_stream(str(p)))


# ---------------------------------------------------------- FrontendWrapper


def test_motion_threshold_keyframing():
    """Frames under the t/r threshold are dropped
    (`frontend_wrapper.cpp:293-310`)."""
    w = FrontendWrapper(_calib(), client_id=0, kf_t_min=0.5, kf_r_min=0.2)
    rng = np.random.default_rng(1)
    kp = rng.uniform(0, 640, (30, 2)).astype(np.float32)
    de = rng.integers(0, 256, (30, 32)).astype(np.uint8)

    out = []
    xs = [0.0, 0.1, 0.2, 0.7, 0.75, 1.4, 1.45, 1.5]  # 3 big jumps
    for i, x in enumerate(xs):
        m = w.process_frame(0.1 * i, _pose(x), keypoints=kp, descriptors=de)
        if m is not None:
            out.append(m)
    assert len(out) == 3  # x=0.0, 0.7, 1.4
    assert [m.id for m in out] == [(0, 0), (1, 0), (2, 0)]
    # rotation alone must also trigger
    m = w.process_frame(9.0, _pose(1.4, yaw=0.3), keypoints=kp,
                        descriptors=de)
    assert m is not None


def test_keyframe_message_schema():
    """Adapter keyframes carry the reference message inventory: relative
    pose vs predecessor, odometry pose, landmark-free index map."""
    w = FrontendWrapper(_calib(), client_id=3, kf_t_min=0.1, kf_r_min=0.1)
    rng = np.random.default_rng(2)
    kp = rng.uniform(0, 640, (25, 2)).astype(np.float32)
    de = rng.integers(0, 256, (25, 32)).astype(np.uint8)

    m0 = w.process_frame(0.0, _pose(0.0), keypoints=kp, descriptors=de)
    w.feed_imu(rng.normal(size=(4, 3)), rng.normal(size=(4, 3)),
               np.full(4, 0.005))
    m1 = w.process_frame(0.5, _pose(1.0), keypoints=kp, descriptors=de)

    assert m0.calibration is not None and m1.calibration is None
    assert m1.id == (1, 3) and m1.id_predecessor == (0, 3)
    np.testing.assert_allclose(m1.T_sref_s[4:7], [1.0, 0.0, 0.0],
                               atol=1e-12)
    assert np.all(m1.landmark_ids == -1)  # odometry-only attachment
    assert m1.preintegration is not None
    assert len(m1.preintegration.dts) == 4


def test_image_frames_dual_feature_sets():
    """Image input -> ORB extracted here, with a denser `_add` set for
    place recognition (`frontend_wrapper.cpp:161-211`)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 255, (240, 320))).astype(np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)  # give ORB real corners
    w = FrontendWrapper(_calib(), client_id=0, n_features=100,
                        n_features_add=300)
    m = w.process_frame(0.0, _pose(0.0), image=img)
    assert m is not None
    assert len(m.keypoints) > 8
    assert m.descriptors_add is not None
    assert len(m.descriptors_add) >= len(m.descriptors)


def test_replay_stream_to_session(tmp_path):
    """CFS replay -> FrontendWrapper -> AgentSession ingest: the full
    third-party attachment path against the real back-end (COVINS-G mode,
    which needs no landmarks)."""
    import jax.numpy as jnp

    from covins_tpu.models.map_manager import MapManager
    from covins_tpu.models.session import AgentSession
    from covins_tpu.ops import bow as bow_ops
    from covins_tpu.utils.config import Config

    rng = np.random.default_rng(4)
    path = str(tmp_path / "fe.cfs")
    with cfs.StreamWriter(path) as wr:
        wr.write_calibration(_calib())
        for i in range(8):
            kp = rng.uniform(0, 640, (30, 2)).astype(np.float32)
            de = rng.integers(0, 256, (30, 32)).astype(np.uint8)
            wr.write_frame(0.1 * i, _pose(0.5 * i), keypoints=kp,
                           descriptors=de)

    fe = FrontendWrapper(None, client_id=0, kf_t_min=0.1, kf_r_min=0.1)
    kfs = list(fe.replay(path))
    assert len(kfs) == 8

    cfg = Config(placerec_type="COVINS_G", start_after_kf=2,
                 activate_lm_culling=False)
    vocab = np.asarray(bow_ops.train_vocabulary(
        jnp.asarray(rng.integers(0, 256, (256, 32)).astype(np.uint8)),
        k=64, iters=2))
    mgr = MapManager(vocab, cfg)
    sess = AgentSession(0, mgr, cfg)
    sess.ingest_many(kfs)
    sess.flush()
    assert sess.stats["keyframes"] == 8
    mp = mgr.map_of(0)
    assert int(mp.kf_mask.sum()) == 8


# ------------------------------------------------------------ DBoW2 import


def _tiny_dbow2_text(tmp_path, k=3, L=2, seed=0):
    """Synthetic DBoW2 text vocabulary: full k-ary tree of depth L."""
    rng = np.random.default_rng(seed)
    lines = []
    parents = [0]  # current level's node ids
    next_id = 1
    for lvl in range(L):
        nxt = []
        for p in parents:
            for _ in range(k):
                d = rng.integers(0, 256, 32)
                leaf = 1 if lvl == L - 1 else 0
                wt = float(rng.uniform(0.1, 2.0)) if leaf else 0.0
                lines.append(
                    f"{p} {leaf} {' '.join(str(x) for x in d)} {wt}"
                )
                nxt.append(next_id)
                next_id += 1
        parents = nxt
    path = tmp_path / "voc.txt"
    path.write_text(f"{k} {L} 0 0\n" + "\n".join(lines) + "\n")
    return str(path)


def test_dbow2_import_and_descent(tmp_path):
    from covins_tpu.ops import dbow_import as dbi

    path = _tiny_dbow2_text(tmp_path, k=3, L=2)
    voc = dbi.load_orb_vocabulary_text(path)
    assert voc.k == 3 and voc.L == 2
    assert voc.n_words == 9
    assert len(voc.node_desc) == 1 + 3 + 9

    # jax descent must equal a straightforward numpy descent
    rng = np.random.default_rng(1)
    descs = rng.integers(0, 256, (50, 32)).astype(np.uint8)
    wid, wt = voc.assign(descs)
    wid = np.asarray(wid)

    pop = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(1)

    def np_descend(d):
        node = 0
        for _ in range(voc.L):
            ch = voc.children[node]
            ch = ch[ch >= 0]
            dists = [pop[voc.node_desc[c] ^ d].sum() for c in ch]
            node = int(ch[int(np.argmin(dists))])
        return int(voc.leaf_word_id[node])

    expect = np.asarray([np_descend(d) for d in descs])
    np.testing.assert_array_equal(wid, expect)
    assert np.all(np.asarray(wt) > 0)


def test_dbow2_flatten_partition(tmp_path):
    from covins_tpu.ops import dbow_import as dbi

    path = _tiny_dbow2_text(tmp_path, k=3, L=2, seed=2)
    voc = dbi.load_orb_vocabulary_text(path)
    # generous budget -> the full leaf level
    vocab, wts = voc.flatten(max_words=64)
    assert vocab.shape == (9, 32) and wts.shape == (9,)
    # tight budget -> the first level (3 nodes)
    vocab3, _ = voc.flatten(max_words=4)
    assert vocab3.shape == (3, 32)


def test_dbow2_text_roundtrip(tmp_path):
    from covins_tpu.ops import dbow_import as dbi

    path = _tiny_dbow2_text(tmp_path, k=2, L=3, seed=3)
    voc = dbi.load_orb_vocabulary_text(path)
    out = str(tmp_path / "voc2.txt")
    dbi.save_orb_vocabulary_text(voc, out)
    voc2 = dbi.load_orb_vocabulary_text(out)
    np.testing.assert_array_equal(voc.node_desc, voc2.node_desc)
    np.testing.assert_array_equal(voc.children, voc2.children)
    np.testing.assert_allclose(voc.node_weight, voc2.node_weight, rtol=1e-6)


@pytest.mark.slow
def test_record_cfs_and_frontend_cli(tmp_path):
    """The full recorded-stream attachment pipeline on real PNGs:
    fake-EuRoC -> scripts/record_cfs.py -> CFS file -> `covins-tpu
    frontend` -> live server (COVINS-G)."""
    import os
    import subprocess
    import sys
    import time as _t

    from covins_tpu.utils.fake_euroc import write_fake_sequence

    seq = write_fake_sequence(str(tmp_path / "seq"), n_keyframes=12,
                              n_landmarks=300, seed=4)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    cfs_path = str(tmp_path / "run.cfs")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "record_cfs.py"),
         "--euroc", seq, "--out", cfs_path, "--with-imu"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.getsize(cfs_path) > 1000

    out = str(tmp_path / "srv")
    srv = subprocess.Popen(
        [sys.executable, "-m", "covins_tpu.cli", "server", "--port", "9971",
         "--output-dir", out, "--placerec-type", "COVINS_G"],
        cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        deadline = _t.time() + 120
        os.makedirs(out, exist_ok=True)
        import socket as _s
        while _t.time() < deadline:
            try:
                _s.create_connection(("127.0.0.1", 9971), timeout=1).close()
                break
            except OSError:
                _t.sleep(0.5)
        r = subprocess.run(
            [sys.executable, "-m", "covins_tpu.cli", "frontend",
             "--stream", cfs_path, "--port", "9971",
             "--kf-t-min", "0.05", "--kf-r-min", "0.05"],
            cwd=repo, env=env, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "sent" in r.stdout
        n_sent = int(r.stdout.split("sent ")[1].split()[0])
        assert n_sent >= 5, r.stdout
    finally:
        srv.terminate()
        srv.wait(timeout=30)
