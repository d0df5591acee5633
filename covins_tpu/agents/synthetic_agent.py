"""Synthetic agent: generates a schema-complete keyframe/landmark message
stream from the analytic trajectory generator.

Functional stand-in for the reference front-ends (ORB-SLAM3 with COVINS_MOD
hooks, `orb_slam3/src/comm/communicator.cpp:54-139`, and the generic
`covins_frontend` wrapper): produces `MsgKeyframe`/`MsgLandmark` with the
same field inventory — relative pose vs the previous keyframe, raw IMU
samples between keyframes, per-feature landmark ids, per-landmark reference
-frame positions — so the whole server path (ingest -> place recognition ->
PGO/GBA -> trajectory out) can run deterministically with no dataset.

Descriptors are synthesized per landmark (one random 256-bit signature,
each observation flips a few bits) so descriptor matching and BoW retrieval
behave like real data.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.comm import messages as msgs
from covins_tpu.utils import cameras as cam_mod
from covins_tpu.utils import geometry as geo, synthetic


def _forward_camera_extrinsic(dtype=np.float64):
    """Camera optical axis along body +x (see tests/test_gba.py)."""
    R_s_c = np.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    return np.asarray(geo.pose_from_qt(geo.matrix_to_quat(jnp.asarray(R_s_c)),
                                       jnp.zeros(3))).astype(dtype)


@dataclasses.dataclass
class SyntheticWorld:
    """Shared ground truth for N agents flying through one scene."""

    landmarks: np.ndarray  # (M, 3)
    lm_descs: np.ndarray  # (M, B) uint8 signatures
    calib: msgs.VICalibration

    @classmethod
    def create(cls, n_landmarks=800, desc_bytes=32, seed=0, feat_type="ORB"):
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        lms = np.asarray(synthetic.generate_landmarks(k1, n=n_landmarks))
        if feat_type == "SIFT":
            d = np.asarray(jax.random.normal(k2, (n_landmarks, desc_bytes)))
            descs = np.abs(d).astype(np.float32)
            descs *= 512.0 / np.linalg.norm(descs, axis=-1, keepdims=True)
        else:
            descs = np.asarray(
                jax.random.randint(k2, (n_landmarks, desc_bytes), 0, 256,
                                   jnp.int32)
            ).astype(np.uint8)
        calib = msgs.VICalibration(
            T_s_c=_forward_camera_extrinsic(),
            cam_model=cam_mod.PINHOLE,
            dist_model=cam_mod.RADTAN,
            intrinsics=np.asarray([458.0, 457.0, 376.0, 240.0, 0.0]),
            dist=np.zeros(4),
            img_w=752, img_h=480,
        )
        return cls(lms, descs, calib)


class SyntheticAgent:
    """One agent streaming keyframes along a (time-shifted) trajectory."""

    def __init__(
        self,
        world: SyntheticWorld,
        client_id: int,
        n_keyframes: int = 40,
        kf_dt: float = 0.5,
        t0: float = 0.0,
        px_noise: float = 0.3,
        desc_bit_flips: int = 4,
        pose_drift: float = 0.0,
        seed: Optional[int] = None,
        send_updates: bool = False,
        update_window_size: int = 3,
    ):
        self.world = world
        self.client_id = client_id
        self.px_noise = px_noise
        self.desc_bit_flips = desc_bit_flips
        self.pose_drift = pose_drift
        self.rng = np.random.default_rng(
            client_id * 1000 + (seed if seed is not None else 7)
        )
        self.traj = synthetic.generate(n_keyframes=n_keyframes, kf_dt=kf_dt, t0=t0)
        self.n_keyframes = n_keyframes
        # Track window: a world landmark keeps its client landmark id only
        # while continuously tracked; after `track_gap` keyframes unseen, a
        # revisit mints a NEW landmark id (like a real VIO front-end that
        # lost track — loop closure, not tracking, must re-associate).
        self.track_gap = 3
        # agent-side update stream (`comm.send_updates` plane): after each
        # new keyframe, re-send the previous `update_window_size` keyframes
        # as pose-update messages + their landmarks as position updates
        # (the reference's `sent_once_` path,
        # `orb_slam3/src/comm/communicator.cpp:54-81`;
        # window: `config_comm.yaml:20` update_window_size)
        self.send_updates = send_updates
        self.update_window_size = update_window_size
        self._lm_first_kf: dict[int, list[int]] = {}  # kf -> client lm ids
        self._lm_client_id: dict[int, int] = {}  # world idx -> client lm id
        self._lm_last_seen: dict[int, int] = {}
        self.lm_world_idx: dict[int, int] = {}  # client lm id -> world idx
        self._next_lm_id = 0
        self._sent_lms: set[int] = set()
        # drifted "VIO" poses: what the front-end believes
        self._vio_poses = self._make_vio_poses()

    def _make_vio_poses(self):
        gt = np.asarray(self.traj.poses)
        if self.pose_drift <= 0:
            return gt.copy()
        rel = np.asarray(
            jax.vmap(geo.pose_relative)(self.traj.poses[:-1], self.traj.poses[1:])
        )
        out = [gt[0]]
        for k in range(len(rel)):
            noise = self.rng.normal(0.0, self.pose_drift, 6)
            noise[:3] *= 0.2  # less rotational drift
            T = np.asarray(
                geo.pose_boxplus(jnp.asarray(rel[k]), jnp.asarray(noise))
            )
            out.append(np.asarray(geo.pose_compose(jnp.asarray(out[-1]), jnp.asarray(T))))
        return np.stack(out)

    def visible_landmarks(self, k: int):
        """Indices + pixel obs of world landmarks visible from GT pose k."""
        cam = cam_mod.Camera(
            intrinsics=jnp.asarray(self.world.calib.intrinsics),
            dist=jnp.asarray(self.world.calib.dist),
            T_s_c=jnp.asarray(self.world.calib.T_s_c),
            cam_model=self.world.calib.cam_model,
            dist_model=self.world.calib.dist_model,
        )
        T_w_c = geo.pose_compose(self.traj.poses[k], cam.T_s_c)
        p_c = np.asarray(
            geo.pose_apply(geo.pose_inverse(T_w_c)[None], jnp.asarray(self.world.landmarks))
        )
        uv, valid = cam_mod.project3(cam, jnp.asarray(p_c))
        uv = np.asarray(uv)
        ok = (
            np.asarray(valid)
            & (p_c[:, 2] > 0.3) & (p_c[:, 2] < 25.0)
            & (uv[:, 0] > 0) & (uv[:, 0] < self.world.calib.img_w)
            & (uv[:, 1] > 0) & (uv[:, 1] < self.world.calib.img_h)
        )
        idx = np.where(ok)[0]
        return idx, uv[idx]

    def _noisy_desc(self, lm_idx: int) -> np.ndarray:
        d = self.world.lm_descs[lm_idx].copy()
        if d.dtype != np.uint8:  # SIFT: additive noise, keep norm
            d = d + self.rng.normal(0.0, 8.0, d.shape).astype(np.float32)
            return np.abs(d).astype(np.float32)
        for _ in range(self.desc_bit_flips):
            bit = self.rng.integers(0, d.size * 8)
            d[bit // 8] ^= np.uint8(1 << (bit % 8))
        return d

    def messages(self) -> Iterator[object]:
        """Yield the full message stream (KFs interleaved with landmarks)."""
        traj = self.traj
        acc = np.asarray(traj.imu_acc)
        gyro = np.asarray(traj.imu_gyro)
        dts = np.asarray(traj.imu_dts)
        for k in range(self.n_keyframes):
            idx, uv = self.visible_landmarks(k)
            uv = uv + self.rng.normal(0.0, self.px_noise, uv.shape)
            descs = np.stack([self._noisy_desc(i) for i in idx]) if len(idx) else (
                np.zeros((0,) + self.world.lm_descs.shape[1:],
                         self.world.lm_descs.dtype))
            aors = np.zeros((len(idx), 4), np.float32)  # octave 0
            # client landmark ids with track-loss semantics
            lm_ids = np.empty(len(idx), np.int64)
            new_world_idx = []
            for j, wi in enumerate(idx):
                wi = int(wi)
                last = self._lm_last_seen.get(wi, -(10**9))
                if k - last > self.track_gap:
                    self._lm_client_id[wi] = self._next_lm_id
                    self.lm_world_idx[self._next_lm_id] = wi
                    self._next_lm_id += 1
                    new_world_idx.append((j, wi))
                self._lm_last_seen[wi] = k
                lm_ids[j] = self._lm_client_id[wi]

            if k == 0:
                T_sref_s = np.asarray(geo.pose_identity(np.float64))
                id_ref = (-1, -1)
                pre = None
            else:
                T_sref_s = np.asarray(
                    geo.pose_relative(
                        jnp.asarray(self._vio_poses[k - 1]),
                        jnp.asarray(self._vio_poses[k]),
                    )
                )
                id_ref = (k - 1, self.client_id)
                pre = msgs.PreintegrationData(
                    acc=acc[k - 1], gyro=gyro[k - 1], dts=dts[k - 1]
                )

            yield msgs.MsgKeyframe(
                id=(k, self.client_id),
                timestamp=float(traj.times[k]),
                calibration=self.world.calib if k == 0 else None,
                keypoints=uv.astype(np.float32),
                keypoints_undist=uv.astype(np.float32),
                keypoints_aors=aors,
                descriptors=descs,
                id_reference=id_ref,
                T_sref_s=T_sref_s,
                T_w_s_vio=self._vio_poses[k],
                velocity=np.asarray(traj.vels[k]),
                bias_gyro=np.zeros(3),
                bias_acc=np.zeros(3),
                preintegration=pre,
                landmark_ids=lm_ids,
                id_predecessor=(k - 1, self.client_id) if k > 0 else (-1, -1),
                id_successor=(-1, -1),
            )

            # newly-minted landmarks get a MsgLandmark.  pos_ref is the
            # GT BODY-RELATIVE position: a real front-end triangulates
            # from observations over a short window, so the body-frame
            # geometry is metrically correct while the WORLD placement
            # inherits the anchor keyframe's accumulated drift (the server
            # lifts pos_ref through its drifted pose chain).  Computing
            # pos_ref against the drifted pose instead would cancel the
            # drift exactly and leave loop closure nothing to correct.
            minted = []
            for j, wi in new_world_idx:
                lid = int(lm_ids[j])
                minted.append(lid)
                pos_ref = np.asarray(
                    geo.pose_apply(
                        geo.pose_inverse(jnp.asarray(np.asarray(self.traj.poses)[k])),
                        jnp.asarray(self.world.landmarks[wi]),
                    )
                )
                yield msgs.MsgLandmark(
                    id=(lid, self.client_id),
                    id_reference=(k, self.client_id),
                    pos_ref=pos_ref,
                    observations={(k, self.client_id): int(j)},
                )
            self._lm_first_kf[k] = minted

            # update plane: re-send the previous window's keyframes as
            # pose updates relative to KF0 (`ConvertToMsg` update layout,
            # `KeyFrame.cc:45+`) and their landmarks as position updates
            if self.send_updates and k > 0:
                from covins_tpu.utils import npgeo
                lo = max(0, k - self.update_window_size)
                for u in range(lo, k):
                    yield msgs.MsgKeyframeUpdate(
                        id=(u, self.client_id),
                        id_reference=(0, self.client_id),
                        T_sref_s=npgeo.pose_relative(
                            self._vio_poses[0], self._vio_poses[u]
                        ),
                        velocity=np.asarray(self.traj.vels[u]),
                        bias_gyro=np.zeros(3),
                        bias_acc=np.zeros(3),
                    )
                    for lid in self._lm_first_kf.get(u, []):
                        wi = self.lm_world_idx[lid]
                        yield msgs.MsgLandmarkUpdate(
                            id=(lid, self.client_id),
                            id_reference=(u, self.client_id),
                            pos_ref=npgeo.pose_apply(
                                npgeo.pose_inverse(
                                    np.asarray(self.traj.poses)[u]
                                ),
                                self.world.landmarks[wi],
                            ),
                        )
