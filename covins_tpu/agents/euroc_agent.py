"""EuRoC replay agent: streams schema-complete keyframes from an EuRoC ASL
sequence directory (`mav0/`).

Functional stand-in for the ORB-SLAM3 front-end in the reference's
canonical workloads (`orb_slam3/covins_examples/euroc_examples_mh*.sh`,
`Examples/Monocular-Inertial/mono_inertial_euroc.cc:43`): reads cam0
images + IMU + ground-truth state, selects keyframes by motion threshold
(the `covins_frontend` t_min/r_min scheme, `frontend_wrapper.cpp:293-310`),
extracts ORB features (OpenCV), maintains landmark TRACKS by
mutual-nearest-neighbor Hamming matching between consecutive keyframes,
triangulates tracks against the odometry poses, and emits
MsgKeyframe/MsgLandmark streams identical in shape to the synthetic agent.

The odometry poses default to ground truth with optional synthetic drift —
this isolates the BACK-END under test from front-end VIO quality, while
producing real images/descriptors/IMU.  (Rebuilding ORB-SLAM3 itself is
explicitly out of scope, SURVEY.md §2.3.)
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Iterator, Optional

import numpy as np

from covins_tpu.comm import messages as msgs
from covins_tpu.utils import geometry as geo

import jax.numpy as jnp

# EuRoC MAV cam0 calibration (sensor.yaml of the public dataset)
EUROC_INTRINSICS = np.asarray([458.654, 457.296, 367.215, 248.375, 0.0])
EUROC_DIST = np.asarray([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
EUROC_T_BS = np.asarray([  # cam0 extrinsic T_imu_cam (4x4)
    [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
    [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
    [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
    [0.0, 0.0, 0.0, 1.0],
])


def _pose_from_44(T):
    return np.asarray(geo.pose_from_matrix(jnp.asarray(T)))


@dataclasses.dataclass
class _Track:
    lm_id: int
    pos_w: Optional[np.ndarray]  # triangulated world position
    last_kf: int
    last_feat: int
    sent: bool


class EurocAgent:
    def __init__(
        self,
        seq_dir: str,
        client_id: int,
        max_keyframes: Optional[int] = None,
        n_features: int = 1000,
        kf_t_min: float = 0.12,
        kf_r_min: float = 0.15,
        pose_drift: float = 0.0,
        seed: int = 7,
    ):
        import cv2  # agent-side only (SURVEY §2.4: OpenCV stays agent-side)

        self.cv2 = cv2
        mav0 = os.path.join(seq_dir, "mav0")
        if not os.path.isdir(mav0):
            mav0 = seq_dir  # allow pointing directly at mav0
        self.cam_dir = os.path.join(mav0, "cam0")
        self.imu_csv = os.path.join(mav0, "imu0", "data.csv")
        self.gt_csv = os.path.join(
            mav0, "state_groundtruth_estimate0", "data.csv"
        )
        self.client_id = client_id
        self.max_keyframes = max_keyframes
        self.kf_t_min = kf_t_min
        self.kf_r_min = kf_r_min
        self.pose_drift = pose_drift
        self.rng = np.random.default_rng(seed + client_id)
        self.orb = cv2.ORB_create(nfeatures=n_features)
        self.tri_reproj_px = 2.0  # triangulation verification gate
        self.calib = msgs.VICalibration(
            T_s_c=_pose_from_44(EUROC_T_BS),
            cam_model=0, dist_model=1,
            intrinsics=EUROC_INTRINSICS.copy(), dist=EUROC_DIST.copy(),
            img_w=752, img_h=480,
        )
        self._next_lm_id = 0

    # ----------------------------------------------------------- data load
    def _load_frames(self):
        rows = []
        with open(os.path.join(self.cam_dir, "data.csv")) as fh:
            for row in csv.reader(fh):
                if row and row[0][0].isdigit():
                    rows.append((int(row[0]), row[1].strip()))
        return rows

    def _load_imu(self):
        data = np.loadtxt(self.imu_csv, delimiter=",", skiprows=1)
        return data  # [t_ns, wx, wy, wz, ax, ay, az]

    def _load_gt(self):
        data = np.loadtxt(self.gt_csv, delimiter=",", skiprows=1)
        # [t_ns, px, py, pz, qw, qx, qy, qz, v..., bw..., ba...]
        return data

    def _gt_pose_at(self, gt, t_ns):
        i = np.searchsorted(gt[:, 0], t_ns)
        i = np.clip(i, 0, len(gt) - 1)
        row = gt[i]
        q = row[4:8]
        p = row[1:4]
        v = row[8:11] if gt.shape[1] > 10 else np.zeros(3)
        pose = np.concatenate([q / np.linalg.norm(q), p])
        return pose, v

    # --------------------------------------------------------------- main
    def messages(self) -> Iterator[object]:
        cv2 = self.cv2
        frames = self._load_frames()
        imu = self._load_imu()
        gt = self._load_gt()
        t0_gt, t1_gt = gt[0, 0], gt[-1, 0]

        tracks: dict[int, _Track] = {}  # feature slot of prev KF -> track
        prev = None  # (kf_idx, kps, descs, pose, t_ns)
        k = 0
        last_pose = None
        drift_pose = None

        for t_ns, fname in frames:
            if not (t0_gt <= t_ns <= t1_gt):
                continue
            pose_gt, vel = self._gt_pose_at(gt, t_ns)
            if last_pose is not None:
                d = np.asarray(geo.pose_boxminus(
                    jnp.asarray(pose_gt), jnp.asarray(last_pose)))
                if (np.linalg.norm(d[3:]) < self.kf_t_min
                        and np.linalg.norm(d[:3]) < self.kf_r_min):
                    continue  # not a keyframe (motion threshold)
            img_path = os.path.join(self.cam_dir, "data", fname)
            img = cv2.imread(img_path, cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            kps, descs = self.orb.detectAndCompute(img, None)
            if descs is None or len(kps) < 30:
                continue
            last_pose = pose_gt

            # odometry pose: GT, optionally drifted
            if self.pose_drift > 0 and drift_pose is not None:
                rel = np.asarray(geo.pose_relative(
                    jnp.asarray(prev[3]), jnp.asarray(pose_gt)))
                noise = self.rng.normal(0.0, self.pose_drift, 6)
                noise[:3] *= 0.2
                rel = np.asarray(geo.pose_boxplus(jnp.asarray(rel),
                                                  jnp.asarray(noise)))
                pose_vio = np.asarray(geo.pose_compose(
                    jnp.asarray(drift_pose), jnp.asarray(rel)))
            else:
                pose_vio = pose_gt
            drift_pose = pose_vio

            uv = np.asarray([kp.pt for kp in kps], np.float32)
            aors = np.asarray(
                [[kp.angle, kp.octave, kp.response, kp.size] for kp in kps],
                np.float32,
            )
            undist = cv2.undistortPoints(
                uv.reshape(-1, 1, 2),
                np.asarray([[EUROC_INTRINSICS[0], 0, EUROC_INTRINSICS[2]],
                            [0, EUROC_INTRINSICS[1], EUROC_INTRINSICS[3]],
                            [0, 0, 1.0]]),
                EUROC_DIST,
                P=np.asarray([[EUROC_INTRINSICS[0], 0, EUROC_INTRINSICS[2]],
                              [0, EUROC_INTRINSICS[1], EUROC_INTRINSICS[3]],
                              [0, 0, 1.0]]),
            ).reshape(-1, 2).astype(np.float32)

            lm_ids = np.full(len(kps), -1, np.int64)
            new_lms: list[tuple[int, np.ndarray, int]] = []  # (lm_id, pos_w, feat)

            if prev is not None:
                # track via mutual-NN Hamming matching against the previous KF
                bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
                matches = bf.match(prev[2], descs)
                T_w_c_prev = np.asarray(geo.pose_compose(
                    jnp.asarray(prev[3]), jnp.asarray(self.calib.T_s_c)))
                T_w_c_cur = np.asarray(geo.pose_compose(
                    jnp.asarray(pose_vio), jnp.asarray(self.calib.T_s_c)))
                new_tracks: dict[int, _Track] = {}
                for m in matches:
                    if m.distance > 50:
                        continue
                    tr = tracks.get(m.queryIdx)
                    if tr is None:
                        # new track: triangulate between the two views
                        pos = self._triangulate(
                            prev[5][m.queryIdx], undist[m.trainIdx],
                            T_w_c_prev, T_w_c_cur,
                        )
                        if pos is None:
                            continue
                        tr = _Track(self._next_lm_id, pos, k, m.trainIdx, False)
                        self._next_lm_id += 1
                        new_lms.append((tr.lm_id, pos, m.trainIdx))
                    else:
                        # continuation: the new observation must reproject
                        # near the already-triangulated point, or the match
                        # is a descriptor collision — drop it (same role as
                        # ORB-SLAM3's TrackLocalMap outlier flags)
                        if tr.pos_w is not None and not self._reprojects(
                                tr.pos_w, undist[m.trainIdx], T_w_c_cur):
                            continue
                        tr.last_kf = k
                        tr.last_feat = m.trainIdx
                    lm_ids[m.trainIdx] = tr.lm_id
                    new_tracks[m.trainIdx] = tr
                tracks = new_tracks  # slots not re-matched are dropped

            # IMU window between previous KF and this one
            pre = None
            if prev is not None:
                sel = (imu[:, 0] > prev[4]) & (imu[:, 0] <= t_ns)
                win = imu[sel]
                if len(win) >= 2:
                    dts = np.diff(win[:, 0], prepend=prev[4]) * 1e-9
                    pre = msgs.PreintegrationData(
                        acc=win[:, 4:7].copy(), gyro=win[:, 1:4].copy(),
                        dts=dts,
                    )

            yield msgs.MsgKeyframe(
                id=(k, self.client_id),
                timestamp=t_ns * 1e-9,
                calibration=self.calib if k == 0 else None,
                keypoints=uv,
                keypoints_undist=undist,
                keypoints_aors=aors,
                descriptors=descs,
                id_reference=(k - 1, self.client_id) if k > 0 else (-1, -1),
                T_sref_s=(
                    np.asarray(geo.pose_relative(jnp.asarray(prev[3]),
                                                 jnp.asarray(pose_vio)))
                    if prev is not None else
                    np.asarray(geo.pose_identity(np.float64))
                ),
                T_w_s_vio=pose_vio,
                velocity=vel,
                bias_gyro=np.zeros(3),
                bias_acc=np.zeros(3),
                preintegration=pre,
                landmark_ids=lm_ids,
                id_predecessor=(k - 1, self.client_id) if k > 0 else (-1, -1),
                id_successor=(-1, -1),
            )
            for lm_id, pos_w, feat in new_lms:
                pos_ref = np.asarray(geo.pose_apply(
                    geo.pose_inverse(jnp.asarray(pose_vio)), jnp.asarray(pos_w)
                ))
                yield msgs.MsgLandmark(
                    id=(lm_id, self.client_id),
                    id_reference=(k, self.client_id),
                    pos_ref=pos_ref,
                    observations={(k, self.client_id): int(feat)},
                )

            prev = (k, kps, descs, pose_vio, t_ns, undist)
            k += 1
            if self.max_keyframes and k >= self.max_keyframes:
                break

    def _reprojects(self, X, uv, T_w_c) -> bool:
        from covins_tpu.utils import npgeo
        fx, fy, cx, cy = EUROC_INTRINSICS[:4]
        pc = npgeo.pose_apply(npgeo.pose_inverse(T_w_c), X)
        if pc[2] < 1e-6:
            return False
        u = fx * pc[0] / pc[2] + cx
        v = fy * pc[1] / pc[2] + cy
        return bool(np.hypot(u - uv[0], v - uv[1]) <= self.tri_reproj_px)

    def _triangulate(self, uv1, uv2, T_w_c1, T_w_c2):
        fx, fy, cx, cy = EUROC_INTRINSICS[:4]

        def bearing(uv):
            v = np.asarray([(uv[0] - cx) / fx, (uv[1] - cy) / fy, 1.0])
            return v / np.linalg.norm(v)

        from covins_tpu.ops import epipolar
        d1 = np.asarray(geo.quat_rotate(jnp.asarray(T_w_c1[:4]),
                                        jnp.asarray(bearing(uv1))))
        d2 = np.asarray(geo.quat_rotate(jnp.asarray(T_w_c2[:4]),
                                        jnp.asarray(bearing(uv2))))
        X, ok = epipolar.triangulate_midpoint(
            jnp.asarray(T_w_c1[4:7])[None], jnp.asarray(d1)[None],
            jnp.asarray(T_w_c2[4:7])[None], jnp.asarray(d2)[None],
        )
        if not bool(ok[0]):
            return None
        X = np.asarray(X[0])
        depth = np.linalg.norm(X - T_w_c1[4:7])
        if depth < 0.3 or depth > 60.0:
            return None
        # reprojection VERIFICATION in both founding views — a real VIO
        # front-end refines map points in local BA and rejects tracks that
        # do not reproject (ORB-SLAM3 CreateNewMapPoints epipolar +
        # reprojection checks); without this a single wrong descriptor
        # match mints a grossly wrong landmark
        if not (self._reprojects(X, uv1, T_w_c1)
                and self._reprojects(X, uv2, T_w_c2)):
            return None
        return X
