import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.ops import imu as imu_mod
from covins_tpu.utils import geometry as geo
from covins_tpu.utils import synthetic


def preintegrate_segment(traj, k, bg=None, ba=None, noise=None):
    dtype = traj.poses.dtype
    bg = jnp.zeros(3, dtype) if bg is None else bg
    ba = jnp.zeros(3, dtype) if ba is None else ba
    noise = imu_mod.default_noise(dtype) if noise is None else noise
    return imu_mod.preintegrate(
        traj.imu_acc[k], traj.imu_gyro[k], traj.imu_dts[k], traj.imu_mask[k],
        bg, ba, noise,
    )


_TRAJ = None


def _get_traj():
    global _TRAJ
    if _TRAJ is None:
        _TRAJ = synthetic.generate(n_keyframes=6, kf_dt=0.5)
    return _TRAJ


class TestPreintegration:
    def setup_method(self):
        self.traj = _get_traj()

    def test_zero_residual_on_ground_truth(self):
        """With exact IMU and true states the factor residual ~ 0."""
        traj = self.traj
        dtype = traj.poses.dtype
        for k in range(traj.poses.shape[0] - 1):
            pre = preintegrate_segment(traj, k)
            r = imu_mod.imu_residual(
                pre,
                traj.poses[k], traj.vels[k],
                jnp.zeros(3, dtype), jnp.zeros(3, dtype),
                traj.poses[k + 1], traj.vels[k + 1],
            )
            # 200 Hz Euler integration over 0.5 s: expect sub-mm/sub-mrad error
            assert float(jnp.abs(r).max()) < 2e-3, (k, np.asarray(r))

    def test_residual_sensitive_to_pose_error(self):
        traj = self.traj
        dtype = traj.poses.dtype
        pre = preintegrate_segment(traj, 0)
        bad_pose = traj.poses[1].at[4].add(0.5)  # 50 cm x-shift
        r = imu_mod.imu_residual(
            pre, traj.poses[0], traj.vels[0],
            jnp.zeros(3, dtype), jnp.zeros(3, dtype),
            bad_pose, traj.vels[1],
        )
        assert float(jnp.abs(r[6:9]).max()) > 0.2

    def test_bias_correction_first_order(self):
        """First-order bias correction must match re-propagation at the new
        bias to O(|db|^2)."""
        traj = self.traj
        dtype = traj.poses.dtype
        db = jnp.asarray([2e-3, -1e-3, 1.5e-3], dtype)
        pre0 = preintegrate_segment(traj, 1)
        # corrected at new gyro bias
        dq_c, dv_c, dp_c = imu_mod.bias_corrected_delta(
            pre0, db, jnp.zeros(3, dtype)
        )
        # re-propagated at new gyro bias
        pre1 = preintegrate_segment(traj, 1, bg=db)
        np.testing.assert_allclose(dv_c, pre1.dv, atol=5e-5)
        np.testing.assert_allclose(dp_c, pre1.dp, atol=5e-5)
        ang_err = geo.quat_log(
            geo.quat_multiply(geo.quat_conjugate(dq_c), pre1.dq)
        )
        assert float(jnp.abs(ang_err).max()) < 5e-5

        # accel bias too
        dba = jnp.asarray([5e-2, -3e-2, 2e-2], dtype)
        _, dv_c2, dp_c2 = imu_mod.bias_corrected_delta(pre0, jnp.zeros(3, dtype), dba)
        pre2 = preintegrate_segment(traj, 1, ba=dba)
        np.testing.assert_allclose(dv_c2, pre2.dv, atol=1e-9)  # linear in ba
        np.testing.assert_allclose(dp_c2, pre2.dp, atol=1e-9)

    def test_covariance_psd_and_grows(self):
        traj = self.traj
        pre = preintegrate_segment(traj, 0)
        eig = jnp.linalg.eigvalsh(pre.cov)
        assert float(eig.min()) > -1e-16
        assert float(eig.max()) > 0
        # half the samples -> strictly smaller covariance trace
        half = traj.imu_acc.shape[1] // 2
        dtype = traj.poses.dtype
        pre_half = imu_mod.preintegrate(
            traj.imu_acc[0, :half], traj.imu_gyro[0, :half],
            traj.imu_dts[0, :half], traj.imu_mask[0, :half],
            jnp.zeros(3, dtype), jnp.zeros(3, dtype), imu_mod.default_noise(dtype),
        )
        assert float(jnp.trace(pre_half.cov)) < float(jnp.trace(pre.cov))

    def test_mask_padding_noop(self):
        """Padded (masked) samples must not change the result."""
        traj = self.traj
        dtype = traj.poses.dtype
        acc = jnp.concatenate([traj.imu_acc[0], jnp.full((8, 3), 1e6, dtype)])
        gyro = jnp.concatenate([traj.imu_gyro[0], jnp.full((8, 3), 1e6, dtype)])
        dts = jnp.concatenate([traj.imu_dts[0], jnp.full((8,), 0.005, dtype)])
        mask = jnp.concatenate([traj.imu_mask[0], jnp.zeros(8, dtype)])
        noise = imu_mod.default_noise(dtype)
        z = jnp.zeros(3, dtype)
        pre_pad = imu_mod.preintegrate(acc, gyro, dts, mask, z, z, noise)
        pre = preintegrate_segment(traj, 0)
        np.testing.assert_allclose(pre_pad.dp, pre.dp, atol=1e-12)
        np.testing.assert_allclose(pre_pad.dv, pre.dv, atol=1e-12)
        np.testing.assert_allclose(pre_pad.dq, pre.dq, atol=1e-12)
        np.testing.assert_allclose(pre_pad.cov, pre.cov, atol=1e-20)
        assert float(pre_pad.dt) == float(pre.dt)

    def test_fuse_matches_long_window(self):
        """Fusing two consecutive windows == integrating the long window
        (the keyframe-culling invariant)."""
        traj = self.traj
        dtype = traj.poses.dtype
        z = jnp.zeros(3, dtype)
        noise = imu_mod.default_noise(dtype)
        acc, gyro, dts, mask = imu_mod.fuse_samples(
            traj.imu_acc[0], traj.imu_gyro[0], traj.imu_dts[0], traj.imu_mask[0],
            traj.imu_acc[1], traj.imu_gyro[1], traj.imu_dts[1], traj.imu_mask[1],
        )
        pre = imu_mod.preintegrate(acc, gyro, dts, mask, z, z, noise)
        r = imu_mod.imu_residual(
            pre, traj.poses[0], traj.vels[0], z, z, traj.poses[2], traj.vels[2]
        )
        assert float(jnp.abs(r).max()) < 5e-3

    def test_vmap_over_segments(self):
        traj = self.traj
        dtype = traj.poses.dtype
        z = jnp.zeros(3, dtype)
        noise = imu_mod.default_noise(dtype)
        pre_b = jax.vmap(
            lambda a, g, d, m: imu_mod.preintegrate(a, g, d, m, z, z, noise)
        )(traj.imu_acc, traj.imu_gyro, traj.imu_dts, traj.imu_mask)
        pre0 = preintegrate_segment(traj, 0)
        np.testing.assert_allclose(pre_b.dp[0], pre0.dp, atol=1e-12)
        assert pre_b.dq.shape == (traj.imu_acc.shape[0], 4)

    def test_jit(self):
        traj = self.traj
        dtype = traj.poses.dtype
        z = jnp.zeros(3, dtype)
        noise = imu_mod.default_noise(dtype)
        f = jax.jit(
            lambda a, g, d, m: imu_mod.preintegrate(a, g, d, m, z, z, noise).dp
        )
        np.testing.assert_allclose(
            f(traj.imu_acc[0], traj.imu_gyro[0], traj.imu_dts[0], traj.imu_mask[0]),
            preintegrate_segment(traj, 0).dp,
            atol=1e-12,
        )
