"""Essential-matrix and 17-pt generalized relative-pose tests."""

import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.ops import epipolar as epi
from covins_tpu.utils import geometry as geo


def _central_pair(key, n=60, noise=0.0):
    k1, k2, k3 = jax.random.split(key, 3)
    pts = jax.random.uniform(k1, (n, 3), jnp.float64, -4.0, 4.0) + jnp.asarray(
        [0.0, 0.0, 10.0]
    )
    w = jax.random.normal(k2, (3,), jnp.float64) * 0.2
    t = jax.random.normal(k3, (3,), jnp.float64)
    t = t / jnp.linalg.norm(t)  # central: scale-free
    T_a_b = geo.pose_from_qt(geo.quat_exp(w), t)
    fa = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    p_b = geo.pose_apply(geo.pose_inverse(T_a_b)[None], pts)
    fb = p_b / jnp.linalg.norm(p_b, axis=-1, keepdims=True)
    return fa, fb, T_a_b


def _rig(key, n, n_cams=3, spread=0.8):
    """Ray origins at n_cams distinct offsets (a 'virtual rig' of temporal
    neighbor keyframes, as COVINS-G builds)."""
    offs = jax.random.normal(key, (n_cams, 3), jnp.float64) * spread
    return offs[jnp.arange(n) % n_cams]


def _noncentral_pair(key, n=80):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    pts = jax.random.uniform(k1, (n, 3), jnp.float64, -6.0, 6.0) + jnp.asarray(
        [0.0, 0.0, 12.0]
    )
    w = jax.random.normal(k2, (3,), jnp.float64) * 0.25
    t = jax.random.normal(k3, (3,), jnp.float64) * 2.0  # metric translation
    T_a_b = geo.pose_from_qt(geo.quat_exp(w), t)
    va = _rig(k4, n)
    vb = _rig(k5, n)
    da = pts - va
    fa = da / jnp.linalg.norm(da, axis=-1, keepdims=True)
    pts_b = geo.pose_apply(geo.pose_inverse(T_a_b)[None], pts)
    db = pts_b - vb
    fb = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    return va, fa, vb, fb, T_a_b


def _pose_err(T1, T2):
    return float(jnp.linalg.norm(geo.pose_boxminus(T1, T2)))


def test_essential_8pt_exact():
    fa, fb, T_true = _central_pair(jax.random.PRNGKey(0))
    E = epi.essential_8pt(fa, fb)
    # epipolar constraint satisfied
    res = jnp.einsum("ni,ij,nj->n", fa, E, fb)
    assert float(jnp.max(jnp.abs(res))) < 1e-8
    # one of the 4 decompositions matches (up to translation sign/scale)
    cands = epi.decompose_essential(E)
    errs = [
        float(jnp.linalg.norm(geo.quat_log(geo.quat_multiply(
            geo.quat_conjugate(geo.pose_q(c)), geo.pose_q(T_true)))))
        for c in cands
    ]
    assert min(errs) < 1e-6


def test_central_ransac_outliers():
    key = jax.random.PRNGKey(3)
    fa, fb, T_true = _central_pair(key, n=100)
    k1, k2 = jax.random.split(key)
    bad = jax.random.normal(k1, (25, 3), jnp.float64)
    fb = fb.at[:25].set(bad / jnp.linalg.norm(bad, axis=-1, keepdims=True))
    out = jax.jit(
        lambda k: epi.relative_pose_ransac_central(
            k, fa, fb, jnp.ones(100, bool), n_hypotheses=128, threshold_rad=0.002
        )
    )(k2)
    # rotation must match; translation up to scale (unit in both)
    dq = geo.quat_multiply(
        geo.quat_conjugate(geo.pose_q(out["T_a_b"])), geo.pose_q(T_true)
    )
    assert float(jnp.linalg.norm(geo.quat_log(dq))) < 5e-3
    tdot = jnp.dot(geo.pose_t(out["T_a_b"]), geo.pose_t(T_true))
    assert abs(float(tdot)) > 0.999
    assert int(out["n_inliers"]) >= 70


def test_gep_17pt_exact_metric_scale():
    va, fa, vb, fb, T_true = _noncentral_pair(jax.random.PRNGKey(1))
    T = epi.gep_17pt(va, fa, vb, fb)
    assert _pose_err(T, T_true) < 1e-6  # includes metric translation


def test_noncentral_ransac_with_outliers():
    key = jax.random.PRNGKey(5)
    va, fa, vb, fb, T_true = _noncentral_pair(key, n=120)
    k1, k2 = jax.random.split(key)
    bad = jax.random.normal(k1, (20, 3), jnp.float64)
    fb = fb.at[:20].set(bad / jnp.linalg.norm(bad, axis=-1, keepdims=True))
    out = jax.jit(
        lambda k: epi.relative_pose_ransac_noncentral(
            k, va, fa, vb, fb, jnp.ones(120, bool),
            n_hypotheses=256, threshold_rad=0.002,
        )
    )(k2)
    assert _pose_err(out["T_a_b"], T_true) < 1e-3
    assert int(out["n_inliers"]) >= 90


def test_sampling_covariance_scales_with_noise():
    key = jax.random.PRNGKey(9)
    va, fa, vb, fb, T_true = _noncentral_pair(key, n=150)
    inl = jnp.ones(150, bool)

    def run(noise, k):
        kn, ks = jax.random.split(k)
        fb_n = fb + noise * jax.random.normal(kn, fb.shape, jnp.float64)
        fb_n = fb_n / jnp.linalg.norm(fb_n, axis=-1, keepdims=True)
        cov, n_used = epi.sampling_covariance(
            ks, T_true, va, fa, vb, fb_n, inl,
            n_samples=48, threshold_rad=0.05, min_inlier_ratio=0.5,
        )
        return float(jnp.trace(cov)), int(n_used)

    tr_lo, n_lo = run(1e-5, jax.random.PRNGKey(11))
    tr_hi, n_hi = run(3e-3, jax.random.PRNGKey(12))
    assert n_lo > 10 and n_hi >= 3  # high noise: few re-solves pass the gate
    assert tr_hi > 10.0 * tr_lo  # noisier data -> visibly larger covariance


def test_triangulate_midpoint():
    o1 = jnp.zeros((1, 3), jnp.float64)
    d1 = jnp.asarray([[0.0, 0.0, 1.0]])
    o2 = jnp.asarray([[1.0, 0.0, 0.0]])
    X_true = jnp.asarray([[0.0, 0.0, 4.0]])
    d2 = X_true - o2
    d2 = d2 / jnp.linalg.norm(d2)
    X, ok = epi.triangulate_midpoint(o1, d1, o2, d2)
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(X[0]), [0.0, 0.0, 4.0], atol=1e-9)


def test_essential_5pt_exact():
    """Minimal 5-pt (Nister): true E among the returned candidates."""
    fa, fb, T_true = _central_pair(jax.random.PRNGKey(7), n=5)
    E_all, valid = epi.essential_5pt(fa, fb)
    assert bool(jnp.any(valid))
    # score each valid candidate on an independent set of correspondences
    fa2, fb2, _ = _central_pair(jax.random.PRNGKey(7), n=50)
    res = jnp.abs(jnp.einsum("ni,cij,nj->cn", fa2, E_all, fb2))
    best = float(jnp.min(jnp.where(valid[:, None], res, jnp.inf).max(-1)))
    assert best < 1e-6


def test_central_ransac_5pt_outliers():
    """5-pt RANSAC survives 40% outliers (8-pt degrades here — the reason
    the reference uses the minimal sample, RelNonCentralPosSolver.cpp:343)."""
    key = jax.random.PRNGKey(11)
    fa, fb, T_true = _central_pair(key, n=100)
    k1, _ = jax.random.split(key)
    bad = jax.random.normal(k1, (40, 3), jnp.float64)
    fb = fb.at[:40].set(bad / jnp.linalg.norm(bad, axis=-1, keepdims=True))
    out = epi.relative_pose_ransac_central_5pt(
        jax.random.PRNGKey(1), fa, fb, jnp.ones(100, bool),
        n_hypotheses=64, threshold_rad=0.002,
    )
    assert int(out["n_inliers"]) >= 55
    dq = geo.quat_multiply(
        geo.quat_conjugate(geo.pose_q(out["T_a_b"])), geo.pose_q(T_true)
    )
    assert float(jnp.linalg.norm(geo.quat_log(dq))) < 0.02
