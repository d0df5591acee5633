"""P3P + absolute-pose RANSAC tests against synthetic ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covins_tpu.ops import pnp, polynomial as poly
from covins_tpu.utils import geometry as geo


def test_quartic_roots_known():
    # (x-1)(x-2)(x-3)(x-4) = x^4 -10x^3 +35x^2 -50x +24
    roots, is_real = poly.solve_quartic(
        *[jnp.asarray(c, jnp.float64) for c in (1.0, -10.0, 35.0, -50.0, 24.0)]
    )
    r = np.sort(np.real(np.asarray(roots)))
    assert np.asarray(is_real).all()
    np.testing.assert_allclose(r, [1.0, 2.0, 3.0, 4.0], atol=1e-6)


def test_quartic_complex_pairs():
    # (x^2+1)(x-2)(x-5) = x^4 -7x^3 +11x^2 -7x +10
    roots, is_real = poly.solve_quartic(
        *[jnp.asarray(c, jnp.float64) for c in (1.0, -7.0, 11.0, -7.0, 10.0)]
    )
    rr = np.asarray(roots)[np.asarray(is_real)]
    assert np.asarray(is_real).sum() == 2
    np.testing.assert_allclose(np.sort(np.real(rr)), [2.0, 5.0], atol=1e-6)


def test_cubic_batched():
    key = jax.random.PRNGKey(0)
    c = jax.random.normal(key, (64, 4), dtype=jnp.float64)
    c = c.at[:, 0].set(jnp.where(jnp.abs(c[:, 0]) < 0.1, 1.0, c[:, 0]))
    roots, is_real = poly.solve_cubic(c[:, 0], c[:, 1], c[:, 2], c[:, 3])
    # every flagged-real root satisfies the polynomial
    x = roots
    val = ((c[:, 0:1] * x + c[:, 1:2]) * x + c[:, 2:3]) * x + c[:, 3:4]
    val = jnp.where(is_real, val, 0.0)
    assert np.max(np.abs(np.asarray(val))) < 1e-6
    # a cubic always has at least one real root
    assert np.asarray(is_real).any(axis=-1).all()


def test_quartic_fuzz_vs_numpy():
    """Random quartics: every flagged-real root matches a numpy.roots real
    root; every numpy real root is recovered by some flagged-real root."""
    rng = np.random.default_rng(3)
    coefs = rng.normal(size=(256, 5))
    coefs[:, 0] = np.where(np.abs(coefs[:, 0]) < 0.1, 1.0, coefs[:, 0])
    c = [jnp.asarray(coefs[:, i], jnp.float64) for i in range(5)]
    roots, is_real = poly.solve_quartic(*c)
    roots = poly.polish_real_roots(
        jnp.stack(c, axis=-1), roots
    )
    roots = np.asarray(roots)
    is_real = np.asarray(is_real)
    for i in range(coefs.shape[0]):
        np_roots = np.roots(coefs[i])
        np_real = np.sort(
            np.real(np_roots[np.abs(np.imag(np_roots)) < 1e-8])
        )
        ours = np.sort(roots[i][is_real[i]])
        assert len(ours) == len(np_real), f"poly {i}: {ours} vs {np_real}"
        if len(np_real):
            scale = 1.0 + np.max(np.abs(np_real))
            np.testing.assert_allclose(ours, np_real, atol=1e-6 * scale)


def test_no_complex_in_lowered_ransac():
    """TPU regression (r03 VERDICT #1): the loop-verification path must not
    contain ANY complex dtype in its lowered HLO under x64 — f64->c128 CVT
    aborts the TPU backend (x64_rewriter).  We assert on the StableHLO text
    of the exact entry point the server calls."""
    key = jax.random.PRNGKey(0)
    pts = jnp.zeros((40, 3), jnp.float64)
    brs = jnp.zeros((40, 3), jnp.float64)
    mask = jnp.ones((40,), bool)
    lowered = jax.jit(
        lambda k: pnp.absolute_pose_ransac(
            k, pts, brs, mask, n_hypotheses=32, threshold_rad=0.006
        )
    ).lower(key)
    txt = lowered.as_text()
    assert "complex<" not in txt, "complex dtype leaked into the P3P path"


def _random_scene(key, n=50):
    k1, k2, k3 = jax.random.split(key, 3)
    points = jax.random.uniform(k1, (n, 3), jnp.float64, -4.0, 4.0) + jnp.asarray(
        [0.0, 0.0, 8.0]
    )
    w = jax.random.normal(k2, (3,), jnp.float64) * 0.3
    t = jax.random.normal(k3, (3,), jnp.float64) * 1.5
    T_c_w = geo.pose_from_qt(geo.quat_exp(w), t)
    p_c = geo.pose_apply(T_c_w[None], points)
    bearings = p_c / jnp.linalg.norm(p_c, axis=-1, keepdims=True)
    return points, bearings, T_c_w


def test_p3p_exact_recovery():
    for seed in range(5):
        points, bearings, T_true = _random_scene(jax.random.PRNGKey(seed), n=3)
        T, valid = pnp.p3p_grunert(points, bearings)
        assert np.asarray(valid).any()
        errs = []
        for i in range(4):
            if not valid[i]:
                continue
            d = geo.pose_boxminus(T[i], T_true)
            errs.append(float(jnp.linalg.norm(d)))
        assert min(errs) < 1e-5, f"seed {seed}: best pose err {min(errs)}"


def test_absolute_pose_ransac_with_outliers():
    key = jax.random.PRNGKey(7)
    points, bearings, T_true = _random_scene(key, n=80)
    # corrupt 30% of bearings
    k1, k2 = jax.random.split(key)
    n_out = 24
    bad = jax.random.normal(k1, (n_out, 3), jnp.float64)
    bad = bad / jnp.linalg.norm(bad, axis=-1, keepdims=True)
    bearings = bearings.at[:n_out].set(bad)
    mask = jnp.ones(80, bool)

    out = jax.jit(
        lambda k: pnp.absolute_pose_ransac(
            k, points, bearings, mask, n_hypotheses=128, threshold_rad=0.002
        )
    )(k2)
    d = geo.pose_boxminus(out["T_c_w"], T_true)
    assert float(jnp.linalg.norm(d)) < 1e-3
    inl = np.asarray(out["inliers"])
    assert inl[n_out:].sum() >= 50  # most true inliers kept
    assert inl[:n_out].sum() <= 2  # outliers rejected


def test_angular_error_behind_camera():
    T = geo.pose_identity(jnp.float64)
    pts = jnp.asarray([[0.0, 0.0, -5.0]])
    br = jnp.asarray([[0.0, 0.0, 1.0]])
    err = pnp.reprojection_angular_error(T, pts, br)
    assert float(err[0]) > 3.0


def _random_rig_scene(key, n=60, rig_spread=0.6):
    """Non-central scene: rays from n distinct origins in the rig frame."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    points = jax.random.uniform(k1, (n, 3), jnp.float64, -5.0, 5.0)
    points = points + jnp.asarray([0.0, 0.0, 12.0])
    w = jax.random.normal(k2, (3,), jnp.float64) * 0.3
    t = jax.random.normal(k3, (3,), jnp.float64) * 2.0
    T_rig_w = geo.pose_from_qt(geo.quat_exp(w), t)
    origins = jax.random.normal(k4, (n, 3), jnp.float64) * rig_spread
    p_r = geo.pose_apply(T_rig_w[None], points)
    d = p_r - origins
    bearings = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return points, origins, bearings, T_rig_w


def test_gp3p_exact_recovery():
    """Minimal non-central absolute pose (the OpenGV GP3P role,
    Se3Solver.cpp:59-110): true pose among the <=8 candidates."""
    for seed in range(4):
        points, origins, bearings, T_true = _random_rig_scene(
            jax.random.PRNGKey(seed), n=3)
        T, valid = pnp.gp3p_kneip(points, origins, bearings)
        errs = jax.vmap(lambda Ti: jnp.linalg.norm(
            geo.pose_boxminus(Ti, T_true)))(T)
        best = float(jnp.min(jnp.where(valid, errs, jnp.inf)))
        assert best < 1e-5, (seed, best)


def test_gp3p_reduces_to_central():
    """origins = 0 must agree with the central P3P solution set."""
    points, _, bearings, T_true = _random_rig_scene(
        jax.random.PRNGKey(11), n=3, rig_spread=0.0)
    T, valid = pnp.gp3p_kneip(points, jnp.zeros((3, 3), jnp.float64),
                              bearings)
    errs = jax.vmap(lambda Ti: jnp.linalg.norm(
        geo.pose_boxminus(Ti, T_true)))(T)
    assert float(jnp.min(jnp.where(valid, errs, jnp.inf))) < 1e-5


def test_generalized_ransac_with_outliers():
    key = jax.random.PRNGKey(21)
    points, origins, bearings, T_true = _random_rig_scene(key, n=60)
    k1, k2 = jax.random.split(key)
    n_out = 18
    bad = jax.random.normal(k1, (n_out, 3), jnp.float64)
    bearings = bearings.at[:n_out].set(
        bad / jnp.linalg.norm(bad, axis=-1, keepdims=True))
    out = pnp.generalized_absolute_pose_ransac(
        k2, points, origins, bearings, jnp.ones(60, bool),
        n_hypotheses=64, threshold_rad=0.002)
    d = geo.pose_boxminus(out["T_rig_w"], T_true)
    assert float(jnp.linalg.norm(d)) < 1e-2
    inl = np.asarray(out["inliers"])
    assert inl[n_out:].sum() >= 35
    assert inl[:n_out].sum() <= 2


def test_solve_poly_real_separated_roots():
    """The bracketing solver finds every well-separated real root (the
    contract the 5pt/GP3P minimal solvers rely on).  Roots closer than
    the scaled grid pitch may merge — acceptable under RANSAC, documented
    in `polynomial.solve_poly_real`."""
    rng = np.random.default_rng(5)
    for _ in range(10):
        true = np.sort(rng.uniform(-3.0, 3.0, size=6))
        # enforce separation >= 0.3
        true = true[np.concatenate([[True], np.diff(true) > 0.3])]
        c = np.poly(true)
        while len(c) < 11:  # pad to degree 10 with rootless quadratics
            c = np.convolve(c, [1.0, rng.normal(), abs(rng.normal()) + 4])
        c = c[:11] if len(c) == 11 else np.poly(true)
        roots, valid = poly.solve_poly_real(jnp.asarray(c))
        got = np.asarray(roots)[np.asarray(valid)]
        for t in true:
            assert np.min(np.abs(got - t)) < 1e-5 * (1 + abs(t)), (t, got)
