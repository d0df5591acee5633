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
