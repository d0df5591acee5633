"""Batched closed-form polynomial root solvers (quadratic/cubic/quartic).

Minimal-solver kernels (P3P) need quartic roots inside `vmap`/`jit`.  XLA on
TPU has no general eigensolver, so the usual companion-matrix trick is out;
instead we solve in closed form (Cardano/Ferrari) with complex arithmetic —
branch-free, fully batched, differentiable almost everywhere.

All solvers take coefficient arrays with a trailing coefficient axis and
return ``(roots, is_real)`` where ``roots`` is complex with a trailing root
axis and ``is_real`` flags roots whose imaginary part is negligible.
"""

from __future__ import annotations

import jax.numpy as jnp

_REAL_TOL = 1e-6


def _cplx(x):
    return x.astype(jnp.complex128) if x.dtype == jnp.float64 else x.astype(jnp.complex64)


def solve_quadratic(a, b, c):
    """a x^2 + b x + c = 0 -> roots (..., 2) complex."""
    a, b, c = _cplx(a), _cplx(b), _cplx(c)
    disc = jnp.sqrt(b * b - 4.0 * a * c)
    # Numerically stable form: q = -(b + sign(Re(b)) * disc) / 2
    sgn = jnp.where(jnp.real(b) >= 0, 1.0, -1.0)
    q = -0.5 * (b + sgn * disc)
    a_safe = jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
    q_safe = jnp.where(jnp.abs(q) < 1e-30, 1e-30, q)
    return jnp.stack([q / a_safe, c / q_safe], axis=-1)


def solve_cubic(a, b, c, d):
    """a x^3 + b x^2 + c x + d = 0 -> roots (..., 3) complex (Cardano)."""
    a, b, c, d = _cplx(a), _cplx(b), _cplx(c), _cplx(d)
    a_safe = jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
    b, c, d = b / a_safe, c / a_safe, d / a_safe
    # Depress: x = t - b/3
    p = c - b * b / 3.0
    q = 2.0 * b**3 / 27.0 - b * c / 3.0 + d
    disc = jnp.sqrt((q / 2.0) ** 2 + (p / 3.0) ** 3)
    # Choose the u-branch with larger magnitude for stability.
    u3a = -q / 2.0 + disc
    u3b = -q / 2.0 - disc
    u3 = jnp.where(jnp.abs(u3a) >= jnp.abs(u3b), u3a, u3b)
    u = u3 ** (1.0 / 3.0)
    u = jnp.where(jnp.abs(u) < 1e-30, 1e-30, u)
    v = -p / (3.0 * u)
    omega = jnp.asarray(-0.5 + 0.8660254037844386j, u.dtype)
    t0 = u + v
    t1 = u * omega + v / omega
    t2 = u / omega + v * omega
    return jnp.stack([t0, t1, t2], axis=-1) - b[..., None] / 3.0


def solve_quartic(a, b, c, d, e):
    """a x^4 + b x^3 + c x^2 + d x + e = 0 -> (roots (..., 4) complex,
    is_real (..., 4) bool).  Ferrari's method via the resolvent cubic."""
    a, b, c, d, e = _cplx(a), _cplx(b), _cplx(c), _cplx(d), _cplx(e)
    a_safe = jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
    b, c, d, e = b / a_safe, c / a_safe, d / a_safe, e / a_safe
    # Depress: x = y - b/4
    p = c - 3.0 * b * b / 8.0
    q = d - b * c / 2.0 + b**3 / 8.0
    r = e - b * d / 4.0 + b * b * c / 16.0 - 3.0 * b**4 / 256.0

    # Resolvent cubic: 8 m^3 + 8 p m^2 + (2 p^2 - 8 r) m - q^2 = 0
    m_roots = solve_cubic(
        jnp.full_like(p, 8.0), 8.0 * p, 2.0 * p * p - 8.0 * r, -q * q
    )
    # Pick the root with the largest |2m| (stability: we divide by sqrt(2m)
    # and by 4m below).  Any root works analytically.
    mag = jnp.abs(m_roots)
    m = jnp.take_along_axis(m_roots, jnp.argmax(mag, axis=-1)[..., None], -1)[..., 0]
    m = jnp.where(jnp.abs(m) < 1e-30, 1e-30, m)
    s = jnp.sqrt(2.0 * m)
    s = jnp.where(jnp.abs(s) < 1e-30, 1e-30, s)
    # y^2 - s y + (p/2 + m + s q / (4 m)) = 0  and  the s -> -s twin.
    t = q / (2.0 * s)  # = s q / (4 m)
    c1 = p / 2.0 + m + t
    c2 = p / 2.0 + m - t
    one = jnp.ones_like(s)
    r12 = solve_quadratic(one, -s, c1)
    r34 = solve_quadratic(one, s, c2)
    roots = jnp.concatenate([r12, r34], axis=-1) - b[..., None] / 4.0
    scale = 1.0 + jnp.abs(jnp.real(roots))
    is_real = jnp.abs(jnp.imag(roots)) < _REAL_TOL * scale
    return roots, is_real


def polish_real_roots(coeffs, roots, iters: int = 2):
    """Newton-polish real parts of roots against the full polynomial.

    coeffs: (..., D+1) highest-degree first; roots: (..., R) real.
    """
    x = roots
    deg = coeffs.shape[-1] - 1
    dcoef = coeffs[..., :-1] * jnp.arange(deg, 0, -1, dtype=roots.dtype)
    for _ in range(iters):
        f = jnp.zeros_like(x)
        for i in range(coeffs.shape[-1]):
            f = f * x + coeffs[..., i : i + 1]
        fp = jnp.zeros_like(x)
        for i in range(dcoef.shape[-1]):
            fp = fp * x + dcoef[..., i : i + 1]
        x = x - f / jnp.where(jnp.abs(fp) < 1e-20, 1e-20, fp)
    return x
