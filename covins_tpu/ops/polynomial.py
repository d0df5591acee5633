"""Batched closed-form polynomial root solvers (quadratic/cubic/quartic).

Minimal-solver kernels (P3P) need quartic roots inside `vmap`/`jit`.  XLA on
TPU has no general eigensolver, so the usual companion-matrix trick is out;
instead we solve in closed form — and, critically, in **pure real
arithmetic**: the TPU backend does not lower complex128 (f64 -> c128 CVT
aborts in x64_rewriter), so the Cardano/Ferrari formulas are written with
trigonometric / hyperbolic branches selected by `jnp.where`.  Branch-free at
the XLA level (both branches are computed, one is selected), fully batched.

All solvers return ``(roots, is_real)`` where ``roots`` is a **real** array
with a trailing root axis and ``is_real`` flags genuinely real roots.  For a
complex-conjugate pair the returned value is the pair's real part with
``is_real = False`` — callers mask on the flag.
"""

from __future__ import annotations

import jax.numpy as jnp

_REAL_TOL = 1e-9


def _safe(x, eps=1e-30):
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)


def _cbrt(x):
    """Real signed cube root (jnp.cbrt exists but route through sign/abs to
    be robust for all dtypes)."""
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def solve_quadratic(a, b, c):
    """a x^2 + b x + c = 0 -> (roots (..., 2) real, is_real (..., 2)).

    Numerically stable citardauq form.  For a complex pair the real part
    -b/(2a) is returned in both slots with is_real=False.
    """
    a = jnp.asarray(a)
    disc = b * b - 4.0 * a * c
    scale = b * b + jnp.abs(4.0 * a * c)
    real = disc >= -_REAL_TOL * scale
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    sgn = jnp.where(b >= 0, 1.0, -1.0)
    q = -0.5 * (b + sgn * sq)
    r0 = q / _safe(a)
    r1 = c / _safe(q)
    # Degenerate a ~ 0: linear bx + c = 0.
    lin = jnp.abs(a) < 1e-30
    rl = -c / _safe(b)
    r0 = jnp.where(lin, rl, r0)
    r1 = jnp.where(lin, rl, r1)
    # Complex pair -> return shared real part.
    ctr = -b / (2.0 * _safe(a))
    r0 = jnp.where(real, r0, ctr)
    r1 = jnp.where(real, r1, ctr)
    roots = jnp.stack([r0, r1], axis=-1)
    return roots, jnp.broadcast_to(real[..., None], roots.shape)


def solve_cubic(a, b, c, d):
    """a x^3 + b x^2 + c x + d = 0 -> (roots (..., 3) real, is_real (..., 3)).

    Trigonometric branch (three real roots) / Cardano branch (one real root
    plus a conjugate pair, whose shared real part fills the other two slots
    with is_real=False).  Pure real arithmetic; TPU-lowerable.
    """
    a = jnp.asarray(a)
    a_s = _safe(a)
    b, c, d = b / a_s, c / a_s, d / a_s
    # Depress: x = t - b/3  ->  t^3 + p t + q
    p = c - b * b / 3.0
    q = 2.0 * b**3 / 27.0 - b * c / 3.0 + d
    half_q = 0.5 * q
    third_p = p / 3.0
    disc = half_q * half_q + third_p**3  # >0: one real root

    # --- trig branch (disc <= 0, so p <= 0): t_k = 2r cos(phi - 2 pi k / 3)
    r = jnp.sqrt(jnp.maximum(-third_p, 0.0))
    r3 = jnp.maximum(r**3, 1e-30)
    cos3phi = jnp.clip(-half_q / r3, -1.0, 1.0)
    phi = jnp.arccos(cos3phi) / 3.0
    two_pi_3 = 2.0943951023931953
    t_trig = jnp.stack(
        [2.0 * r * jnp.cos(phi - two_pi_3 * k) for k in range(3)], axis=-1
    )

    # --- Cardano branch (disc > 0): one real root u + v
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = _cbrt(-half_q + sq)
    v = _cbrt(-half_q - sq)
    t0 = u + v
    pair_re = -0.5 * t0  # real part of the conjugate pair
    t_card = jnp.stack([t0, pair_re, pair_re], axis=-1)

    three_real = (disc <= 0.0)[..., None]
    roots = jnp.where(three_real, t_trig, t_card) - (b / 3.0)[..., None]
    is_real = three_real | (jnp.arange(3) == 0)
    return roots, jnp.broadcast_to(is_real, roots.shape)


def solve_quartic(a, b, c, d, e):
    """a x^4 + b x^3 + c x^2 + d x + e = 0 -> (roots (..., 4) real,
    is_real (..., 4) bool).  Ferrari's method via the resolvent cubic, in
    pure real arithmetic (matches the role of the quartic inside the
    reference's OpenGV P3P, `Se3Solver.cpp:59-110`, without complex dtypes
    that the TPU backend cannot lower)."""
    a = jnp.asarray(a)
    a_s = _safe(a)
    b, c, d, e = b / a_s, c / a_s, d / a_s, e / a_s
    # Depress: x = y - b/4  ->  y^4 + p y^2 + q y + r
    p = c - 3.0 * b * b / 8.0
    q = d - b * c / 2.0 + b**3 / 8.0
    r = e - b * d / 4.0 + b * b * c / 16.0 - 3.0 * b**4 / 256.0

    # Resolvent cubic: 8 m^3 + 8 p m^2 + (2 p^2 - 8 r) m - q^2 = 0.
    # g(0) = -q^2 <= 0 and g(+inf) = +inf, so the largest real root m* >= 0
    # whenever q != 0; we select it (divide by sqrt(2 m) and 4 m below).
    m_roots, m_real = solve_cubic(
        jnp.full_like(p, 8.0), 8.0 * p, 2.0 * p * p - 8.0 * r, -q * q
    )
    m = jnp.max(jnp.where(m_real, m_roots, -jnp.inf), axis=-1)
    two_m = jnp.maximum(2.0 * m, 0.0)
    s = jnp.sqrt(two_m)

    # Ferrari split: (y^2 - s y + p/2 + m + t)(y^2 + s y + p/2 + m - t)
    # with t = q / (2 s).
    t = q / _safe(2.0 * s, 1e-30)
    c1 = p / 2.0 + m + t
    c2 = p / 2.0 + m - t
    d1 = s * s - 4.0 * c1
    d2 = s * s - 4.0 * c2
    sc1 = s * s + jnp.abs(4.0 * c1)
    sc2 = s * s + jnp.abs(4.0 * c2)
    real1 = d1 >= -_REAL_TOL * (1.0 + sc1)
    real2 = d2 >= -_REAL_TOL * (1.0 + sc2)
    sq1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    sq2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    f_roots = jnp.stack(
        [0.5 * (s + sq1), 0.5 * (s - sq1), 0.5 * (-s + sq2), 0.5 * (-s - sq2)],
        axis=-1,
    )
    f_real = jnp.stack([real1, real1, real2, real2], axis=-1)

    # Degenerate s ~ 0 (q ~ 0): biquadratic z^2 + p z + r = 0, y = +-sqrt(z).
    z, z_real = solve_quadratic(jnp.ones_like(p), p, r)
    z_ok = z_real & (z >= 0.0)
    zs = jnp.sqrt(jnp.maximum(z, 0.0))
    b_roots = jnp.concatenate([zs, -zs], axis=-1)  # (z0, z1, -z0, -z1)
    b_real = jnp.concatenate([z_ok, z_ok], axis=-1)

    use_biquad = (two_m < 1e-12 * (1.0 + jnp.abs(p) + jnp.abs(r)))[..., None]
    roots = jnp.where(use_biquad, b_roots, f_roots) - (b / 4.0)[..., None]
    is_real = jnp.where(use_biquad, b_real, f_real)
    return roots, is_real


def solve_poly_real(coeffs, n_grid: int = 1024, bisect_iters: int = 48,
                    newton_iters: int = 3):
    """All real roots of a degree-D polynomial, pure real arithmetic.

    ``coeffs``: (D+1,) highest-degree first (unbatched — vmap for batches).
    Returns ``(roots (D,), valid (D,))``.

    Method: substitute z = tan(theta) and evaluate the homogenized form
    P~(theta) = sum_k c_k sin^k cos^(D-k), which is continuous on
    (-pi/2, pi/2) and shares sign changes with P(z) on the whole real line.
    Bracket sign changes on an ``n_grid`` theta grid, bisect each bracket,
    then Newton-polish in z.  Branch-free, static shapes, no complex dtypes,
    no eigensolver — the TPU-safe companion-matrix replacement used by the
    5-pt (Nister degree-10) and GP3P (degree-8) minimal solvers.

    Limitations (fine under RANSAC, which sees many hypotheses): roots of
    even multiplicity produce no sign change and are missed; roots closer
    together than the grid pitch may merge into one bracket.
    """
    coeffs = jnp.asarray(coeffs)
    deg = coeffs.shape[-1] - 1

    # Fujiwara root bound -> rescale z = s u so every root has |u| <~ 1,
    # where the tan grid is densest.  Without this, two large nearby roots
    # land in one theta cell and merge.  Clamped: a vanishing leading
    # coefficient (roots escaping to infinity) must not crush the finite
    # roots into an unresolvable cluster at u ~ 0.
    c0 = jnp.maximum(jnp.abs(coeffs[0]), 1e-30)
    k = jnp.arange(1, deg + 1, dtype=coeffs.dtype)
    ratios = (jnp.abs(coeffs[1:]) / c0) ** (1.0 / k)
    s = jnp.clip(2.0 * jnp.max(ratios), 1e-3, 1e3)
    scaled = coeffs * s ** jnp.arange(deg, -1.0, -1.0, dtype=coeffs.dtype)
    scaled = scaled / jnp.maximum(jnp.max(jnp.abs(scaled)), 1e-30)
    orig_coeffs, coeffs = coeffs, scaled

    eps = 1e-4
    theta = jnp.linspace(-jnp.pi / 2 + eps, jnp.pi / 2 - eps, n_grid)

    def homog(th):
        s, c = jnp.sin(th), jnp.cos(th)
        # sum_k coeffs[k] * s^(D-k) * c^k   (coeffs[0] is the z^D term)
        powers_s = s[..., None] ** jnp.arange(deg, -1.0, -1.0)
        powers_c = c[..., None] ** jnp.arange(0.0, deg + 1.0)
        return jnp.sum(coeffs * powers_s * powers_c, axis=-1)

    f = homog(theta)  # (G,)
    sgn = jnp.sign(f)
    change = (sgn[:-1] * sgn[1:] < 0) | (sgn[:-1] == 0)
    rank = jnp.cumsum(change)  # (G-1,)

    # bracket slot j <- index of the (j+1)-th sign change (or flag invalid)
    lo_list, hi_list, valid_list = [], [], []
    for j in range(deg):
        hit = change & (rank == j + 1)
        idx = jnp.argmax(hit)
        valid_list.append(jnp.any(hit))
        lo_list.append(theta[idx])
        hi_list.append(theta[idx + 1])
    lo = jnp.stack(lo_list)
    hi = jnp.stack(hi_list)
    valid = jnp.stack(valid_list)

    f_lo = homog(lo)
    for _ in range(bisect_iters):
        mid = 0.5 * (lo + hi)
        f_mid = homog(mid)
        left = f_lo * f_mid <= 0
        hi = jnp.where(left, mid, hi)
        lo = jnp.where(left, lo, mid)
        f_lo = jnp.where(left, f_lo, f_mid)
    roots = jnp.tan(0.5 * (lo + hi)) * s  # back to the original variable
    roots = polish_real_roots(orig_coeffs[None, :], roots[None, :],
                              iters=newton_iters)[0]
    return jnp.where(valid, roots, 0.0), valid


def polish_real_roots(coeffs, roots, iters: int = 3):
    """Newton-polish real roots against the full polynomial.

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
