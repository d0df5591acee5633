"""Global visual-inertial bundle adjustment with Schur-complement landmark
elimination — the framework's core solver.

TPU-native replacement for `Optimization::GlobalBundleAdjustment`
(`covins_backend/src/covins_backend/optimization_be.cpp:56-618`, Ceres
DOGLEG/SPARSE_SCHUR with 8 threads).  Reference semantics preserved:

* parameter blocks per keyframe: pose (quaternion local param -> 6-dof
  right tangent here), speed (3), gyro+accel bias (6); extrinsics and
  camera intrinsics FIXED (`optimization_be.cpp:81-145`);
* residuals: IMU preintegration factor between consecutive KFs evaluated
  at first-order-bias-corrected deltas (`:132-143`), reprojection residual
  per observation with sigma = (octave+1)*2 px (`:178-235`), loop edges as
  6-DoF between factors with fixed sqrt-info (`:238-254`);
* two rounds with outlier pruning between them at `th_gba_outlier_global`
  px (`:256-292`), gauge fixed by the map-origin KF (`:88-89`);
* `visual_only` mode (GBA action codes 4/5) drops IMU terms.

TPU design (the Schur trick as batched dense-block ops):

    H = [ Hpp  Hpl ]   ->   (Hpp - Hpl Hll^-1 Hlp) dx_p = b_p - Hpl Hll^-1 b_l
        [ Hlp  Hll ]         dx_l = Hll^-1 (b_l - Hlp dx_p)

`Hll` is block-diagonal (3x3 per landmark) because landmarks only couple
through keyframes — its inverse is one batched 3x3 inversion.  The reduced
camera system is solved MATRIX-FREE with block-Jacobi PCG: each mat-vec is
gathers + einsum contractions + segment-sums over the observation COO list
(MXU-shaped, shards by observation).  Keyframe state is a 15-dof tangent
[pose(6), vel(3), bias(6)].  All loops are fixed-length `lax.scan`s.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from covins_tpu.ops import linalg as la_small
from covins_tpu.ops import imu as imu_mod
from covins_tpu.ops import residuals as res
from covins_tpu.utils import cameras as cam_mod
from covins_tpu.utils import geometry as geo

KF_DOF = 15  # [pose(6), vel(3), bias(6)]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "poses", "vels", "biases", "kf_mask", "kf_fixed", "cam",
        "lms", "lm_mask",
        "obs_kf", "obs_lm", "obs_uv", "obs_w", "obs_mask",
        "imu_i", "imu_j", "imu_pre", "imu_sqrt_info", "bias_sqrt_info",
        "imu_mask", "gravity",
        "loop_i", "loop_j", "loop_T", "loop_sqrt_info", "loop_mask",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class GBAProblem:
    """Flat fixed-capacity VI-GBA problem (all invalid slots masked)."""

    # keyframe states
    poses: jax.Array  # (N, 7) T_w_s
    vels: jax.Array  # (N, 3)
    biases: jax.Array  # (N, 6) [bg, ba]
    kf_mask: jax.Array  # (N,)
    kf_fixed: jax.Array  # (N,) gauge-fixed KFs
    cam: cam_mod.Camera  # single camera (shared intrinsics; extrinsics fixed)
    # landmarks
    lms: jax.Array  # (M, 3)
    lm_mask: jax.Array  # (M,)
    # reprojection observations (COO)
    obs_kf: jax.Array  # (O,) int32
    obs_lm: jax.Array  # (O,) int32
    obs_uv: jax.Array  # (O, 2)
    obs_w: jax.Array  # (O,) 1/sigma weights (octave-based)
    obs_mask: jax.Array  # (O,)
    # IMU preintegration factors between keyframe pairs
    imu_i: jax.Array  # (F,) int32
    imu_j: jax.Array  # (F,) int32
    imu_pre: imu_mod.Preintegrated  # batched (F, ...)
    imu_sqrt_info: jax.Array  # (F, 9, 9)
    bias_sqrt_info: jax.Array  # (F, 6, 6) random-walk weights
    imu_mask: jax.Array  # (F,)
    gravity: jax.Array  # (3,)
    # loop-closure 6-DoF between edges
    loop_i: jax.Array  # (L,) int32
    loop_j: jax.Array  # (L,) int32
    loop_T: jax.Array  # (L, 7)
    loop_sqrt_info: jax.Array  # (L, 6, 6)
    loop_mask: jax.Array  # (L,)


def _kf_state(poses, vels, biases, idx):
    return poses[idx], vels[idx], biases[idx]


def _retract_kf(pose, vel, bias, xi):
    """Apply a 15-dof tangent to one keyframe state."""
    return (
        geo.pose_boxplus(pose, xi[..., :6]),
        vel + xi[..., 6:9],
        bias + xi[..., 9:15],
    )


# ---------------------------------------------------------------------------
# Residuals + Jacobians, vmapped per factor type
# ---------------------------------------------------------------------------


def _reproj_r_J(p: GBAProblem, huber_k: float = 0.0):
    """Per-observation whitened residual (O, 2), J_pose (O, 2, 6),
    J_lm (O, 2, 3).

    ``huber_k > 0`` applies a Huber IRLS weight sqrt(min(1, k/||r||)) to
    the whitened residual — the robust loss the reference attaches to GBA
    reprojection terms during the outlier round (`optimization_be.cpp`,
    Ceres `HuberLoss`; k ~ sqrt(chi2_95 two-dof) = 2.447 whitened units).
    """

    def one(kf, lm, uv, w):
        pose = p.poses[kf]
        X = p.lms[lm]

        def r_of(xi6, d3):
            r, valid = res.reprojection_residual(
                p.cam, geo.pose_boxplus(pose, xi6), X + d3, uv
            )
            return r, valid

        z6 = jnp.zeros(6, pose.dtype)
        z3 = jnp.zeros(3, pose.dtype)
        r, valid = r_of(z6, z3)
        Jp = jax.jacfwd(lambda a: r_of(a, z3)[0])(z6)
        Jl = jax.jacfwd(lambda b: r_of(z6, b)[0])(z3)
        # observations of invalid landmarks/keyframes must not contribute:
        # a masked landmark's position is frozen, so leaving its residuals
        # active would bias the poses toward stale geometry.
        ww = w * valid * p.lm_mask[lm] * p.kf_mask[kf]
        if huber_k > 0.0:
            rn = jnp.linalg.norm(r * ww)
            ww = ww * jnp.sqrt(
                jnp.minimum(1.0, huber_k / jnp.maximum(rn, 1e-12))
            )
        return r * ww, Jp * ww, Jl * ww

    return jax.vmap(one)(p.obs_kf, p.obs_lm, p.obs_uv,
                         (p.obs_w * p.obs_mask).astype(p.poses.dtype))


def _imu_r_J(p: GBAProblem):
    """Per-factor whitened residual (F, 15) and Jacobian (F, 15, 30)
    w.r.t. [kf_i tangent(15), kf_j tangent(15)].  Residual stacks the
    9-dof preintegration error and the 6-dof bias random walk."""

    def one(i, j, pre, S9, S6, m):
        pose_i, vel_i, bias_i = _kf_state(p.poses, p.vels, p.biases, i)
        pose_j, vel_j, bias_j = _kf_state(p.poses, p.vels, p.biases, j)

        def r_of(xi):
            pi, vi, bi = _retract_kf(pose_i, vel_i, bias_i, xi[:15])
            pj, vj, bj = _retract_kf(pose_j, vel_j, bias_j, xi[15:])
            r9 = imu_mod.imu_residual(
                pre, pi, vi, bi[:3], bi[3:], pj, vj, gravity=p.gravity
            )
            rb = bj - bi
            return jnp.concatenate([S9 @ r9, S6 @ rb])

        zero = jnp.zeros(30, pose_i.dtype)
        r = r_of(zero)
        J = jax.jacfwd(r_of)(zero)
        mm = m * p.kf_mask[i] * p.kf_mask[j]
        return r * mm, J * mm

    return jax.vmap(one)(
        p.imu_i, p.imu_j, p.imu_pre, p.imu_sqrt_info, p.bias_sqrt_info,
        p.imu_mask.astype(p.poses.dtype),
    )


def _loop_r_J(p: GBAProblem):
    """Per-loop-edge whitened residual (L, 6) + Jacobians (L, 6, 6) x2
    (pose part only)."""

    def one(i, j, T_meas, S, m):
        Ti, Tj = p.poses[i], p.poses[j]

        def r_of(xi):
            return S @ res.six_dof_between_residual(
                geo.pose_boxplus(Ti, xi[:6]), geo.pose_boxplus(Tj, xi[6:]), T_meas
            )

        zero = jnp.zeros(12, Ti.dtype)
        r = r_of(zero)
        J = jax.jacfwd(r_of)(zero)
        mm = m * p.kf_mask[i] * p.kf_mask[j]
        return r * mm, J[:, :6] * mm, J[:, 6:] * mm

    return jax.vmap(one)(
        p.loop_i, p.loop_j, p.loop_T, p.loop_sqrt_info,
        p.loop_mask.astype(p.poses.dtype),
    )


# ---------------------------------------------------------------------------
# One damped GN step with Schur elimination
# ---------------------------------------------------------------------------


def _gn_schur_step(p: GBAProblem, state, lam, n_cg, visual_only, huber_k=0.0,
                   cg_variant: str = "fused"):
    """One Levenberg-Marquardt step with Schur landmark elimination.

    `lam` is the adaptive Marquardt parameter (multiplies the Hessian
    block diagonals, making the damping scale-invariant across the wildly
    different pose/velocity/bias/landmark curvatures).
    """
    poses, vels, biases, lms = state
    pp = dataclasses.replace(p, poses=poses, vels=vels, biases=biases, lms=lms)
    n = poses.shape[0]
    m = lms.shape[0]
    dtype = poses.dtype
    # Gauge fixing pins only the POSE of fixed keyframes; their velocity
    # and bias stay free (the reference sets only the pose parameter block
    # constant, `optimization_be.cpp:88-89` — freezing vel/bias would leave
    # the adjacent IMU factor permanently unsatisfiable).
    free_pose = (~p.kf_fixed & p.kf_mask).astype(dtype)[:, None]  # (N, 1)
    free_vb = p.kf_mask.astype(dtype)[:, None]  # (N, 1)
    free = jnp.concatenate(
        [jnp.broadcast_to(free_pose, (n, 6)),
         jnp.broadcast_to(free_vb, (n, 9))], axis=-1
    )  # (N, 15)
    lm_free = p.lm_mask.astype(dtype)[:, None]  # (M, 1)

    r_o, Jp_o, Jl_o = _reproj_r_J(pp, huber_k)  # (O,2), (O,2,6), (O,2,3)
    r_l, Ji_l, Jj_l = _loop_r_J(pp)  # (L,6), (L,6,6)x2
    if not visual_only:
        r_f, J_f = _imu_r_J(pp)  # (F,15), (F,15,30)
        Ji_f, Jj_f = J_f[:, :, :15], J_f[:, :, 15:]

    # ---- gradient b = -J^T r ---------------------------------------------
    # NOTE on indexing style throughout this solver: NEVER scatter/gather
    # into a slice (`.at[idx, :6]`, `v[idx, :6]`) — XLA:TPU lowers mixed
    # advanced+basic indexing ~100x slower than a full-row scatter/gather
    # (measured 257 ms vs 2.3 ms at 61k rows).  Pose-block (6-DoF)
    # contributions accumulate in a (N, 6) buffer that is padded to the
    # 15-DoF state once; full-width IMU rows scatter directly.
    def pad_pose(b6):
        return jnp.pad(b6, ((0, 0), (0, KF_DOF - 6)))

    b6 = jnp.zeros((n, 6), dtype)
    b6 = b6.at[p.obs_kf].add(-jnp.einsum("ori,or->oi", Jp_o, r_o))
    b6 = b6.at[p.loop_i].add(-jnp.einsum("eri,er->ei", Ji_l, r_l))
    b6 = b6.at[p.loop_j].add(-jnp.einsum("eri,er->ei", Jj_l, r_l))
    b_p = pad_pose(b6)
    if not visual_only:
        b_p = b_p.at[p.imu_i].add(-jnp.einsum("fri,fr->fi", Ji_f, r_f))
        b_p = b_p.at[p.imu_j].add(-jnp.einsum("fri,fr->fi", Jj_f, r_f))
    b_p = b_p * free

    b_l = jnp.zeros((m, 3), dtype)
    b_l = b_l.at[p.obs_lm].add(-jnp.einsum("ori,or->oi", Jl_o, r_o))
    b_l = b_l * lm_free

    # ---- Hll (block diag 3x3) and its inverse ----------------------------
    Hll = jnp.zeros((m, 3, 3), dtype)
    Hll = Hll.at[p.obs_lm].add(jnp.einsum("ori,orj->oij", Jl_o, Jl_o))
    eye3 = jnp.eye(3, dtype=dtype)
    dll = jnp.einsum("mii->mi", Hll)  # (M, 3) diagonals
    Hll = Hll + lam * dll[..., None] * eye3 + 1e-10 * eye3
    Hll_inv = la_small.inv33(Hll) * lm_free[..., None]

    # ---- helpers for the reduced system -----------------------------------
    def Hpp_v(v):
        """(N, 15) -> (N, 15): pose-system Hessian times vector."""
        v6 = v[:, :6]  # static slice first, then full-row gathers
        out6 = jnp.zeros((n, 6), dtype)
        # reprojection (pose block only)
        y_o = jnp.einsum("ork,ok->or", Jp_o, v6[p.obs_kf])
        out6 = out6.at[p.obs_kf].add(jnp.einsum("ork,or->ok", Jp_o, y_o))
        # loop edges
        y_l = jnp.einsum("erk,ek->er", Ji_l, v6[p.loop_i]) + jnp.einsum(
            "erk,ek->er", Jj_l, v6[p.loop_j]
        )
        out6 = out6.at[p.loop_i].add(jnp.einsum("erk,er->ek", Ji_l, y_l))
        out6 = out6.at[p.loop_j].add(jnp.einsum("erk,er->ek", Jj_l, y_l))
        out = pad_pose(out6)
        if not visual_only:
            y_f = jnp.einsum("frk,fk->fr", Ji_f, v[p.imu_i]) + jnp.einsum(
                "frk,fk->fr", Jj_f, v[p.imu_j]
            )
            out = out.at[p.imu_i].add(jnp.einsum("frk,fr->fk", Ji_f, y_f))
            out = out.at[p.imu_j].add(jnp.einsum("frk,fr->fk", Jj_f, y_f))
        return out

    def Hlp_v(v):
        """(N, 15) -> (M, 3)."""
        y_o = jnp.einsum("ork,ok->or", Jp_o, v[:, :6][p.obs_kf])
        t = jnp.zeros((m, 3), dtype)
        return t.at[p.obs_lm].add(jnp.einsum("ork,or->ok", Jl_o, y_o))

    def Hpl_w(w):
        """(M, 3) -> (N, 15)."""
        y_o = jnp.einsum("ork,ok->or", Jl_o, w[p.obs_lm])
        out6 = jnp.zeros((n, 6), dtype)
        return pad_pose(
            out6.at[p.obs_kf].add(jnp.einsum("ork,or->ok", Jp_o, y_o)))

    def Hll_inv_apply(w):
        return jnp.einsum("mij,mj->mi", Hll_inv, w)

    # ---- block-Jacobi blocks of Hpp (also the Marquardt diagonal) ---------
    M6 = jnp.zeros((n, 6, 6), dtype)
    Ppp = jnp.einsum("ori,orj->oij", Jp_o, Jp_o)
    M6 = M6.at[p.obs_kf].add(Ppp)
    M6 = M6.at[p.loop_i].add(jnp.einsum("eri,erj->eij", Ji_l, Ji_l))
    M6 = M6.at[p.loop_j].add(jnp.einsum("eri,erj->eij", Jj_l, Jj_l))
    M_blocks = jnp.pad(M6, ((0, 0), (0, KF_DOF - 6), (0, KF_DOF - 6)))
    if not visual_only:
        M_blocks = M_blocks.at[p.imu_i].add(jnp.einsum("fri,frj->fij", Ji_f, Ji_f))
        M_blocks = M_blocks.at[p.imu_j].add(jnp.einsum("fri,frj->fij", Jj_f, Jj_f))
    dpp = jnp.einsum("nii->ni", M_blocks)  # (N, 15) Hpp diagonals
    lam_diag = lam * dpp + 1e-8  # Marquardt scaling

    def reduced_Hv(v):
        v = v * free
        hv = Hpp_v(v) - Hpl_w(Hll_inv_apply(Hlp_v(v)))
        return hv * free + lam_diag * v

    b_red = (b_p - Hpl_w(Hll_inv_apply(b_l))) * free

    M_damped = M_blocks + jax.vmap(jnp.diag)(lam_diag)
    M_inv = la_small.inv_psd_small(M_damped)

    # ---- PCG on the reduced camera system ---------------------------------
    def apply_M(r):
        return jnp.einsum("nij,nj->ni", M_inv, r) * free

    # Chronopoulos-Gear PCG (cg_variant="fused", the default): the
    # classic loop needs TWO dependent reduction rounds per iteration
    # (alpha's p.Hp, then beta's r1.z1 — under GSPMD each is a separate
    # all-reduce that serializes against the sharded matvec).  The CG-CG
    # recurrence keeps A.p via s_i = w_i + beta_i s_{i-1}, so both
    # scalars (gamma = r.u and delta = w.u) are computable from the SAME
    # vectors and fuse into ONE reduction per iteration — the
    # communication-avoiding fix named by SCALING_r04's diagnosis.
    # Algebraically identical to classic PCG; the "classic" variant is
    # kept for the scaling bench's collective-count A/B.
    def safe_div(a, b):
        return a / jnp.where(jnp.abs(b) < 1e-30, 1e-30, b)

    if cg_variant == "classic":
        def cg_step_classic(carry, _):
            x, r, z, pvec = carry
            Hp = reduced_Hv(pvec)
            pHp = jnp.sum(pvec * Hp)
            rz = jnp.sum(r * z)
            alpha = safe_div(rz, pHp)
            x1 = x + alpha * pvec
            r1 = r - alpha * Hp
            z1 = apply_M(r1)
            beta = safe_div(jnp.sum(r1 * z1), rz)
            return (x1, r1, z1, z1 + beta * pvec), None

        z_init = apply_M(b_red)
        (dx_p, *_), _ = jax.lax.scan(
            cg_step_classic,
            (jnp.zeros_like(b_red), b_red, z_init, z_init), None,
            length=n_cg,
        )
    else:
        r0 = b_red
        u0 = apply_M(r0)
        w0 = reduced_Hv(u0)
        gamma0 = jnp.sum(r0 * u0)
        delta0 = jnp.sum(w0 * u0)
        alpha0 = safe_div(gamma0, delta0)
        x0 = jnp.zeros_like(b_red)

        def cg_step(carry, _):
            x, r, u, w, pvec, svec, gamma, alpha = carry
            x1 = x + alpha * pvec
            r1 = r - alpha * svec
            u1 = apply_M(r1)
            w1 = reduced_Hv(u1)            # the single matvec
            gamma1 = jnp.sum(r1 * u1)      # fused: one reduction round
            delta1 = jnp.sum(w1 * u1)      # for both scalars
            beta1 = safe_div(gamma1, gamma)
            alpha1 = safe_div(
                gamma1, delta1 - safe_div(beta1 * gamma1, alpha))
            p1 = u1 + beta1 * pvec
            s1 = w1 + beta1 * svec
            return (x1, r1, u1, w1, p1, s1, gamma1, alpha1), None

        (dx_p, *_), _ = jax.lax.scan(
            cg_step, (x0, r0, u0, w0, u0, w0, gamma0, alpha0), None,
            length=n_cg,
        )
    dx_p = dx_p * free

    # ---- cost function ------------------------------------------------------
    def total_cost(st):
        pt = dataclasses.replace(
            p, poses=st[0], vels=st[1], biases=st[2], lms=st[3]
        )
        r_o2, _, _ = _reproj_r_J(pt, huber_k)
        r_l2, _, _ = _loop_r_J(pt)
        c = jnp.sum(r_o2 * r_o2) + jnp.sum(r_l2 * r_l2)
        if not visual_only:
            r_f2, _ = _imu_r_J(pt)
            c = c + jnp.sum(r_f2 * r_f2)
        return c

    # ---- backtracking on the step length ------------------------------------
    # Stiff IMU factors make full GN steps overshoot in narrow valleys;
    # evaluate a geometric ladder of step scales in one vmapped batch and
    # take the best (the TPU-friendly analog of a line search — fixed
    # shapes, no data-dependent loop).
    def state_at(alpha):
        dxp = alpha * dx_p
        dxl = Hll_inv_apply(b_l - Hlp_v(dxp)) * lm_free
        return (
            geo.pose_boxplus(poses, dxp[:, :6]),
            vels + dxp[:, 6:9],
            biases + dxp[:, 9:15],
            lms + dxl,
        )

    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.03, 0.01], dtype)
    cands = jax.vmap(state_at)(alphas)
    costs = jax.vmap(total_cost)(cands)
    best = jnp.argmin(costs)
    c_best = costs[best]
    c_old = total_cost(state)
    accept = c_best < c_old
    out = jax.tree.map(
        lambda cand, old: jnp.where(accept, cand[best], old), cands, state
    )
    # LM lambda schedule: shrink on a clean full step, grow when the step
    # had to be shortened or was rejected outright.
    lam_new = jnp.where(
        accept,
        jnp.where(best == 0, lam / 3.0, lam * 2.0),
        lam * 10.0,
    )
    lam_new = jnp.clip(lam_new, 1e-12, 1e8)
    return out, lam_new, jnp.minimum(c_best, c_old)


@partial(jax.jit, static_argnames=("n_gn", "n_cg", "visual_only", "huber_k"))
def _gba_rounds(p: GBAProblem, n_gn, n_cg, lam0, visual_only, huber_k=0.0):
    state = (p.poses, p.vels, p.biases, p.lms)

    def step(carry, _):
        st, lam = carry
        st, lam, cost = _gn_schur_step(p, st, lam, n_cg, visual_only, huber_k)
        return (st, lam), cost

    (state, _), costs = jax.lax.scan(
        step, (state, jnp.asarray(lam0, p.poses.dtype)), None, length=n_gn
    )
    return state, costs


@partial(jax.jit, static_argnames=())
def _reproj_outlier_mask(p: GBAProblem, threshold):
    """Per-observation pruning at `th_gba_outlier_global` on the WHITENED
    pixel residual norm — residual scaled by the octave sqrt-information
    1/sigma, exactly the Ceres residual norm the reference thresholds
    (`optimization_be.cpp:269-292` with `config_backend.yaml:118` = 0.92;
    sigma = (octave+1)*2 px, so 0.92 whitened ~= 1.8-5 px raw)."""

    def one(kf, lm, uv, w):
        r, valid = res.reprojection_residual(p.cam, p.poses[kf], p.lms[lm], uv)
        return jnp.linalg.norm(r) * w, valid

    norms, valid = jax.vmap(one)(p.obs_kf, p.obs_lm, p.obs_uv, p.obs_w)
    return p.obs_mask & valid & (norms < threshold)


def global_bundle_adjustment(
    p: GBAProblem,
    n_gn: int = 10,
    n_cg: int = 60,
    lam0: float = 1e-4,
    visual_only: bool = False,
    outlier_removal: bool = True,
    th_outlier: float = 0.92,
    n_gn_round1: int = 5,
    time_budget_s: float | None = None,
    th_huber: float = 2.447,
):
    """Two-round VI-GBA mirroring `GlobalBundleAdjustment` semantics
    (round-1 short solve -> prune reprojection outliers -> round-2 full
    solve, `optimization_be.cpp:56-618`).  `outlier_removal`/`visual_only`
    mirror the `CallbackGBA` action codes (`backend.cpp:128-176`);
    `time_budget_s` mirrors the solver time limit (`optimization_be.cpp:56-63`)
    at dispatch granularity: if round 1 exhausted the budget, round 2 is
    skipped (each round is one fixed-shape device dispatch here, not an
    interruptible Ceres loop).

    Returns (problem with updated states, dict with costs + pruned count).
    """
    import time as _time

    t0 = _time.perf_counter()
    info = {}
    if outlier_removal:
        # round 1 is Huber-robustified so gross outliers cannot drag the
        # solution before they are identified (reference: Ceres HuberLoss
        # on GBA reprojection factors); round 2 runs clean after pruning.
        (poses, vels, biases, lms), costs1 = _gba_rounds(
            p, n_gn_round1, n_cg, lam0, visual_only, th_huber
        )
        p = dataclasses.replace(p, poses=poses, vels=vels, biases=biases, lms=lms)
        new_mask = _reproj_outlier_mask(p, th_outlier)
        info["n_pruned"] = int(jnp.sum(p.obs_mask & ~new_mask))
        info["round1_costs"] = costs1
        p = dataclasses.replace(p, obs_mask=new_mask)
        if time_budget_s is not None:
            jax.block_until_ready(p.poses)
            if _time.perf_counter() - t0 > time_budget_s:
                info["costs"] = costs1
                info["time_budget_hit"] = True
                return p, info
    (poses, vels, biases, lms), costs2 = _gba_rounds(
        p, n_gn, n_cg, lam0, visual_only
    )
    p = dataclasses.replace(p, poses=poses, vels=vels, biases=biases, lms=lms)
    info["costs"] = costs2
    return p, info


def imu_sqrt_info_from_cov(cov, jitter: float = 1e-10):
    """(..., 9, 9) covariance -> upper-Cholesky sqrt information."""
    info = la_small.inv_psd_small(
        cov + jitter * jnp.eye(cov.shape[-1], dtype=cov.dtype)
    )
    return la_small.cholesky_small(info).swapaxes(-1, -2)


def bias_walk_sqrt_info(noise: imu_mod.ImuNoise, dt, dtype=jnp.float64):
    """Random-walk sqrt-info for the 6-dof bias-difference residual."""
    dt = jnp.maximum(dt, 1e-6)
    sg = (noise.gyro_walk * jnp.sqrt(dt))[..., None]  # (..., 1)
    sa = (noise.acc_walk * jnp.sqrt(dt))[..., None]
    d = jnp.concatenate(
        [jnp.broadcast_to(1.0 / sg, dt.shape + (3,)),
         jnp.broadcast_to(1.0 / sa, dt.shape + (3,))], axis=-1
    ).astype(dtype)
    return jax.vmap(jnp.diag)(d) if d.ndim == 2 else jnp.diag(d)
