"""Batched geodesic ODE integration with event termination, TPU-native.

The reference integrates one ODE per ray via OrdinaryDiffEq's ``Tsit5`` with
a ``ContinuousCallback`` that root-finds the surface crossing and terminates
(/root/reference/src/RayTraceGR.jl:482-511), parallelized with a thread
ensemble. That shape (dynamic per-ray step counts, early exits) is hostile to
TPUs, so this module is the single biggest architectural divergence
(SURVEY.md §2a, §7): ONE uniform batched stepper over ray state ``[B, 8]``
with per-ray active masks — terminated/hit rays are frozen in place while the
rest keep stepping — inside a fixed-shape ``lax.while_loop`` (forward fast
path) or bounded ``lax.scan`` (differentiable path).

Components:
  * Tsit5 (Tsitouras 5(4)) embedded pair with FSAL, per-ray adaptive dt,
    PI step-size controller and step rejection — the reference's solver
    (RayTraceGR.jl:510) re-derived as an array program.
  * Classic RK4 fixed-step — the cheap mode for flat space (BASELINE.json
    example1 config).
  * Event handling: the ContinuousCallback becomes per-step sign-change
    detection of the event function on a cubic-Hermite dense-output
    interpolant (checked at interior sample points, like the callback's
    ``interp_points``), then masked bisection to localize the crossing.
  * Hairer's automatic initial-dt heuristic, vectorized per ray.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Tsitouras 5(4) tableau (FSAL). Standard published coefficients.
# ---------------------------------------------------------------------------
TS_C = (0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0)
TS_A = (
    (0.161,),
    (-0.008480655492356989, 0.335480655492357),
    (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
    (5.325864828439257, -11.748883564062828, 7.4955393428898365,
     -0.09249506636175525),
    (5.86145544294642, -12.92096931784711, 8.159367898576159,
     -0.071584973281401, -0.028269050394068383),
    # Row 7 == 5th-order solution weights b_i (FSAL)
    (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
     -3.290069515436081, 2.324710524099774),
)
# Error weights: err = dt * sum(btilde_i * k_i)  (5th minus embedded 4th)
TS_BTILDE = (
    -0.00178001105222577714, -0.0008164344596567469, 0.007880878010261995,
    -0.1447110071732629, 0.5823571654525552, -0.45808210592918697,
    0.015151515151515152,
)

RHS = Callable[[jax.Array], jax.Array]  # [B, 8] -> [B, 8] (autonomous)
EventFn = Callable[[jax.Array], jax.Array]  # [B, 8] -> [B]


class IntegratorConfig(NamedTuple):
    """Solver settings (reference defaults: RayTraceGR.jl:485,497,510)."""

    method: str = "tsit5"  # "tsit5" | "rk4"
    rtol: float = 1e-12  # ~ eps(Float64)^(3/4), set per dtype by caller
    atol: float = 1e-12
    lam_max: float = 100.0  # affine-parameter span (0, 100)
    max_steps: int = 10_000  # while_loop iteration bound (accept+reject)
    rk4_dt: float = 0.05  # fixed step for method="rk4"
    # 9 interior samples at theta = k/9 — the same grid as ContinuousCallback's
    # default interp_points=10 INCLUSIVE range(tprev, t, length=10), which the
    # reference relies on (RayTraceGR.jl:488-490). Grazing-ray hit detection
    # (sphere silhouettes) is sensitive to this spacing.
    interp_points: int = 9
    bisect_iters: int = 40  # event bisection refinements
    # Beyond-reference robustness: also refine interior local MINIMA of the
    # event function within each step (trisection on the dense output) and
    # fire the event if the refined minimum dips below zero. Interval
    # sampling alone — ours and the reference's ContinuousCallback alike —
    # misses grazing hits and thin objects whose negative window falls
    # between samples (provably: 53/40000 example1 silhouette pixels the
    # reference golden MISSES are analytic sphere hits; see
    # tests/test_event_detection.py). Default False because golden parity
    # means reproducing the reference's misses.
    refine_minima: bool = False
    min_refine_iters: int = 16  # trisection iterations for the minimum
    safety: float = 0.9
    qmin: float = 0.2
    qmax: float = 10.0
    beta1: float = 7.0 / 50.0  # PI controller gains (order-5 defaults)
    beta2: float = 2.0 / 25.0
    # OrdinaryDiffEq's qoldinit: the PI controller's memory term qold is
    # floored at 1e-4 (init and update). With an exactly-zero error estimate
    # (straight rays in flat space) this makes accepted steps grow by the full
    # qmax=10 per step, as the reference's solver does — a tighter floor grows
    # them by only ~3.6x, changing the event-sampling density and flipping
    # grazing-ray hits at sphere silhouettes vs the reference goldens.
    qold_init: float = 1e-4
    dt_min: float = 1e-14
    # Capture-stop: kill rays whose spatial coordinate radius drops below
    # this (0 = disabled). For black-hole scenes set it inside the horizon:
    # nothing there can affect the image, and stopping before the
    # singularity keeps states finite — essential for reverse-mode AD,
    # where a NaN trajectory poisons gradients of every parameter even if
    # the forward pass masks it. (The reference instead grinds captured
    # rays to dtmin and aborts, RayTraceGR.jl has no gradients to protect.)
    stop_rho: float = 0.0
    # Pallas backend: sort the ray batch by impact parameter before tiling
    # (results bitwise identical; see integrate_rays_pallas). Enable for
    # strongly step-divergent scenes — e.g. the accretion disk, where the
    # photon-ring band takes ~15k steps vs a p50 of ~21 and sorting gives
    # 2.5x — and leave off for mild ones, where the argsort + gathers
    # (~16 ms per megaray) outweigh the win.
    sort_rays: bool = False
    # Differentiable-path selector for the component-major backends:
    # "auto" = "ckpt_pallas" on a real TPU with a Kerr-Schild metric,
    # "ckpt" otherwise; "ckpt_pallas" = checkpointed custom-VJP with the
    # FUSED Pallas forward-segment and backward-replay kernels
    # (ops/pallas_adjoint.py — ~3x the XLA ckpt path on chip; interpret
    # mode is far too slow for CPU tests, hence the auto split);
    # "ckpt" = the checkpointed custom-VJP integrator (ops/adjoint.py) —
    # segment while_loops with early exit, XLA backward replay;
    # "scan" = the bounded rematerialized lax.scan (always max_steps —
    # the reference implementation the ckpt paths are tested against).
    grad_mode: str = "auto"
    grad_seg_len: int = 8  # ckpt checkpoint spacing (steps per segment)
    # Split the DIFFERENTIABLE ray batch into this many chunks sorted by
    # impact parameter, each integrated by its own ckpt call: a chunk's
    # while_loop (fwd AND bwd) runs only as long as its own slowest ray.
    # Results bitwise identical (lane independence). 1 = off.
    grad_groups: int = 1
    # Detection gate (component-major backends): certify per tile/batch —
    # via sup-norm envelopes of the dense-output basis + interval bounds
    # on the scene distance — that no sampled theta can cross this step,
    # and cond-skip the whole detection sweep. SOUND over-approximation:
    # results bitwise identical (tests/test_event_detection.py). Default
    # OFF: measured a NET LOSS on the flagship render (24.6M vs 27.4M
    # rays/s) — by the time rays approach a surface their accepted dt is
    # O(1-10), which inflates the certificate box to scene scale, so the
    # gate almost never fires and its ~180 ops/iteration + tile cond are
    # pure overhead. Kept (with its soundness tests) for scenes with many
    # small far-apart objects and tight steps, where the certificate can
    # actually bite.
    event_gate: bool = False
    # State-magnitude cap on RHS inputs (0 = disabled). Captured rays obey
    # u' = -Γ u u, so |u| grows superexponentially and overflows to inf in
    # a handful of steps; rhs(inf) is NaN, and one NaN PRIMAL anywhere in
    # the step graph makes reverse-mode cotangents of the physics params
    # NaN for the whole batch (0-cotangent x inf-partial = NaN) even
    # though the forward pass masks the dead ray. Clipping the state fed
    # to the RHS at a huge-but-finite cap is the identity for every
    # physical ray (|y| <~ 1e2 on all reference scenes) and keeps every
    # stage evaluation finite. Enable for gradient work (grad.py does).
    state_cap: float = 0.0


class TraceResult(NamedTuple):
    y: jax.Array  # [B, 8] final state (at the surface crossing for hits)
    lam: jax.Array  # [B] final affine parameter
    hit: jax.Array  # [B] bool, event fired (surface crossed)
    steps: jax.Array  # [B] accepted steps per ray
    n_iters: jax.Array  # scalar, loop iterations used


# ---------------------------------------------------------------------------
# Steppers
# ---------------------------------------------------------------------------

def tsit5_step(f: RHS, y: jax.Array, dt: jax.Array, k1: jax.Array):
    """One Tsit5 stage sweep. ``dt`` is per-ray ``[B]``; ``k1 = f(y)`` (FSAL).

    Returns (y5, err, k7, ks) where k7 = f(y5) seeds the next step's k1
    and ks = (k1..k7) feeds the 4th-order dense output (tsit5_interp).
    """
    d = dt[..., None]
    k2 = f(y + d * (TS_A[0][0] * k1))
    k3 = f(y + d * (TS_A[1][0] * k1 + TS_A[1][1] * k2))
    k4 = f(y + d * (TS_A[2][0] * k1 + TS_A[2][1] * k2 + TS_A[2][2] * k3))
    k5 = f(y + d * (TS_A[3][0] * k1 + TS_A[3][1] * k2 + TS_A[3][2] * k3
                    + TS_A[3][3] * k4))
    k6 = f(y + d * (TS_A[4][0] * k1 + TS_A[4][1] * k2 + TS_A[4][2] * k3
                    + TS_A[4][3] * k4 + TS_A[4][4] * k5))
    y5 = y + d * (TS_A[5][0] * k1 + TS_A[5][1] * k2 + TS_A[5][2] * k3
                  + TS_A[5][3] * k4 + TS_A[5][4] * k5 + TS_A[5][5] * k6)
    k7 = f(y5)
    err = d * (TS_BTILDE[0] * k1 + TS_BTILDE[1] * k2 + TS_BTILDE[2] * k3
               + TS_BTILDE[3] * k4 + TS_BTILDE[4] * k5 + TS_BTILDE[5] * k6
               + TS_BTILDE[6] * k7)
    return y5, err, k7, (k1, k2, k3, k4, k5, k6, k7)


def rk4_step(f: RHS, y: jax.Array, dt: jax.Array, k1: jax.Array):
    """Classic RK4; returns (y1, zero-err, f(y1), None) to share the driver
    (no free dense output — event localization uses cubic Hermite)."""
    d = dt[..., None]
    k2 = f(y + 0.5 * d * k1)
    k3 = f(y + 0.5 * d * k2)
    k4 = f(y + d * k3)
    y1 = y + (d / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return y1, jnp.zeros_like(y1), f(y1), None


# Large-but-finite stand-in for "infinite error": guarantees rejection
# (>> 1) while keeping every downstream power/sqrt/vjp finite in f32 —
# an inf here is another 0*inf=NaN gradient trap.
ERR_BIG = 1e30


def error_norm(err, y0, y1, rtol, atol):
    """Hairer scaled RMS error norm over the 8 state components, per ray.

    The ratio is clamped before squaring so garbage rays (|err| up to the
    RHS clamp over a tiny atol) cannot overflow the square in f32; clamped
    ratios belong to steps that are rejected regardless.
    """
    sc = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    ratio = jnp.clip(err / sc, -1e15, 1e15)
    # Floor inside the sqrt: an exactly-zero error estimate (straight rays
    # in flat space; stationary padded lanes) makes the sqrt vjp inf, and
    # 0-cotangent x inf = NaN poisons whole-batch parameter gradients.
    # Primal-invariant: every consumer floors or compares en above 1e-10.
    return jnp.sqrt(jnp.maximum(jnp.mean(ratio ** 2, axis=-1), 1e-30))


def hermite_interp(y0, y1, f0, f1, dt, theta):
    """Cubic Hermite dense output on a step: state at ``y(lam0 + theta*dt)``.

    Used for the fixed-step RK4 path (straight-line flat-space rays, where
    it is exact); the Tsit5 path uses the genuine 4th-order interpolant
    below. theta: [...] broadcastable against y's batch dims.
    """
    th = theta[..., None]
    d = dt[..., None]
    return ((1 - th) * y0 + th * y1
            + th * (th - 1) * ((1 - 2 * th) * (y1 - y0)
                               + (th - 1) * d * f0 + th * d * f1))


def tsit5_bi(th):
    """Tsit5's free 4th-order dense-output weights ``b_i(theta)``.

    Published interpolant of the Tsitouras 5(4) pair (Tsitouras 2011,
    "Runge-Kutta pairs of order 5(4) satisfying only the first column
    simplifying assumption") — the same dense output OrdinaryDiffEq's
    Tsit5 supplies to ContinuousCallback root-finding in the reference
    (/root/reference/src/RayTraceGR.jl:488-490, 510). Identities (checked
    in tests/test_integrate.py): b_i(0)=0, b_1'(0)=1 (consistency), and
    b_i(1) equals the 5th-order solution weights, so theta=1 reproduces
    y5 exactly.
    """
    th2 = th * th
    b1 = (-1.0530884977290216 * th * (th - 1.3299890189751412)
          * (th2 - 1.4364028541716351 * th + 0.7139816917074209))
    b2 = 0.1017 * th2 * (th2 - 2.1966568338249754 * th + 1.2949852507374631)
    b3 = (2.490627285651252793 * th2
          * (th2 - 2.38535645472061657 * th + 1.57803468208092486))
    b4 = (-16.54810288924490272 * (th - 1.21712927295533244)
          * (th - 0.61620406037800089) * th2)
    b5 = (47.37952196281928122 * (th - 1.203071208372362603)
          * (th - 0.658047292653547382) * th2)
    b6 = (-34.87065786149660974 * (th - 1.2)
          * (th - 0.666666666666666667) * th2)
    b7 = 2.5 * (th - 1.0) * (th - 0.6) * th2
    return b1, b2, b3, b4, b5, b6, b7


def tsit5_interp(y0, ks, dt, theta):
    """Tsit5 4th-order dense output: ``y(theta) = y0 + dt*sum_i b_i(th) k_i``.

    Row-major layout: y0/ks [B, 8], dt/theta [B]. One order higher than
    cubic Hermite on the same step — event localization (and therefore hit
    positions / checker-boundary colors) matches the reference's
    ContinuousCallback interpolant to the same order.
    """
    th = theta[..., None]
    d = dt[..., None]
    bs = tsit5_bi(th)
    acc = bs[0] * ks[0]
    for b, k in zip(bs[1:], ks[1:]):
        acc = acc + b * k
    return y0 + d * acc


def hairer_init_dt(f: RHS, y0: jax.Array, rtol, atol, order: int = 5,
                   lam_span: float = 100.0) -> jax.Array:
    """Per-ray automatic initial step size (Hairer, Norsett & Wanner II.4)."""
    f0 = f(y0)
    sc = atol + jnp.abs(y0) * rtol
    d0 = jnp.sqrt(jnp.mean((y0 / sc) ** 2, axis=-1))
    d1 = jnp.sqrt(jnp.mean((f0 / sc) ** 2, axis=-1))
    dt0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + dt0[..., None] * f0
    f1 = f(y1)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / sc) ** 2, axis=-1)) / dt0
    dmax = jnp.maximum(d1, d2)
    dt1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(1e-6, dt0 * 1e-3),
        (0.01 / dmax) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(100.0 * dt0, jnp.minimum(dt1, lam_span))


# ---------------------------------------------------------------------------
# Event localization
# ---------------------------------------------------------------------------

def _locate_event(event_fn, y0, y1, f0, f1, dt, cfg: IntegratorConfig,
                  ks=None):
    """Find the first zero crossing of the event function within a step.

    Samples the step's dense output at ``interp_points`` interior points to
    bracket the FIRST sign change (mirrors ContinuousCallback's
    interp_points scan), then bisects. With ``ks`` (the Tsit5 stage values)
    the genuine 4th-order Tsit5 interpolant is used — the same dense output
    the reference's ContinuousCallback root-finds on
    (RayTraceGR.jl:488-490); without it (RK4) cubic Hermite.
    Returns (crossed [B], theta* [B], y* [B,8]).
    """
    B = y0.shape[0]
    npts = cfg.interp_points
    dtype = y0.dtype
    thetas = jnp.arange(1, npts + 1, dtype=dtype) / npts  # (0, 1] samples
    # The bracketing + bisection search is pure root FINDING — its outputs
    # (theta brackets) carry no useful gradients (they pass through argmax /
    # comparisons anyway), and differentiating through 20-40 bisection
    # iterations bloats the reverse graph for nothing. Run the whole search
    # on gradient-stopped copies; only the final IFT/Newton polish below is
    # AD-visible.
    sg = lax.stop_gradient
    y0s, y1s, f0s, f1s, dts = sg(y0), sg(y1), sg(f0), sg(f1), sg(dt)
    if ks is not None:
        kss = tuple(sg(k) for k in ks)
        interp_s = lambda th: tsit5_interp(y0s, kss, dts, th)
        interp_g = lambda th: tsit5_interp(y0, ks, dt, th)
    else:
        interp_s = lambda th: hermite_interp(y0s, y1s, f0s, f1s, dts, th)
        interp_g = lambda th: hermite_interp(y0, y1, f0, f1, dt, th)
    d_prev = event_fn(y0s)  # [B] (>0 before a crossing)

    def sample(theta):
        return event_fn(interp_s(theta))

    d_samples = jax.vmap(sample)(jnp.broadcast_to(thetas[:, None], (npts, B)))
    # d_samples: [npts, B]. Find first index where sign flips to <= 0.
    neg = d_samples <= 0.0
    any_neg = jnp.any(neg, axis=0)  # [B]
    first = jnp.argmax(neg, axis=0)  # first True index, 0 if none
    th_hi = thetas[first]
    th_lo = jnp.where(first == 0, jnp.zeros_like(th_hi), thetas[first - 1])

    if cfg.refine_minima:
        # Grazing-hit rescue: bracket the global argmin of the sampled event
        # values (one subinterval each side, clamped at the step edges),
        # trisect the bracket down on the interpolant, and fire if the
        # refined minimum is negative even though every sample was positive.
        th_all = jnp.concatenate([jnp.zeros((1,), dtype), thetas])
        d_all = jnp.concatenate([d_prev[None], d_samples], axis=0)
        mi = jnp.argmin(d_all, axis=0)  # index into d_all/th_all
        lo_i = jnp.maximum(mi - 1, 0)
        a0, b0 = th_all[lo_i], th_all[jnp.minimum(mi + 1, npts)]

        def tri_body(_, ab):
            a, b = ab
            m1 = a + (b - a) / 3.0
            m2 = b - (b - a) / 3.0
            take = sample(m1) < sample(m2)
            return jnp.where(take, a, m1), jnp.where(take, m2, b)

        aN, bN = lax.fori_loop(0, cfg.min_refine_iters, tri_body, (a0, b0))
        th_min = 0.5 * (aN + bN)
        min_neg = sample(th_min) <= 0.0
        # Use the minimum bracket when it is the FIRST crossing (no negative
        # sample at all, or the minimum precedes the first negative sample).
        use_min = min_neg & (~any_neg | (th_all[lo_i] < th_lo))
        th_lo = jnp.where(use_min, th_all[lo_i], th_lo)
        th_hi = jnp.where(use_min, th_min, th_hi)
        any_neg = any_neg | min_neg

    crossed = any_neg & (d_prev > 0.0)

    def bisect_body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        d_mid = sample(mid)
        lo = jnp.where(d_mid > 0.0, mid, lo)
        hi = jnp.where(d_mid > 0.0, hi, mid)
        return lo, hi

    # Most iterations localize nothing — skip the bisection sweep entirely
    # unless some ray actually crossed this step (batch-level cond; XLA
    # executes one branch).
    def refine(args):
        lo0, hi0 = args
        return lax.fori_loop(0, cfg.bisect_iters, bisect_body, (lo0, hi0))

    lo, hi = lax.cond(jnp.any(crossed), refine, lambda a: a, (th_lo, th_hi))

    # Implicit-function-theorem correction (SURVEY.md §7 "gradients through
    # discrete events"): bisection finds theta* numerically but carries no
    # gradient through the root condition d(H(theta*)) = 0. One Newton step
    # from a gradient-stopped theta0 leaves the VALUE unchanged (the residual
    # is ~0 after bisection) while routing gradients of theta* through the
    # event function — the d(theta*)/d(params) term the reference's
    # ContinuousCallback never needed (it has no reverse mode at all).
    th0 = hi  # already gradient-stopped (search ran on sg() copies)

    def resid(theta):
        return event_fn(interp_g(theta))

    val, dval = jax.jvp(resid, (th0,), (jnp.ones_like(th0),))
    # RELATIVE slope threshold: the vjp of val/dval materializes val/dval^2,
    # so an absolute 1e-30 floor lets garbage rays (huge val, tiny dval)
    # overflow f32 into 0*inf=NaN that poisons the whole batch's parameter
    # gradients. |dval| > 1e-3*(1+|val|) bounds every backward quotient by
    # 1e6 while accepting all genuine crossings (val ~ 0, dval ~ O(1) there).
    # Near-tangential hits fall back to the bisection value with a zero
    # theta-gradient — the true gradient diverges there, so suppressing it
    # is the correct finite-precision regularization.
    ok = jnp.abs(dval) > 1e-3 * (1.0 + jnp.abs(val))
    delta = jnp.where(ok, val, 0.0) / jnp.where(ok, dval, 1.0)
    th_star = jnp.clip(th0 - jnp.clip(delta, -1.0, 1.0), 0.0, 1.0)
    y_star = interp_g(th_star)
    return crossed, th_star, y_star


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

class _LoopState(NamedTuple):
    y: jax.Array
    lam: jax.Array
    dt: jax.Array
    k1: jax.Array
    active: jax.Array
    hit: jax.Array
    steps: jax.Array
    err_old: jax.Array
    it: jax.Array


def _make_step_body(rhs: RHS, event_fn: EventFn, cfg: IntegratorConfig):
    """Shared loop body for while_loop and scan drivers."""
    if cfg.state_cap > 0.0:
        raw_rhs = rhs

        def rhs(y, _cap=cfg.state_cap):  # noqa: F811 — guarded wrapper
            return raw_rhs(jnp.clip(y, -_cap, _cap))

    stepper = tsit5_step if cfg.method == "tsit5" else rk4_step
    adaptive = cfg.method == "tsit5"

    def body(st: _LoopState) -> _LoopState:
        dtype = st.y.dtype
        lam_left = jnp.asarray(cfg.lam_max, dtype) - st.lam
        dt_try = jnp.minimum(st.dt, lam_left)
        dt_try = jnp.maximum(dt_try, cfg.dt_min)
        # A NaN dt (ray whose RHS was NaN from the start) would otherwise
        # survive every comparison below and stall the loop at max_steps.
        dt_try = jnp.where(jnp.isfinite(dt_try), dt_try, cfg.dt_min)
        # Step sizes are auxiliary solver state, not physics — stop their
        # gradient (see the component-major body for the full rationale:
        # chaotic + f32-overflowing backward through the error-controller
        # chain; physical gradients flow via stages + event localization).
        dt_try = lax.stop_gradient(dt_try)

        y_new, err, k_last, ks = stepper(rhs, st.y, dt_try, st.k1)

        if adaptive:
            en = error_norm(err, st.y, y_new, cfg.rtol, cfg.atol)
            # Guard NaN/Inf states (e.g. ray fell into the singularity):
            bad = ~jnp.isfinite(en) | ~jnp.all(jnp.isfinite(y_new), axis=-1)
            en = jnp.where(bad, ERR_BIG, en)
            accept = en <= 1.0
            # PI controller (accepted) / plain shrink (rejected)
            en_c = jnp.maximum(en, 1e-10)
            q_pi = (cfg.safety * en_c ** (-cfg.beta1)
                    * jnp.maximum(st.err_old, cfg.qold_init) ** cfg.beta2)
            q_rej = cfg.safety * en_c ** (-0.2)
            q = jnp.where(accept, q_pi, jnp.minimum(q_rej, 1.0))
            q = jnp.clip(q, cfg.qmin, cfg.qmax)
            dt_next = jnp.clip(dt_try * q, cfg.dt_min, cfg.lam_max)
            # Kill rays that cannot proceed: NaN states, or error-control
            # failure at the minimum step (e.g. plunging into the
            # singularity). Mirrors OrdinaryDiffEq's dt<=dtmin abort, which
            # is how the reference's captured rays terminate.
            dead = (bad | ~accept) & (dt_try <= 2 * cfg.dt_min)
        else:
            en = jnp.ones(st.y.shape[0], dtype)
            accept = jnp.ones(st.y.shape[0], dtype=bool)
            dt_next = jnp.full_like(st.dt, cfg.rk4_dt)
            # Fixed-step has no rejection: a non-finite state must still
            # kill the ray (frozen at its last finite state).
            bad = ~jnp.all(jnp.isfinite(y_new), axis=-1)
            accept = accept & ~bad
            dead = bad

        if cfg.stop_rho > 0.0:
            rho2 = jnp.sum(y_new[..., 1:4] ** 2, axis=-1)
            dead = dead | (rho2 < cfg.stop_rho**2)

        do = st.active & accept
        # Event localization must never see a non-finite trial state (a ray
        # dying THIS step): even though its result is discarded for such
        # rays, NaN primals poison reverse-mode cotangents of the whole
        # graph. Substitute the (finite) pre-step state — degenerate
        # interval, crossed=False, harmless.
        fin = jnp.all(jnp.isfinite(y_new), axis=-1, keepdims=True)
        y_evt = jnp.where(fin, y_new, st.y)
        k_evt = jnp.where(fin, k_last, st.k1)
        # Zeroing a dying ray's stage values degrades its interpolant to the
        # constant y0 — finite, degenerate, result discarded anyway.
        ks_evt = (None if ks is None
                  else tuple(jnp.where(fin, k, 0.0) for k in ks))
        crossed, th_star, y_star = _locate_event(
            event_fn, st.y, y_evt, st.k1, k_evt, dt_try, cfg, ks=ks_evt)
        hit_now = do & crossed

        y_acc = jnp.where(hit_now[..., None], y_star, y_new)
        lam_acc = st.lam + jnp.where(hit_now, th_star * dt_try, dt_try)
        done_span = lam_acc >= cfg.lam_max - 1e-12

        y = jnp.where(do[..., None], y_acc, st.y)
        lam = jnp.where(do, lam_acc, st.lam)
        k1 = jnp.where(do[..., None], k_last, st.k1)
        hit = st.hit | hit_now
        active = st.active & ~hit_now & ~(do & done_span) & ~dead
        steps = st.steps + do.astype(st.steps.dtype)
        dt = jnp.where(st.active, dt_next, st.dt)
        err_old = jnp.where(do, jnp.maximum(en, cfg.qold_init), st.err_old)

        return _LoopState(y=y, lam=lam, dt=dt, k1=k1, active=active, hit=hit,
                          steps=steps, err_old=err_old, it=st.it + 1)

    return body


def _init_state(rhs, y0, cfg: IntegratorConfig) -> _LoopState:
    B = y0.shape[0]
    dtype = y0.dtype
    if cfg.method == "tsit5":
        dt0 = hairer_init_dt(rhs, y0, cfg.rtol, cfg.atol, 5, cfg.lam_max)
    else:
        dt0 = jnp.full((B,), cfg.rk4_dt, dtype)
    return _LoopState(
        y=y0,
        lam=jnp.zeros((B,), dtype),
        dt=dt0.astype(dtype),
        k1=rhs(y0),
        active=jnp.ones((B,), bool),
        hit=jnp.zeros((B,), bool),
        steps=jnp.zeros((B,), jnp.int32),
        err_old=jnp.full((B,), cfg.qold_init, dtype),
        it=jnp.zeros((), jnp.int32),
    )


def integrate_rays(rhs: RHS, event_fn: EventFn, y0: jax.Array,
                   cfg: IntegratorConfig) -> TraceResult:
    """Forward fast path: masked batched stepping in a ``lax.while_loop``
    until every ray has hit a surface, exhausted the lambda span, or died.

    Equivalent of ``solve(EnsembleProblem(...), Tsit5(), callback=...)`` at
    RayTraceGR.jl:507-511, as one fixed-shape array program.
    """
    body = _make_step_body(rhs, event_fn, cfg)
    st0 = _init_state(rhs, y0, cfg)

    def cond(st: _LoopState):
        return jnp.any(st.active) & (st.it < cfg.max_steps)

    st = lax.while_loop(cond, body, st0)
    return TraceResult(y=st.y, lam=st.lam, hit=st.hit, steps=st.steps,
                       n_iters=st.it)


def integrate_rays_scan(rhs: RHS, event_fn: EventFn, y0: jax.Array,
                        cfg: IntegratorConfig,
                        remat: bool = True) -> TraceResult:
    """Differentiable path: same step body under a bounded ``lax.scan`` so
    reverse-mode AD applies (while_loop is not reverse-differentiable).
    Always runs ``max_steps`` iterations with masked updates.

    ``remat=True`` checkpoints each step: the backward pass recomputes the
    7 RHS stages instead of storing their internals, so activation memory is
    O(max_steps x state) rather than O(max_steps x per-stage intermediates)
    — the standard FLOPs-for-HBM trade for long integrations.
    """
    body = _make_step_body(rhs, event_fn, cfg)
    if remat:
        body = jax.checkpoint(body)
    st0 = _init_state(rhs, y0, cfg)

    def scan_body(st, _):
        return body(st), None

    st, _ = lax.scan(scan_body, st0, None, length=cfg.max_steps)
    return TraceResult(y=st.y, lam=st.lam, hit=st.hit, steps=st.steps,
                       n_iters=st.it)
