"""Fused Pallas BACKWARD kernel for the checkpointed adjoint integrator.

ops/adjoint.py closed most of the forward/backward gap structurally
(checkpoint + replay instead of always-max_steps remat scan), but its
backward replay runs as plain XLA: ~30 small fusions per step over the full
ray batch, every step, for every ray — measured ~3x slower per ray-step
than the fused forward kernel, and unable to skip work for rays that
terminated early (XLA has no per-tile control flow).

This module moves the ENTIRE backward pass into one Pallas kernel:

  * grid over ~1k-ray tiles (same layout as the forward kernel);
  * per tile, a reversed loop over checkpoint segments; a segment whose
    checkpoint shows the tile fully inactive is skipped with a
    ``lax.cond`` — with impact-parameter-sorted rays, short-lived tiles
    stop paying for photon-ring stragglers;
  * each live segment is replayed from its checkpoint (in VMEM) under
    ``jax.vjp`` — the step body, its rematerialized recompute, and its
    transpose all trace into the kernel and run fused on the VPU;
  * parameter cotangents (Kerr-Schild M, a + scene object parameters)
    reduce to per-tile scalars written to an ``(n_tiles, P)`` output and
    summed outside; state cotangents chain backward in VMEM.

Closure handling differs from ops/adjoint.py: no ``closure_convert`` —
Mosaic cannot consume hoisted array constants, so the differentiable
parameters are FLATTENED to one ``(1, P)`` f32 vector read from SMEM, and
the step body is REBUILT inside the kernel from those scalars
(kerr_schild_cm + models/objects.KIND_DISTANCE via scene_event_from_get —
the same single-source definitions as every other backend, so primals are
bit-identical to the XLA paths). Gradients w.r.t. the original (M, a,
scene) pytrees flow through the flattening ops by ordinary AD.

Scope: the standard differentiable configuration (Kerr-Schild metric with
a ``kerr_recipe``, registered scene kinds). render.trace_batch falls back
to the XLA backward for anything else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .integrate import IntegratorConfig, TraceResult
from .metrics import KerrSchildParams
from .pallas_geodesic import (LANES, TILE_S, kerr_schild_cm,
                              localize_events_cm, make_step_cm,
                              scene_event_from_get)

# 13-plane resumable state (make_step_cm's 14-tuple minus the scalar `it`,
# same convention as compaction.py). Wide planes are (8, S, L).
_WIDE = (0, 3, 8)
_N_STATE = 13
# Per-object differentiable parameters packed after (M, a) in the flat
# parameter vector, in this order.
_OBJ_FIELDS = ("pos1", "pos2", "pos3", "radius", "time", "r_in", "r_out",
               "half")


def flatten_params(metric_cm, scene):
    """(M, a, per-object fields) -> flat [P] vector (traced; gradients flow
    back through these ops) + the static kinds tuple."""
    import numpy as np

    p = metric_cm.params
    kinds = tuple(int(k) for k in np.asarray(scene.kind))
    parts = [jnp.asarray(p.M), jnp.asarray(p.a)]
    for i in range(len(kinds)):
        parts += [scene.pos[i, 1], scene.pos[i, 2], scene.pos[i, 3],
                  scene.radius[i], scene.time[i], scene.r_in[i],
                  scene.r_out[i], scene.half[i]]
    dtype = scene.pos.dtype
    return jnp.stack([jnp.asarray(x, dtype) for x in parts]), kinds


def make_param_body(kinds, r_formula: str, rho_min: float,
                    cfg: IntegratorConfig):
    """Static recipe ``params_scalars -> (cond, body, init)`` rebuilding the
    step machinery from a flat tuple of scalar parameters — callable both
    at the XLA level (scalars = pvec[j] slices) and inside the Pallas
    kernel (scalars = SMEM reads)."""

    def build(params):
        M, a = params[0], params[1]
        mcm = kerr_schild_cm(KerrSchildParams(M=M, a=a), r_formula,
                             rho_min=rho_min)

        def make_get(i):
            base = 2 + len(_OBJ_FIELDS) * i

            def get(field, comp=None):
                if field == "pos":
                    return params[base + (comp - 1)]
                return params[base + 3 + ("radius", "time", "r_in",
                                          "r_out", "half").index(field)]

            return get

        event = scene_event_from_get(kinds, make_get)
        return make_step_cm(mcm, event, cfg)

    return build


def _to13(st14):
    return st14[:8] + st14[9:]


def _to14(st13, it):
    return st13[:8] + (it,) + st13[8:]


# ---------------------------------------------------------------------------
# custom_vjp: Pallas forward (one fused kernel launch per checkpoint
# segment, chained in an XLA while_loop with batch-level early exit) and
# Pallas backward (per-tile segment replay).
# ---------------------------------------------------------------------------

def _state_specs():
    wide = pl.BlockSpec((8, TILE_S, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    flat = pl.BlockSpec((TILE_S, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return [wide if i in _WIDE else flat for i in range(_N_STATE)]


def _fwd_seg_launch(build, seg_len: int, n_params: int, interpret: bool,
                    pvec, st13):
    """One forward checkpoint segment as a fused Pallas launch: the whole
    seg_len-step adaptive loop runs in VMEM (same economics as the
    forward render kernel), parameters come from SMEM scalars."""
    R = st13[1].shape[0]
    dtype = st13[0].dtype
    n_tiles = R // TILE_S

    def kernel(pref, *refs):
        ins = refs[:_N_STATE]
        outs = refs[_N_STATE:]
        params = tuple(pref[0, j] for j in range(n_params))
        cond, body, _ = build(params)
        st = _to14(tuple(r[:] for r in ins), jnp.zeros((), jnp.int32))
        st = lax.while_loop(cond, body, st)
        for r, v in zip(outs, _to13(st)):
            r[:] = v

    specs = _state_specs()
    pspec = pl.BlockSpec((1, n_params), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
    shp = lambda i: ((8, R, LANES) if i in _WIDE else (R, LANES))
    out_shape = tuple(jax.ShapeDtypeStruct(shp(i), dtype)
                      for i in range(_N_STATE))
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pspec] + specs,
        out_specs=tuple(specs),
        out_shape=out_shape,
        interpret=interpret,
    )(pvec.reshape(1, -1).astype(dtype), *st13)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _run(build, build_seg, seg_len: int, n_seg: int, n_params: int,
         interpret: bool, pvec, st13):
    def cond(c):
        s, st = c
        return (s < n_seg) & (jnp.max(st[4]) > 0)

    def step(c):
        s, st = c
        return s + 1, _fwd_seg_launch(build_seg, seg_len, n_params,
                                      interpret, pvec, st)

    n_used, st = lax.while_loop(cond, step, (jnp.zeros((), jnp.int32), st13))
    return st, n_used


def _run_fwd(build, build_seg, seg_len, n_seg, n_params, interpret, pvec,
             st13):
    ck0 = jax.tree.map(lambda x: jnp.zeros((n_seg,) + x.shape, x.dtype),
                       st13)

    def cond(c):
        s, st, ck = c
        return (s < n_seg) & (jnp.max(st[4]) > 0)

    def step(c):
        s, st, ck = c
        ck = jax.tree.map(
            lambda b, x: lax.dynamic_update_index_in_dim(b, x, s, 0), ck, st)
        return s + 1, _fwd_seg_launch(build_seg, seg_len, n_params,
                                      interpret, pvec, st), ck

    n_used, st, ck = lax.while_loop(
        cond, step, (jnp.zeros((), jnp.int32), st13, ck0))
    return (st, n_used), (ck, pvec)


def _run_bwd(build, build_seg, seg_len, n_seg, n_params, interpret, res,
             ct):
    ck, pvec = res
    ct = ct[0]  # cotangent of st13; the n_used counter's is symbolic zero
    R = ck[1].shape[1]
    dtype = ck[0].dtype
    n_tiles = R // TILE_S

    def kernel(pref, *refs):
        ck_refs = refs[:_N_STATE]
        ct_refs = refs[_N_STATE:2 * _N_STATE]
        ct0_refs = refs[2 * _N_STATE:3 * _N_STATE]
        pbar_ref = refs[3 * _N_STATE]

        params = tuple(pref[0, j] for j in range(n_params))
        _, body, _ = build(params)

        def seg_fn(params_, st):
            # params_ are the SAME tracers as `params` captured by `body`
            # via build — rebuild so vjp sees them as inputs. NO
            # jax.checkpoint here: Mosaic cannot lower the remat2
            # primitive; the vjp's per-step residuals live in VMEM, which
            # is the cheap memory this kernel exists to exploit.
            _, body_, _ = build(params_)
            for _ in range(seg_len):
                st = _to13(body_(_to14(st, jnp.zeros((), jnp.float32))))
            return st

        ct_st = tuple(r[:] for r in ct_refs)
        pbar0 = tuple(jnp.zeros((), dtype) for _ in range(n_params))

        def seg_rev(i, carry):
            ct_, pbar = carry
            s = n_seg - 1 - i
            st_s = tuple(r[s] for r in ck_refs)
            live = jnp.max(st_s[4]) > 0

            def do(args):
                c, pb = args
                _, vjp_fn = jax.vjp(seg_fn, params, st_s)
                pb_inc, c2 = vjp_fn(c)
                return c2, tuple(a + b for a, b in zip(pb, pb_inc))

            return lax.cond(live, do, lambda a: a, (ct_, pbar))

        ct_st, pbar = lax.fori_loop(0, n_seg, seg_rev, (ct_st, pbar0))
        for r, v in zip(ct0_refs, ct_st):
            r[:] = v
        # Scatter the P scalar cotangents into a (1, 8, 128) VMEM slab
        # (scalar stores / (1, P) SMEM blocks violate TPU tiling rules):
        # lane j of every sublane holds pbar[j]; the caller reads row 0.
        cols = lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        row = jnp.zeros((8, LANES), dtype)
        for j in range(n_params):
            row = jnp.where(cols == j, pbar[j], row)
        pbar_ref[:] = row[None]

    wide_ck = pl.BlockSpec((n_seg, 8, TILE_S, LANES), lambda i: (0, 0, i, 0),
                           memory_space=pltpu.VMEM)
    flat_ck = pl.BlockSpec((n_seg, TILE_S, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    ck_specs = [wide_ck if i in _WIDE else flat_ck for i in range(_N_STATE)]
    st_specs = _state_specs()
    pspec = pl.BlockSpec((1, n_params), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
    pbar_spec = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    shp = lambda i: ((8, R, LANES) if i in _WIDE else (R, LANES))
    out_shape = tuple(jax.ShapeDtypeStruct(shp(i), dtype)
                      for i in range(_N_STATE))
    out_shape += (jax.ShapeDtypeStruct((n_tiles, 8, LANES), dtype),)

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pspec] + ck_specs + st_specs,
        out_specs=tuple(st_specs) + (pbar_spec,),
        out_shape=out_shape,
        # The per-segment vjp keeps ~3.5 MB/step of residuals live (no
        # remat inside the kernel — Mosaic can't lower remat2); the
        # default 16 MB scoped-vmem cap rejects seg_len=8 at 28.5 MB.
        # v5e has 128 MB of physical VMEM; give the scheduler room.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pvec.reshape(1, -1).astype(dtype), *ck, *ct)

    ct0 = outs[:_N_STATE]
    pbar = jnp.sum(outs[_N_STATE][:, 0, :n_params],
                   axis=0).astype(pvec.dtype)
    return pbar, ct0


_run.defvjp(_run_fwd, _run_bwd)


def integrate_rays_cm_ckpt_pallas(metric_cm, scene, y0: jax.Array,
                                  dt0: jax.Array, cfg: IntegratorConfig,
                                  seg_len: int | None = None,
                                  interpret: bool = False) -> TraceResult:
    """Checkpointed-adjoint integration with the Pallas backward kernel.

    Same contract and primals as ops/adjoint.integrate_rays_cm_ckpt; the
    backward pass runs fused per tile with per-segment skipping. Requires a
    Kerr-Schild metric_cm carrying ``kerr_recipe``/``params`` (set by
    metrics.make_metric) and a Scene of registered kinds.
    """
    r_formula, rho_min = metric_cm.kerr_recipe
    pvec, kinds = flatten_params(metric_cm, scene)
    if int(pvec.shape[0]) > LANES:
        # The backward kernel scatters the P parameter cotangents into one
        # 128-lane row; more objects than fit (P = 2 + 8*n_objects > LANES,
        # i.e. > 15 objects) must use the XLA ckpt path
        # (render._trace_differentiable_cm routes there automatically).
        raise ValueError(
            f"pallas adjoint supports at most {LANES} differentiable "
            f"parameters (= {(LANES - 2) // len(_OBJ_FIELDS)} objects); "
            f"scene has {len(kinds)} objects -> {int(pvec.shape[0])} params. "
            "Use grad_mode='ckpt' (XLA backward) for larger scenes.")

    B = y0.shape[0]
    dtype = y0.dtype
    tile = TILE_S * LANES
    n_tiles = -(-B // tile)
    Bp = n_tiles * tile
    R = Bp // LANES
    pad = Bp - B
    y_cm = jnp.pad(y0, ((0, pad), (0, 0))).T.reshape(8, R, LANES)
    dt_cm = jnp.pad(dt0, (0, pad), constant_values=1.0).reshape(R, LANES)
    act_cm = jnp.pad(jnp.ones((B,), bool), (0, pad)).reshape(R, LANES)

    if seg_len is None:
        seg_len = 8
    seg_len = max(1, min(seg_len, cfg.max_steps))
    while cfg.max_steps % seg_len:
        seg_len -= 1
    n_seg = cfg.max_steps // seg_len

    build = make_param_body(kinds, r_formula, rho_min, cfg)
    # The forward segment kernel bounds its in-kernel while at seg_len
    # (it resets to 0 each launch); the replay builder keeps the full cfg.
    build_seg = make_param_body(kinds, r_formula, rho_min,
                                cfg._replace(max_steps=seg_len))
    n_params = int(pvec.shape[0])

    # Build st0 with the SAME traced params so init's k1 = rhs(y0) carries
    # their gradients; all-float carry (steps/it as f32).
    _, _, init = build(tuple(pvec[j] for j in range(n_params)))
    st14 = init(y_cm, dt_cm, act_cm)
    st14 = (st14[:6] + (st14[6].astype(dtype), st14[7],
                        st14[8].astype(dtype)) + st14[9:])
    st13 = _to13(st14)

    st, n_used = _run(build, build_seg, seg_len, n_seg, n_params, interpret,
                      pvec, st13)

    # Dead-ray cotangent cutoff: killed rays only (see
    # adjoint.integrate_rays_cm_ckpt for the full rationale) — truncated
    # (still-active) rays keep gradients.
    lam_f, active_f, hit_f = st[1], st[4], st[5]
    dead = ((hit_f <= 0) & (active_f <= 0)
            & (lam_f < cfg.lam_max - 1e-6))
    st = (jnp.where(dead, lax.stop_gradient(st[0]), st[0]),) + st[1:]

    # Differentiable epilogue outside the custom_vjp: rebuild the metric /
    # event from the SAME traced parameters.
    mcm = kerr_schild_cm(
        KerrSchildParams(M=pvec[0], a=pvec[1]), r_formula, rho_min=rho_min)
    params = tuple(pvec[j] for j in range(n_params))
    # the builder's accessor structure, re-expressed for the event function:
    base_get = lambda i: (lambda field, comp=None: (
        params[2 + len(_OBJ_FIELDS) * i + (comp - 1)] if field == "pos"
        else params[2 + len(_OBJ_FIELDS) * i + 3
                    + ("radius", "time", "r_in", "r_out",
                       "half").index(field)]))
    event = scene_event_from_get(kinds, base_get)
    y, lam = localize_events_cm(mcm, event, cfg,
                                _to14(st, jnp.zeros((), jnp.float32)))
    return TraceResult(
        y=y.reshape(8, Bp).T[:B],
        lam=lam.reshape(Bp)[:B],
        hit=(st[5] > 0).reshape(Bp)[:B],
        steps=st[6].astype(jnp.int32).reshape(Bp)[:B],
        # Each segment kernel resets its in-kernel iteration counter, so the
        # exact loop_iters total is unavailable on this path; report the
        # tight upper bound segments_run * seg_len (exact when no tile
        # exits a segment early) so utils/stats doesn't read "no work done".
        n_iters=n_used * seg_len,
    )
