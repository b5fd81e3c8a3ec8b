"""Mid-flight ray compaction: chunked kernel launches with active-ray packing.

The fused Pallas kernel already exits early per ~1k-ray tile, and
impact-parameter sorting clusters slow rays into few tiles — but a
photon-ring tile still runs ~15k iterations with mostly-dead lanes
(BASELINE.md: accretion-disk p99 ~15k steps vs p50 ~21; 66x divergence tax
vs the flagship). This module adds the third mitigation from SURVEY.md §7
("periodic compaction"): integrate in CHUNKS of iterations, and between
chunks gather the still-active rays into dense tiles before relaunching, so
late chunks run on a small packed batch instead of a sparse full-size one.

Architecture (host-in-the-loop, forward-only):
  * ``chunk`` kernel: the same step body (pallas_geodesic.make_step_cm) and
    in-kernel deferred event localization, but RESUMABLE — the full
    integration state (13 planes) streams in and out, so a ray's evolution
    is bit-identical whether it runs 20k iterations in one launch or
    across many.
  * driver ``trace_batch_compacted``: sorts by impact parameter, launches a
    chunk, syncs ONLY the active-lane count to the host (all result
    scatter and lane packing stay on device — pulling per-chunk results
    through the tunneled chip measurably ate the whole win), shrinks the
    batch to at-least-halved buckets (so only ~log2 distinct shapes ever
    compile), and relaunches with a doubling iteration budget. Results are
    gathered back to camera order at the end.

Chunk boundaries, lane packing, and bucket padding are all invisible to
the per-ray math (lane independence — the property sort_rays regression-
tests), so the image is BITWISE IDENTICAL to the single-launch kernel.

This is a driver-level loop (not jittable end-to-end) by design: the
active-ray count is data-dependent, and XLA requires static shapes — the
host sync per chunk (~20 ms on the tunneled chip) is amortized by the
doubling chunk schedule (~10 launches for a 20k-iteration budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ops.integrate import IntegratorConfig, TraceResult
from .ops.pallas_geodesic import (LANES, TILE_S, impact_parameter_order,
                                  localize_events_cm, make_step_cm)

# Resumable state layout: make_step_cm's 14-tuple minus the scalar `it`
# (index 8), which is a per-LAUNCH iteration budget counter, re-zeroed each
# chunk. Indices below are into the 13-tuple.
_WIDE = (0, 3, 8)  # (8, S, L)-shaped planes: y, k1, ev_y0


def _chunk_kernel(metric_cm, event_fn, cfg: IntegratorConfig,
                  init_in_kernel: bool):
    """Resumable chunk kernel. ``init_in_kernel=True`` builds the first
    chunk: inputs are (y0, dt0, act) and the loop state is constructed
    INSIDE the kernel — the same placement as the single-launch kernel
    (_make_kernel), which matters for bitwise parity: computing k1 =
    rhs(y0) in a separately-compiled XLA program instead rounds a few
    lanes one ulp differently, and the acceptance thresholds amplify that
    into different step sequences. Subsequent chunks stream the full
    13-plane state in and out."""
    cond, body, init = make_step_cm(metric_cm, event_fn, cfg)

    def kernel(*refs):
        if init_in_kernel:
            y_ref, dt_ref, act_ref = refs[:3]
            outs = refs[3:16]
            yfin_ref, lamfin_ref = refs[16], refs[17]
            st0 = init(y_ref[:], dt_ref[:], act_ref[:] > 0)
        else:
            ins = refs[:13]
            outs = refs[13:26]
            yfin_ref, lamfin_ref = refs[26], refs[27]
            st0 = (tuple(r[:] for r in ins[:8])
                   + (jnp.zeros((), jnp.int32),)
                   + tuple(r[:] for r in ins[8:]))
        st = lax.while_loop(cond, body, st0)
        res = st[:8] + st[9:]
        for r, v in zip(outs, res):
            r[:] = v
        # Localization is idempotent (pure function of the per-ray ev
        # record), so re-running it for already-hit filler lanes in later
        # chunks rewrites the same values.
        yf, lf = localize_events_cm(metric_cm, event_fn, cfg, st)
        yfin_ref[:] = yf
        lamfin_ref[:] = lf

    return kernel


def _state_specs(R):
    wide = pl.BlockSpec((8, TILE_S, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    flat = pl.BlockSpec((TILE_S, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return [wide if i in _WIDE else flat for i in range(13)]


def make_chunk_launcher(metric_cm, event_fn, cfg: IntegratorConfig,
                        interpret: bool = False,
                        init_in_kernel: bool = False):
    """Jitted resumable launcher: ``state13 -> (state13, y_fin, lam_fin)``,
    or with ``init_in_kernel`` ``(y_cm, dt_cm, act_cm) -> same`` (first
    chunk — see _chunk_kernel).

    ``cfg.max_steps`` is the PER-CHUNK iteration budget. Shapes are taken
    from the inputs, so one launcher instance serves one bucket size; the
    driver caches launchers per (size, budget).
    """
    kernel = _chunk_kernel(metric_cm, event_fn, cfg, init_in_kernel)

    @jax.jit
    def launch(*args):
        R = args[1].shape[0]
        dtype = args[0].dtype
        specs = _state_specs(R)
        in_specs = [specs[0], specs[1], specs[1]] if init_in_kernel else specs
        shp = lambda i: ((8, R, LANES) if i in _WIDE else (R, LANES))
        dt_of = lambda i: (jnp.int32 if i == 6 else dtype)
        out_shape = tuple(jax.ShapeDtypeStruct(shp(i), dt_of(i))
                          for i in range(13))
        out_shape += (jax.ShapeDtypeStruct((8, R, LANES), dtype),
                      jax.ShapeDtypeStruct((R, LANES), dtype))
        out = pl.pallas_call(
            kernel,
            grid=(R // TILE_S,),
            in_specs=in_specs,
            out_specs=tuple(specs) + (specs[0], specs[1]),
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
        return out[:13], out[13], out[14]

    return launch


@functools.partial(jax.jit, static_argnums=2)
def _prologue(y0, dt0, Bp):
    """Sort by impact parameter, pad to a whole number of tiles, reshape to
    component-major lanes. Jitted: everything here is a permutation / pad /
    reshape of the caller's (y0, dt0) — exact, so fusing it cannot perturb
    the per-ray math and the bitwise pin vs the single-launch kernel is
    preserved. (The sort KEY is arithmetic, but ray results are
    lane-independent — the property test_sort_rays regression-tests — so
    even an ulp-shifted ordering only regroups tiles, never changes a ray's
    trajectory.)"""
    B = y0.shape[0]
    R = Bp // LANES
    pad = Bp - B
    order, inv_order = impact_parameter_order(y0)
    ys, ds = y0[order], dt0[order]
    y_cm = jnp.pad(ys, ((0, pad), (0, 0))).T.reshape(8, R, LANES)
    dt_cm = jnp.pad(ds, (0, pad), constant_values=1.0).reshape(R, LANES)
    act_cm = jnp.pad(jnp.ones((B,), y0.dtype), (0, pad)).reshape(R, LANES)
    return y_cm, dt_cm, act_cm, inv_order


@jax.jit
def _unsort(y_o, lam_o, hit_o, steps_o, inv):
    """Gather results back to camera order. Pure gathers — exact, see
    _prologue."""
    B = inv.shape[0]
    return y_o[:B][inv], lam_o[:B][inv], hit_o[:B][inv], steps_o[:B][inv]


def _take_lanes(state, keep, R_new):
    """Gather lane-columns ``keep`` from a 13-tuple cm state and reshape to
    R_new rows. ``keep`` has R_new*LANES entries (device array)."""
    out = []
    for i, arr in enumerate(state):
        if i in _WIDE:
            flat = arr.reshape(8, -1)
            out.append(jnp.take(flat, keep, axis=1).reshape(8, R_new, LANES))
        else:
            flat = arr.reshape(-1)
            out.append(jnp.take(flat, keep, axis=0).reshape(R_new, LANES))
    return tuple(out)


def trace_batch_compacted(metric_cm, event_fn, y0: jax.Array,
                          dt0: jax.Array, cfg: IntegratorConfig,
                          *, first_chunk: int = 64,
                          interpret: bool = False,
                          launcher_cache: dict | None = None) -> TraceResult:
    """Forward integration with mid-flight compaction (see module doc).

    ``y0`` [B, 8] row-major, ``dt0`` [B]: same contract as
    integrate_rays_pallas. Returns a TraceResult bitwise identical to the
    single-launch kernel's. ``first_chunk`` is the iteration budget of the
    first launch; subsequent chunks double it (most rays finish in the
    first few launches; the photon-ring tail gets ever-larger budgets with
    ever-smaller batches).
    """
    B = y0.shape[0]
    dtype = y0.dtype
    tile = TILE_S * LANES
    Bp = -(-B // tile) * tile
    R = Bp // LANES
    y_cm, dt_cm, act_cm, inv_order = _prologue(y0, dt0, Bp)

    # Launchers are cached across calls when the caller passes a dict
    # (make_compact_renderer does): rebuilding them re-traces the Pallas
    # kernel every render, which costs seconds even with the persistent
    # XLA compile cache.
    launchers = {} if launcher_cache is None else launcher_cache

    def launcher_for(rows, budget, init_in_kernel=False):
        key = (rows, budget, init_in_kernel)
        if key not in launchers:
            launchers[key] = make_chunk_launcher(
                metric_cm, event_fn, cfg._replace(max_steps=budget),
                interpret=interpret, init_in_kernel=init_in_kernel)
        return launchers[key]

    # Result buffers in padded-sorted lane space, kept ON DEVICE: the only
    # per-chunk host traffic is the active-lane COUNT (one scalar). Pulling
    # per-chunk results to the host instead costs ~45 MB per launch through
    # the tunneled chip — measured to eat the entire compaction win.
    y_out = jnp.zeros((Bp, 8), dtype)
    lam_out = jnp.zeros((Bp,), dtype)
    hit_out = jnp.zeros((Bp,), bool)
    steps_out = jnp.zeros((Bp,), jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def scatter(y_o, lam_o, hit_o, steps_o, slots, state, y_fin, lam_fin):
        # Finished lanes are final; still-active lanes get overwritten by a
        # later chunk's scatter.
        return (y_o.at[slots].set(y_fin.reshape(8, -1).T),
                lam_o.at[slots].set(lam_fin.reshape(-1)),
                hit_o.at[slots].set(state[5].reshape(-1) > 0),
                steps_o.at[slots].set(state[6].reshape(-1)))

    @functools.partial(jax.jit, static_argnums=2)
    def pack(state, slots, new_rows):
        act_i = (state[4].reshape(-1) <= 0).astype(jnp.int32)
        keep = jnp.argsort(act_i, stable=True)[:new_rows * LANES]
        return _take_lanes(state, keep, new_rows), slots[keep]

    slots = jnp.arange(Bp)  # original padded-sorted slot of each lane
    it_total = 0
    budget = int(first_chunk)
    rows = R
    state = None
    while True:
        budget = min(budget, cfg.max_steps - it_total)
        if state is None:
            state, y_fin, lam_fin = launcher_for(
                rows, budget, init_in_kernel=True)(y_cm, dt_cm, act_cm)
        else:
            state, y_fin, lam_fin = launcher_for(rows, budget)(*state)
        it_total += budget
        y_out, lam_out, hit_out, steps_out = scatter(
            y_out, lam_out, hit_out, steps_out, slots, state, y_fin,
            lam_fin)
        n_act = int(jnp.sum(state[4] > 0))  # the one host sync per chunk
        if n_act == 0 or it_total >= cfg.max_steps:
            break
        # Shrink only when the packed batch at least halves (so at most
        # log2 distinct shapes compile), and keep rows a multiple of
        # TILE_S — the grid covers rows//TILE_S tiles, so a misaligned
        # row count would leave tail rows unwritten.
        rows_needed = -(-n_act // LANES)
        rows_needed = max(TILE_S, -(-rows_needed // TILE_S) * TILE_S)
        new_rows = rows_needed if rows_needed <= rows // 2 else rows
        if new_rows != rows:
            # Pack actives first (stable order preserves impact-parameter
            # clustering); fill the remainder with frozen lanes.
            state, slots = pack(state, slots, new_rows)
            rows = new_rows
            budget = min(budget * 2, 4096)
        else:
            # Packing stalled: the survivors are a homogeneous band (the
            # accretion-disk photon ring: every remaining ray needs ~15k
            # steps), so more chunking buys nothing — the in-kernel
            # per-tile early exit already handles any stragglers — and
            # each extra chunk costs a ~20 ms host sync on the tunneled
            # chip plus launch overhead. Run the rest in ONE launch.
            # (Round-5: the r4 doubling-to-4096 schedule spent 7 extra
            # syncs + launches here; the disk render dropped from ~1.6 s
            # to ~1.1 s with this rule, images bitwise identical — chunk
            # boundaries are invisible to the per-ray math.)
            budget = cfg.max_steps - it_total

    y_f, lam_f, hit_f, steps_f = _unsort(y_out, lam_out, hit_out,
                                         steps_out, inv_order)
    return TraceResult(
        y=y_f, lam=lam_f, hit=hit_f, steps=steps_f,
        n_iters=jnp.asarray(it_total, jnp.int32),
    )


def make_compact_renderer(metric, scene, cfg, *, first_chunk: int = 64,
                          interpret: bool = False,
                          fast_epilogue: bool = False):
    """Build a reusable ``canvas -> canvas-with-rgb`` compacted renderer.

    Unlike ``render_fn`` the result is NOT jittable end-to-end (the
    compaction loop syncs the active count to the host between chunks);
    the integration chunks and the shading epilogue are jitted
    individually, and the chunk launchers are cached inside the renderer
    so repeat renders skip re-tracing. Use for strongly step-divergent
    scenes (accretion disk, photon-ring closeups); images are bitwise
    identical to ``backend="pallas"``.

    ``fast_epilogue=True`` jits the init-dt heuristic and the shading
    epilogue, which by default run EAGER to preserve bitwise parity with
    the single-launch path (see the inline comments below). Eager means
    every elementwise op is a separate XLA program making a full HBM pass
    over the megapixel buffers — measured ~0.38 s of the 1.4 s disk render
    at 1024x1024 (BASELINE.md round-5 roofline row). Jitting fuses them;
    the cost is that fusion-level rounding (a) shifts some rays' dt0 by an
    ulp, which the adaptive controller can amplify into a different (still
    valid) step sequence for isolated grazing rays, and (b) rounds shaded
    colors an LSB differently. The image is no longer bitwise-pinned to
    ``backend="pallas"`` — tests assert it stays visually identical
    (tests/test_compaction.py::test_fast_epilogue_close).
    """
    from .ops.integrate import hairer_init_dt
    from .ops.pallas_geodesic import geodesic_cm, scene_event_cm
    from .render import _metric_cm_of, _shade

    metric_cm = _metric_cm_of(metric)
    event_fn = scene_event_cm(scene, literal=True)
    integ = cfg.integrator
    cache: dict = {}

    # NOT jitted by default: jit fuses the heuristic differently and shifts
    # dt0 by an ulp, which the acceptance thresholds amplify into different
    # step sequences — breaking bitwise parity with the (unjitted)
    # trace_batch reference path. Eager is ~0.11 s/render at 1024x1024
    # (unfused HBM passes); fast_epilogue trades the bitwise pin for fusion.
    def init_dt(y0):
        if integ.method == "rk4":
            return jnp.full(y0.shape[:1], integ.rk4_dt, y0.dtype)

        def rhs_cm(y):
            return geodesic_cm(metric_cm, y.T[:, None, :])[:, 0, :].T

        return hairer_init_dt(rhs_cm, y0, integ.rtol, integ.atol, 5,
                              integ.lam_max)

    # Eager by default, like trace_rays: jitting the shading epilogue
    # refuses bitwise parity (fusion-level rounding lands on the
    # checker-pattern mod/atan2 boundaries, flipping most textured pixels
    # by an LSB). ~0.27 s/render at 1024x1024 redshift shading.
    shade = lambda a, b: _shade(metric, scene, a, b, cfg)
    if fast_epilogue:
        init_dt = jax.jit(init_dt)
        shade = jax.jit(shade)

    def render(canvas):
        ni, nj = canvas.shape
        y0 = jnp.concatenate([canvas.pos, canvas.normal],
                             axis=-1).reshape(-1, 8)
        res = trace_batch_compacted(
            metric_cm, event_fn, y0, init_dt(y0), integ,
            first_chunk=first_chunk, interpret=interpret,
            launcher_cache=cache)
        rgb = shade(y0, res.y)
        return canvas._replace(rgb=rgb.reshape(ni, nj, 3))

    return render


def render_compacted(metric, scene, canvas, cfg, *, first_chunk: int = 64,
                     interpret: bool = False, fast_epilogue: bool = False):
    """One-shot convenience over ``make_compact_renderer``."""
    return make_compact_renderer(metric, scene, cfg, first_chunk=first_chunk,
                                 interpret=interpret,
                                 fast_epilogue=fast_epilogue)(canvas)
