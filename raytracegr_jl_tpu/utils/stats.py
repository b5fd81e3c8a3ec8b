"""Structured per-render observability.

The reference's entire observability story is one println of the output
path (/root/reference/src/RayTraceGR.jl:574,610; SURVEY.md §5). This
module is the framework-grade replacement: every trace can be summarized
into one JSON-able record — ray counts, hit/miss/killed classification,
the step-count distribution (the quantity that governs TPU divergence
cost — see the sort_rays / compaction work), throughput, and device
identity — suitable for logging pipelines, regression dashboards, or a
quick glance.

Usage:
    res = trace_batch(...)            # or any TraceResult
    stats = trace_stats(res, wall_s=dt)
    print(json.dumps(stats))

benchmarks/time.py emits it alongside the reference-style timing.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from ..ops.integrate import IntegratorConfig, TraceResult


def trace_stats(res: TraceResult, wall_s: float | None = None,
                cfg: IntegratorConfig | None = None) -> dict[str, Any]:
    """Summarize a TraceResult into a flat JSON-able dict.

    Classification: ``hit`` = terminated on a surface crossing; ``escaped``
    = exhausted the affine span (shaded as miss); ``killed`` = stopped
    mid-flight (capture radius / error-control failure / step budget).
    """
    steps = np.asarray(res.steps)
    hit = np.asarray(res.hit)
    lam = np.asarray(res.lam)
    n = int(steps.size)
    lam_max = float(cfg.lam_max) if cfg is not None else 100.0
    escaped = (~hit) & (lam >= lam_max - 1e-5)
    killed = (~hit) & ~escaped
    p = np.percentile(steps, [50, 90, 99]) if n else [0, 0, 0]
    out: dict[str, Any] = {
        "rays": n,
        "hit_frac": round(float(hit.mean()), 6) if n else 0.0,
        "escaped_frac": round(float(escaped.mean()), 6) if n else 0.0,
        "killed_frac": round(float(killed.mean()), 6) if n else 0.0,
        "steps_mean": round(float(steps.mean()), 2) if n else 0.0,
        "steps_p50": int(p[0]),
        "steps_p90": int(p[1]),
        "steps_p99": int(p[2]),
        "steps_max": int(steps.max()) if n else 0,
        "loop_iters": int(np.asarray(res.n_iters)),
        "device": getattr(jax.devices()[0], "device_kind",
                          jax.devices()[0].platform),
    }
    if wall_s is not None and wall_s > 0:
        out["wall_s"] = round(float(wall_s), 4)
        out["rays_per_s"] = round(n / wall_s, 1)
    if cfg is not None:
        out["method"] = cfg.method
        out["max_steps"] = int(cfg.max_steps)
    return out
