"""Profiling analog of the reference's profile.sh
(/root/reference/profile.sh:3-10): warm-up render, then a measured render
under the JAX profiler; the trace is written for xprof/Perfetto AND the
device-plane events are summarized to stdout (total device time, top ops).

The stdout summary is what found the round-3 hotspot: a 200x200 render
showed ~13 ms of device time of which ~10 ms was one fusion
(hairer_init_dt on the jacfwd row-major RHS) — while host-blocked wall time
read 33 ms, the difference being the remote-chip dispatch round-trip.

Usage: python benchmarks/profile.py [N] [--backend pallas] \
       [--outdir /tmp/rtgr_trace]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def summarize(outdir: str, top: int = 12) -> None:
    """Aggregate device-plane event durations from the newest trace."""
    paths = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace.json.gz found to summarize", file=sys.stderr)
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    device_pids = {e["pid"] for e in ev
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "device:" in str(e.get("args", {}).get("name", ""))
                   and "CPU" not in str(e["args"]["name"])}
    from collections import defaultdict
    tot, cnt = defaultdict(float), defaultdict(int)
    device_total = 0.0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in device_pids:
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
            device_total += e["dur"]
    print(f"device events: {sum(cnt.values())}, "
          f"sum of device op time: {device_total / 1e3:.2f} ms "
          f"(envelopes included; ops nest)")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {t / 1e3:9.2f} ms  x{cnt[name]:<5} {name[:80]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=100)
    ap.add_argument("--outdir", default="/tmp/rtgr_trace")
    ap.add_argument("--backend", default="pallas",
                    choices=["xla", "xla_cm", "pallas"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from raytracegr_jl_tpu import IntegratorConfig, RenderConfig, render_fn
    from raytracegr_jl_tpu.models.scenes import build, example2_spec
    from raytracegr_jl_tpu.render import default_tol

    dtype = jnp.float32
    spec = example2_spec(args.n, args.n)
    metric, scene, canvas = build(spec, dtype)
    tol = default_tol(dtype)
    cfg = RenderConfig(integrator=IntegratorConfig(
        method="tsit5", rtol=tol, atol=tol, max_steps=20_000),
        backend=args.backend)
    fn = jax.jit(render_fn(metric, scene, cfg))

    # Warm-up (compile excluded from the trace), like profile.sh's first run.
    jax.block_until_ready(fn(canvas.pos, canvas.normal))

    with jax.profiler.trace(args.outdir):
        jax.block_until_ready(fn(canvas.pos, canvas.normal))
    print(f"trace written to {args.outdir}")
    summarize(args.outdir)


if __name__ == "__main__":
    main()
