"""Golden-image parity harness: render example1/example2 at the reference's
exact configuration (Float64, tol = eps^(3/4), 200x200) and compare against
the committed goldens from the Julia reference
(/root/reference/scenes/sphere.png, sphere2.png).

Criterion: fraction of pixels whose 8-bit RGB differs by more than 2 LSB.
Boundary pixels (checker-cell edges, silhouettes) may legitimately flip from
solver roundoff; the bulk image must match.

Usage: python benchmarks/parity.py [--example 1|2] [--n 200]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys
import time


def run(example: int, n: int) -> float:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from raytracegr_jl_tpu.models.scenes import (example1_spec, example2_spec,
                                                 render_spec)
    from raytracegr_jl_tpu.utils.image import canvas_to_image, load_png

    from raytracegr_jl_tpu import IntegratorConfig, RenderConfig
    from raytracegr_jl_tpu.render import default_tol

    spec = (example1_spec if example == 1 else example2_spec)(n, n)
    # Parity requires the reference's exact solver: Tsit5 at
    # reltol=abstol=eps^(3/4) (RayTraceGR.jl:485,510) for BOTH examples
    # (render_spec defaults flat space to cheap RK4, whose hit offsets
    # differ at silhouette pixels).
    tol = default_tol(jnp.float64)
    cfg = RenderConfig(integrator=IntegratorConfig(
        method="tsit5", rtol=tol, atol=tol, max_steps=20_000))
    t0 = time.time()
    canvas = render_spec(spec, jnp.float64, cfg)
    print(f"example{example} render: {time.time() - t0:.1f}s")

    img = canvas_to_image(np.asarray(canvas.rgb)).astype(np.float64) / 255.0
    gold = load_png(f"/root/reference/scenes/sphere{'' if example == 1 else 2}.png")
    if img.shape != gold.shape:
        print(f"shape mismatch: {img.shape} vs {gold.shape}")
        return 1.0
    diff = np.abs(img - gold)
    frac_bad = float((diff.max(-1) > 2 / 255).mean())
    print(f"max abs diff: {diff.max():.4f}  mean: {diff.mean():.6f}  "
          f"frac pixels >2LSB: {frac_bad:.4f}")

    if example == 1 and frac_bad > 0:
        # Flat space: rays are straight lines, so the ray-sphere intersection
        # has a closed form — classify every differing pixel. The residual
        # example1 diffs are silhouette-grazing pixels whose event window
        # falls between the solver's interp samples: detection there is a
        # roundoff lottery (the step controller runs on an error estimate
        # that is catastrophic-cancellation noise at tol=eps^0.75 in exactly
        # linear motion, so the reference's dt sequence is not reproducible
        # bit-for-bit — it differs across Julia versions/CPUs too). The
        # analytic oracle confirms BOTH images only disagree at true grazes;
        # the reference golden itself MISSES 53 analytically-true hits.
        bad = np.argwhere(diff.max(-1) > 2 / 255)
        n_graze, ours_hit, gold_hit = 0, 0, 0
        ours_right, gold_right = 0, 0
        # Silhouette band |rho_min - 0.5| < 0.03: the detection lottery
        # extends to impact parameters where the sphere chord (the event
        # function's negative window, 2*sqrt(0.25 - rho_min^2) ~ 0.31 at
        # rho_min = 0.475) is still shorter than the in-step sample spacing
        # of late flat-space steps (dt grows x10/step to ~10 => spacing
        # dt/9 ~ 1.1), so whether EITHER solver sees the dip is a phase
        # lottery in its dt sequence. Measured at HEAD: all 96 differing
        # pixels lie in this band (deepest: 4 pixels of one 4-fold-symmetric
        # ray class at rho_min = 0.4754, true hits the golden catches and we
        # miss; among the other 92 WE catch 56 true outcomes vs the golden's
        # 40).
        for r, c in bad:
            i, j = int(c), int(r)  # canvas (i, j) from image (row=j, col=i)
            dx = (i + 0.5) / n - 0.5
            dy = (j + 0.5) / n - 0.5
            p = np.array([dx, -2.0, dy])
            d = np.array([dx, 1.0, dy])
            d /= np.linalg.norm(d)
            rho_min = np.sqrt(p @ p - (p @ d) ** 2)
            if abs(rho_min - 0.5) < 0.03:
                n_graze += 1
            if abs(img[r, c, 2] - 1.0) < 0.01:
                ours_hit += 1
            elif abs(gold[r, c, 2] - 1.0) < 0.01:
                gold_hit += 1
            # Score each image against the analytic ground truth: a ray
            # with rho_min < radius TRULY crosses the sphere. (Pixels where
            # the two images disagree have exactly one of them hitting.)
            true_hit = rho_min < 0.5
            if (abs(img[r, c, 2] - 1.0) < 0.01) == true_hit:
                ours_right += 1
            if (abs(gold[r, c, 2] - 1.0) < 0.01) == true_hit:
                gold_right += 1
        print(f"diff classification: {len(bad)} pixels, {n_graze} at the "
              f"sphere silhouette (|rho_min-0.5|<0.03); detection split: "
              f"ours-hit={ours_hit} gold-hit={gold_hit}")
        print(f"analytic-oracle score on differing pixels: "
              f"ours correct {ours_right}/{len(bad)}, "
              f"reference golden correct {gold_right}/{len(bad)}")
        if n_graze == len(bad):
            print("all diffs are grazing-detection artifacts "
                  "(analytically verified)")
    return frac_bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--example", type=int, default=1, choices=[1, 2])
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--threshold", type=float, default=0.01)
    args = ap.parse_args()
    frac = run(args.example, args.n)
    ok = frac < args.threshold
    print("PARITY", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
