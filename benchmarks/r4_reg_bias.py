"""Where does the registration objective's optimum sit relative to the
TRUE pose? (VERDICT r3 next #3: the 18% ref_constants row leans on an
unproven ~1.5 cm bias claim.)

The registration delta ascends the mean per-point GP predictive density
over the claimed scan (src/gp_registration.cpp:214-215). This script
evaluates that objective directly on a grid of translation offsets around
the PERFECTLY aligned pose, for (a) the reference-constants map
(sigma_f^2=100, l^2=1) and (b) the MAP-calibrated map, and records each
axis's argmax offset — the structural bias of the density field itself,
independent of any optimizer. Writes benchmarks/r4_reg_bias.json.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r4_reg_bias.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import bench
from gp_compressor_tpu.config import RegistrationConfig
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor, registration

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r4_reg_bias.json")


def objective_curves(comp, pts, cols, valid, cfg, dkp, ds20, span, n):
    """Mean depth log-density along each translation axis through d=0.
    Returns offsets [n] and curves [3, n]."""
    rcfg = RegistrationConfig()
    offsets = jnp.linspace(-span, span, n, dtype=pts.dtype)

    @jax.jit
    def curves(pts):
        def eval_at(d3):
            delta, ls, cls, nu = registration.compute_transformation(
                comp, pts + d3[None, :], cols, valid, cfg, rcfg,
                depth_kp=dkp, depth_s20=ds20)
            return ls, nu

        def axis(ax):
            def one(_, d):
                d3 = jnp.zeros((3,), pts.dtype).at[ax].set(d)
                ls, nu = eval_at(d3)
                return _, (ls, nu)

            _, (ls, nu) = lax.scan(one, 0, offsets)
            return ls, nu

        out = [axis(a) for a in range(3)]
        return (jnp.stack([o[0] for o in out]),
                jnp.stack([o[1] for o in out]))

    ls, nu = curves(pts)
    return offsets, ls, nu


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from benchmarks.r3_reg_traj import bench_cfg
    cfg = bench_cfg()
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)
    use_pallas = jax.devices()[0].platform != "cpu"

    span, n = 0.03, 41
    results = {"span_m": span, "n_grid": n, "n_points": int(pts.shape[0])}

    # (a) reference constants
    comp, _ = compressor.compress_decompress(pts, cols, valid, cfg,
                                             jax.random.key(0),
                                             use_pallas=use_pallas)
    offs, ls, nu = objective_curves(comp, pts, cols, valid, cfg, None, None,
                                    span, n)
    offs_np = jax.device_get(offs)
    amax = jax.device_get(jnp.argmax(ls, axis=1))
    results["ref_constants"] = {
        "argmax_offset_m": [round(float(offs_np[int(i)]), 5) for i in amax],
        "curve_x": [round(float(v), 8) for v in jax.device_get(ls[0])],
        "curve_y": [round(float(v), 8) for v in jax.device_get(ls[1])],
        "curve_z": [round(float(v), 8) for v in jax.device_get(ls[2])],
        "offsets_m": [round(float(o), 5) for o in offs_np],
    }

    # (b) calibrated map
    comp_c, kpc, s20c, _ = compressor.compress_decompress_calibrated(
        pts, cols, valid, cfg, jax.random.key(0), use_pallas=use_pallas,
        calib_patches=32, calib_points=64, calib_steps=150, calib_lr=0.1,
        calib_starts=4)
    offs, lsc, _ = objective_curves(comp_c, pts, cols, valid, cfg, kpc,
                                    s20c, span, n)
    amaxc = jax.device_get(jnp.argmax(lsc, axis=1))
    results["calibrated"] = {
        "argmax_offset_m": [round(float(offs_np[int(i)]), 5) for i in amaxc],
        "sigmaf_sq": round(float(kpc.sigmaf_sq), 6),
        "l_sq": round(float(kpc.l_sq), 6),
    }

    bias_ref = max(abs(v) for v in results["ref_constants"]["argmax_offset_m"])
    bias_cal = max(abs(v) for v in results["calibrated"]["argmax_offset_m"])
    results["max_axis_bias_ref_m"] = round(bias_ref, 5)
    results["max_axis_bias_calibrated_m"] = round(bias_cal, 5)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"max_axis_bias_ref_m": bias_ref,
                      "max_axis_bias_calibrated_m": bias_cal,
                      "argmax_ref": results["ref_constants"]["argmax_offset_m"],
                      "argmax_cal": results["calibrated"]["argmax_offset_m"]}))


if __name__ == "__main__":
    main()
