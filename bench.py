"""Headline benchmark: GP-path compress+decompress throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the test_gp_compress configuration (res 0.15, sz 20 —
src/test_gp_compress.cpp:21) on a Kinect-scale synthetic cloud (~300k
points; the reference reads TUM scans of the same size). Timed section =
patch projection + online GP training of every patch (depth + RGB) + grid
prediction/reprojection, i.e. save_compressed + load_compressed
(src/gp_compressor.cpp:21-27,267-386).

Baseline: the reference publishes no numbers (BASELINE.md), so the baseline
is the measured single-CPU throughput of the serial float64 oracle
(models/oracle.py — the same per-point O(N^2) loop the C++ runs), sampled
on a subset and cached in baseline_cpu.json. vs_baseline = TPU / CPU
points-per-second.

Besides the headline, "extra" carries the other workload benchmarks
(BASELINE.json's north-star configuration + the two remaining reference
pipelines), each with honest device sync:
  calibrated — compress+decompress with MAP-calibrated hyperparameters
               (reference constants: src/rbf_kernel.h:24, src/sparse_gp.h:48)
  nuts       — NUTS samples/s over the patch-bank hyperparameter posterior
  registration — gradient-ascent scan-to-map alignment steps/s + recovered
               pose error (src/gp_registration.cpp:73-92)
  mapping    — full register->insert->carve scans/s, one fused dispatch
               per scan (src/gp_mapping.cpp:12-35)
Set GPTPU_BENCH_HEADLINE_ONLY=1 to skip the extra sections.
"""

import dataclasses
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "baseline_cpu.json")

N_POINTS = 300_000
RES = 0.15
SZ = 20
CAPACITY = 100       # reference default (src/sparse_gp.h:48) — the CPU
                     # baseline uses it; see TPU_* below for the device run
MAX_PATCHES = 2048   # static patch-bank bound; the bench cloud bins into
                     # 1675 leaves, and every bank op (Pallas train blocks,
                     # bank gathers, grid predict) scales with the PADDED
                     # bound — 4096 spent 2.4x the work on empty patches
MAX_PPP = 256

# TPU run settings. eps_tol: in float32 the novelty gamma = k** - k^T Q k
# carries O(sigma_f^2 * ||Qhat|| * eps_f32) cancellation noise once the BV
# Gram correlates (patch coords span ~0.15 of a 1.0 lengthscale with
# sigma_f^2 = 100), so the novelty threshold must sit ABOVE that noise
# floor: gamma noise ~ sigma_f^2 * ||Q||/sigma_f^2-scale * eps_f32 * slots
# reaches O(1) once Q grows, so eps_tol=2.0 (2% of k**) keeps every
# accepted BV genuinely novel. Measured: float64 RMSE is essentially
# unchanged by the threshold (0.016 vs the reference 1e-6's 0.0149 — the
# 1 m lengthscale oversmooths 0.15 m patches regardless, so extra BVs buy
# nothing), float32 matches it, and the rare diverging patch is caught by
# sparse_gp.sanitize_batch. The BV budget tops out well under 32, so the
# padded state shrinks from 128 to 32 slots — 16x less HBM traffic.
TPU_EPS_TOL = 2.0
TPU_CAPACITY = 30
TPU_SLOTS = 32


def measure_cpu_baseline(pts, cols, seed=0):
    """Serial reference-semantics throughput (points/s) on this host CPU.

    Times the hot path (per-point sparse GP updates for depth+RGB GPs plus
    the sz x sz grid predictions) on a sample of patches, exactly as the
    reference's serial leaf loop does (src/gp_compressor.cpp:121-175).
    """
    from gp_compressor_tpu.models.oracle import SerialSOGP

    r = np.random.default_rng(seed)
    # cheap voxel binning on host to get realistic patch point sets
    keys = np.floor((pts - pts.min(0)) / RES).astype(np.int64)
    lin = (keys[:, 0] << 42) + (keys[:, 1] << 21) + keys[:, 2]
    uniq, inv, counts = np.unique(lin, return_inverse=True, return_counts=True)
    # sample ~12 patches across the size distribution
    order = np.argsort(counts)
    sel = order[np.linspace(len(order) // 2, len(order) - 1, 12).astype(int)]
    grid = np.stack(np.meshgrid(np.arange(SZ), np.arange(SZ), indexing='ij'),
                    -1).reshape(-1, 2)
    Xstar = RES * ((grid + 0.5) / SZ - 0.5)

    t0 = time.perf_counter()
    n_done = 0
    for si in sel:
        idx = np.nonzero(inv == si)[0]
        uv = r.uniform(-RES / 2, RES / 2, size=(len(idx), 2))
        depth = 0.02 * r.standard_normal(len(idx))
        rgb = cols[idx] - cols[idx].mean(0)
        gp = SerialSOGP(capacity=CAPACITY, s20=1e-1)
        gp.add_measurements(uv, depth)
        cgp = SerialSOGP(capacity=CAPACITY, s20=1e2, dout=3)
        cgp.add_measurements(uv, rgb)
        gp.predict(Xstar)
        cgp.predict(Xstar)
        n_done += len(idx)
    dt = time.perf_counter() - t0
    return n_done / dt


ROW_NAMES = ("calibrated", "nuts", "registration", "mapping", "smc",
             "ksvd")


def _row_subprocess(name: str, timeout_s: int):
    """Run one bench row in an ISOLATED python subprocess and parse its
    final JSON line.

    Why: the axon TPU worker accumulates per-client state across loaded
    executables; measured round 5, loading the 16-chain NUTS program into
    a worker session that already ran the fused headline pipeline crashes
    the worker ("TPU worker process crashed or restarted") — every
    program pair runs fine in a fresh process. Per-row subprocesses give
    crash AND hang containment (SURVEY §5 failure-containment
    discipline): a dead/wedged row becomes an "error" entry plus a
    recovery pause instead of killing every later row (which is exactly
    what happened to two full bench runs). The parent NEVER touches the
    single-client TPU tunnel — rows run strictly sequentially.
    """
    import subprocess
    import sys
    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--row", name],
                           capture_output=True, text=True, cwd=REPO,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"error": f"row '{name}' timed out after {timeout_s}s"}
    json_lines = [ln for ln in p.stdout.splitlines()
                  if ln.startswith("{")]
    if p.returncode != 0 or not json_lines:
        tail = (p.stderr or "").strip().splitlines()[-3:]
        return {"error": f"row '{name}' rc={p.returncode}: "
                         + " | ".join(tail)[-400:]}
    return json.loads(json_lines[-1])


def main():
    """Orchestrator: spawns each row as an isolated subprocess (see
    _row_subprocess) and prints the assembled ONE-line JSON. Touches no
    jax/TPU state itself."""
    result = _row_subprocess("headline", timeout_s=3000)
    if "error" in result:
        time.sleep(90)                       # tunnel recovery, retry once
        result = _row_subprocess("headline", timeout_s=3000)
    if "error" in result:
        print(json.dumps({"metric": "gp_compress_decompress_throughput",
                          "value": 0, "unit": "points/s", "vs_baseline": 0,
                          "extra": result}))
        return
    if os.environ.get("GPTPU_BENCH_HEADLINE_ONLY") != "1":
        for name in ROW_NAMES:
            row = _row_subprocess(name, timeout_s=2400)
            if "error" in row:
                time.sleep(90)               # tunnel recovery, retry once
                row = _row_subprocess(name, timeout_s=2400)
            result["extra"][name] = row
    print(json.dumps(result))


def _build_cfg():
    from gp_compressor_tpu.config import (CompressorConfig, GPConfig,
                                          KSVDConfig, PatchConfig,
                                          rgb_gp_config, rgb_ksvd_config)
    return CompressorConfig(
        patch=PatchConfig(res=RES, sz=SZ, max_patches=MAX_PATCHES,
                          max_points_per_patch=MAX_PPP,
                          approx_sphere_moments=True,
                          # deterministic center-out insertion: at the
                          # reference constants BV selection is otherwise
                          # shuffle-luck (r2: rmse 0.031 +- 0.010 across
                          # keys). Measured (benchmarks/r3_order_sweep.json):
                          # center_out 0.0208 m with ZERO key spread at
                          # 3.86M pts/s vs shuffle mean 0.031; edge_in and
                          # native are worse (0.074 / 0.027).
                          bank_order="center_out"),
        depth_gp=GPConfig(capacity=TPU_CAPACITY, slots=TPU_SLOTS,
                          eps_tol=TPU_EPS_TOL),
        rgb_gp=dataclasses.replace(
            rgb_gp_config(slots=TPU_SLOTS, capacity=TPU_CAPACITY),
            eps_tol=TPU_EPS_TOL),
        # demo stopping constants per pipeline (src/test_compress.cpp:18);
        # atom_block=16: Jacobi-within-block dictionary sweeps — 38 scan
        # steps instead of 600 (the sweep is latency-bound, see
        # KSVDConfig.atom_block)
        ksvd=KSVDConfig(atom_block=16),
        rgb_ksvd=dataclasses.replace(rgb_ksvd_config(), atom_block=16),
    )

def row_main(name: str):
    """Child entry for one bench row (see _row_subprocess): full jax/TPU
    setup, compute the shared compressed cloud, run the row, print its
    JSON result as the final stdout line."""
    import jax
    import jax.numpy as jnp

    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    from gp_compressor_tpu.utils import synthetic
    from gp_compressor_tpu.workloads import compressor

    pts_np, cols_np = synthetic.room_cloud(n=N_POINTS, seed=0)

    # ---- CPU baseline (cached across rounds) ----
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cpu_pps = json.load(f)["cpu_points_per_s"]
    else:
        cpu_pps = measure_cpu_baseline(pts_np, cols_np)
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"cpu_points_per_s": cpu_pps,
                       "config": {"res": RES, "sz": SZ, "capacity": CAPACITY},
                       "note": "serial float64 oracle, reference semantics"},
                      f, indent=1)

    cfg = _build_cfg()
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)
    key = jax.random.key(0)

    use_pallas = jax.devices()[0].platform != "cpu" and \
        os.environ.get("GPTPU_NO_PALLAS") != "1"

    def pipeline(pts, cols, valid, key):
        # one-jit fused round trip: a single device dispatch (the per-stage
        # dispatch+fetch RTTs cost ~25% wall on the tunneled backend)
        return compressor.compress_decompress(pts, cols, valid, cfg, key,
                                              use_pallas=use_pallas)

    # force a real device round-trip: on the tunneled axon backend,
    # block_until_ready alone does not guarantee execution finished. ONE
    # jitted checksum + ONE scalar fetch — separate fetches each pay a
    # dispatch+fetch RTT on the tunnel (~19 ms apiece).
    checksum = jax.jit(lambda comp, out: (
        jnp.sum(out[0]) + jnp.sum(comp.depth_gp.C) + jnp.sum(comp.rgb_gp.C)))

    def sync(comp, out):
        return float(checksum(comp, out))

    # warmup / compile (fall back to the XLA scan path if the fused kernel
    # fails to compile on this backend)
    try:
        comp, out = pipeline(pts, cols, valid, key)
        sync(comp, out)
    except Exception:
        use_pallas = False
        comp, out = pipeline(pts, cols, valid, key)
        sync(comp, out)

    if name != "headline":
        fn = {"calibrated": bench_calibrated, "nuts": bench_nuts,
              "registration": bench_registration, "mapping": bench_mapping,
              "smc": bench_smc, "ksvd": bench_ksvd}[name]
        print(json.dumps(fn(pts, cols, valid, cfg, comp, use_pallas)))
        return

    n_claimed = int(jnp.sum(comp.patch.mask))
    times = []
    rmses = []
    for i in range(3):
        t0 = time.perf_counter()
        comp, out = pipeline(pts, cols, valid, jax.random.key(i))
        sync(comp, out)
        times.append(time.perf_counter() - t0)
        rmses.append(float(compressor.reconstruction_rmse(comp, cfg)))
    dt = min(times)
    tpu_pps = N_POINTS / dt
    # bank_order="center_out" makes BV selection deterministic: the rmse
    # is key-independent (the spread entry should read as a single value;
    # it stays measured over 3 keys as the regression guard)
    rmse = float(np.mean(rmses))

    result = {
        "metric": "gp_compress_decompress_throughput",
        "value": round(tpu_pps, 1),
        "unit": "points/s",
        "vs_baseline": round(tpu_pps / cpu_pps, 2),
        "extra": {
            "wall_s": round(dt, 3),
            "cpu_baseline_points_per_s": round(cpu_pps, 1),
            "n_points": N_POINTS,
            "n_patches": int(comp.patch.n_leaves),
            "n_claimed_in_banks": n_claimed,
            "in_sample_rmse_m": round(rmse, 4),
            "rmse_spread_m": [round(min(rmses), 4), round(max(rmses), 4)],
            "fused_pallas_train": use_pallas,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def _sync(*arrays):
    """Honest device sync on the tunneled backend: one scalar fetch."""
    import jax.numpy as jnp
    return float(sum(jnp.sum(a) for a in arrays))


def bench_calibrated(pts, cols, valid, cfg, comp, use_pallas):
    """North-star configuration: compress+decompress with MAP-calibrated
    (sigmaf^2, l^2, s20) — BASELINE.json:5. The whole
    calibrate->train->decompress round trip is ONE jit (the calibrated
    hyperparameters stay traced: SMEM params in the Pallas kernel), so
    unlike the staged compress_calibrated a fresh calibration costs no
    retrace and no host fetches.

    Two operating points are timed: COLD (fresh cloud, 4-start 150-step
    MAP) and WARM (theta warm-started from the previous cloud's
    calibration, 40 steps — the production steady state on a scan
    stream)."""
    import jax
    import jax.numpy as jnp

    from gp_compressor_tpu.workloads import compressor

    def run_cold(key):
        return compressor.compress_decompress_calibrated(
            pts, cols, valid, cfg, key, use_pallas=use_pallas,
            calib_patches=32, calib_points=64, calib_steps=150,
            calib_lr=0.1, calib_starts=4)

    def run_warm(key, theta_init):
        return compressor.compress_decompress_calibrated(
            pts, cols, valid, cfg, key, use_pallas=use_pallas,
            calib_patches=32, calib_points=64, calib_steps=40,
            calib_lr=0.05, calib_starts=1, theta_init=theta_init)

    c, kp, s20, out = run_cold(jax.random.key(0))         # warmup/compile
    _sync(out[0])
    cold_times = []
    for i in range(2):
        t0 = time.perf_counter()
        c, kp, s20, out = run_cold(jax.random.key(i + 1))  # fresh keys: no
        _sync(out[0])                                      # retrace by design
        cold_times.append(time.perf_counter() - t0)
    cold = min(cold_times)
    rmse = float(compressor.reconstruction_rmse(c, cfg, depth_kp=kp,
                                                depth_s20=s20))
    theta_prev = jnp.log(jnp.stack([kp.sigmaf_sq, kp.l_sq, s20]))
    cw, kpw, s20w, outw = run_warm(jax.random.key(9), theta_prev)  # compile
    _sync(outw[0])
    warm_times = []
    for i in range(2):
        t0 = time.perf_counter()
        cw, kpw, s20w, outw = run_warm(jax.random.key(10 + i), theta_prev)
        _sync(outw[0])
        warm_times.append(time.perf_counter() - t0)
    warm = min(warm_times)
    warm_rmse = float(compressor.reconstruction_rmse(cw, cfg, depth_kp=kpw,
                                                     depth_s20=s20w))
    return {
        "points_per_s": round(N_POINTS / warm, 1),
        "wall_s": round(warm, 3),
        "in_sample_rmse_m": round(warm_rmse, 4),
        "cold_points_per_s": round(N_POINTS / cold, 1),
        "cold_wall_s": round(cold, 3),
        "cold_rmse_m": round(rmse, 4),
        "sigmaf_sq": round(float(kpw.sigmaf_sq), 5),
        "l_sq": round(float(kpw.l_sq), 5),
        "s20": round(float(s20w), 6),
    }


def bench_nuts(pts, cols, valid, cfg, comp, use_pallas):
    """NUTS samples/s over the patch-bank hyperparameter posterior —
    BASELINE.json's primary Bayesian metric."""
    import jax
    import jax.numpy as jnp

    from gp_compressor_tpu.config import HMCConfig
    from gp_compressor_tpu.inference import hmc, nuts
    from gp_compressor_tpu.workloads import compressor

    batch = comp.patch
    Bc, n = 16, 48
    # dense valid-first subsample: the banks are scatter-time shuffled, so
    # raw [:Bc, :n] slices are mostly padding — a near-flat posterior that
    # chains wander on (observed max_rhat ~20)
    Xc, yc, mc = compressor.calib_subsample(batch, Bc, n)
    logpost = hmc.make_patch_logpost(Xc, yc, mc.astype(batch.X.dtype))
    hcfg = HMCConfig(num_warmup=50, num_samples=100, num_chains=4)
    theta0 = jnp.asarray([np.log(100.0), 0.0, np.log(0.1)], batch.X.dtype)
    th0 = theta0[None, :] + 0.2 * jax.random.normal(
        jax.random.key(7), (hcfg.num_chains, 3), batch.X.dtype)

    samples, acc, _ = nuts.nuts_sample_chains(logpost, th0, jax.random.key(1),
                                              hcfg)                 # compile
    _sync(samples)
    # >= 3 timed repeats, median + spread: single-shot rows on the tunneled
    # backend swung +-30-60% between same-day runs (VERDICT r4 weak #5)
    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        samples, acc, _ = nuts.nuts_sample_chains(logpost, th0,
                                                  jax.random.key(2 + i), hcfg)
        _sync(samples)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    rhat = hmc.split_rhat(samples)

    # chain-axis parallel row: the TPU-native throughput answer
    # (BASELINE.json north star shards chains across the mesh; at 4 vmapped
    # chains the lane axis is mostly idle). Same posterior, same warmup;
    # R-hat is computed over all 16 chains — a STRONGER diagnostic than the
    # 4-chain row's. Trajectory length is the irreducible per-transition
    # cost on this posterior (benchmarks/r5_nuts_study.json: dense mass,
    # depth caps and MAP warm starts all measured and buried), so the
    # honest lever left is the batch axis.
    hcfg16 = HMCConfig(num_warmup=50, num_samples=100, num_chains=16)
    th16 = theta0[None, :] + 0.2 * jax.random.normal(
        jax.random.key(8), (hcfg16.num_chains, 3), batch.X.dtype)
    s16, a16, _ = nuts.nuts_sample_chains(logpost, th16, jax.random.key(11),
                                          hcfg16)
    _sync(s16)
    walls16 = []
    for i in range(3):
        t0 = time.perf_counter()
        s16, a16, _ = nuts.nuts_sample_chains(logpost, th16,
                                              jax.random.key(12 + i), hcfg16)
        _sync(s16)
        walls16.append(time.perf_counter() - t0)
    wall16 = float(np.median(walls16))
    rhat16 = hmc.split_rhat(s16)

    # ADVI on the same posterior (VERDICT r3 weak #7: the one inference
    # path with no measured row) — one lax.scan dispatch since r4.
    # r5: warm-started from the multi-start MAP mode — 300 cold Adam steps
    # from the reference constants are mid-transit along the posterior
    # ridge (VERDICT r4 weak #3: the resulting "mode" was ~100x off), and
    # the row is gated on an ELBO plateau so an unconverged run can never
    # again be published as a mode.
    from gp_compressor_tpu.inference import vi

    theta_map, _ = hmc.map_estimate_multi(logpost, theta0, steps=150,
                                          lr=0.1, n_starts=4)
    vi_steps = 300
    res = vi.fit_advi(logpost, theta_map, jax.random.key(3), steps=vi_steps)
    _sync(res.elbo_trace)
    vi_walls = []
    for i in range(2):
        t0 = time.perf_counter()
        res = vi.fit_advi(logpost, theta_map, jax.random.key(4 + i),
                          steps=vi_steps)
        _sync(res.elbo_trace)
        vi_walls.append(time.perf_counter() - t0)
    vi_wall = float(np.median(vi_walls))
    plateaued = bool(vi.elbo_plateaued(res.elbo_trace))

    return {
        "samples_per_s": round(hcfg.num_chains * hcfg.num_samples / wall, 1),
        "wall_s": round(wall, 3),
        "wall_spread_s": [round(min(walls), 3), round(max(walls), 3)],
        "chains": hcfg.num_chains,
        "accept": round(float(jnp.mean(acc)), 3),
        "max_rhat": round(float(jnp.max(rhat)), 3),
        "logpost_patches": Bc,
        "chains16": {
            "samples_per_s": round(hcfg16.num_chains * hcfg16.num_samples
                                   / wall16, 1),
            "wall_s": round(wall16, 3),
            "wall_spread_s": [round(min(walls16), 3),
                              round(max(walls16), 3)],
            "chains": hcfg16.num_chains,
            "accept": round(float(jnp.mean(a16)), 3),
            "max_rhat": round(float(jnp.max(rhat16)), 3),
        },
        "advi": {"steps_per_s": round(vi_steps / vi_wall, 1),
                 "wall_s": round(vi_wall, 3),
                 "final_elbo": round(float(jnp.mean(res.elbo_trace[-20:])), 1),
                 "elbo_plateaued": plateaued,
                 "map_warm_start": True,
                 "mode_sigmaf_sq": (round(float(jnp.exp(res.mean[0])), 5)
                                    if plateaued else "UNCONVERGED"),
                 "mode_l_sq": (round(float(jnp.exp(res.mean[1])), 5)
                               if plateaued else "UNCONVERGED")},
    }


def bench_registration(pts, cols, valid, cfg, comp, use_pallas):
    """Scan-to-map registration at bench scale: full 300k-point scan vs the
    compressed map, perturbed by a known rigid motion.

    Headline row: the CALIBRATED map (the north-star operating point — the
    MAP-fit l ~ 4 cm density field is sharp at the surface) walked with
    sign-based iRprop- per-axis steps (RegistrationConfig.step_mode docs).
    Measured (r3 hypothesis, r4 PROVEN by direct objective sweep,
    benchmarks/r4_reg_bias.json): the reference-constants l = 1 m field is
    too flat and BIASED for cm-scale motion — its mean-likelihood argmax
    sits (0.027, 0.0285, 0.0195) m off the TRUE pose (>= the row's
    residual), while the calibrated field's argmax is exactly at truth.
    The ref_constants row's ceiling is therefore structural to the
    reference's own objective, not an optimizer artifact (that row ships
    for parity). Two r3 fixes were load-bearing here: full-precision geometry
    matmuls (transforms.py — the backend-default bf16 `points @ R.T` put a
    9 mm quantization floor under every step) and the oscillation-damped
    step rule (a fixed step ping-pongs at its trust radius forever)."""
    import jax
    import jax.numpy as jnp

    from gp_compressor_tpu.config import RegistrationConfig
    from gp_compressor_tpu.geometry import transforms
    from gp_compressor_tpu.workloads import compressor, registration

    ang = jnp.asarray([0.004, -0.003, 0.005], pts.dtype)
    t_true = jnp.asarray([0.012, -0.009, 0.006], pts.dtype)
    R_true = transforms.euler_xyz(ang)
    moved = transforms.apply(pts, R_true, t_true)
    err0 = float(jnp.mean(jnp.linalg.norm(moved - pts, axis=1)))

    comp_c, kpc, s20c, _ = compressor.compress_decompress_calibrated(
        pts, cols, valid, cfg, jax.random.key(0), use_pallas=use_pallas,
        calib_patches=32, calib_points=64, calib_steps=150,
        calib_lr=0.1, calib_starts=4)
    rcfg = RegistrationConfig(max_steps=80, step_mode="rprop")

    def run():
        return registration.register(comp_c, moved, cols, valid, cfg, rcfg,
                                     depth_kp=kpc, depth_s20=s20c)

    st, out = run()
    _sync(out)                                            # compile
    walls = []
    for _ in range(3):                # median of >=3: tunnel-weather honest
        t0 = time.perf_counter()
        st, out = run()
        _sync(out)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    steps = int(st.step_nbr)
    terr, rerr = registration.registration_error(st.R_cloud, st.t_cloud,
                                                 R_true, t_true)
    # alignment error in point space (the gp-accuracy metric): how much of
    # the injected motion the registration actually removed
    err1 = float(jnp.mean(jnp.linalg.norm(out - pts, axis=1)))

    # parity row: reference constants, reference fixed-step rule at the
    # implied scaled tolerance
    rcfg_ref = RegistrationConfig(max_steps=40, step=0.005,
                                  grad_tol_step_ref=0.1)
    st_r, out_r = registration.register(comp, moved, cols, valid, cfg,
                                        rcfg_ref)
    _sync(out_r)
    err1_ref = float(jnp.mean(jnp.linalg.norm(out_r - pts, axis=1)))
    return {
        "steps_per_s": round(steps / wall, 1),
        "steps": steps,
        "wall_s": round(wall, 3),
        "wall_spread_s": [round(min(walls), 3), round(max(walls), 3)],
        "n_scan_points": int(pts.shape[0]),
        "initial_mean_err_m": round(err0, 4),
        "final_mean_err_m": round(err1, 4),
        "removed_pct": round(100 * (1 - err1 / err0), 1),
        "trans_err_m": round(float(terr), 4),
        "rot_err_rad": round(float(rerr), 4),
        "reclaim_every": rcfg.reclaim_every,
        "map": "calibrated",
        "step_mode": rcfg.step_mode,
        "ref_constants": {
            "steps": int(st_r.step_nbr),
            "final_mean_err_m": round(err1_ref, 4),
            "removed_pct": round(100 * (1 - err1_ref / err0), 1),
        },
    }


def bench_mapping(pts, cols, valid, cfg, comp, use_pallas):
    """Incremental mapping: register->insert->carve scans/s over a stream
    of 150k-point scans (one fused device dispatch per scan)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gp_compressor_tpu.config import MappingConfig, RegistrationConfig
    from gp_compressor_tpu.workloads import mapping

    lo = np.asarray(jnp.min(pts, 0)) - 0.3
    hi = np.asarray(jnp.max(pts, 0)) + 0.3
    # carve cap: 99th-percentile camera->point distance instead of the
    # world-box diagonal (73 steps) — rays longer than the cap just skip
    # their far free-space tail, the least valuable evidence
    p99 = float(np.percentile(np.linalg.norm(np.asarray(pts), axis=1), 99))
    steps = min(mapping.required_ray_steps(lo, hi, cfg.patch.res),
                int(1.2 * p99 / cfg.patch.res) + 2)
    # registration here is a fixed per-scan polish BUDGET on an already-
    # tracked stream — cap hits are routine, not divergence, so
    # drop_on_reg_cap=False (measured: the default dropped 3 of 4 scans
    # and left the map at 0.157 m chamfer RMSE). reg_stride 4: the polish
    # registers a 37k subsample with proportionally smaller banks.
    # reg_stride 8 measured identical scans/s and map_rmse to 4 (the
    # insert body, not registration, is the per-scan cost) — keep the
    # statistically safer 4. carve_stride=8 is the measured latency fix
    # for the carve walk (config.py: stride 4-8 map_rmse statistically
    # identical; stride 4 costs ~60 ms/scan of DDA steps vs ~half that).
    mcfg = MappingConfig(min_points_new_patch=50, max_ray_steps=steps,
                         carve_stride=8, drop_on_reg_cap=False,
                         reg_stride=4)
    # CALIBRATED mapping (r3): hyperparameters are MAP-fit once on the
    # seed scan, then the whole stream — registration density field,
    # incremental training, sanitation, prediction — runs on that ONE
    # consistent set. At the reference constants the l = 1 m density
    # field's optimum sits 2-3 cm off the true pose
    # (benchmarks/r4_reg_bias.json), so every per-scan
    # polish SMEARED the map (measured map chamfer RMSE 0.08-0.09 m);
    # the calibrated sharp field with iRprop- polish registers unperturbed
    # scans to mm drift.
    from gp_compressor_tpu.workloads import compressor as compressor_mod
    rcfg = RegistrationConfig(max_steps=8, min_steps=2, step_mode="rprop",
                              bank_points=64)
    state = mapping.map_init(cfg, mcfg, lo, hi, dtype=pts.dtype)

    n_scans, Ns = 4, 150_000
    scans = [(pts[i::2][:Ns], cols[i::2][:Ns], valid[i::2][:Ns])
             for i in (0, 1)]

    _, kpc, s20c, _ = compressor_mod.compress_decompress_calibrated(
        *scans[0], cfg, jax.random.key(5), use_pallas=use_pallas,
        calib_patches=32, calib_points=64, calib_steps=150,
        calib_lr=0.1, calib_starts=4)
    eps_c = cfg.depth_gp.eps_tol * kpc.sigmaf_sq / cfg.depth_gp.sigmaf_sq
    calib = dict(depth_kp=kpc, depth_s20=s20c, depth_eps=eps_c)

    # seed the map with one scan, then fold the stream in ONE dispatch
    # (mapping.add_clouds): per-scan dispatch of the MapState pytree costs
    # ~0.8 s/scan in tunnel round trips on top of the device time
    state, _, _, _ = mapping.add_cloud_fused(state, *scans[0], cfg, mcfg,
                                             jax.random.key(0), rcfg=rcfg,
                                             use_pallas=use_pallas, **calib)
    _sync(state.means)
    SP = jnp.stack([scans[(1 + s) % 2][0] for s in range(n_scans)])
    SC = jnp.stack([scans[(1 + s) % 2][1] for s in range(n_scans)])
    SV = jnp.stack([scans[(1 + s) % 2][2] for s in range(n_scans)])

    state2, diverged, reg_steps, info = mapping.add_clouds(
        state, SP, SC, SV, cfg, mcfg, jax.random.key(1), rcfg=rcfg,
        use_pallas=use_pallas, **calib)                   # compile
    _sync(state2.means)
    walls = []
    for i in range(3):                # median of >=3: tunnel-weather honest
        t0 = time.perf_counter()
        state2, diverged, reg_steps, info = mapping.add_clouds(
            state, SP, SC, SV, cfg, mcfg, jax.random.key(2 + i), rcfg=rcfg,
            use_pallas=use_pallas, **calib)
        _sync(state2.means)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))

    # ---- map-quality gate (VERDICT r2 weak #5): one-sided chamfer RMSE
    # from the predicted map cloud to the observed scan points. Outside the
    # timed window; a corner-cut map (diverged patches, dropped evidence)
    # shows up directly here.
    mpts, _, mok = mapping.map_cloud(state2, cfg, depth_kp=kpc,
                                     depth_s20=s20c)
    mp = np.asarray(mpts)[np.asarray(mok)]
    finite = np.isfinite(mp).all(axis=1)
    n_nonfinite = int((~finite).sum())
    mp = mp[finite]
    ref = np.concatenate([np.asarray(s[0]) for s in scans])
    try:
        from scipy.spatial import cKDTree
        d, _ = cKDTree(ref).query(mp, k=1)
        map_rmse = float(np.sqrt(np.mean(d ** 2)))
    except Exception:
        map_rmse = float("nan")
    return {
        "scans_per_s": round(n_scans / wall, 3),
        "wall_s_per_scan": round(wall / n_scans, 3),
        "wall_spread_s": [round(min(walls), 3), round(max(walls), 3)],
        "points_per_scan": Ns,
        "n_patches": int(state2.n_patches),
        "ray_steps": steps,
        "carve_stride": mcfg.carve_stride,
        "last_reg_steps": int(reg_steps[-1]),
        "map_rmse_m": round(map_rmse, 4),
        "map_points_nonfinite": n_nonfinite,
        "bank_dropped": int(jnp.sum(info["bank_dropped"])),
        "pend_dropped": int(jnp.sum(info["pend_dropped"])),
        "patch_overflow": int(jnp.sum(info["patch_overflow"])),
    }


def bench_smc(pts, cols, valid, cfg, comp, use_pallas):
    """SMC pose refinement against the map (SURVEY 2.5 SMC row; VERDICT r4
    next #6): the divergence-fallback scenario. A scan is displaced well
    beyond the mapping stream's 8-step polish budget; gradient registration
    at that budget leaves a cm-scale residual, and the particle refinement
    (mapping.smc_refine_pose, one lax.scan dispatch) closes it — directly
    upgrading the reference's drop-on-divergence behavior
    (src/gp_mapping.cpp:22-27, which throws the scan away)."""
    import jax
    import jax.numpy as jnp

    from gp_compressor_tpu.config import (MappingConfig, RegistrationConfig,
                                          SMCConfig)
    from gp_compressor_tpu.geometry import transforms
    from gp_compressor_tpu.workloads import compressor as compressor_mod
    from gp_compressor_tpu.workloads import mapping, registration

    lo = np.asarray(jnp.min(pts, 0)) - 0.3
    hi = np.asarray(jnp.max(pts, 0)) + 0.3
    p99 = float(np.percentile(np.linalg.norm(np.asarray(pts), axis=1), 99))
    steps = min(mapping.required_ray_steps(lo, hi, cfg.patch.res),
                int(1.2 * p99 / cfg.patch.res) + 2)
    mcfg = MappingConfig(min_points_new_patch=50, max_ray_steps=steps,
                         carve_stride=8, drop_on_reg_cap=False, reg_stride=4)
    rcfg = RegistrationConfig(max_steps=8, min_steps=2, step_mode="rprop",
                              bank_points=64)
    Ns = 150_000
    scan0 = (pts[0::2][:Ns], cols[0::2][:Ns], valid[0::2][:Ns])
    scan1 = (pts[1::2][:Ns], cols[1::2][:Ns], valid[1::2][:Ns])

    _, kpc, s20c, _ = compressor_mod.compress_decompress_calibrated(
        *scan0, cfg, jax.random.key(5), use_pallas=use_pallas,
        calib_patches=32, calib_points=64, calib_steps=150,
        calib_lr=0.1, calib_starts=4)
    eps_c = cfg.depth_gp.eps_tol * kpc.sigmaf_sq / cfg.depth_gp.sigmaf_sq
    state = mapping.map_init(cfg, mcfg, lo, hi, dtype=pts.dtype)
    state, _, _, _ = mapping.add_cloud_fused(
        state, *scan0, cfg, mcfg, jax.random.key(0), rcfg=rcfg,
        use_pallas=use_pallas, depth_kp=kpc, depth_s20=s20c, depth_eps=eps_c)
    _sync(state.means)

    # displacement ~4x the 8-step rprop budget can remove
    ang = jnp.asarray([0.012, -0.008, 0.010], pts.dtype)
    t_true = jnp.asarray([0.05, -0.04, 0.03], pts.dtype)
    R_true = transforms.euler_xyz(ang)
    moved = transforms.apply(scan1[0], R_true, t_true)
    err0 = float(jnp.mean(jnp.linalg.norm(moved - scan1[0], axis=1)))

    comp_m = mapping._map_as_compressed(state, cfg)
    st, out_reg = registration.register(comp_m, moved, scan1[1], scan1[2],
                                        cfg, rcfg, depth_kp=kpc,
                                        depth_s20=s20c)
    _sync(out_reg)
    err_reg = float(jnp.mean(jnp.linalg.norm(out_reg - scan1[0], axis=1)))

    scfg = SMCConfig(num_particles=256, pose_proposal_std_t=0.012,
                     pose_proposal_std_r=0.004)
    n_iters = 16

    def run(key):
        return mapping.smc_refine_pose(state, out_reg, scan1[1], scan1[2],
                                       cfg, scfg, key, n_iters=n_iters,
                                       depth_kp=kpc, depth_s20=s20c)

    (R2, t2), _, trace = run(jax.random.key(3))
    _sync(trace)                                         # compile
    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        (R2, t2), _, trace = run(jax.random.key(4 + i))
        _sync(trace)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    out_smc = transforms.apply(out_reg, R2, t2)
    err_smc = float(jnp.mean(jnp.linalg.norm(out_smc - scan1[0], axis=1)))
    return {
        "particles_per_s": round(scfg.num_particles * n_iters / wall, 1),
        "wall_s": round(wall, 3),
        "wall_spread_s": [round(min(walls), 3), round(max(walls), 3)],
        "particles": scfg.num_particles,
        "iters": n_iters,
        "injected_err_m": round(err0, 4),
        "after_reg_budget_err_m": round(err_reg, 4),
        "after_smc_err_m": round(err_smc, 4),
        "reg_steps": int(st.step_nbr),
    }


def bench_ksvd(pts, cols, valid, cfg, comp, use_pallas):
    """K-SVD compression pipeline on the chip (the reference's second
    workload, src/pointcloud_compressor.cpp:20-29 at the test_compress
    demo config: dict 200/600, words 10/20, src/test_compress.cpp:18).
    The whole dictionary learning loop (OMP coding + Gauss-Seidel atom
    sweeps + stop_diff early exit) runs on-device (dictionary.ksvd_device);
    previously the outer loop host-synced every iteration (VERDICT r2
    missing #1)."""
    import jax
    import jax.numpy as jnp

    from gp_compressor_tpu.workloads import ksvd_compressor

    def run(key):
        return ksvd_compressor.compress(pts, cols, valid, cfg, key)

    comp_k = run(jax.random.key(0))                        # warmup/compile
    _sync(comp_k.depth.error, comp_k.rgb.error)
    times = []
    for i in range(2):
        t0 = time.perf_counter()
        comp_k = run(jax.random.key(i + 1))
        _sync(comp_k.depth.error, comp_k.rgb.error)
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rms = ksvd_compressor.rms_error(comp_k)
    return {
        "points_per_s": round(N_POINTS / wall, 1),
        "wall_s": round(wall, 3),
        "in_sample_rms_m": round(rms, 4),
        "depth_iters": int(comp_k.depth.iters),
        "rgb_iters": int(comp_k.rgb.iters),
        "depth_mse": round(float(comp_k.depth.error), 6),
        "dict_size": cfg.ksvd.dict_size,
        "words_max": cfg.ksvd.words_max,
    }


if __name__ == "__main__":
    import sys
    if len(sys.argv) >= 3 and sys.argv[1] == "--row":
        row_main(sys.argv[2])
    else:
        main()
