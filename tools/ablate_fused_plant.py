"""
Measured breakdown of the fused INTEGRATED-plant kernel's per-step cost
(VERDICT r3 item 7: single instrumented plant runs ~127k steps/s vs ~340k
for bare physics — find where the gap lives).

Sweeps the kernel's trace-time ablation switches (ops/fused_plant.py
``_ABLATE``: each member removes one overlay subsystem from the traced
kernel, so the timing delta IS that subsystem's in-kernel cost):

  full        physics + 7 instruments + taps + PRNG + lines + stores
  no_rand     PRNG word->normal/uniform conversion replaced by constants
  no_hist     sample-line circular histories skipped (tap used directly)
  no_store    sensor carry write-back to VMEM skipped
  no_taps     zone-tap segment extraction replaced by plane broadcast
  one_sensor  only the first sensor of seven runs
  no_sensors  physics-only inside the SAME kernel (launch/carry overhead)
  physics     the standalone physics kernel (ops/fused_rollout.py)

Prints one JSON line with per-step microsecond costs and implied shares.
Backend-hermetic like bench.py. Single-plant 20-zone RK4.

Usage: python tools/ablate_fused_plant.py [--steps 16384] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _timed(fn, arg, reps, get):
    out = fn(arg)
    get(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out)  # chain outputs -> inputs (relay caches identical calls)
    get(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from ics_wt_physicsengine_tpu.utils.backend_select import (
        enable_compile_cache, ensure_default_backend)
    platform, reason = ensure_default_backend(
        min_devices=1, probe_deadline=60.0, retries=2,
        log=lambda m: print(f"[ablate] {m}", file=sys.stderr, flush=True))
    if platform == "cpu" and os.environ.get("ABLATE_ALLOW_CPU") != "1":
        print(json.dumps({"ok": False,
                          "reason": f"accelerator unusable: {reason}"}))
        return 0
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ics_wt_physicsengine_tpu.core import reactor as R
    from ics_wt_physicsengine_tpu.models.plant import make_plant
    from ics_wt_physicsengine_tpu.ops import fused_plant as FP
    from ics_wt_physicsengine_tpu.ops.fused_rollout import rollout_fused

    config = R.ReactorConfiguration(volume=1000, height=2.0, diameter=0.798,
                                    n_zones=20)
    substeps = R.default_substeps(config, 1.0)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.2,
                              inlet_chlorine=0.5, acid_flow_rate=0.1)
    n = args.steps

    # 1. standalone physics kernel (the 340k steps/s comparator)
    params = R.make_params(config, dtype=jnp.float32)
    state = R.make_initial_state(config, dtype=jnp.float32)
    t_phys = _timed(
        lambda s: rollout_fused(params, s, bc, dt=1.0, substeps=substeps,
                                n_steps=n),
        state, args.reps, lambda s: np.asarray(s.time))

    pparams, plant = make_plant(config, seed=1, dtype=jnp.float32)

    # On CPU (smoke-test path) the on-chip PRNG is unavailable: feed the
    # kernel explicit int32 words instead (same CPU-testable path the
    # fused-plant oracle tests use). rows_padded=8 for one 20-zone plant.
    rng_kw = {"rng": "hw", "seed": 7}
    if jax.default_backend() == "cpu":
        bits = np.random.default_rng(7).integers(
            -2**31, 2**31, size=(n, FP.N_WORDS, 8, FP._LANES),
            dtype=np.int32)
        rng_kw = {"rng": "bits", "bits": jnp.asarray(bits)}

    def run_with(flags, p):
        saved = FP._ABLATE
        FP._ABLATE = frozenset(flags)   # trace-time switch; also the jit key
        try:
            out, _ = FP.plant_rollout_fused(
                pparams, p, bc, dt=1.0, substeps=substeps, n_steps=n,
                record_every=n, **rng_kw)
        finally:
            FP._ABLATE = saved
        return out

    variants = ["full", "no_rand", "no_hist", "no_store", "no_taps",
                "one_sensor", "no_sensors"]
    times = {}
    for v in variants:
        flags = () if v == "full" else (v,)
        times[v] = _timed(lambda p, f=flags: run_with(f, p), plant,
                          args.reps, lambda p: np.asarray(p.reactor.time))
        print(f"[ablate] {v}: {1e6 * times[v] / n:.3f} us/step",
              file=sys.stderr, flush=True)

    us = lambda t: round(1e6 * t / n, 3)  # noqa: E731
    full = us(times["full"])
    result = {
        "ok": True,
        "backend": jax.default_backend(),
        "n_steps": n,
        "physics_kernel_us_per_step": us(t_phys),
        "physics_kernel_steps_per_sec": round(n / t_phys, 1),
        "full_plant_us_per_step": full,
        "full_plant_steps_per_sec": round(n / times["full"], 1),
        "us_per_step": {v: us(t) for v, t in times.items()},
        # each ablation's saving = that subsystem's in-kernel cost
        "subsystem_us": {
            "prng_conversion": round(full - us(times["no_rand"]), 3),
            "sample_line_hist": round(full - us(times["no_hist"]), 3),
            "carry_store": round(full - us(times["no_store"]), 3),
            "zone_taps": round(full - us(times["no_taps"]), 3),
            "six_extra_sensors": round(full - us(times["one_sensor"]), 3),
            "all_sensor_overlay": round(full - us(times["no_sensors"]), 3),
            "kernel_vs_physics_overhead": round(
                us(times["no_sensors"]) - us(t_phys), 3),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
