"""
Measured breakdown of the fused INTEGRATED-plant kernel's per-step cost
(VERDICT r3 item 7: single instrumented plant runs ~127k steps/s vs ~340k
for bare physics — find where the gap lives).

Ablations, all single-plant 20-zone RK4 on the default (TPU) backend:
  1. physics-only fused kernel      (ops/fused_rollout.py::rollout_fused)
  2. full fused plant               (physics + 7 instruments + line taps)
  3. full fused plant with all sample-line delays zero (isolates the
     circular-history tap share)

Prints one JSON line with per-step microsecond costs and the implied
shares. Backend-hermetic like bench.py.

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
        out = fn(out)
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
    from ics_wt_physicsengine_tpu.ops.fused_plant import plant_rollout_fused
    from ics_wt_physicsengine_tpu.ops.fused_rollout import rollout_fused

    config = R.ReactorConfiguration(volume=1000, height=2.0, diameter=0.798,
                                    n_zones=20)
    substeps = R.default_substeps(config, 1.0)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.2,
                              inlet_chlorine=0.5, acid_flow_rate=0.1)
    n = args.steps

    # 1. bare physics
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
        from ics_wt_physicsengine_tpu.ops.fused_plant import N_WORDS, _LANES
        bits = np.random.default_rng(7).integers(
            -2**31, 2**31, size=(n, N_WORDS, 8, _LANES), dtype=np.int32)
        rng_kw = {"rng": "bits", "bits": jnp.asarray(bits)}

    def run(p, prms=pparams):
        out, _ = plant_rollout_fused(prms, p, bc, dt=1.0, substeps=substeps,
                                     n_steps=n, record_every=n, **rng_kw)
        return out

    # 2. full plant (production hw rng)
    t_full = _timed(lambda p: run(p), plant, args.reps,
                    lambda p: np.asarray(p.reactor.time))

    # 3. zero-delay lines (tap share)
    import dataclasses
    try:
        fields = {}
        for f in pparams.__dataclass_fields__:
            v = getattr(pparams, f)
            fields[f] = dataclasses.replace(
                v, base=dataclasses.replace(v.base, line_delay_s=0.0)) \
                if hasattr(v, "base") and hasattr(v.base, "line_delay_s") \
                else v
        p_nodelay = dataclasses.replace(pparams, **fields)
        t_nodelay = _timed(lambda p: run(p, prms=p_nodelay), plant,
                           args.reps, lambda p: np.asarray(p.reactor.time))
    except Exception as e:  # noqa: BLE001 — ablation is best-effort
        print(f"[ablate] no-delay variant failed: {type(e).__name__}",
              file=sys.stderr)
        t_nodelay = None

    us = lambda t: round(1e6 * t / n, 3)  # noqa: E731
    sensor_us = us(t_full) - us(t_phys)
    result = {
        "ok": True,
        "backend": jax.default_backend(),
        "n_steps": n,
        "physics_only_steps_per_sec": round(n / t_phys, 1),
        "full_plant_steps_per_sec": round(n / t_full, 1),
        "physics_us_per_step": us(t_phys),
        "full_us_per_step": us(t_full),
        "sensor_overlay_us_per_step": round(sensor_us, 3),
        "sensor_share_pct": round(100 * sensor_us / us(t_full), 1),
    }
    if t_nodelay is not None:
        result["no_delay_us_per_step"] = us(t_nodelay)
        result["line_tap_us_per_step"] = round(us(t_full) - us(t_nodelay), 3)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
