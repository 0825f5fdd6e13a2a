"""
Ablation harness for the batched integrated-plant hot path
(models/plant.py::plant_rollout_batched — BASELINE configs 3+4 combined).

Measures plant-steps/s at a fixed batch for:
  physics   bare reactor rollout (upper bound)
  full      physics + 7 instruments (the shipping path)
  norand    full, but every sensor's randomness injected as precomputed
            constants -> isolates the per-step threefry cost
  noline    full, but sample-line ring buffers disabled -> isolates the
            delay-ring dynamic-update cost
  tap       full, with the O(1) fixed-dt line taps (line_mode="tap") —
            the fix this ablation motivated (measured 15.3M -> 50.3M
            plant-steps/s at 16k plants on a v5e; "noline" showed the
            exact ring was ~70% of the whole step)

Timing uses output-chaining (see bench.py::_timed_chained) because the
tunneled-TPU relay caches identical-input calls.

Run:  python tools/ablate_integrated.py --plants 16384 --steps 64
"""

import argparse
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ics_wt_physicsengine_tpu.core import reactor as R  # noqa: E402
from ics_wt_physicsengine_tpu.models import plant as P  # noqa: E402
from ics_wt_physicsengine_tpu.sensors import base as SB  # noqa: E402

# One source of truth for per-sensor randomness widths: the model's table.
SENSOR_DIMS = {name: (nn, nu) for name, nn, nu in P._RAND_LAYOUT}


def timed(fn, carry, reps):
    carry = fn(carry)
    np.asarray(jax.tree_util.tree_leaves(carry)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = fn(carry)
    np.asarray(jax.tree_util.tree_leaves(carry)[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plants", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

    config = R.ReactorConfiguration(volume=1000, height=2.0, diameter=0.798,
                                    n_zones=20)
    m, s = R.default_rkc_plan(config, 1.0, mode="fast")
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.2,
                              inlet_chlorine=0.5, acid_flow_rate=0.1)
    n, steps = args.plants, args.steps
    denom = n * steps

    params, plant = P.make_plant_batch(config, n, seed=1, dtype=jnp.float32)
    params, plant = jax.device_put((params, plant))
    results = {}

    # --- physics only ------------------------------------------------------
    fn_phys = jax.jit(lambda st: R.rollout(
        params.reactor, st, bc, dt=1.0, substeps=m, stages=s,
        n_steps=steps, record=False)[0])
    results["physics"] = denom / timed(fn_phys, plant.reactor, args.reps)

    # --- full shipping path -------------------------------------------------
    fn_full = jax.jit(lambda p: P.plant_rollout_batched(
        params, p, bc, 1.0, m, steps, record=False, stages=s,
        line_mode="exact")[0])
    results["full"] = denom / timed(fn_full, plant, args.reps)

    # --- no PRNG: constant injected randomness ------------------------------
    rand = {k: (jnp.zeros((n, nn), jnp.float32),
                jnp.full((n, nu), 0.5, jnp.float32))
            for k, (nn, nu) in SENSOR_DIMS.items()}
    rand = jax.device_put(rand)

    def roll_norand(p):
        def step1(prm, pl, rnd):
            return P.plant_step(prm, pl, bc, 1.0, m, stages=s, rand=rnd)[0]

        def body(pl, _):
            return jax.vmap(step1)(params, pl, rand), None

        return jax.lax.scan(body, p, None, length=steps)[0]

    results["norand"] = denom / timed(jax.jit(roll_norand), plant, args.reps)

    # --- no sample lines ----------------------------------------------------
    def kill_line(sp):
        # sensor params wrap the base SensorParams in a .base field
        return dataclasses.replace(sp, base=dataclasses.replace(
            sp.base, line_capacity=0))

    params_nl = dataclasses.replace(
        params,
        **{f.name: kill_line(getattr(params, f.name))
           for f in dataclasses.fields(params)
           if hasattr(getattr(params, f.name), "base")
           and isinstance(getattr(params, f.name).base, SB.SensorParams)})
    fn_nl = jax.jit(lambda p: P.plant_rollout_batched(
        params_nl, p, bc, 1.0, m, steps, record=False, stages=s)[0])
    results["noline"] = denom / timed(fn_nl, plant, args.reps)

    # --- O(1) fixed-dt line taps --------------------------------------------
    fn_tap = jax.jit(lambda p: P.plant_rollout_batched(
        params, p, bc, 1.0, m, steps, record=False, stages=s,
        line_mode="tap")[0])
    results["tap"] = denom / timed(fn_tap, plant, args.reps)

    print(f"# {n} plants x {steps} steps, 20 zones, RKC2-fast, "
          f"{jax.default_backend()}")
    for k, v in results.items():
        print(f"{k:8s} {v / 1e6:8.1f}M plant-steps/s   "
              f"({denom / v * 1e9 / n:6.1f} ns/plant-step)")


if __name__ == "__main__":
    main()
