"""
On-device PID commissioning: a 4096-gain closed-loop sweep in one scan.

The reference plant ships with no controller (reference README.md:22); its
roadmap names `control.pid` and controller tuning as the next phase
(reference README.md:432-439). BASELINE config 4's stated workload is
exactly this: thousands of parameter variations for "controller tuning".
Over the Modbus socket each candidate costs a full HIL session (~minutes
of wall clock per gain at realistic pacing). In-graph, the whole grid is
ONE jitted scan over [n_gains, n_zones] arrays:

  1. sweep a (kp, ki) x (kp, ki) grid of dual-loop candidates,
  2. refine the winner by multi-start gradient descent *through the
     differentiable plant*,
  3. report the commissioning table.

Usage:
  python examples/pid_tuning_sweep.py [--gains 4096] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gains", type=int, default=4096,
                        help="grid size (rounded to a k*k*m*m grid)")
    parser.add_argument("--steps", type=int, default=240,
                        help="closed-loop steps per candidate (dt=60s)")
    parser.add_argument("--refine-iters", type=int, default=30)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from ics_wt_physicsengine_tpu import control as C
    from ics_wt_physicsengine_tpu.core import reactor as R

    # grid: n = k^2 * m^2; pick k, m to land near the request
    m = 4
    k = max(2, int(round((args.gains / m ** 2) ** 0.5)))
    config = R.ReactorConfiguration(n_zones=20, initial_chlorine=0.5,
                                    flow_rate=20.0)
    boundary = R.BoundaryConditions(inlet_flow_rate=20.0)
    grid = C.make_gain_grid(
        kp_cl=jnp.linspace(0.05, 3.0, k),
        ki_cl=jnp.linspace(0.0, 0.25, k),
        kp_ph=jnp.linspace(-2.0, -0.1, m),
        ki_ph=jnp.linspace(-0.2, 0.0, m),
        cl_setpoint=2.0, ph_setpoint=7.2)
    n = C.n_gains(grid)
    print(f"sweeping {n} gain candidates x {args.steps} closed-loop steps "
          f"({n * args.steps:,} plant-steps, 20 zones) ...")

    t0 = time.time()
    res = C.gain_sweep(config, grid, dt=60.0, n_steps=args.steps,
                       boundary=boundary, effort_weight=0.1)
    jax.block_until_ready(res["scores"])
    t_sweep = time.time() - t0
    best = res["best"]
    print(f"sweep: {t_sweep:.2f}s "
          f"({n * args.steps / t_sweep:,.0f} closed-loop plant-steps/s)")
    print(f"best #{res['best_index']}: "
          f"cl(kp={float(best.chlorine.kp):.3f}, "
          f"ki={float(best.chlorine.ki):.4f})  "
          f"ph(kp={float(best.ph.kp):.3f}, ki={float(best.ph.ki):.4f})  "
          f"score={float(res['scores'][res['best_index']]):.2f}")

    # gradient refinement: 8 jittered starts around the sweep winner
    import dataclasses

    def jitter(x, scale, kseed):
        key = jax.random.key(kseed)
        return x * (1.0 + scale * jax.random.normal(key, (8,), x.dtype))

    g0 = C.DualPIDGains(
        chlorine=dataclasses.replace(
            jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (8,)),
                                   best.chlorine),
            kp=jitter(best.chlorine.kp, 0.2, 0),
            ki=jitter(best.chlorine.ki, 0.2, 1)),
        ph=dataclasses.replace(
            jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (8,)),
                                   best.ph),
            kp=jitter(best.ph.kp, 0.2, 2),
            ki=jitter(best.ph.ki, 0.2, 3)))
    t0 = time.time()
    ref = C.tune_pid_gradient(config, g0, dt=60.0, n_steps=args.steps,
                              iters=args.refine_iters, learning_rate=0.02,
                              boundary=boundary, effort_weight=0.1)
    jax.block_until_ready(ref["final_scores"])
    t_ref = time.time() - t0
    tuned = ref["best"]
    print(f"gradient refine (8 starts x {args.refine_iters} iters): "
          f"{t_ref:.2f}s")
    print(json.dumps({
        "n_gains": n,
        "sweep_seconds": round(t_sweep, 3),
        "closed_loop_steps_per_sec": round(n * args.steps / t_sweep, 1),
        "sweep_best_score": round(
            float(res["scores"][res["best_index"]]), 3),
        "refined_score": round(float(np.min(
            np.asarray(ref["final_scores"]))), 3),
        "tuned": {
            "cl_kp": round(float(tuned.chlorine.kp), 4),
            "cl_ki": round(float(tuned.chlorine.ki), 5),
            "ph_kp": round(float(tuned.ph.kp), 4),
            "ph_ki": round(float(tuned.ph.ki), 5),
        }}))


if __name__ == "__main__":
    main()
