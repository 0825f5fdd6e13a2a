"""
Broad configuration fuzz vs the reference implementation.

Samples random reactor configurations (zones, volume/geometry, chemistry,
temperatures) and random boundary schedules, runs both engines side by side
on CPU float64, and reports worst-case deviations. Complements the targeted
tests in tests/test_vs_reference.py with breadth.

Usage: python tools/fuzz_vs_reference.py [--configs 40] [--steps 40]
"""

import argparse
import math
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))

sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def sample_config(rng):
    volume = float(rng.uniform(200.0, 3000.0))
    height = float(rng.uniform(1.0, 4.0))
    diameter = 2 * math.sqrt((volume / 1000) / (math.pi * height))
    return dict(
        volume=volume, height=height, diameter=diameter,
        n_zones=int(rng.integers(2, 21)),
        flow_rate=float(rng.uniform(0.5, 15.0)),
        impeller_speed=float(rng.uniform(30.0, 120.0)),
        initial_pH=float(rng.uniform(6.5, 8.0)),
        alkalinity=float(rng.uniform(50.0, 150.0)),
        total_carbonate=float(rng.uniform(1.0, 4.0)),
        initial_chlorine=float(rng.uniform(0.5, 4.0)),
        temperature=float(rng.uniform(8.0, 32.0)),
        inlet_pH=float(rng.uniform(6.8, 8.2)),
        inlet_temperature=float(rng.uniform(8.0, 32.0)),
    )


def sample_schedule(rng, n_steps):
    seq = []
    for _ in range(n_steps):
        seq.append(dict(
            inlet_flow_rate=float(rng.uniform(0.5, 15.0)),
            inlet_pH=float(rng.uniform(6.8, 8.2)),
            inlet_chlorine=float(rng.uniform(0.0, 1.5)),
            inlet_temperature=float(rng.uniform(10.0, 30.0)),
            acid_flow_rate=float(rng.choice([0.0, 0.1, 0.4])),
            chlorine_flow_rate=float(rng.choice([0.0, 0.2])),
            ambient_temperature=float(rng.uniform(5.0, 25.0)),
            heat_loss_coefficient=float(rng.choice([0.0, 40.0, 120.0])),
        ))
    return seq


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", type=int, default=40)
    parser.add_argument("--steps", type=int, default=40)
    parser.add_argument("--dt", type=float, default=1.0)
    parser.add_argument("--random-dt", action="store_true",
                        help="sample dt per config from {0.1,0.5,1,2,5,10}")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--integrator", choices=["rk4", "rkc-strict",
                                                 "rkc-fast"], default="rk4",
                        help="which of our integrators to fuzz against the "
                             "reference Radau oracle")
    args = parser.parse_args()

    from wt_simulator.core.reactor import (
        BoundaryConditions as RefBC,
        IntegratedCSTR as RefCSTR,
        ReactorConfiguration as RefConfig,
    )
    from ics_wt_physicsengine_tpu.core import reactor as R

    rng = np.random.default_rng(args.seed)
    worst = {"pH": 0.0, "Cl": 0.0, "T": 0.0}
    worst_cfg = None

    for c_idx in range(args.configs):
        cfg = sample_config(rng)
        schedule = sample_schedule(rng, args.steps)
        dt = (float(rng.choice([0.1, 0.5, 1.0, 2.0, 5.0, 10.0]))
              if args.random_dt else args.dt)
        args_dt = dt if args.random_dt else args.dt
        try:
            ref = RefCSTR(RefConfig(**cfg))
        except Exception as e:  # noqa: BLE001 — reference rejects some configs
            print(f"[{c_idx}] reference rejected config "
                  f"({type(e).__name__}); skipped")
            continue
        ours = R.IntegratedCSTR(R.ReactorConfiguration(**cfg),
                                integrator=args.integrator)

        n = cfg["n_zones"]
        max_d = {"pH": 0.0, "Cl": 0.0, "T": 0.0}
        for i in range(args.steps):
            rs = ref.step(args_dt, RefBC(**schedule[i]))
            os_ = ours.step(args_dt, R.BoundaryConditions(**schedule[i]))
            max_d["pH"] = max(max_d["pH"],
                              float(np.max(np.abs(np.asarray(os_.pH) - rs.pH))))
            max_d["Cl"] = max(max_d["Cl"], float(np.max(np.abs(
                np.asarray(os_.chlorine) - rs.chlorine))))
            max_d["T"] = max(max_d["T"], float(np.max(np.abs(
                np.asarray(os_.temperature) - rs.temperature))))
        print(f"[{c_idx}] zones={n:2d} dt={args_dt} "
              f"|dpH|={max_d['pH']:.2e} |dCl|={max_d['Cl']:.2e} "
              f"|dT|={max_d['T']:.2e}")
        for key in worst:
            if max_d[key] > worst[key]:
                worst[key] = max_d[key]
                worst_cfg = c_idx

    print(f"\nWORST over {args.configs} configs x {args.steps} steps: "
          f"|dpH|={worst['pH']:.2e} |dCl|={worst['Cl']:.2e} "
          f"|dT|={worst['T']:.2e} (config {worst_cfg})")


if __name__ == "__main__":
    main()
