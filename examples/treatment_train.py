"""
Treatment train: a connected 3-stage reactor network with booster
chlorination (core/network.py — the reference roadmap's "Multi-reactor
networks" row, reference README.md:447).

    raw water --> [0] rapid-mix contact tank (primary chlorine dose)
                   |  pipe, 2-step delay
                   v
                  [1] baffled contact basin (large, no dosing)
                   |  pipe, 5-step delay          ^
                   v                              | 15% recycle
                  [2] clearwell (booster dose) ---+

All three stages advance as one ``[3, Z]`` batched program; the routing is
a 3x3 matmul; the pipe delays are a ring buffer. A second pass sweeps the
booster dose over a vmapped batch of network realizations — every candidate
dose's full-train trajectory in one compiled call.

Usage:
  python examples/treatment_train.py [--hours 6] [--doses 16] [--cpu]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=6.0)
    ap.add_argument("--doses", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

    import functools

    import jax.numpy as jnp
    import numpy as np

    import ics_wt_physicsengine_tpu as wt
    from ics_wt_physicsengine_tpu.core import network as N

    def cfg_vol(volume):
        height = volume / 1000.0 / (math.pi * (0.798 / 2) ** 2)
        return wt.ReactorConfiguration(n_zones=5, volume=volume,
                                       height=height,
                                       initial_chlorine=0.2)

    #            from:  0     1     2
    W = np.array([[0.0, 0.0, 0.0],     # to 0 (head of train)
                  [1.0, 0.0, 0.15],    # to 1 (plus 15% clearwell recycle)
                  [0.0, 1.0, 0.0]])    # to 2
    D = np.array([[1, 1, 1],
                  [2, 1, 5],
                  [1, 5, 1]])
    topo = wt.NetworkTopology(routing=W, delay_steps=D)
    configs = [cfg_vol(800.0), cfg_vol(4000.0), cfg_vol(2500.0)]
    params, ns0 = N.make_network(configs, topo, dtype=jnp.float32)
    ta = N.topology_arrays(topo, jnp.float32)

    dt, substeps = 5.0, 8
    n_steps = int(args.hours * 3600 / dt)

    def boundary(booster):
        return wt.BoundaryConditions(
            inlet_flow_rate=jnp.array([8.0, 0.0, 0.0]),
            inlet_pH=7.6, inlet_chlorine=0.05, inlet_temperature=18.0,
            chlorine_flow_rate=jnp.array([0.25, 0.0, 0.0]) +
            booster * jnp.array([0.0, 0.0, 1.0]),
            chlorine_concentration=50.0)

    roll = jax.jit(functools.partial(
        N.rollout_network, dt=dt, substeps=substeps, n_steps=n_steps,
        record=False))

    fs, _ = roll(params, ta, ns0, boundary(0.1))
    cl = np.asarray(fs.reactor.chlorine[:, -1])
    print(f"after {args.hours:.1f} h (single train, booster 0.1 L/min):")
    for i, name in enumerate(["contact tank", "contact basin", "clearwell"]):
        print(f"  stage {i} ({name:13s}) outlet residual: {cl[i]:6.3f} mg/L")

    # --- booster dose sweep: vmap over network realizations ---
    doses = jnp.linspace(0.0, 0.5, args.doses)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x),
                                   (args.doses,) + np.shape(x)), ns0)
    sweep = jax.jit(jax.vmap(lambda ns, d: roll(params, ta, ns,
                                                boundary(d))[0]))
    fs_all = sweep(batched, doses)
    finished = np.asarray(fs_all.reactor.chlorine[:, 2, -1])
    target = 1.0
    best = int(np.argmin(np.abs(finished - target)))
    print(f"\nbooster sweep ({args.doses} doses, one vmapped call):")
    print(f"  finished-water residual range: "
          f"{finished.min():.3f} .. {finished.max():.3f} mg/L")
    print(f"  closest to {target:.1f} mg/L target: "
          f"{float(doses[best]):.3f} L/min -> {finished[best]:.3f} mg/L")


if __name__ == "__main__":
    main()
