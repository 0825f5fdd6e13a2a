"""
Clarifier train: class-resolved solids through a connected 3-stage network
(core/network.py + core/particles.py) — the physical-treatment flowsheet
the reference explicitly lacks on both axes (reference README.md:447
"Multi-reactor networks", :522 "No particle dynamics").

    raw water (60 mg/L TSS) --> [0] rapid-mix coagulation basin
                                 |  coagulant dose shifts mass fine->coarse
                                 v  pipe, 1-step delay
                                [1] clarifier (large, gently stirred)
                                 |  coarse flocs settle to sludge
                                 v  pipe, 3-step delay
                                [2] filter/contact tank (recirculating
                                 |  granular-media filter polishes fines)
                                 v  finished water

The pipes carry the PER-CLASS composition (BoundaryConditions.
inlet_tss_classes): the clarifier's effluent is whatever escaped settling
— fines-enriched without dosing, floc-enriched with it — and the filter
stage sees that real split, not the raw-water fractions. A final vmapped
sweep finds the coagulant dose meeting a finished-water turbidity target,
every candidate's full-train trajectory in one compiled call.

Usage:
  python examples/clarifier_train.py [--hours 4] [--doses 12] [--cpu]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=8.0)
    ap.add_argument("--doses", type=int, default=12)
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
    from ics_wt_physicsengine_tpu.core import particles as P

    def cfg(volume, rpm):
        height = volume / 1000.0 / (math.pi * (0.798 / 2) ** 2)
        return wt.ReactorConfiguration(
            n_zones=5, volume=volume, height=height, impeller_speed=rpm,
            enable_particles=True, initial_tss=2.0, initial_chlorine=0.0)

    #            from:  0     1     2
    W = np.array([[0.0, 0.0, 0.0],      # to 0 (head of train)
                  [1.0, 0.0, 0.0],      # to 1
                  [0.0, 1.0, 0.0]])     # to 2
    D = np.array([[1, 1, 1],
                  [1, 1, 1],
                  [1, 3, 1]])
    topo = wt.NetworkTopology(routing=W, delay_steps=D)
    configs = [cfg(600.0, 120.0),    # rapid mix: small, hard stirred
               cfg(2500.0, 8.0),     # clarifier: big, nearly quiescent
               cfg(1000.0, 45.0)]    # filter/contact stage
    params, ns0 = N.make_network(configs, topo, dtype=jnp.float32)
    ta = N.topology_arrays(topo, jnp.float32)

    dt, substeps = 10.0, 8
    n_steps = int(args.hours * 3600 / dt)

    def boundary(dose):
        return wt.BoundaryConditions(
            inlet_flow_rate=jnp.array([8.0, 0.0, 0.0]),
            inlet_pH=7.6, inlet_temperature=18.0,
            inlet_tss=jnp.array([60.0, 0.0, 0.0]),
            coagulant_dose=dose * jnp.array([1.0, 0.0, 0.0]),
            filter_flow_rate=jnp.array([0.0, 0.0, 10.0]),
            sludge_blowdown=jnp.array([0.0, 2e-5, 0.0]))

    roll = jax.jit(functools.partial(
        N.rollout_network, dt=dt, substeps=substeps, n_steps=n_steps,
        record=False))

    names = ["coag basin", "clarifier", "filter stage"]
    for dose, label in [(0.0, "no coagulant"), (25.0, "25 mg/L coagulant")]:
        fs, _ = roll(params, ta, ns0, boundary(dose))
        tss = np.asarray(fs.reactor.tss)               # [3, C, Z]
        ntu = np.asarray(P.turbidity_ntu(fs.reactor.tss, params.particles))
        print(f"\nafter {args.hours:.1f} h, {label}:")
        for i, name in enumerate(names):
            split = tss[i, :, -1] / max(tss[i, :, -1].sum(), 1e-12)
            print(f"  stage {i} ({name:12s}) outlet: "
                  f"{tss[i, :, -1].sum():6.2f} mg/L TSS, "
                  f"{ntu[i, -1]:6.2f} NTU, "
                  f"class split {np.round(split, 2)}")
        sl = np.asarray(fs.reactor.sludge).sum(axis=-1)
        print(f"  sludge inventories [mg/L-of-bottom-zone]: "
              f"{np.round(sl, 1)}")

    # --- coagulant dose sweep: one vmapped call over the dose axis ---
    doses = jnp.linspace(0.0, 40.0, args.doses)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x),
                                   (args.doses,) + np.shape(x)), ns0)
    sweep = jax.jit(jax.vmap(lambda ns, d: roll(params, ta, ns,
                                                boundary(d))[0]))
    fs_all = sweep(batched, doses)
    ntu_fin = np.asarray(P.turbidity_ntu(
        fs_all.reactor.tss, params.particles))[:, 2, -1]  # [doses]
    target = 1.0
    ok = np.nonzero(ntu_fin < target)[0]
    print(f"\ncoagulant sweep ({args.doses} doses, one vmapped call):")
    print(f"  finished-water turbidity range: "
          f"{ntu_fin.min():.2f} .. {ntu_fin.max():.2f} NTU")
    if ok.size:
        print(f"  lowest dose under {target:.1f} NTU: "
              f"{float(doses[ok[0]]):.1f} mg/L -> {ntu_fin[ok[0]]:.2f} NTU")
    else:
        best = int(np.argmin(ntu_fin))
        print(f"  no dose met {target:.1f} NTU; best "
              f"{float(doses[best]):.1f} mg/L -> {ntu_fin[best]:.2f} NTU")


if __name__ == "__main__":
    main()
