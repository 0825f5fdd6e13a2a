"""
Jar test: settled turbidity vs coagulant dose over a batched dose sweep —
the new particle dynamics (core/particles.py) on the native batch axis.

The classic water-treatment bench experiment: dose a row of jars with
increasing coagulant, stir, settle, and read the supernatant turbidity.
Here every jar is a lane of one batched rollout: coagulation shifts mass
from the slow-settling fine class into fast-settling flocs, so turbidity
falls with dose until the dose response saturates (Monod in dose). The
sweep also reports the cheapest dose reaching a target NTU — the number a
plant operator actually wants.

Usage:
  python examples/jar_test.py [--doses 32] [--tss 50] [--settle-min 60]
         [--target-ntu 5] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--doses", type=int, default=32)
    ap.add_argument("--max-dose", type=float, default=80.0)
    ap.add_argument("--tss", type=float, default=50.0,
                    help="raw-water total suspended solids [mg/L]")
    ap.add_argument("--settle-min", type=float, default=60.0,
                    help="stir+settle contact time [min]")
    ap.add_argument("--target-ntu", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from ics_wt_physicsengine_tpu.core import particles as P
    from ics_wt_physicsengine_tpu.core import reactor as R

    config = R.ReactorConfiguration(
        n_zones=4, enable_particles=True, flow_rate=0.0,
        initial_tss=args.tss, initial_chlorine=0.0,
        impeller_speed=10.0)   # gentle flocculation stirring
    params = R.make_params(config, dtype=jnp.float32)
    state = R.make_initial_state(config, dtype=jnp.float32)

    doses = jnp.linspace(0.0, args.max_dose, args.doses, dtype=jnp.float32)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (args.doses,) + x.shape), state)

    # each jar gets its own dose: the dose is a [doses]-lane boundary leaf
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, coagulant_dose=doses)

    n_steps = int(args.settle_min * 60)
    final, _ = jax.jit(lambda s: R.rollout(
        params, s, bc, dt=1.0, substeps=R.default_substeps(config, 1.0),
        n_steps=n_steps, record=False))(batched)

    # supernatant = top zone (the clarified water a jar test samples)
    ntu = np.asarray(P.turbidity_ntu(final.tss, params.particles)[:, -1])
    tss_top = np.asarray(P.total_solids_mgl(final.tss)[:, -1])
    settled = np.asarray(jnp.sum(final.sludge, axis=-1))

    d_np = np.asarray(doses)
    hit = d_np[ntu <= args.target_ntu]
    optimal = float(hit[0]) if hit.size else None

    step = max(1, args.doses // 16)
    print(json.dumps({
        "raw_tss_mgL": args.tss,
        "settle_min": args.settle_min,
        "target_ntu": args.target_ntu,
        "optimal_dose_mgL": optimal,
        "curve": [{"dose": round(float(d), 2),
                   "supernatant_ntu": round(float(n), 3),
                   "supernatant_tss": round(float(t), 3),
                   "settled_mgL": round(float(s), 3)}
                  for d, n, t, s in zip(d_np[::step], ntu[::step],
                                        tss_top[::step], settled[::step])],
    }))


if __name__ == "__main__":
    main()