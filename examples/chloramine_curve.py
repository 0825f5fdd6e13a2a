"""
Chlorine-ammonia dose curve: free vs combined residual over a batched
dose sweep — the new nitrogen chemistry (core/nitrogen.py) on the native
batch axis.

Classic water-treatment commissioning question: given source-water
ammonia, what free residual does each chlorine dose leave after contact
time? Below the ~5.06:1 Cl2:N stoichiometric ratio the dose converts to
combined chlorine (monochloramine) and free residual stays ~0; above it,
free chlorine appears. One batched rollout evaluates every dose at once
(the doses are just lanes of the ensemble).

Usage:
  python examples/chloramine_curve.py [--doses 64] [--ammonia 1.0]
         [--contact-min 30] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--doses", type=int, default=64)
    ap.add_argument("--ammonia", type=float, default=1.0,
                    help="source-water total ammonia nitrogen [mg N/L]")
    ap.add_argument("--max-dose", type=float, default=10.0)
    ap.add_argument("--contact-min", type=float, default=30.0)
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

    from ics_wt_physicsengine_tpu.core import nitrogen as N
    from ics_wt_physicsengine_tpu.core import reactor as R

    config = R.ReactorConfiguration(
        n_zones=4, enable_nitrogen=True, flow_rate=0.0,
        initial_ammonia=args.ammonia, initial_chlorine=0.0)
    params = R.make_params(config, dtype=jnp.float32)
    state = R.make_initial_state(config, dtype=jnp.float32)

    doses = jnp.linspace(0.0, args.max_dose, args.doses, dtype=jnp.float32)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (args.doses,) + x.shape), state)
    # each lane starts with its own chlorine dose
    import dataclasses
    batched = dataclasses.replace(
        batched, chlorine=jnp.broadcast_to(
            doses[:, None], (args.doses, config.n_zones)))

    n_steps = int(args.contact_min * 60)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    final, _ = jax.jit(lambda s: R.rollout(
        params, s, bc, dt=1.0, substeps=R.default_substeps(config, 1.0),
        n_steps=n_steps, record=False))(batched)

    free = np.asarray(final.chlorine[:, 0])
    combined = np.asarray(final.chloramine[:, 0])
    tan = np.asarray(final.ammonia[:, 0])
    ratio = np.asarray(doses) / max(args.ammonia, 1e-9)
    # the stoichiometric knee: last dose whose free residual is still ~0
    knee = float(ratio[free < 0.05][-1]) if (free < 0.05).any() else 0.0
    print(json.dumps({
        "ammonia_mgN_L": args.ammonia,
        "contact_min": args.contact_min,
        "stoich_ratio_Cl2_N": round(N.MW_CL2 / N.MW_N, 3),
        "observed_knee_ratio": round(knee, 2),
        "curve": [{"dose": round(float(d), 3),
                   "free": round(float(f), 4),
                   "combined": round(float(c), 4),
                   "ammonia_left": round(float(a), 4)}
                  for d, f, c, a in zip(np.asarray(doses)[::max(
                      1, args.doses // 16)], free[::max(
                          1, args.doses // 16)], combined[::max(
                              1, args.doses // 16)], tan[::max(
                                  1, args.doses // 16)])],
    }))


if __name__ == "__main__":
    main()
