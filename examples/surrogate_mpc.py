"""
Learn a plant surrogate from the physics engine, then control the
exact plant with MPC that plans through the learned model.

The workflow a production deployment actually runs:

  1. roll randomized physics trajectories (the "historian data");
  2. fit the MXU-dense residual-MLP surrogate (models/surrogate.py) —
     dataset generation, Adam training, and multi-step fine-tuning are
     all jitted device programs;
  3. validate it: held-out one-step skill vs the trivial identity
     predictor, and open-loop drift over a 24-minute horizon;
  4. commission a dosing program with receding-horizon MPC whose
     re-plans shoot through the SURROGATE while the EXACT physics
     applies the moves — and score it against physics-shooting MPC on
     the same program.

The surrogate plans at matmul cost (bfloat16 on TPU: ~647M
plant-steps/s vs ~50M for the exact batched physics, bench.py), which
is what makes 10^5-scenario screening and long-horizon planning cheap;
re-planning from the true state each cycle keeps model error from
accumulating beyond one horizon.

No reference counterpart (the reference has no learned components);
this extends its "advanced control methods" roadmap direction
(reference README.md:432-439).

Usage:
  python examples/surrogate_mpc.py [--minutes 90] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=int, default=90,
                    help="program length (one step change at half time)")
    ap.add_argument("--zones", type=int, default=6)
    ap.add_argument("--traj", type=int, default=512,
                    help="training trajectories")
    ap.add_argument("--train-steps", type=int, default=6000)
    ap.add_argument("--rollout-steps", type=int, default=600)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    import time

    import jax.numpy as jnp
    import numpy as np

    from ics_wt_physicsengine_tpu.control.mpc import run_mpc
    from ics_wt_physicsengine_tpu.core import reactor as R
    from ics_wt_physicsengine_tpu.models import surrogate as SG

    dt = 30.0
    config = R.ReactorConfiguration(
        volume=1000.0, n_zones=args.zones, flow_rate=5.0,
        initial_pH=7.2, initial_chlorine=2.0, temperature=20.0)
    params = R.make_params(config, dtype=jnp.float32)
    substeps = R.default_substeps(config, dt)
    bc = R.BoundaryConditions()

    # 1-2. dataset + training (one call; loss curves in info)
    t0 = time.time()
    sp, info = SG.fit_plant_surrogate(config, dt=dt, n_traj=args.traj,
                                      train_steps=args.train_steps,
                                      rollout_steps=args.rollout_steps,
                                      seed=0)
    t_fit = time.time() - t0

    # 3. validation: held-out skill + open-loop drift
    Xv, Uv = SG.make_surrogate_dataset(
        params, config.n_zones, bc, jax.random.PRNGKey(123), 32, 48,
        dt, substeps)
    pred = SG.surrogate_step(sp, Xv[:, :-1], Uv)
    err = np.asarray(pred - Xv[:, 1:])
    res = np.asarray(Xv[:, 1:] - Xv[:, :-1])
    Z = config.n_zones
    skill = {f: round(float(err[..., i * Z:(i + 1) * Z].std()
                            / res[..., i * Z:(i + 1) * Z].std()), 3)
             for i, f in enumerate(("pH", "chlorine", "temperature"))}
    roll = jax.vmap(lambda x0, us: SG.surrogate_rollout(sp, x0, us))(
        Xv[:, 0], Uv)
    drift = np.asarray(roll - Xv[:, 1:])
    drift_cl = float(drift[..., Z:2 * Z].std())

    # 4. surrogate-planned MPC vs physics-shooting MPC, same program
    n_steps = args.minutes * 2          # dt = 30 s
    n_steps -= n_steps % 15
    half = (n_steps // 2) - ((n_steps // 2) % 15)
    program = np.concatenate([
        np.full(half, 1.5), np.full(n_steps - half, 2.5)]) \
        .astype(np.float32)

    t0 = time.time()
    sur = SG.run_mpc_surrogate(config, sp, program, dt=dt,
                               horizon_moves=4, steps_per_move=15,
                               iters=20)
    t_sur = time.time() - t0
    t0 = time.time()
    phys = run_mpc(config, program, dt=dt, horizon_moves=4,
                   steps_per_move=15, iters=20)
    t_phys = time.time() - t0

    print(json.dumps({
        "fit": {"seconds": round(t_fit, 1),
                "val_rmse": {k: round(float(v), 5)
                             for k, v in info["val_rmse"].items()}},
        "one_step_skill_vs_identity": skill,
        "open_loop_drift_chlorine_mgL": round(drift_cl, 5),
        "surrogate_mpc": {"score_ISE": round(sur["score"], 2),
                          "seconds": round(t_sur, 2)},
        "physics_mpc": {"score_ISE": round(phys["score"], 2),
                        "seconds": round(t_phys, 2)},
        "surrogate_within_10pct": bool(
            sur["score"] < phys["score"] * 1.10),
    }))


if __name__ == "__main__":
    main()
