"""
Train the plant surrogate from HISTORIAN data: noisy instrument
readings assimilated by an EKF bank — no true state anywhere in the
training path.

examples/surrogate_mpc.py trains on exact physics states; a real
deployment only has what the instruments recorded. This demo runs the
full production pipeline end to end, every stage in-graph:

  1. COMMISSIONING: the instrument suite is realistically biased —
     the amperometric chlorine sensor's HOCl-speciation weighting
     reads ~0.83x true, DPD ~0.75x, the 2-wire RTD's lead resistance
     ~+5 C — so, as on a real site, two held dose levels are compared
     against lab grab samples (the sim's true taps) and a per-lane
     per-channel linear calibration is fitted. Skipping this step
     quadruples the downstream errors (measured: EKF mid-zone RMSE
     0.62 -> 0.12 mg/L with calibration);
  2. a bank of L instrumented plants (physics + 7 sensors: noise,
     drift, fouling, sample-line delays) under per-lane
     piecewise-random dosing excitation — the "historian" being
     written;
  3. a vmapped full-state EKF (control/ekf.py) assimilating each
     lane's five calibrated boundary readings every tick — the soft
     sensor that turns readings into state estimates;
  4. the surrogate (models/surrogate.py) trained on the ESTIMATE
     transitions (x_hat_k, u_k) -> x_hat_{k+1};
  5. validation against the TRUE states the simulator knows (a real
     site never does): one-step skill vs the identity predictor on
     the EXCITED channel (chlorine — un-excited channels are not
     identifiable from this historian, and the output says so), and
     surrogate-planned MPC driving the exact plant
     (run_mpc_surrogate).

Stages 2+3 run as ONE jitted lax.scan (plant bank + filter bank +
excitation per tick); stage 4 is the jitted Adam scan. This is the
workflow for fitting plants where no mechanistic model exists: point
the same EKF (with this engine as its process model) or raw tap
readings at field historian CSVs (utils/history) and the training
harness is unchanged.

No reference counterpart (no estimator, no learned components there).

Usage:
  python examples/surrogate_from_historian.py [--lanes 32] [--steps 600] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=32,
                    help="historian plant lanes")
    ap.add_argument("--steps", type=int, default=600,
                    help="historian length in dt=30s ticks")
    ap.add_argument("--burn", type=int, default=40,
                    help="EKF convergence ticks discarded from training")
    ap.add_argument("--hold", type=int, default=10,
                    help="excitation hold (ticks per random dose level)")
    ap.add_argument("--zones", type=int, default=6)
    ap.add_argument("--train-steps", type=int, default=4000)
    ap.add_argument("--rollout-steps", type=int, default=400)
    ap.add_argument("--mpc-minutes", type=int, default=45,
                    help="0 disables the closing MPC run")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    import dataclasses
    import time

    import jax.numpy as jnp
    import numpy as np

    from ics_wt_physicsengine_tpu.control import (flatten_state, make_ekf,
                                                  make_ekf_carry)
    from ics_wt_physicsengine_tpu.core import reactor as R
    from ics_wt_physicsengine_tpu.models import surrogate as SG
    from ics_wt_physicsengine_tpu.models.plant import (make_plant_batch,
                                                       plant_step_batched)

    dt = 30.0
    L, S, B = args.lanes, args.steps, args.burn
    if not 1 <= B < S:
        raise SystemExit(f"--burn must be in [1, --steps) — the slice "
                         f"Xhat[:, burn-1:] needs burn >= 1 (got "
                         f"burn={B}, steps={S})")
    Z = args.zones
    config = R.ReactorConfiguration(
        volume=1000.0, n_zones=Z, flow_rate=5.0, initial_pH=7.2,
        initial_chlorine=2.0, temperature=20.0)
    substeps = R.default_substeps(config, dt)
    bc0 = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.5,
                               inlet_chlorine=0.5, inlet_temperature=18.0)
    # chlorine is metered at BOTH ends (as real plants do at the point
    # of application) — without the inlet channel the interior profile
    # is only slowly observable under strong dosing excitation
    taps = [("pH", 0), ("pH", -1), ("chlorine", 0), ("chlorine", -1),
            ("temperature", -1)]
    measured = ["pH_inlet", "pH_outlet", "chlorine_inlet",
                "chlorine_outlet", "temp_outlet"]
    meas_noise = (4e-4, 4e-4, 2.5e-3, 2.5e-3, 1e-2)

    # --- 1+2: the historian scan — plant bank + EKF bank per tick
    pparams, plant = make_plant_batch(config, L, seed=0,
                                      dtype=jnp.float32,
                                      randomize=False, warmed_up=True)
    rparams = R.make_params(config, dtype=jnp.float32)
    # chlorine PSD sized to the excitation (dose levels jump every
    # `hold` ticks; the filter must be allowed to follow)
    ekf_step = make_ekf(rparams, Z, taps, dt, substeps,
                        process_noise=(1e-7, 1e-4, 1e-5),
                        measurement_noise=meas_noise)
    carry1 = make_ekf_carry(R.make_initial_state(config,
                                                 dtype=jnp.float32),
                            p0=(0.05, 1.0, 4.0), n_zones=Z)
    ekf_bank = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (L,) + a.shape).copy(), carry1)

    n_holds = -(-S // args.hold)
    key = jax.random.PRNGKey(7)
    u_levels = jax.random.uniform(key, (L, n_holds), jnp.float32)
    u_seq = jnp.repeat(u_levels, args.hold, axis=1)[:, :S]   # [L, S]

    bc_lanes = jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32),
                                   (L,)).copy(), bc0)

    from ics_wt_physicsengine_tpu.control import tap_index
    tap_cols = jnp.asarray([tap_index(f, zz, Z) for f, zz in taps])

    def raw_tick(pl, u_t):
        """One plant tick: readings + true tap values (no filter)."""
        bc = dataclasses.replace(bc_lanes, chlorine_flow_rate=u_t)
        pl, readings = plant_step_batched(pparams, pl, bc, dt, substeps,
                                          boundary_axes=0)
        z = jnp.stack([readings[nm].value for nm in measured], axis=-1)
        y = flatten_state(pl.reactor)[:, tap_cols]
        return pl, (z, y)

    # --- commissioning: the REAL instruments carry systematic biases
    # (amperometric HOCl-speciation weighting reads ~0.83x true, DPD
    # ~0.75x, the 2-wire RTD's lead resistance ~+5 C) — exactly why a
    # site calibrates against lab grab samples before trusting the
    # historian. Two held dose levels, per-lane per-channel linear fit
    # z = a*y + b from the settled halves; channels the excitation
    # cannot move (pH, temperature) get a single-point offset.
    C = max(2 * args.hold, 20)
    t0 = time.time()

    def commission(pl, level):
        u = jnp.full((C, L), level, jnp.float32)
        pl, (zs, ys) = jax.lax.scan(raw_tick, pl, u)
        return pl, (jnp.mean(zs[C // 2:], axis=0),
                    jnp.mean(ys[C // 2:], axis=0))       # [L, m]

    @jax.jit
    def commission_two(pl):
        pl, (z_lo, y_lo) = commission(pl, 0.15)
        pl, (z_hi, y_hi) = commission(pl, 0.85)
        dy = y_hi - y_lo
        movable = jnp.abs(dy) > 0.05
        a = jnp.where(movable, (z_hi - z_lo) / jnp.where(movable, dy, 1.0),
                      1.0)
        b = jnp.where(movable, z_lo - a * y_lo,
                      0.5 * (z_lo - y_lo + z_hi - y_hi))
        return pl, a, b

    plant, cal_a, cal_b = commission_two(plant)

    # --- the historian scan — plant bank + EKF bank per tick,
    #     readings de-biased by the commissioning calibration
    def tick(carry, u_t):
        pl, ekf = carry
        bc = dataclasses.replace(bc_lanes, chlorine_flow_rate=u_t)
        pl, readings = plant_step_batched(pparams, pl, bc, dt, substeps,
                                          boundary_axes=0)
        z_raw = jnp.stack([readings[nm].value for nm in measured],
                          axis=-1)
        z = (z_raw - cal_b) / cal_a
        ekf, x_hat = jax.vmap(ekf_step)(ekf, z, bc)
        x_true = flatten_state(pl.reactor)
        return (pl, ekf), (x_hat, x_true)

    (_, _), (Xhat, Xtrue) = jax.jit(
        lambda c, u: jax.lax.scan(tick, c, u))((plant, ekf_bank),
                                               u_seq.T)
    Xhat = jnp.swapaxes(Xhat, 0, 1)          # [L, S, n]
    Xtrue = jnp.swapaxes(Xtrue, 0, 1)
    t_hist = time.time() - t0

    # EKF quality on the unmeasured interior (vs truth — sim-only)
    mid = Z // 2
    ekf_rmse = float(jnp.sqrt(jnp.mean(
        (Xhat[:, B:, Z + mid] - Xtrue[:, B:, Z + mid]) ** 2)))

    # --- 3: train on ESTIMATE transitions, burn-in discarded
    X = Xhat[:, B - 1:]                      # [L, S-B+1, n]
    U = u_seq[:, B:, None]                   # [L, S-B, 1]
    t0 = time.time()
    sp, info = SG.train_surrogate(
        X, U, Z, jax.random.PRNGKey(1), hidden=(128, 128),
        n_steps=args.train_steps, rollout_steps=args.rollout_steps)
    t_fit = time.time() - t0

    # --- 4: validate against TRUTH (the simulator's privilege)
    pred = SG.surrogate_step(sp, Xtrue[:, B:-1], U[:, 1:])
    err = np.asarray(pred - Xtrue[:, B + 1:])
    res = np.asarray(Xtrue[:, B + 1:] - Xtrue[:, B:-1])
    def _skill(i):
        d = max(float(res[..., i * Z:(i + 1) * Z].std()), 1e-9)
        return round(float(err[..., i * Z:(i + 1) * Z].std()) / d, 3)

    def _rmse(i):
        return round(float(
            np.sqrt((err[..., i * Z:(i + 1) * Z] ** 2).mean())), 5)

    # Identifiability lesson: only the EXCITED channel (chlorine —
    # the dose is the input) supports a skill ratio; pH/temperature
    # barely move under chlorine-only forcing (true residual std ~0),
    # so any estimate jitter the surrogate learned shows as a huge
    # ratio over a meaningless denominator — report absolute RMSE
    # there, and excite those channels too if their dynamics matter.
    skill = {"chlorine": _skill(1)}
    abs_rmse = {"pH": _rmse(0), "temperature_C": _rmse(2)}

    out = {
        "historian": {"lanes": L, "ticks": S,
                      "seconds": round(t_hist, 1),
                      "ekf_midzone_cl_rmse_mgL": round(ekf_rmse, 4)},
        "fit_seconds": round(t_fit, 1),
        "true_one_step_skill_vs_identity": skill,
        "true_one_step_abs_rmse": abs_rmse,
    }

    if args.mpc_minutes:
        n_mpc = (args.mpc_minutes * 2 // 15) * 15
        program = np.full(n_mpc, 2.5, np.float32)
        t0 = time.time()
        mpc = SG.run_mpc_surrogate(config, sp, program, dt=dt,
                                   horizon_moves=4, steps_per_move=15,
                                   iters=20)
        cl = np.asarray(mpc["chlorine_outlet"])
        out["surrogate_mpc_on_true_plant"] = {
            "target_mgL": 2.5,
            "tail_mean_abs_err_mgL": round(
                float(np.abs(cl[-15:] - 2.5).mean()), 4),
            "seconds": round(time.time() - t0, 2),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
