"""
Shooting MPC vs tuned PID on a chlorine dosing program — in-graph,
end to end.

The reference's roadmap sequence is PID then "advanced control methods"
(reference README.md:432-439). This demo commissions a dosing program
(hold 2.0 mg/L residual, then step down to 1.0 — the
examples/dosing_program_hil.py shape) two ways:

  1. a PID tuned by an on-device closed-loop gain sweep (control/tuning),
  2. receding-horizon shooting MPC (control/mpc): each re-plan is a few
     Adam steps on the move sequence, differentiated THROUGH the plant,
     all inside one jitted outer scan.

and reports both tracking scores. MPC wins because it sees the setpoint
step coming (the program is known ahead) while the PID can only react.

Usage:
  python examples/mpc_dosing.py [--minutes 120] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=int, default=120,
                    help="program length (one step change at half time)")
    ap.add_argument("--zones", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--output-feedback", action="store_true",
                    help="also run the LQG-style loop: MPC planning "
                         "from the EKF estimate over the real "
                         "instrument suite (control/mpc.py "
                         "run_mpc_output_feedback)")
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

    from ics_wt_physicsengine_tpu import control as C
    from ics_wt_physicsengine_tpu.core import reactor as R

    dt = 60.0
    n_steps = args.minutes
    half = n_steps // 2
    config = R.ReactorConfiguration(n_zones=args.zones,
                                    initial_chlorine=0.5, flow_rate=20.0)
    bc = R.BoundaryConditions(inlet_flow_rate=20.0)
    program = jnp.concatenate([jnp.full((half,), 2.0, jnp.float32),
                               jnp.full((n_steps - half,), 1.0,
                                        jnp.float32)])

    # --- PID: sweep-tuned on the first program level, then run against
    #     the program via a setpoint schedule
    t0 = time.time()
    grid = C.make_gain_grid(kp_cl=jnp.linspace(0.2, 2.5, 8),
                            ki_cl=jnp.linspace(0.0, 0.2, 8),
                            kp_ph=jnp.asarray([-0.8]),
                            ki_ph=jnp.asarray([-0.05]),
                            cl_setpoint=2.0, ph_setpoint=7.2)
    best = C.gain_sweep(config, grid, dt=dt, n_steps=half,
                        boundary=bc)["best"]
    sched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_steps,) + jnp.shape(x)), best)
    sched = C.DualPIDGains(
        chlorine=dataclasses.replace(sched.chlorine, setpoint=program),
        ph=sched.ph)
    params = R.make_params(config, dtype=jnp.float32)
    state = R.make_initial_state(config, dtype=jnp.float32)
    substeps = R.default_substeps(config, dt)
    _, _, _, traj = C.rollout_closed_loop(
        params, state, bc, C.dual_pid_controller, best,
        C.make_dual_pid_carry((), jnp.float32), dt=dt, substeps=substeps,
        n_steps=n_steps, gains_schedule=sched,
        record_obs=("chlorine_outlet",))
    pid_score = float(jnp.sum((traj["chlorine_outlet"] - program) ** 2)
                      * dt)
    t_pid = time.time() - t0

    # --- shooting MPC on the same program
    t0 = time.time()
    res = C.run_mpc(config, program, dt=dt, horizon_moves=6,
                    steps_per_move=10, iters=20, boundary=bc)
    t_mpc = time.time() - t0

    out = {
        "program": {"levels": [2.0, 1.0], "minutes": n_steps},
        "pid": {"score_ISE": round(pid_score, 2),
                "kp": round(float(best.chlorine.kp), 3),
                "ki": round(float(best.chlorine.ki), 4),
                "seconds": round(t_pid, 2)},
        "mpc": {"score_ISE": round(res["score"], 2),
                "seconds": round(t_mpc, 2)},
        "mpc_beats_pid": bool(res["score"] < pid_score),
    }

    if args.output_feedback:
        # --- the deployment shape: MPC shoots from the EKF estimate,
        #     which assimilates the REAL instrument suite (no true
        #     state anywhere in the control path)
        t0 = time.time()
        of = C.run_mpc_output_feedback(
            config, program, dt=dt,
            taps=[("pH", 0), ("chlorine", -1), ("temperature", -1)],
            measured=["pH_inlet", "chlorine_outlet", "temp_outlet"],
            horizon_moves=6, steps_per_move=10, iters=20, boundary=bc,
            measurement_noise=(4e-4, 2.5e-3, 1e-2), seed=11)
        out["mpc_output_feedback"] = {
            "score_ISE_vs_truth": round(of["score"], 2),
            "final_measured_Cl": round(
                float(np.asarray(of["measured"]["chlorine_outlet"])[-1]),
                3),
            "seconds": round(time.time() - t0, 2),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
