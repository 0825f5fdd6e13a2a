"""Shooting MPC (control/mpc.py): the receding-horizon planner must track
a time-varying dosing program and beat the tuned PID on the same program
— the reference's "advanced control methods" roadmap direction (reference
README.md:432-439) delivered through the differentiable plant."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from ics_wt_physicsengine_tpu import control as C
from ics_wt_physicsengine_tpu.core import reactor as R

_CONFIG = R.ReactorConfiguration(n_zones=4, initial_chlorine=0.5,
                                 flow_rate=20.0)
_BC = R.BoundaryConditions(inlet_flow_rate=20.0)
# the dosing program: hold 2.0 mg/L, then step down to 1.0 (the
# examples/dosing_program_hil.py commissioning shape)
_PROGRAM = jnp.concatenate([jnp.full((60,), 2.0, jnp.float32),
                            jnp.full((60,), 1.0, jnp.float32)])
_DT = 60.0


def _pid_score(gains: C.DualPIDGains) -> float:
    """Closed-loop PID tracking score on the same program (the setpoint
    changes between segments, so run the loop in two chained segments)."""
    params = R.make_params(_CONFIG, dtype=jnp.float32)
    state = R.make_initial_state(_CONFIG, dtype=jnp.float32)
    carry = C.make_dual_pid_carry((), jnp.float32)
    boundary = _BC
    substeps = R.default_substeps(_CONFIG, _DT)
    score = 0.0
    for seg_sp, n in ((2.0, 60), (1.0, 60)):
        seg = C.DualPIDGains(
            chlorine=dataclasses.replace(gains.chlorine,
                                         setpoint=jnp.float32(seg_sp)),
            ph=gains.ph)
        state, carry, boundary, traj = C.rollout_closed_loop(
            params, state, boundary, C.dual_pid_controller, seg, carry,
            dt=_DT, substeps=substeps, n_steps=n,
            record_obs=("chlorine_outlet",))
        score += float(jnp.sum((traj["chlorine_outlet"] - seg_sp) ** 2)
                       * _DT)
    return score


def test_output_feedback_mpc_tracks_through_instruments():
    """LQG-style loop: the MPC shoots from the EKF estimate, which
    assimilates the REAL instrument suite — no true state anywhere in
    the control path. It must still track the dosing program (scored
    against the hidden truth, within the instruments' bias budget)."""
    program = jnp.concatenate([jnp.full((45,), 2.0, jnp.float32),
                               jnp.full((45,), 1.0, jnp.float32)])
    res = C.run_mpc_output_feedback(
        _CONFIG, program, dt=_DT,
        taps=[("pH", 0), ("chlorine", -1), ("temperature", -1)],
        measured=["pH_inlet", "chlorine_outlet", "temp_outlet"],
        horizon_moves=5, steps_per_move=9, iters=15, boundary=_BC,
        measurement_noise=(4e-4, 2.5e-3, 1e-2), seed=11)
    cl_true = np.asarray(res["chlorine_outlet"])     # hidden truth
    assert np.isfinite(cl_true).all()
    # tracks both program levels by each segment's end; tolerance
    # covers the outlet instrument's calibration bias (the controller
    # steers the MEASURED value to the setpoint)
    assert abs(cl_true[40] - 2.0) < 0.6, cl_true[40]
    assert abs(cl_true[-1] - 1.0) < 0.6, cl_true[-1]
    # and the measured value it actually regulates sits tighter
    cl_meas = np.asarray(res["measured"]["chlorine_outlet"])
    assert abs(cl_meas[-1] - 1.0) < 0.25, cl_meas[-1]
    # the estimate agrees with the measured outlet at the end
    from ics_wt_physicsengine_tpu.control import tap_index
    est_out = float(res["final_estimate"].x[
        tap_index("chlorine", -1, _CONFIG.n_zones)])
    assert abs(est_out - cl_meas[-1]) < 0.2, (est_out, cl_meas[-1])


def test_mpc_tracks_and_beats_tuned_pid():
    res = C.run_mpc(_CONFIG, _PROGRAM, dt=_DT, horizon_moves=6,
                    steps_per_move=10, iters=20, boundary=_BC)
    cl = np.asarray(res["chlorine_outlet"])
    assert np.isfinite(cl).all()
    # tracks both program levels by each segment's end
    assert abs(cl[55] - 2.0) < 0.5
    assert abs(cl[115] - 1.0) < 0.1

    # the PID opponent: gains picked by a sweep on the SAME plant at the
    # first program level (a fair, tuned baseline)
    grid = C.make_gain_grid(kp_cl=jnp.linspace(0.2, 2.0, 6),
                            ki_cl=jnp.linspace(0.0, 0.2, 5),
                            kp_ph=jnp.asarray([-0.8]),
                            ki_ph=jnp.asarray([-0.05]),
                            cl_setpoint=2.0, ph_setpoint=7.2)
    best = C.gain_sweep(_CONFIG, grid, dt=_DT, n_steps=60,
                        boundary=_BC)["best"]
    pid_score = _pid_score(best)
    assert res["score"] < pid_score, \
        f"MPC {res['score']:.1f} did not beat tuned PID {pid_score:.1f}"


def test_mpc_plan_reduces_cost():
    """A single plan call's Adam iterations must monotonically-ish reduce
    the shooting cost (first vs last)."""
    params = R.make_params(_CONFIG, dtype=jnp.float32)
    state = R.make_initial_state(_CONFIG, dtype=jnp.float32)
    sp = jnp.full((40,), 2.0, jnp.float32)
    moves0 = jnp.full((4,), 0.2, jnp.float32)
    moves, costs = C.mpc_plan(params, state, _BC, sp, moves0, dt=_DT,
                              substeps=R.default_substeps(_CONFIG, _DT),
                              steps_per_move=10, iters=25)
    costs = np.asarray(costs)
    assert np.isfinite(costs).all()
    assert costs[-1] < costs[0]
    assert ((np.asarray(moves) >= 0.0) & (np.asarray(moves) <= 1.0)).all()


def test_mpc_multi_input_joint_tracking():
    """Two coupled pumps, two targets: joint shooting MPC on
    (chlorine_flow_rate, acid_flow_rate) tracks a chlorine residual AND a
    pH target simultaneously — the acid loop leaning against the
    chlorination's pH push."""
    config = R.ReactorConfiguration(n_zones=4, initial_chlorine=0.5,
                                    initial_pH=7.4, flow_rate=20.0)
    bc = R.BoundaryConditions(inlet_flow_rate=20.0, inlet_pH=7.4)
    n = 60
    programs = {
        "chlorine_outlet": jnp.full((n,), 2.0, jnp.float32),
        "pH_inlet": jnp.full((n,), 7.0, jnp.float32),
    }
    res = C.run_mpc(config, programs, dt=60.0, horizon_moves=6,
                    steps_per_move=10, iters=20, boundary=bc,
                    controls=("chlorine_flow_rate", "acid_flow_rate"),
                    weights={"chlorine_outlet": 1.0, "pH_inlet": 4.0})
    cl = np.asarray(res["tracked"]["chlorine_outlet"])
    ph = np.asarray(res["tracked"]["pH_inlet"])
    assert np.isfinite(cl).all() and np.isfinite(ph).all()
    assert abs(cl[-1] - 2.0) < 0.5        # residual reached
    assert abs(ph[-1] - 7.0) < 0.15       # pH pulled down to target
    acid = np.asarray(res["commands_by_control"]["acid_flow_rate"])
    assert acid.max() > 0.01              # the second pump actually ran


def test_mpc_coagulant_tracks_turbidity_target():
    """Physical-treatment MPC: the shooting optimizer commands the
    coagulant dosing pump (a round-4 actuator, differentiable through the
    Monod aggregation chain + Stokes settling) to hold an outlet-TSS
    target against a 60 mg/L raw-water load — the automated jar test.
    The undosed plant settles to ~24 mg/L; MPC must land near the 8 mg/L
    target and beat the undosed ISE decisively."""
    cfg = R.ReactorConfiguration(n_zones=4, enable_particles=True,
                                 initial_tss=30.0, initial_chlorine=0.0)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_tss=60.0)
    n, target = 120, 8.0
    prog = {"tss_outlet": np.full(n, target, np.float32)}
    out = C.run_mpc(cfg, prog, dt=30.0, horizon_moves=4, steps_per_move=10,
                    iters=25, learning_rate=2.0, boundary=bc,
                    controls=("coagulant_dose",))
    tr = np.asarray(out["tracked"]["tss_outlet"])
    dose = np.asarray(out["commands_by_control"]["coagulant_dose"])
    assert np.isfinite(tr).all()
    assert dose.min() >= 0.0 and dose.max() <= 100.0   # actuator limits

    # steady tracking shows in the final quarter
    tail = tr[-n // 4:]
    assert abs(float(tail.mean()) - target) < 3.5, tail.mean()
    # decisively better than the ~24 mg/L undosed steady state (measured
    # with this config/boundary via a plain rollout)
    assert float(tail.mean()) < 12.0


def test_mpc_uv_tracks_crypto_credit():
    """Disinfection MPC: the shooting optimizer commands the UV bank
    (a round-4 actuator, differentiable through the Beer-Lambert fluence
    and the analytic kill split) to hold a Cryptosporidium log-removal
    target — lamp-power scheduling against the regulatory credit."""
    cfg = R.ReactorConfiguration(n_zones=4, enable_disinfection=True,
                                 initial_pathogens=1e4,
                                 initial_chlorine=0.0)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pathogens=1e4,
                              inlet_chlorine=0.0, inlet_toc=2.0)
    n, target = 120, 3.0
    prog = {"crypto_log_removal": np.full(n, target, np.float32)}
    # small Adam steps: the credit's gradient vanishes once the outlet
    # zone sterilizes (float32 underflow floors the observation at 30),
    # so the optimizer must stay in the smooth sub-sterilizing region
    out = C.run_mpc(cfg, prog, dt=30.0, horizon_moves=4, steps_per_move=10,
                    iters=40, learning_rate=0.1, boundary=bc,
                    controls=("uv_intensity",))
    tr = np.asarray(out["tracked"]["crypto_log_removal"])
    lamp = np.asarray(out["commands_by_control"]["uv_intensity"])
    assert np.isfinite(tr).all()
    assert lamp.min() >= 0.0 and lamp.max() <= 50.0    # actuator limits
    assert lamp.max() > 0.01                           # the bank actually lit

    # steady tracking shows at the end: near the target, neither washed
    # out (the unlit plant has ~zero Crypto credit — chlorine-resistant
    # class, Cl=0) nor sterilizing the outlet zone (credit floors at 30
    # when float32 pathogens underflow). The credit's response to lamp
    # power is logarithmic at this residence time, so tracking lands
    # within ~1 log of the target rather than exactly on it.
    tail = tr[-10:]
    assert abs(float(tail.mean()) - target) < 1.5, tail.mean()
    assert float(tail.mean()) > 1.5
    assert float(tail.max()) < 10.0                    # not floored

def test_mpc_booster_chlorination_suppresses_hpc():
    """Regrowth MPC: the shooting optimizer commands the chlorine dosing
    pump (differentiable through Chick-Watson kill + Monod inhibition,
    core/biofilm.py) to hold the outlet plate count at a target — booster
    chlorination against a source-water regrowth event."""
    cfg = R.ReactorConfiguration(n_zones=4, enable_biofilm=True,
                                 initial_chlorine=0.0,
                                 initial_bacteria=1e-3,   # ~5e3 CFU/mL
                                 initial_bdoc=1.0)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_chlorine=0.0,
                              inlet_bacteria=1e-3, inlet_bdoc=1.0,
                              chlorine_concentration=50.0)
    n, target = 120, 500.0       # CFU/mL
    prog = {"hpc_outlet": np.full(n, target, np.float32)}
    out = C.run_mpc(cfg, prog, dt=30.0, horizon_moves=4, steps_per_move=10,
                    iters=40, learning_rate=0.05, boundary=bc,
                    controls=("chlorine_flow_rate",),
                    weights={"hpc_outlet": 1e-6})
    tr = np.asarray(out["tracked"]["hpc_outlet"])
    pump = np.asarray(out["commands_by_control"]["chlorine_flow_rate"])
    assert np.isfinite(tr).all()
    assert pump.min() >= 0.0 and pump.max() <= 1.0     # actuator limits
    assert pump.max() > 1e-3                           # the pump ran

    # the count comes down from the unchlorinated ~5e3 baseline toward
    # the target without sterilizing the tank outright
    tail = tr[-10:]
    assert float(tail.mean()) < 2500.0, tail.mean()
    assert float(tail.mean()) > 10.0, tail.mean()


def test_output_feedback_booster_chlorination_on_biofilm_plant():
    """Output-feedback regrowth control: on a biofilm plant the MPC
    holds the outlet plate count from the EKF's ESTIMATE — assimilated
    from the real core instruments only (no HPC lab channel in the
    loop) — commanding the chlorine pump against a regrowth event.
    Regression for the extension-plant unflatten in
    run_mpc_output_feedback (the estimate layout follows the plant's
    enabled species)."""
    cfg = R.ReactorConfiguration(n_zones=4, enable_biofilm=True,
                                 initial_chlorine=0.0,
                                 initial_bacteria=1e-3,   # ~5e3 CFU/mL
                                 initial_bdoc=1.0)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_chlorine=0.0,
                              inlet_bacteria=1e-3, inlet_bdoc=1.0,
                              chlorine_concentration=50.0)
    n, target = 80, 500.0       # CFU/mL
    prog = {"hpc_outlet": np.full(n, target, np.float32)}
    res = C.run_mpc_output_feedback(
        cfg, prog, dt=30.0,
        taps=[("pH", 0), ("chlorine", -1), ("temperature", -1)],
        measured=["pH_inlet", "chlorine_outlet", "temp_outlet"],
        horizon_moves=4, steps_per_move=10, iters=25,
        learning_rate=0.05, boundary=bc,
        controls=("chlorine_flow_rate",),
        weights={"hpc_outlet": 1e-6},
        measurement_noise=(4e-4, 2.5e-3, 1e-2), seed=7)
    tr = np.asarray(res["tracked"]["hpc_outlet"])     # hidden truth
    pump = np.asarray(res["commands_by_control"]["chlorine_flow_rate"])
    assert np.isfinite(tr).all()
    assert pump.min() >= 0.0 and pump.max() <= 1.0
    assert pump.max() > 1e-3                          # the pump ran
    tail = tr[-10:]
    assert float(tail.mean()) < 2500.0, tail.mean()   # count brought down
    assert float(tail.mean()) > 10.0, tail.mean()     # not sterilized
    # the estimate's bacteria field is live (not collapsed to zero)
    from ics_wt_physicsengine_tpu.control import tap_index
    i_x = tap_index("bacteria", -1, cfg.n_zones, biofilm=True)
    assert float(res["final_estimate"].x[i_x]) > 0.0
