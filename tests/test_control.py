"""In-graph closed-loop control (control/): PID bit-match vs the host
controller, closed-loop equivalence with the orchestrator's loop
semantics, batched gain sweeps, and gradient tuning.

The reference contains no control logic by design (reference README.md:22)
— ``wt_simulator.control.pid`` is its Phase-2 roadmap item (reference
README.md:432-439). These tests pin the delivered in-graph version to the
host-side controller (examples/pid_controller.py) and orchestrator
validation semantics (__main__.py:57-81,255-271) it must agree with."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu import control as C
from ics_wt_physicsengine_tpu.core import reactor as R

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def _dual_gains(dtype=jnp.float64, cl_sp=2.0, ph_sp=7.0):
    return C.DualPIDGains(
        chlorine=C.make_gains(0.4, 0.02, 0.0, cl_sp, 0.0, 1.0, dtype),
        ph=C.make_gains(-0.8, -0.05, 0.0, ph_sp, 0.0, 2.0, dtype))


def test_pid_step_bitmatches_host_pid():
    """pid_step must reproduce examples/pid_controller.py::PID.update
    EXACTLY (same float ops incl. the anti-windup != comparison) over a
    measurement stream that exercises both saturation rails."""
    from pid_controller import PID

    host = PID(kp=0.4, ki=0.02, kd=0.1, setpoint=2.0,
               out_min=0.0, out_max=1.0)
    gains = C.make_gains(0.4, 0.02, 0.1, 2.0, 0.0, 1.0, jnp.float64)
    carry = C.make_pid_carry(dtype=jnp.float64)
    rng = np.random.default_rng(0)
    for i in range(200):
        m = float(rng.uniform(-1.0, 5.0))
        want = host.update(m, 1.0)
        carry, got = C.pid_step(gains, carry, jnp.float64(m), 1.0)
        assert float(got) == want, f"step {i}: {float(got)} != {want}"


def test_pid_active_gate_freezes_carry():
    """active=False (warm-up / NaN reading) must hold the carry and output
    zero — the in-graph form of the host loop's `if reading > 0` gate."""
    gains = C.make_gains(1.0, 0.5, 0.0, 2.0, 0.0, 10.0, jnp.float64)
    carry = C.make_pid_carry(dtype=jnp.float64)
    carry, cmd = C.pid_step(gains, carry, jnp.float64(1.0), 1.0)
    frozen, cmd2 = C.pid_step(gains, carry, jnp.float64(float("nan")), 1.0,
                              active=jnp.float64(float("nan")) > 0.0)
    assert float(cmd2) == 0.0
    assert float(frozen.integral) == float(carry.integral)
    assert bool(frozen.has_prev) == bool(carry.has_prev)
    # and it resumes cleanly
    _, cmd3 = C.pid_step(gains, frozen, jnp.float64(1.0), 1.0)
    assert np.isfinite(float(cmd3))


def test_validate_commands_zero_trust():
    """In-graph command validation matches the orchestrator's zero-trust
    clamps (__main__.py:57-81): NaN -> 0, clip to [0, max]."""
    out = C.validate_commands({"acid_flow_rate": jnp.float64(50.0),
                               "chlorine_flow_rate": jnp.float64(-3.0)})
    assert float(out["acid_flow_rate"]) == 2.0
    assert float(out["chlorine_flow_rate"]) == 0.0
    out = C.validate_commands({"acid_flow_rate":
                               jnp.float64(float("nan"))})
    assert float(out["acid_flow_rate"]) == 0.0
    with pytest.raises(ValueError):
        C.validate_commands({"inlet_pH": jnp.float64(3.0)})


def test_closed_loop_matches_host_hil_loop():
    """rollout_closed_loop must reproduce the orchestrator's serving-loop
    semantics step for step: a host loop built from the SAME pieces the
    socket path uses (R.step + orchestrator apply_boundary_conditions +
    the examples/pid_controller.py PID) with noise-free true-state
    observations must produce the identical trajectory."""
    import dataclasses

    import ics_wt_physicsengine_tpu.__main__ as orch
    from pid_controller import PID

    config = R.ReactorConfiguration(n_zones=4, initial_chlorine=0.5)
    params = R.make_params(config, dtype=jnp.float64)
    state0 = R.make_initial_state(config, dtype=jnp.float64)
    dt, substeps, n_steps = 30.0, R.default_substeps(config, 30.0), 40

    gains = _dual_gains()
    carry = C.make_dual_pid_carry((), jnp.float64)
    _, _, _, traj = C.rollout_closed_loop(
        params, state0, R.BoundaryConditions(), C.dual_pid_controller,
        gains, carry, dt=dt, substeps=substeps, n_steps=n_steps)

    # host loop: step -> observe -> controller -> validated apply (the
    # reference HIL tick, __main__.py:398-457, minus the socket)
    cl_pid = PID(kp=0.4, ki=0.02, kd=0.0, setpoint=2.0,
                 out_min=0.0, out_max=1.0)
    ph_pid = PID(kp=-0.8, ki=-0.05, kd=0.0, setpoint=7.0,
                 out_min=0.0, out_max=2.0)
    step = jax.jit(lambda s, b: R.step(params, s, b, dt=dt,
                                       substeps=substeps))
    state, boundary = state0, R.BoundaryConditions()
    host_cl, host_cmd = [], []
    for _ in range(n_steps):
        state = step(state, boundary)
        cl_out = float(state.chlorine[-1])
        ph_in = float(state.pH[0])
        if cl_out > 0.0:
            cl_cmd = min(max(cl_pid.update(cl_out, dt), 0.0), 1.0)
        else:
            cl_cmd = 0.0
        acid_cmd = ph_pid.update(ph_in, dt) if ph_in > 0.0 else 0.0
        commands = (acid_cmd, cl_cmd, 0.0, 0.1, 50.0, True, True, True)
        new_bc = orch.apply_boundary_conditions(boundary, commands)
        # the orchestrator leaves concentrations at the register defaults;
        # keep the in-graph loop's untouched-field semantics
        boundary = dataclasses.replace(
            boundary, acid_flow_rate=new_bc.acid_flow_rate,
            chlorine_flow_rate=new_bc.chlorine_flow_rate)
        host_cl.append(cl_out)
        host_cmd.append(cl_cmd)

    np.testing.assert_allclose(np.asarray(traj["chlorine_outlet"]),
                               host_cl, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(traj["cmd:chlorine_flow_rate"]),
                               host_cmd, rtol=0, atol=1e-12)


def test_gain_sweep_lane_independence_and_ranking():
    """Batched sweep: identical gains on different lanes score identically
    (no cross-lane leakage), scores are finite, and the returned best is
    the argmin."""
    import dataclasses

    config = R.ReactorConfiguration(n_zones=4, initial_chlorine=0.5)
    base = _dual_gains(jnp.float32)

    def lanes(*kps):
        n = len(kps)
        b = lambda x: jnp.broadcast_to(x, (n,))  # noqa: E731
        cl = dataclasses.replace(
            base.chlorine, kp=jnp.asarray(kps, jnp.float32),
            ki=b(base.chlorine.ki), kd=b(base.chlorine.kd),
            setpoint=b(base.chlorine.setpoint),
            out_min=b(base.chlorine.out_min),
            out_max=b(base.chlorine.out_max))
        ph = jax.tree_util.tree_map(b, base.ph)
        return C.DualPIDGains(chlorine=cl, ph=ph)

    gains = lanes(0.2, 0.8, 0.2)
    res = C.gain_sweep(config, gains, dt=60.0, n_steps=40)
    scores = np.asarray(res["scores"])
    assert np.isfinite(scores).all()
    assert scores[0] == scores[2], "identical lanes must score identically"
    assert res["best_index"] == int(np.argmin(scores))
    assert float(res["best"].chlorine.kp) == \
        float(gains.chlorine.kp[res["best_index"]])


def test_gain_grid_shape():
    grid = C.make_gain_grid(kp_cl=jnp.asarray([0.1, 0.5]),
                            ki_cl=jnp.asarray([0.0, 0.02, 0.1]),
                            kp_ph=jnp.asarray([-0.5]),
                            ki_ph=jnp.asarray([-0.05, -0.01]))
    assert C.n_gains(grid) == 2 * 3 * 1 * 2
    assert grid.ph.out_max.shape == (12,)


def test_gradient_tuning_improves_loss():
    """jax.grad through the closed-loop rollout: Adam on (kp, ki, kd) must
    reduce the tracking loss (straight-through clipping keeps gradients
    alive through actuator saturation)."""
    config = R.ReactorConfiguration(n_zones=4, initial_chlorine=0.5,
                                    flow_rate=20.0)
    bc = R.BoundaryConditions(inlet_flow_rate=20.0)
    g0 = C.DualPIDGains(
        chlorine=C.make_gains(0.5, 0.01, 0.0, 2.0, 0.0, 1.0),
        ph=C.make_gains(-0.8, -0.05, 0.0, 7.2, 0.0, 2.0))
    res = C.tune_pid_gradient(config, g0, dt=60.0, n_steps=100, iters=25,
                              learning_rate=0.02, boundary=bc)
    h = np.asarray(res["loss_history"])
    assert np.isfinite(h).all()
    assert h[-1] < h[0], f"loss did not improve: {h[0]} -> {h[-1]}"
    # tuned scalar pick has scalar leaves
    assert jnp.shape(res["best"].chlorine.kp) == ()


def test_closed_loop_instrumented_observation():
    """observe='sensors': the controller reads the seven instruments'
    measured values (warm-up gating works: commands stay 0 until readings
    become positive) — single plant and batched."""
    from ics_wt_physicsengine_tpu.models.plant import (make_plant,
                                                       make_plant_batch)

    config = R.ReactorConfiguration(n_zones=4, initial_chlorine=0.5)
    params, plant = make_plant(config, seed=0)
    gains = _dual_gains(jnp.float32)
    carry = C.make_dual_pid_carry((), jnp.float32)
    _, _, bc, traj = C.rollout_closed_loop(
        params, plant, R.BoundaryConditions(), C.dual_pid_controller,
        gains, carry, dt=30.0, substeps=2, n_steps=10, observe="sensors")
    assert np.isfinite(np.asarray(traj["cmd:chlorine_flow_rate"])).all()
    # measured chlorine feeds the loop: commands respond to readings
    assert np.asarray(traj["chlorine_outlet"]).shape == (10,)

    bparams, bplant = make_plant_batch(config, 3, seed=1, randomize=False)
    bcarry = C.make_dual_pid_carry((3,), jnp.float32)
    _, _, _, btraj = C.rollout_closed_loop(
        bparams, bplant, R.BoundaryConditions(), C.dual_pid_controller,
        gains, bcarry, dt=30.0, substeps=2, n_steps=8, observe="sensors",
        batched=True)
    assert np.asarray(btraj["cmd:chlorine_flow_rate"]).shape == (8, 3)
    assert np.isfinite(np.asarray(btraj["cmd:acid_flow_rate"])).all()


def test_actuator_lag_in_graph():
    """actuator_tau > 0 applies the first-order pump lag in-graph —
    commands approach their targets instead of jumping (parity with
    __main__.apply_actuator_dynamics)."""
    config = R.ReactorConfiguration(n_zones=4, initial_chlorine=0.0)
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)

    def bang(gains, carry, obs, dt):   # constant full-throttle command
        return carry, {"chlorine_flow_rate":
                       jnp.ones_like(obs["chlorine_outlet"])}

    _, _, bc_lag, traj = C.rollout_closed_loop(
        params, state, R.BoundaryConditions(), bang, None, (),
        dt=1.0, substeps=1, n_steps=5, actuator_tau=10.0)
    applied = np.asarray(traj["cmd:chlorine_flow_rate"])
    # the recorded commands are the raw controller outputs; the APPLIED
    # boundary lags behind (strictly less than the command after 5 steps)
    assert float(bc_lag.chlorine_flow_rate) < 1.0
    alpha = 1.0 - np.exp(-1.0 / 10.0)
    want = 1.0 - (1.0 - alpha) ** 5
    np.testing.assert_allclose(float(bc_lag.chlorine_flow_rate), want,
                               rtol=1e-9)
    assert applied.shape == (5,)


def test_setpoint_schedule_and_disturbance():
    """gains_schedule runs a per-step setpoint program; disturbance
    scripts non-actuator forcing while the controller holds the actuator
    fields — the in-graph version of commissioning a program against
    inlet swings."""
    config = R.ReactorConfiguration(n_zones=4, initial_chlorine=1.5,
                                    flow_rate=20.0)
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)
    n_steps, dt = 80, 60.0
    substeps = R.default_substeps(config, dt)

    base = C.DualPIDGains(
        chlorine=C.make_gains(1.0, 0.05, 0.0, 2.0, 0.0, 1.0, jnp.float64),
        ph=C.make_gains(-0.8, -0.05, 0.0, 7.0, 0.0, 2.0, jnp.float64))
    # setpoint program: 2.0 then step down to 1.0 at half time
    sp = jnp.where(jnp.arange(n_steps) < n_steps // 2, 2.0, 1.0)
    sched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_steps,) + jnp.shape(x)), base)
    import dataclasses
    sched = C.DualPIDGains(
        chlorine=dataclasses.replace(sched.chlorine,
                                     setpoint=sp.astype(jnp.float64)),
        ph=sched.ph)

    dist = R.BoundaryConditions(
        inlet_flow_rate=20.0 + 5.0 * jnp.sin(
            2 * jnp.pi * jnp.arange(n_steps) / 20.0),
        inlet_pH=7.5, inlet_temperature=20.0)

    carry = C.make_dual_pid_carry((), jnp.float64)
    _, _, bc, traj = C.rollout_closed_loop(
        params, state, R.BoundaryConditions(inlet_flow_rate=20.0),
        C.dual_pid_controller, base, carry, dt=dt, substeps=substeps,
        n_steps=n_steps, gains_schedule=sched, disturbance=dist,
        record_obs=("chlorine_outlet", "flow_main"))
    cl = np.asarray(traj["chlorine_outlet"])
    assert np.isfinite(cl).all()
    # tracks the first level, then moves toward the lower one
    assert abs(cl[n_steps // 2 - 1] - 2.0) < 0.5
    assert cl[-1] < cl[n_steps // 2 - 1] - 0.2
    # the disturbance actually reached the plant (flow observed swinging)
    fl = np.asarray(traj["flow_main"])
    assert fl.max() - fl.min() > 5.0
    # shape check on a bad schedule
    with pytest.raises(ValueError, match="gains_schedule"):
        C.rollout_closed_loop(
            params, state, R.BoundaryConditions(), C.dual_pid_controller,
            base, carry, dt=dt, substeps=substeps, n_steps=n_steps,
            gains_schedule=base)


def test_chloramine_residual_control():
    """Closed-loop COMBINED-chlorine (chloramine) residual control: with
    ammonia in the source water, a PI on total_chlorine_outlet driving
    the chlorine pump holds the combined residual — the chloramination
    plant workflow the nitrogen chemistry enables."""
    config = R.ReactorConfiguration(
        n_zones=4, enable_nitrogen=True, initial_ammonia=1.0,
        initial_chlorine=0.0, flow_rate=20.0)
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)
    dt, n_steps = 60.0, 120
    substeps = R.default_substeps(config, dt)
    gains = C.make_gains(1.0, 0.05, 0.0, 2.0, 0.0, 1.0, jnp.float64)

    def controller(g, carry, obs, dt):
        carry, cmd = C.pid_step(g, carry, obs["total_chlorine_outlet"], dt,
                                active=obs["total_chlorine_outlet"] >= 0.0)
        return carry, {"chlorine_flow_rate": cmd}

    _, _, _, traj = C.rollout_closed_loop(
        params, state,
        R.BoundaryConditions(inlet_flow_rate=20.0, inlet_ammonia=1.0),
        controller, gains, C.make_pid_carry((), jnp.float64),
        dt=dt, substeps=substeps, n_steps=n_steps,
        record_obs=("total_chlorine_outlet", "chloramine_outlet",
                    "chlorine_outlet"))
    tot = np.asarray(traj["total_chlorine_outlet"])
    assert np.isfinite(tot).all()
    # residual reaches and holds near the 2.0 setpoint...
    assert abs(tot[-1] - 2.0) < 0.3
    # ...and with ammonia present it is mostly COMBINED chlorine
    assert np.asarray(traj["chloramine_outlet"])[-1] > \
        np.asarray(traj["chlorine_outlet"])[-1]


def test_sweep_from_zero_residual_tunes():
    """Regression (round-3 review): a gain sweep on a plant commissioned
    from ZERO chlorine must still tune — the host-parity `> 0` warm-up
    gate would freeze every candidate forever on noise-free true-state
    observations (all scores identical and meaningless)."""
    config = R.ReactorConfiguration(n_zones=4, initial_chlorine=0.0,
                                    flow_rate=20.0)
    grid = C.make_gain_grid(kp_cl=jnp.asarray([0.1, 2.0]),
                            ki_cl=jnp.asarray([0.0, 0.1]),
                            kp_ph=jnp.asarray([-0.8]),
                            ki_ph=jnp.asarray([-0.05]))
    res = C.gain_sweep(config, grid, dt=60.0, n_steps=60,
                       boundary=R.BoundaryConditions(inlet_flow_rate=20.0))
    scores = np.asarray(res["scores"])
    assert np.isfinite(scores).all()
    # dosing actually happened and candidates differentiate
    assert len(np.unique(np.round(scores, 6))) > 1
    traj = C.gain_sweep(config, grid, dt=60.0, n_steps=60,
                        boundary=R.BoundaryConditions(inlet_flow_rate=20.0),
                        return_traj=True)["traj"]
    assert np.asarray(traj["cmd:chlorine_flow_rate"]).max() > 0.0


def test_robust_gain_sweep():
    """Uncertainty-robust tuning: every gain candidate faces a Monte-Carlo
    plant ensemble; worst >= mean per candidate, ranking is by the
    robust blend, and with the ensemble collapsed to identical plants the
    mean scores equal the plain sweep's."""
    config = R.ReactorConfiguration(n_zones=4, initial_chlorine=0.5,
                                    flow_rate=20.0)
    bc = R.BoundaryConditions(inlet_flow_rate=20.0)
    grid = C.make_gain_grid(kp_cl=jnp.asarray([0.2, 1.0]),
                            ki_cl=jnp.asarray([0.0, 0.05]),
                            kp_ph=jnp.asarray([-0.8]),
                            ki_ph=jnp.asarray([-0.05]))
    res = C.robust_gain_sweep(config, grid, dt=60.0, n_steps=40,
                              n_plants=8, seed=3, boundary=bc)
    mean_s = np.asarray(res["scores_mean"])
    worst_s = np.asarray(res["scores_worst"])
    assert np.isfinite(mean_s).all() and np.isfinite(worst_s).all()
    assert (worst_s >= mean_s - 1e-5).all()
    assert (worst_s > mean_s).any()     # the ensemble actually varies
    robust = np.asarray(res["robust"])
    assert res["best_index"] == int(np.argmin(robust))
    assert jnp.shape(res["best"].chlorine.kp) == ()


def test_extension_observables_and_actuator_limits():
    """observe_true exposes the gas/particle channels and the in-graph
    command validator accepts the round-4 actuators with the same limits
    as the orchestrator's zero-trust register clamps."""
    from ics_wt_physicsengine_tpu.control.closed_loop import (
        _COMMAND_LIMITS, observe_true, validate_commands)

    cfg = R.ReactorConfiguration(n_zones=4, enable_gas=True,
                                 enable_particles=True, initial_oxygen=6.0,
                                 initial_tss=20.0)
    st = R.make_initial_state(cfg, dtype=jnp.float32)
    obs = observe_true(st)
    for key in ("oxygen_outlet", "carbonate_outlet", "tss_outlet",
                "sludge_total"):
        assert key in obs and np.isfinite(float(obs[key])), key
    assert float(obs["tss_outlet"]) == pytest.approx(20.0, rel=1e-5)

    out = validate_commands({"coagulant_dose": jnp.float32(250.0),
                             "filter_flow_rate": jnp.float32(-3.0),
                             "sludge_blowdown": jnp.float32(np.nan),
                             "aeration_kla": jnp.float32(0.05)})
    assert float(out["coagulant_dose"]) == _COMMAND_LIMITS["coagulant_dose"]
    assert float(out["filter_flow_rate"]) == 0.0
    assert float(out["sludge_blowdown"]) == 0.0       # NaN -> 0
    assert float(out["aeration_kla"]) == pytest.approx(0.05)


def test_disinfection_observables_and_actuator_limits():
    """observe_true exposes the regulatory disinfection channels and the
    validator accepts the UV/TOC commands with the register clamps."""
    from ics_wt_physicsengine_tpu.control.closed_loop import (
        _COMMAND_LIMITS, observe_true, validate_commands)

    cfg = R.ReactorConfiguration(n_zones=4, enable_disinfection=True,
                                 initial_pathogens=1e4, initial_toc=2.0)
    st = R.make_initial_state(cfg, dtype=jnp.float32)
    obs = observe_true(st)
    for key in ("giardia_log_removal", "crypto_log_removal", "ct_outlet",
                "thm_outlet", "toc_outlet"):
        assert key in obs and np.isfinite(float(obs[key])), key
    # uniform initial pathogen field: zero through-tank credit
    assert float(obs["giardia_log_removal"]) == pytest.approx(0.0, abs=1e-5)
    assert float(obs["toc_outlet"]) == pytest.approx(2.0, rel=1e-5)

    out = validate_commands({"uv_intensity": jnp.float32(500.0),
                             "inlet_toc": jnp.float32(np.nan)})
    assert float(out["uv_intensity"]) == _COMMAND_LIMITS["uv_intensity"]
    assert float(out["inlet_toc"]) == 0.0             # NaN -> 0

def test_biofilm_observables_and_actuator_limits():
    """observe_true exposes the regrowth channels (HPC in operator CFU/mL)
    and the validator accepts the source-water commands with the register
    clamps."""
    from ics_wt_physicsengine_tpu.control.closed_loop import (
        _COMMAND_LIMITS, observe_true, validate_commands)

    cfg = R.ReactorConfiguration(n_zones=4, enable_biofilm=True,
                                 initial_bacteria=1e-3, initial_bdoc=0.5,
                                 initial_biofilm=10.0)
    st = R.make_initial_state(cfg, dtype=jnp.float32)
    obs = observe_true(st)
    for key in ("hpc_outlet", "bdoc_outlet", "biofilm_peak"):
        assert key in obs and np.isfinite(float(obs[key])), key
    # 1e-3 mg C/L -> 5e3 CFU/mL (core/biofilm.py CELLS_PER_MG_C)
    assert float(obs["hpc_outlet"]) == pytest.approx(5e3, rel=1e-5)
    assert float(obs["biofilm_peak"]) == pytest.approx(10.0, rel=1e-6)

    out = validate_commands({"inlet_bdoc": jnp.float32(50.0),
                             "inlet_bacteria": jnp.float32(np.nan)})
    assert float(out["inlet_bdoc"]) == _COMMAND_LIMITS["inlet_bdoc"]
    assert float(out["inlet_bacteria"]) == 0.0        # NaN -> 0
