"""
Shooting MPC: receding-horizon optimal dosing through the differentiable
plant.

Model-predictive control is the reference's roadmap step past PID
(reference README.md:432-439 lists ``control.pid`` then "advanced control
methods"). A TPU-native plant makes the direct (single-shooting) form
natural: the predicted trajectory is a ``lax.scan`` of the physics, the
tracking cost is differentiable through it (AD through rollouts proven in
tests/test_grad.py), so each re-plan is a few Adam steps on the move
sequence — all inside one jit, including the outer receding-horizon loop.

Multi-input by construction: ``controls`` names any set of actuator
fields (chlorine + acid dosing jointly, by default chlorine alone) and
``track`` any set of observed variables with per-step setpoint programs
and weights — e.g. holding BOTH a chlorine residual and a pH target with
two coupled pumps (chlorination raises pH; the acid loop must lean
against it).

``run_mpc`` tracks a time-varying program (the
examples/dosing_program_hil.py commissioning shape: step changes in
target residual) and is benchmarked against the tuned PID in
tests/test_mpc.py — same plant, same program, lower tracking error.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.control.closed_loop import (_COMMAND_LIMITS,
                                                          observe_true)
from ics_wt_physicsengine_tpu.control.pid import st_clip
from ics_wt_physicsengine_tpu.core import reactor as R

_DEFAULT_CONTROLS = ("chlorine_flow_rate",)


def _clip_moves(moves, controls):
    """Straight-through clip each control column to its actuator limit:
    out-of-range candidates are applied clipped, but the optimizer still
    feels which way to move them (see pid.st_clip)."""
    cols = [st_clip(moves[..., i], 0.0, _COMMAND_LIMITS[f])
            for i, f in enumerate(controls)]
    return jnp.stack(cols, axis=-1)


def _predict_cost(params, state, boundary, moves, setpoints, weights,
                  controls, dt, substeps, steps_per_move, stages,
                  move_weight):
    """Cost of a candidate move sequence: weighted ISE of every tracked
    observable vs its setpoint program + a move-smoothness penalty.
    ``moves`` is ``[n_moves, n_controls]``, each row held for
    ``steps_per_move`` physics steps; ``setpoints`` maps tracked
    observable names (observe_true keys) to ``[n_moves * steps_per_move]``
    programs."""
    u = jnp.repeat(_clip_moves(moves, controls), steps_per_move, axis=0)

    def body(st, inp):
        u_t, sp_t = inp
        bc = dataclasses.replace(
            boundary, **{f: u_t[i] for i, f in enumerate(controls)})
        st = R.step(params, st, bc, dt=dt, substeps=substeps, stages=stages)
        obs = observe_true(st)
        sq = sum(weights[k] * (obs[k] - sp_t[k]) ** 2 for k in setpoints)
        return st, sq

    _, sq_err = jax.lax.scan(body, state, (u, setpoints))
    smooth = jnp.sum((moves[1:] - moves[:-1]) ** 2) \
        if moves.shape[0] > 1 else 0.0
    return jnp.sum(sq_err) * dt + move_weight * smooth


@partial(jax.jit, static_argnames=("dt", "substeps", "steps_per_move",
                                   "stages", "iters", "controls"))
def mpc_plan(params, state: R.ReactorState, boundary: R.BoundaryConditions,
             setpoints, moves0: jnp.ndarray, dt: float,
             substeps: int, steps_per_move: int, stages=None,
             iters: int = 30, learning_rate: float = 0.08,
             move_weight: float = 0.05,
             controls: Sequence[str] = _DEFAULT_CONTROLS, weights=None):
    """Optimize a move sequence over the horizon by Adam on the shooting
    cost. ``setpoints``: a ``[horizon]`` array (legacy: tracks
    chlorine_outlet) or a dict of observable-name -> ``[horizon]``
    programs. ``moves0``: ``[n_moves]`` (single control) or ``[n_moves,
    n_controls]``. Returns ``(moves, cost_history)`` with moves clipped to
    the actuator limits, in the shape moves0 came in."""
    import optax

    controls = tuple(controls)
    single = jnp.ndim(moves0) == 1
    moves0 = jnp.atleast_2d(moves0.T).T if single else moves0
    if not isinstance(setpoints, dict):
        setpoints = {"chlorine_outlet": jnp.asarray(setpoints)}
    if weights is None:
        weights = {k: 1.0 for k in setpoints}

    cost = partial(_predict_cost, params, state, boundary,
                   setpoints=setpoints, weights=weights, controls=controls,
                   dt=dt, substeps=substeps, steps_per_move=steps_per_move,
                   stages=stages, move_weight=move_weight)
    opt = optax.chain(optax.clip_by_global_norm(10.0),
                      optax.adam(learning_rate))

    def body(carry, _):
        moves, opt_state = carry
        c, g = jax.value_and_grad(cost)(moves)
        g = jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)
        updates, opt_state = opt.update(g, opt_state, moves)
        return (optax.apply_updates(moves, updates), opt_state), c

    (moves, _), costs = jax.lax.scan(body, (moves0, opt.init(moves0)),
                                     None, length=iters)
    lims = jnp.asarray([_COMMAND_LIMITS[f] for f in controls], moves.dtype)
    moves = jnp.clip(moves, 0.0, lims)
    return (moves[:, 0] if single else moves), costs


def run_mpc(config: R.ReactorConfiguration, setpoint_program,
            dt: float, horizon_moves: int = 8, steps_per_move: int = 15,
            replan_every: Optional[int] = None, iters: int = 30,
            learning_rate: float = 0.08, move_weight: float = 0.05,
            boundary: Optional[R.BoundaryConditions] = None,
            substeps: Optional[int] = None, stages=None,
            controls: Sequence[str] = _DEFAULT_CONTROLS, weights=None,
            dtype=jnp.float32) -> Dict:
    """Receding-horizon control of the true plant.

    ``setpoint_program``: a ``[n_steps]`` array (legacy: chlorine_outlet
    target) or a dict of observable-name -> ``[n_steps]`` programs (the
    dosing *programs* being commissioned — e.g. chlorine residual AND pH
    jointly with ``controls=("chlorine_flow_rate", "acid_flow_rate")``).
    Every ``replan_every`` steps (default: one move length) the controller
    re-plans ``horizon_moves`` moves against the programs ahead
    (edge-padded past their end), applies the plan until the next re-plan,
    and the plant advances — all inside one jitted outer scan.

    Returns the applied per-control commands, the realized tracked
    trajectories, and the weighted tracking score. Legacy single-program
    callers also get ``commands`` / ``chlorine_outlet`` keys.
    """
    controls = tuple(controls)
    if not isinstance(setpoint_program, dict):
        setpoint_program = {"chlorine_outlet":
                            jnp.asarray(setpoint_program, dtype)}
    programs = {k: jnp.asarray(v, dtype)
                for k, v in setpoint_program.items()}
    lengths = {int(v.shape[0]) for v in programs.values()}
    if len(lengths) != 1:
        raise ValueError(f"programs disagree on n_steps: {lengths}")
    n_steps = lengths.pop()
    if weights is None:
        weights = {k: 1.0 for k in programs}
    if replan_every is None:
        replan_every = steps_per_move
    if n_steps % replan_every:
        raise ValueError(f"n_steps={n_steps} must be a multiple of "
                         f"replan_every={replan_every}")
    if substeps is None:
        substeps = R.default_substeps(config, dt)
    if boundary is None:
        boundary = R.BoundaryConditions()
    params = R.make_params(config, dtype=dtype)
    state = R.make_initial_state(config, dtype=dtype)

    horizon = horizon_moves * steps_per_move
    padded = {k: jnp.concatenate([v, jnp.full((horizon,), v[-1], dtype)])
              for k, v in programs.items()}
    n_outer = n_steps // replan_every
    n_controls = len(controls)

    @partial(jax.jit, static_argnames=())
    def outer(state):
        def body(carry, k):
            st, moves_prev = carry
            sp_h = {name: jax.lax.dynamic_slice(p, (k * replan_every,),
                                                (horizon,))
                    for name, p in padded.items()}
            moves, _ = mpc_plan(params, st, boundary, sp_h, moves_prev,
                                dt=float(dt), substeps=int(substeps),
                                steps_per_move=int(steps_per_move),
                                stages=stages, iters=int(iters),
                                learning_rate=learning_rate,
                                move_weight=move_weight,
                                controls=controls, weights=weights)
            u_applied = jnp.repeat(moves, steps_per_move,
                                   axis=0)[:replan_every]

            def inner(st, u_t):
                bc = dataclasses.replace(
                    boundary,
                    **{f: u_t[i] for i, f in enumerate(controls)})
                st = R.step(params, st, bc, dt=float(dt),
                            substeps=int(substeps), stages=stages)
                obs = observe_true(st)
                return st, {name: obs[name] for name in programs}

            st, tracked = jax.lax.scan(inner, st, u_applied)
            shifted = jnp.concatenate([moves[1:], moves[-1:]]) \
                if replan_every == steps_per_move else moves
            return (st, shifted), (u_applied, tracked)

        moves0 = jnp.full((horizon_moves, n_controls), 0.2, dtype)
        (st, _), (u, tracked) = jax.lax.scan(body, (state, moves0),
                                             jnp.arange(n_outer))
        return st, u.reshape(-1, n_controls), \
            {k: v.reshape(-1) for k, v in tracked.items()}

    state, u, tracked = outer(state)
    score = sum(float(weights[k])
                * float(jnp.sum((tracked[k] - programs[k]) ** 2) * dt)
                for k in programs)
    out = {"commands_by_control": {f: u[:, i]
                                   for i, f in enumerate(controls)},
           "tracked": tracked, "score": score,
           "final_state": state, "observe": observe_true(state)}
    if controls == _DEFAULT_CONTROLS:
        out["commands"] = u[:, 0]
    if "chlorine_outlet" in tracked:
        out["chlorine_outlet"] = tracked["chlorine_outlet"]
    return out


def run_mpc_output_feedback(
        config: R.ReactorConfiguration, setpoint_program, dt: float,
        taps: Sequence, measured: Sequence[str],
        horizon_moves: int = 8, steps_per_move: int = 15,
        replan_every: Optional[int] = None, iters: int = 30,
        learning_rate: float = 0.08, move_weight: float = 0.05,
        boundary: Optional[R.BoundaryConditions] = None,
        substeps: Optional[int] = None, stages=None,
        controls: Sequence[str] = _DEFAULT_CONTROLS, weights=None,
        measurement_noise=0.01, process_noise=(1e-6, 1e-5, 1e-5),
        p0=(0.05, 1.0, 4.0), seed: int = 0,
        dtype=jnp.float32) -> Dict:
    """Output-feedback (LQG-style) receding-horizon control: the MPC
    never sees the true state — it shoots from the EKF's estimate,
    which assimilates the REAL instrument suite's readings every tick.

    ``taps`` are the EKF's ``(field, zone)`` measurement channels
    (control/ekf.py) and ``measured`` the matching reading names from
    the instrumented plant (``"pH_inlet"``, ``"chlorine_outlet"``, ...).
    Everything — plant + 7 instruments, filter predict/update with the
    jacfwd transition Jacobian, and each re-plan's Adam iterations —
    runs inside one jitted outer scan.

    Returns the applied commands, the realized TRUE tracked
    trajectories (for honest scoring), the measured readings, and the
    final estimate. The practical deployment shape: this is the
    controller you commission before pointing the same MPC at a real
    plant over Modbus/OPC UA, where the true state never exists."""
    from ics_wt_physicsengine_tpu.control.ekf import (make_ekf,
                                                      make_ekf_carry,
                                                      state_fields,
                                                      unflatten_state)
    from ics_wt_physicsengine_tpu.models.plant import make_plant, plant_step

    controls = tuple(controls)
    if not isinstance(setpoint_program, dict):
        setpoint_program = {"chlorine_outlet":
                            jnp.asarray(setpoint_program, dtype)}
    programs = {k: jnp.asarray(v, dtype)
                for k, v in setpoint_program.items()}
    n_steps = {int(v.shape[0]) for v in programs.values()}.pop()
    if weights is None:
        weights = {k: 1.0 for k in programs}
    if replan_every is None:
        replan_every = steps_per_move
    if n_steps % replan_every:
        raise ValueError(f"n_steps={n_steps} must be a multiple of "
                         f"replan_every={replan_every}")
    if substeps is None:
        substeps = R.default_substeps(config, dt)
    if boundary is None:
        boundary = R.BoundaryConditions()
    zones = config.n_zones
    pparams, plant = make_plant(config, seed=seed, dtype=dtype,
                                warmed_up=True)
    rparams = pparams.reactor
    # extension axes ride along: the EKF's state layout follows the
    # plant's enabled species (nitrogen/gas/particles/biofilm), and the
    # estimate must be unflattened with the same flags
    nitrogen = rparams.nitrogen is not None
    gas = rparams.gas is not None
    biofilm = rparams.biofilm is not None
    n_cls = (0 if rparams.particles is None
             else rparams.particles.ntu_per_mgl.shape[-1])
    n_fields = len(state_fields(nitrogen, gas, biofilm))
    p0_arr = jnp.asarray(p0, jnp.float32)
    if p0_arr.ndim == 1 and p0_arr.shape == (3,) \
            and (n_fields > 3 or n_cls):
        # pad the 3-entry core default with unit variance per extension
        # field (same convention as make_ekf's process-noise padding)
        pads = [p0_arr, jnp.full((n_fields - 3,), 1.0, jnp.float32)]
        if n_cls:
            pads.append(jnp.asarray([25.0, 1.0], jnp.float32))
        p0 = jnp.concatenate(pads)
    ekf_step = make_ekf(rparams, zones, taps, dt, substeps,
                        process_noise=process_noise,
                        measurement_noise=measurement_noise,
                        stages=stages)
    ekf_carry = make_ekf_carry(
        R.make_initial_state(config, dtype=dtype), p0=p0,
        n_zones=zones)

    horizon = horizon_moves * steps_per_move
    padded = {k: jnp.concatenate([v, jnp.full((horizon,), v[-1], dtype)])
              for k, v in programs.items()}
    n_outer = n_steps // replan_every
    n_controls = len(controls)

    @partial(jax.jit, static_argnames=())
    def outer(plant0, ekf0):
        def body(carry, k):
            pl, ekf_c, moves_prev = carry
            sp_h = {name: jax.lax.dynamic_slice(p, (k * replan_every,),
                                                (horizon,))
                    for name, p in padded.items()}
            # Plan from the ESTIMATE — the only state the controller has
            est_state = unflatten_state(ekf_c.x, zones,
                                        nitrogen=nitrogen, gas=gas,
                                        biofilm=biofilm,
                                        n_classes=n_cls)
            moves, _ = mpc_plan(rparams, est_state, boundary, sp_h,
                                moves_prev, dt=float(dt),
                                substeps=int(substeps),
                                steps_per_move=int(steps_per_move),
                                stages=stages, iters=int(iters),
                                learning_rate=learning_rate,
                                move_weight=move_weight,
                                controls=controls, weights=weights)
            u_applied = jnp.repeat(moves, steps_per_move,
                                   axis=0)[:replan_every]

            def inner(c, u_t):
                pl, ekf_c = c
                bc = dataclasses.replace(
                    boundary,
                    **{f: u_t[i] for i, f in enumerate(controls)})
                pl, readings = plant_step(pparams, pl, bc, dt,
                                          int(substeps), stages=stages)
                z = jnp.stack([readings[n].value for n in measured])
                ekf_c, _ = ekf_step(ekf_c, z, bc)
                obs_true = observe_true(pl.reactor)
                return (pl, ekf_c), (
                    {name: obs_true[name] for name in programs},
                    {n: readings[n].value for n in measured})

            (pl, ekf_c), (tracked, meas) = jax.lax.scan(
                inner, (pl, ekf_c), u_applied)
            shifted = jnp.concatenate([moves[1:], moves[-1:]]) \
                if replan_every == steps_per_move else moves
            return (pl, ekf_c, shifted), (u_applied, tracked, meas)

        moves0 = jnp.full((horizon_moves, n_controls), 0.2, dtype)
        (pl, ekf_c, _), (u, tracked, meas) = jax.lax.scan(
            body, (plant0, ekf0, moves0), jnp.arange(n_outer))
        return pl, ekf_c, u.reshape(-1, n_controls), \
            {k: v.reshape(-1) for k, v in tracked.items()}, \
            {k: v.reshape(-1) for k, v in meas.items()}

    plant, ekf_carry, u, tracked, meas = outer(plant, ekf_carry)
    score = sum(float(weights[k])
                * float(jnp.sum((tracked[k] - programs[k]) ** 2) * dt)
                for k in programs)
    out = {"commands_by_control": {f: u[:, i]
                                   for i, f in enumerate(controls)},
           "tracked": tracked, "measured": meas, "score": score,
           "final_plant": plant, "final_estimate": ekf_carry}
    if controls == _DEFAULT_CONTROLS:
        out["commands"] = u[:, 0]
    if "chlorine_outlet" in tracked:
        out["chlorine_outlet"] = tracked["chlorine_outlet"]
    return out
