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

``run_mpc`` tracks a time-varying chlorine setpoint program (the
commissioning shape of examples/dosing_program_hil.py: step changes in
target residual) and is benchmarked against the tuned PID in
tests/test_mpc.py — same plant, same program, lower tracking error.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.control.closed_loop import observe_true
from ics_wt_physicsengine_tpu.control.pid import st_clip
from ics_wt_physicsengine_tpu.core import reactor as R


def _predict_cost(params, state, boundary, moves, setpoints, dt, substeps,
                  steps_per_move, stages, move_weight):
    """Cost of a candidate move sequence: ISE of predicted chlorine_outlet
    vs the setpoint program + a move-smoothness penalty. ``moves`` is
    ``[n_moves]`` chlorine_flow_rate commands, each held for
    ``steps_per_move`` physics steps; ``setpoints`` is ``[n_moves *
    steps_per_move]``."""
    # straight-through clip: candidate moves beyond the pump limits are
    # applied clipped, but the optimizer still feels which way to move them
    u = jnp.repeat(st_clip(moves, 0.0, 1.0), steps_per_move)

    def body(st, inp):
        u_t, sp_t = inp
        bc = dataclasses.replace(boundary, chlorine_flow_rate=u_t)
        st = R.step(params, st, bc, dt=dt, substeps=substeps, stages=stages)
        err = st.chlorine[..., -1] - sp_t
        return st, err ** 2

    _, sq_err = jax.lax.scan(body, state, (u, setpoints))
    smooth = jnp.sum((moves[1:] - moves[:-1]) ** 2) if moves.shape[0] > 1 \
        else 0.0
    return jnp.sum(sq_err) * dt + move_weight * smooth


@partial(jax.jit, static_argnames=("dt", "substeps", "steps_per_move",
                                   "stages", "iters"))
def mpc_plan(params, state: R.ReactorState, boundary: R.BoundaryConditions,
             setpoints: jnp.ndarray, moves0: jnp.ndarray, dt: float,
             substeps: int, steps_per_move: int, stages=None,
             iters: int = 30, learning_rate: float = 0.08,
             move_weight: float = 0.05):
    """Optimize a chlorine-dosing move sequence over the horizon by Adam on
    the shooting cost. ``setpoints``: per-step targets over the horizon
    (``len(moves0) * steps_per_move``). Returns ``(moves, cost_history)``.
    """
    import optax

    cost = partial(_predict_cost, params, state, boundary,
                   setpoints=setpoints, dt=dt, substeps=substeps,
                   steps_per_move=steps_per_move, stages=stages,
                   move_weight=move_weight)
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
    return jnp.clip(moves, 0.0, 1.0), costs


def run_mpc(config: R.ReactorConfiguration, setpoint_program: jnp.ndarray,
            dt: float, horizon_moves: int = 8, steps_per_move: int = 15,
            replan_every: Optional[int] = None, iters: int = 30,
            learning_rate: float = 0.08, move_weight: float = 0.05,
            boundary: Optional[R.BoundaryConditions] = None,
            substeps: Optional[int] = None, stages=None,
            dtype=jnp.float32) -> Dict:
    """Receding-horizon chlorine-residual control of the true plant.

    ``setpoint_program``: per-step chlorine_outlet targets, length
    ``n_steps`` (the dosing *program* being commissioned). Every
    ``replan_every`` steps (default: one move length) the controller
    re-plans ``horizon_moves`` moves against the setpoint program ahead
    (the program is edge-padded past its end), applies the plan until the
    next re-plan, and the plant advances — all inside one jitted outer
    scan. Returns the applied commands, the realized chlorine_outlet
    trajectory, and the tracking score (comparable to
    ``tuning.tracking_scores`` on the chlorine loop alone).
    """
    setpoint_program = jnp.asarray(setpoint_program, dtype)
    n_steps = int(setpoint_program.shape[0])
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
    # program lookahead table: padded so the last horizons see a held value
    padded = jnp.concatenate(
        [setpoint_program,
         jnp.full((horizon,), setpoint_program[-1], dtype)])
    n_outer = n_steps // replan_every

    @partial(jax.jit, static_argnames=())
    def outer(state):
        def body(carry, k):
            st, moves_prev = carry
            sp_h = jax.lax.dynamic_slice(padded, (k * replan_every,),
                                         (horizon,))
            moves, _ = mpc_plan(params, st, boundary, sp_h, moves_prev,
                                dt=float(dt), substeps=int(substeps),
                                steps_per_move=int(steps_per_move),
                                stages=stages, iters=int(iters),
                                learning_rate=learning_rate,
                                move_weight=move_weight)
            # apply the head of the plan for replan_every steps
            u_applied = jnp.repeat(moves, steps_per_move)[:replan_every]

            def inner(st, u_t):
                bc = dataclasses.replace(boundary,
                                         chlorine_flow_rate=u_t)
                st = R.step(params, st, bc, dt=float(dt),
                            substeps=int(substeps), stages=stages)
                return st, st.chlorine[..., -1]

            st, cl_traj = jax.lax.scan(inner, st, u_applied)
            # warm-start the next re-plan with the plan shifted one move
            shifted = jnp.concatenate([moves[1:], moves[-1:]]) \
                if replan_every == steps_per_move else moves
            return (st, shifted), (u_applied, cl_traj)

        moves0 = jnp.full((horizon_moves,), 0.2, dtype)
        (st, _), (u, cl) = jax.lax.scan(body, (state, moves0),
                                        jnp.arange(n_outer))
        return st, u.reshape(-1), cl.reshape(-1)

    state, u, cl = outer(state)
    err = cl - setpoint_program
    return {"commands": u, "chlorine_outlet": cl,
            "score": float(jnp.sum(err ** 2) * dt),
            "final_state": state, "observe": observe_true(state)}
