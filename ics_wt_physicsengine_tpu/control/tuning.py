"""
Batched PID tuning: thousands of gain candidates in one device scan.

This is what the framework's batch throughput is FOR (BASELINE config 4
names "controller tuning" as the Monte-Carlo workload): the physics is
natively batched, ``pid_step`` broadcasts, and the closed loop scans — so
a 4096-gain sweep is ONE jitted scan over ``[n_gains, n_zones]`` arrays
(seconds on a TPU chip) instead of 4096 socket-paced HIL sessions (hours).

Two tuners:
  - ``gain_sweep``: exhaustive/random candidate evaluation (scores every
    lane, returns the ranked table) — the PLC-commissioning workflow.
  - ``tune_pid_gradient``: jax.grad *through the closed-loop rollout*
    (physics + controller are differentiable end to end, AD through plant
    rollouts proven in tests/test_grad.py), multi-start Adam on a smooth
    tracking loss. Gradient tuning is the reference's own roadmap
    direction beyond PID (reference README.md:432-439).
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.control.closed_loop import (
    DualPIDGains, dual_pid_controller, make_dual_pid_carry,
    rollout_closed_loop)
from ics_wt_physicsengine_tpu.control.pid import PIDGains
from ics_wt_physicsengine_tpu.core import reactor as R


def make_gain_grid(kp_cl, ki_cl, kp_ph, ki_ph, cl_setpoint: float = 2.0,
                   ph_setpoint: float = 7.0, kd_cl=0.0, kd_ph=0.0,
                   dtype=jnp.float32) -> DualPIDGains:
    """Cartesian candidate grid over the two loops' (kp, ki) — the axes
    that dominate PI commissioning. Scalars broadcast; the result's leaves
    are flat ``[n_gains]`` arrays (n = len(kp_cl)*len(ki_cl)*len(kp_ph)*
    len(ki_ph))."""
    kp_cl, ki_cl, kp_ph, ki_ph = map(jnp.atleast_1d, (kp_cl, ki_cl,
                                                      kp_ph, ki_ph))
    a, b, c, d = jnp.meshgrid(kp_cl, ki_cl, kp_ph, ki_ph, indexing="ij")
    flat = lambda x: x.reshape(-1).astype(dtype)  # noqa: E731
    n = a.size
    full = lambda v: jnp.full((n,), v, dtype)  # noqa: E731
    return DualPIDGains(
        chlorine=PIDGains(kp=flat(a), ki=flat(b), kd=full(kd_cl),
                          setpoint=full(cl_setpoint), out_min=full(0.0),
                          out_max=full(1.0)),
        ph=PIDGains(kp=flat(c), ki=flat(d), kd=full(kd_ph),
                    setpoint=full(ph_setpoint), out_min=full(0.0),
                    out_max=full(2.0)))


def n_gains(gains: DualPIDGains) -> int:
    shape = jnp.shape(gains.chlorine.kp)
    return int(shape[0]) if shape else 1


def tracking_scores(traj: Dict[str, jnp.ndarray], gains: DualPIDGains,
                    dt: float, effort_weight: float = 0.0) -> jnp.ndarray:
    """Per-lane integrated-squared-error score (lower is better) over the
    two controlled variables, plus an optional control-effort penalty
    (actuator wear): ISE_cl + ISE_pH + w * integral(cmd^2) dt. Time is the
    leading trajectory axis."""
    cl_err = traj["chlorine_outlet"] - gains.chlorine.setpoint
    ph_err = traj["pH_inlet"] - gains.ph.setpoint
    score = jnp.sum(cl_err ** 2, axis=0) * dt \
        + jnp.sum(ph_err ** 2, axis=0) * dt
    if effort_weight:
        score = score + effort_weight * dt * (
            jnp.sum(traj["cmd:chlorine_flow_rate"] ** 2, axis=0)
            + jnp.sum(traj["cmd:acid_flow_rate"] ** 2, axis=0))
    return score


def _batched_plant(config: R.ReactorConfiguration, n: int, dtype):
    """One reactor broadcast to [n] lanes (identical plants, different
    gains): natively batched params stay scalar; only the state carries
    the lane axis."""
    params = R.make_params(config, dtype=dtype)
    state = R.make_initial_state(config, dtype=dtype)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x, dtype),
                                   (n,) + jnp.shape(x)), state)
    return params, state


@partial(jax.jit, static_argnames=("dt", "substeps", "n_steps", "stages",
                                   "effort_weight", "feedforward"))
def _sweep_jit(params, state, boundary, gains, carry, dt, substeps,
               n_steps, stages, effort_weight, feedforward):
    # warmup_gate=False: true-state sweeps have no warm-up zeros, and the
    # > 0 gate would permanently freeze every candidate on a plant
    # commissioned from zero residual (identical meaningless scores)
    controller = partial(dual_pid_controller, feedforward=feedforward,
                         warmup_gate=False)
    _, _, _, traj = rollout_closed_loop(
        params, state, boundary, controller, gains, carry,
        dt=dt, substeps=substeps, n_steps=n_steps, stages=stages,
        observe="true",
        record_obs=("chlorine_outlet", "pH_inlet", "flow_main"))
    return tracking_scores(traj, gains, dt, effort_weight), traj


def gain_sweep(config: R.ReactorConfiguration, gains: DualPIDGains,
               dt: float, n_steps: int,
               boundary: Optional[R.BoundaryConditions] = None,
               substeps: Optional[int] = None, stages=None,
               effort_weight: float = 0.0, feedforward: bool = False,
               dtype=jnp.float32, return_traj: bool = False) -> Dict:
    """Evaluate every gain candidate on its own closed-loop plant lane in
    one scan. Returns ``{"scores": [n], "best_index": int,
    "best": DualPIDGains (scalar leaves), "traj": optional}``.
    """
    n = n_gains(gains)
    params, state = _batched_plant(config, n, dtype)
    if substeps is None:
        substeps = R.default_substeps(config, dt)
    if boundary is None:
        boundary = R.BoundaryConditions()
    carry = make_dual_pid_carry((n,), dtype)
    scores, traj = _sweep_jit(params, state, boundary, gains, carry,
                              float(dt), int(substeps), int(n_steps),
                              stages, float(effort_weight),
                              bool(feedforward))
    best = int(jnp.argmin(scores))
    pick = jax.tree_util.tree_map(lambda x: x[best], gains)
    out = {"scores": scores, "best_index": best, "best": pick}
    if return_traj:
        out["traj"] = traj
    return out


# ---------------------------------------------------------------------------
# Gradient tuning
# ---------------------------------------------------------------------------

_TUNED_FIELDS = ("kp", "ki", "kd")


def _pack(gains: DualPIDGains):
    return {loop: {f: getattr(getattr(gains, loop), f)
                   for f in _TUNED_FIELDS} for loop in ("chlorine", "ph")}


def _unpack(gains: DualPIDGains, theta) -> DualPIDGains:
    return DualPIDGains(
        chlorine=replace(gains.chlorine, **theta["chlorine"]),
        ph=replace(gains.ph, **theta["ph"]))


def tune_pid_gradient(config: R.ReactorConfiguration, gains0: DualPIDGains,
                      dt: float, n_steps: int, iters: int = 50,
                      learning_rate: float = 0.05,
                      boundary: Optional[R.BoundaryConditions] = None,
                      substeps: Optional[int] = None, stages=None,
                      effort_weight: float = 0.0, dtype=jnp.float32) -> Dict:
    """Multi-start Adam on (kp, ki, kd) of both loops through the
    differentiable closed-loop rollout. ``gains0`` may carry a leading
    ``[n_starts]`` axis — every start descends in parallel on its own
    plant lane (the loss is a per-lane sum, so the lanes' gradients are
    independent). Setpoints and output limits are held fixed.

    Returns ``{"gains": tuned DualPIDGains, "best": scalar-leaf
    DualPIDGains of the best start, "loss_history": [iters],
    "final_scores": [n_starts]}``.
    """
    import optax

    n = n_gains(gains0)
    params, state = _batched_plant(config, n, dtype)
    if substeps is None:
        substeps = R.default_substeps(config, dt)
    if boundary is None:
        boundary = R.BoundaryConditions()
    carry0 = make_dual_pid_carry((n,), dtype)

    # straight-through clipping: forward trajectories are identical to the
    # hard-clipped controller, but gradients survive actuator saturation
    # (without this one optimizer step into a rail zeroes every gradient
    # and the tuner is stuck — see pid.st_clip)
    controller = partial(dual_pid_controller, clip_mode="straight-through",
                         warmup_gate=False)

    def scores_of(theta):
        gains = _unpack(gains0, theta)
        _, _, _, traj = rollout_closed_loop(
            params, state, boundary, controller, gains, carry0,
            dt=float(dt), substeps=int(substeps), n_steps=int(n_steps),
            stages=stages, observe="true",
            record_obs=("chlorine_outlet", "pH_inlet"))
        return tracking_scores(traj, gains, float(dt), effort_weight)

    def loss_of(theta):
        return jnp.sum(scores_of(theta))

    # Global-norm clipping + NaN scrubbing: a candidate that wanders into a
    # violently unstable closed loop mid-descent must not poison the other
    # starts' lanes (the loss sums over lanes, so one inf/NaN lane would).
    opt = optax.chain(optax.clip_by_global_norm(10.0),
                      optax.adam(learning_rate))
    theta0 = _pack(gains0)

    @jax.jit
    def run(theta):
        opt_state = opt.init(theta)

        def body(carry, _):
            theta, opt_state = carry
            loss, grads = jax.value_and_grad(loss_of)(theta)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0,
                                         neginf=0.0), grads)
            updates, opt_state = opt.update(grads, opt_state, theta)
            return (optax.apply_updates(theta, updates), opt_state), loss

        (theta, _), losses = jax.lax.scan(body, (theta, opt_state), None,
                                          length=iters)
        return theta, losses, scores_of(theta)

    theta, losses, final_scores = run(theta0)
    tuned = _unpack(gains0, theta)
    best = int(jnp.argmin(final_scores))
    pick = jax.tree_util.tree_map(lambda x: x[best] if jnp.ndim(x) else x,
                                  tuned)
    return {"gains": tuned, "best": pick, "loss_history": losses,
            "final_scores": final_scores}


def robust_gain_sweep(config: R.ReactorConfiguration, gains: DualPIDGains,
                      dt: float, n_steps: int, n_plants: int = 64,
                      seed: int = 0,
                      boundary: Optional[R.BoundaryConditions] = None,
                      substeps: Optional[int] = None, stages=None,
                      effort_weight: float = 0.0,
                      worst_weight: float = 0.5,
                      dtype=jnp.float32) -> Dict:
    """Uncertainty-ROBUST gain selection: every candidate is evaluated in
    closed loop against a Monte-Carlo ensemble of ``n_plants``
    parameter-randomized plants (models/monte_carlo.py ranges — the
    BASELINE config-4 workload), not one nominal plant. The full
    ``[n_gains * n_plants]`` grid runs as ONE natively-batched scan.

    Ranking: ``worst_weight * worst + (1 - worst_weight) * mean`` per
    candidate — gains that only work on the nominal plant lose to gains
    that transfer across the parameter envelope.

    Returns ``{"scores_mean": [G], "scores_worst": [G], "robust": [G],
    "best_index": int, "best": scalar-leaf DualPIDGains}``.
    """
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)

    G = n_gains(gains)
    if substeps is None:
        substeps = R.default_substeps(config, dt)
    if boundary is None:
        boundary = R.BoundaryConditions()
    mc_params, mc_states = make_monte_carlo_batch(config, n_plants,
                                                  seed=seed, dtype=dtype)

    def tile_plants(x):
        """[P, ...] -> [G*P, ...] (plants fastest, gains slowest)."""
        x = jnp.asarray(x)
        if x.ndim == 0:
            return x
        return jnp.tile(x, (G,) + (1,) * (x.ndim - 1))

    params_t = jax.tree_util.tree_map(tile_plants, mc_params)
    states_t = jax.tree_util.tree_map(tile_plants, mc_states)
    gains_t = jax.tree_util.tree_map(
        lambda x: jnp.repeat(jnp.asarray(x), n_plants, axis=0), gains)
    carry = make_dual_pid_carry((G * n_plants,), dtype)
    controller = partial(dual_pid_controller, warmup_gate=False)

    @partial(jax.jit, static_argnames=())
    def run(params_t, states_t, gains_t, carry):
        _, _, _, traj = rollout_closed_loop(
            params_t, states_t, boundary, controller, gains_t, carry,
            dt=float(dt), substeps=int(substeps), n_steps=int(n_steps),
            stages=stages, observe="true",
            record_obs=("chlorine_outlet", "pH_inlet"))
        lane_scores = tracking_scores(traj, gains_t, float(dt),
                                      effort_weight)
        per_gain = lane_scores.reshape(G, n_plants)
        return jnp.mean(per_gain, axis=1), jnp.max(per_gain, axis=1)

    mean_s, worst_s = run(params_t, states_t, gains_t, carry)
    robust = worst_weight * worst_s + (1.0 - worst_weight) * mean_s
    best = int(jnp.argmin(robust))
    pick = jax.tree_util.tree_map(lambda x: x[best], gains)
    return {"scores_mean": mean_s, "scores_worst": worst_s,
            "robust": robust, "best_index": best, "best": pick}
