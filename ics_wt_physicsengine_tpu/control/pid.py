"""
In-graph PID: a pure, jittable, batchable, differentiable PID transform.

The reference plant deliberately contains zero control logic (reference
README.md:22, core/__init__.py:75-82) and lists ``wt_simulator.control.pid``
as its own Phase-2 roadmap item (reference README.md:432-439). This module
delivers that item TPU-natively: ``pid_step`` is a pure function over a
tiny carry pytree, so it scans with the plant inside one jit
(control/closed_loop.py), vmaps/broadcasts over a ``[n_gains]`` axis for
tuning sweeps (control/tuning.py), and differentiates for gradient tuning.

Semantics are bit-matched (same order of operations, same float comparisons)
to the host-side controller in ``examples/pid_controller.py::PID`` — the
discrete PID with anti-windup clamping that the closed-loop HIL tests drive
over a real Modbus socket — so an in-graph sweep result transfers verbatim
to gains deployed in an external PLC/SCADA master.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PIDGains:
    """Controller parameters as a pytree of arrays: every field may carry a
    leading batch axis (a ``[n_gains]`` sweep) or be a traced value (for
    jax.grad gradient tuning)."""

    kp: jnp.ndarray
    ki: jnp.ndarray
    kd: jnp.ndarray
    setpoint: jnp.ndarray
    out_min: jnp.ndarray
    out_max: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclass
class PIDCarry:
    """Scan-carried controller state (examples/pid_controller.py's
    ``integral`` / ``prev_error`` members; ``has_prev`` encodes the host
    version's ``prev_error is None`` first-call branch)."""

    integral: jnp.ndarray
    prev_error: jnp.ndarray
    has_prev: jnp.ndarray     # bool


def make_gains(kp: float, ki: float, kd: float, setpoint: float,
               out_min: float, out_max: float, dtype=jnp.float32
               ) -> PIDGains:
    a = lambda x: jnp.asarray(x, dtype)  # noqa: E731
    return PIDGains(kp=a(kp), ki=a(ki), kd=a(kd), setpoint=a(setpoint),
                    out_min=a(out_min), out_max=a(out_max))


def make_pid_carry(batch_shape=(), dtype=jnp.float32) -> PIDCarry:
    return PIDCarry(integral=jnp.zeros(batch_shape, dtype),
                    prev_error=jnp.zeros(batch_shape, dtype),
                    has_prev=jnp.zeros(batch_shape, bool))


_ST_CLIP_LEAK = 0.1


@jax.custom_jvp
def st_clip(x, lo, hi):
    """Leaky straight-through clip: forward = jnp.clip; backward passes the
    tangent scaled by 1 in-range and by ``_ST_CLIP_LEAK`` when saturated.

    Gradient-based tuning (control/tuning.py, control/mpc.py) needs
    gradients to survive actuator saturation: with a hard clip, a rollout
    whose command rails at a limit has exactly zero gradient w.r.t. the
    gains — one bad optimizer step into the rail and the tuner is stuck
    there forever (a dead zone). A FULL straight-through (backward =
    identity) fixes that but creates the opposite failure in a closed
    loop: the tangent system becomes the *unclipped* loop, which for
    aggressive gains is linearly unstable, and 40+ scan steps of
    exponential tangent growth overflow to NaN gradients. The leak keeps
    the local escape direction alive at the rail while damping the
    recurrent tangent by 10x per saturated step, which keeps long-rollout
    gradients finite (observed: full STE NaNs at kp_ph=-2 over 40x121
    f32 steps; leak 0.1 stays finite)."""
    return jnp.clip(x, lo, hi)


@st_clip.defjvp
def _st_clip_jvp(primals, tangents):
    x, lo, hi = primals
    dx, _, _ = tangents
    in_range = ((x >= lo) & (x <= hi)).astype(dx.dtype)
    scale = in_range + _ST_CLIP_LEAK * (1.0 - in_range)
    return jnp.clip(x, lo, hi), dx * scale


@jax.custom_jvp
def ste_clip(x, lo, hi):
    """FULL straight-through clip: forward = jnp.clip, backward =
    identity.

    The estimation-side counterpart of :func:`st_clip`. A Kalman
    filter's process Jacobian must be the physical sensitivity at the
    nearest FEASIBLE point: any tangent discount at the bound scales the
    state's self-transition F(i,i) below 1, and the covariance predict
    then multiplies P(i,i) by that factor SQUARED every step — a leak of
    0.1 collapses an unmeasured state's variance 100x per step the
    moment its estimate wanders out of range, silently killing the
    filter (observed on wall-film soft-sensing: one noisy update pushes
    the film estimate below zero and the filter permanently reads
    "clean tank"). st_clip's leak exists to damp *recurrent closed-loop
    tangents* over long differentiated rollouts; an EKF relinearizes
    every step, so the instability the leak guards against cannot
    accumulate here."""
    return jnp.clip(x, lo, hi)


@ste_clip.defjvp
def _ste_clip_jvp(primals, tangents):
    x, lo, hi = primals
    dx, _, _ = tangents
    return jnp.clip(x, lo, hi), dx


def pid_step(gains: PIDGains, carry: PIDCarry, measurement, dt: float,
             active=None, clip_mode: str = "hard"):
    """One discrete PID update -> ``(new_carry, command)``.

    Matches ``examples/pid_controller.py::PID.update`` operation for
    operation: error, integral accumulation, first-call derivative = 0,
    output clamp to [out_min, out_max], and the anti-windup rule that
    un-accumulates the integral whenever the clamp engaged (compared with
    the exact float ``!=`` the host version uses).

    ``active`` (optional bool mask): where False, the carry passes through
    unchanged and the command is 0 — the in-graph form of the host loop's
    "sensor still warming up -> hold output at zero, don't tick the PID"
    gate (``if cl_out > 0.0:``). NaN measurements make ``active`` False
    via any comparison, so a faulted reading freezes rather than poisons
    the controller.

    ``clip_mode``: ``"hard"`` (default, exact host semantics) or
    ``"straight-through"`` (identical forward values, saturation-proof
    gradients — what the gradient tuners use; see ``st_clip``).
    """
    error = gains.setpoint - measurement
    integral = carry.integral + error * dt
    derivative = jnp.where(carry.has_prev,
                           (error - carry.prev_error) / dt, 0.0)
    out = gains.kp * error + gains.ki * integral + gains.kd * derivative
    clip = jnp.clip if clip_mode == "hard" else st_clip
    clamped = clip(out, gains.out_min, gains.out_max)
    # anti-windup: identical float comparison to the host PID
    integral = jnp.where(clamped != out, integral - error * dt, integral)

    new_carry = PIDCarry(integral=integral, prev_error=error,
                         has_prev=jnp.ones_like(carry.has_prev))
    if active is None:
        return new_carry, clamped

    active = jnp.asarray(active)
    sel = lambda n, o: jnp.where(active, n, o)  # noqa: E731
    gated = PIDCarry(integral=sel(new_carry.integral, carry.integral),
                     prev_error=sel(new_carry.prev_error, carry.prev_error),
                     has_prev=sel(new_carry.has_prev, carry.has_prev))
    return gated, jnp.where(active, clamped, jnp.zeros_like(clamped))
