"""
Measurement filtering for closed-loop control on REAL instruments.

The tuners run against noise-free true-state observation; a deployed
controller sees the instrument suite — noise, NaN dropouts (air bubbles,
open/short faults), drift. Feeding raw readings to a PID turns
measurement noise into actuator churn (pump wear) and a single NaN into a
frozen loop tick. This module provides the standard fix as a pure
scan-carried transform that composes with ``rollout_closed_loop``:

- ``kalman_step``: scalar Kalman filter with a random-walk process model
  (state x_t = x_{t-1} + w, w ~ N(0, Q dt); measurement z = x + v,
  v ~ N(0, R)). Q encodes how fast the process genuinely moves, R the
  instrument variance (sensor ``precision`` squared is the natural
  default). NaN measurements are handled exactly like a missing sample:
  the time update runs (variance grows), the measurement update is
  skipped — so dropouts widen uncertainty instead of poisoning the state.
- ``filtered_controller``: wraps any controller so named observations
  pass through per-lane Kalman filters before the control law.

No reference counterpart (the reference has no controller at all); this
is the estimator leg of its "advanced control methods" roadmap direction
(reference README.md:432-439).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class KalmanParams:
    q: jnp.ndarray          # process noise PSD [unit^2 / s]
    r: jnp.ndarray          # measurement variance [unit^2]


@jax.tree_util.register_dataclass
@dataclass
class KalmanCarry:
    x: jnp.ndarray          # state estimate
    p: jnp.ndarray          # estimate variance
    initialized: jnp.ndarray  # bool: first finite measurement seeds x


def make_kalman_params(q: float, r: float, dtype=jnp.float32
                       ) -> KalmanParams:
    return KalmanParams(q=jnp.asarray(q, dtype), r=jnp.asarray(r, dtype))


def make_kalman_carry(batch_shape=(), x0: float = 0.0, p0: float = 1e6,
                      dtype=jnp.float32) -> KalmanCarry:
    return KalmanCarry(x=jnp.full(batch_shape, x0, dtype),
                       p=jnp.full(batch_shape, p0, dtype),
                       initialized=jnp.zeros(batch_shape, bool))


def kalman_step(params: KalmanParams, carry: KalmanCarry, z, dt: float
                ) -> Tuple[KalmanCarry, jnp.ndarray]:
    """One predict+update of the scalar random-walk Kalman filter.

    Returns ``(carry', x_hat)``. Non-finite ``z`` skips the measurement
    update (prediction only — variance grows by Q dt). The first finite
    measurement initializes the state directly (no transient from an
    arbitrary prior)."""
    z = jnp.asarray(z)
    finite = jnp.isfinite(z)
    # time update (random walk)
    p_pred = carry.p + params.q * dt
    # measurement update, masked on finiteness
    k = p_pred / (p_pred + params.r)
    z_safe = jnp.where(finite, z, 0.0)
    x_upd = carry.x + k * (z_safe - carry.x)
    p_upd = (1.0 - k) * p_pred
    # first finite sample seeds the filter
    x_new = jnp.where(finite,
                      jnp.where(carry.initialized, x_upd, z_safe),
                      carry.x)
    p_new = jnp.where(finite,
                      jnp.where(carry.initialized, p_upd, params.r),
                      p_pred)
    init = carry.initialized | finite
    new = KalmanCarry(x=x_new, p=p_new, initialized=init)
    return new, x_new


def filtered_controller(controller: Callable,
                        filters: Dict[str, KalmanParams]):
    """Wrap ``controller(gains, carry, obs, dt)`` so the observations
    named in ``filters`` are Kalman-filtered before the control law.

    The wrapped carry is ``(ctrl_carry, {name: KalmanCarry})`` — build the
    filter carries with ``make_kalman_carry(batch_shape)`` matching the
    loop's batch. Composes directly with ``rollout_closed_loop``:

        wrapped = filtered_controller(dual_pid_controller,
                                      {"chlorine_outlet": kp})
        carry = (make_dual_pid_carry(...),
                 {"chlorine_outlet": make_kalman_carry(...)})
        rollout_closed_loop(..., wrapped, gains, carry, ...)
    """

    def step(gains, carry, obs, dt):
        ctrl_carry, kf_carries = carry
        new_kf = {}
        filtered = dict(obs)
        for name, kp in filters.items():
            new_kf[name], filtered[name] = kalman_step(
                kp, kf_carries[name], obs[name], dt)
        ctrl_carry, commands = controller(gains, ctrl_carry, filtered, dt)
        return (ctrl_carry, new_kf), commands

    return step
