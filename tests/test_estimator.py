"""Measurement filtering (control/estimator.py): scalar Kalman on noisy
instrument streams, NaN-dropout handling, and composition with the
closed loop over the REAL sensor suite."""

import numpy as np

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu import control as C
from ics_wt_physicsengine_tpu.control.estimator import (
    filtered_controller,
    kalman_step,
    make_kalman_carry,
    make_kalman_params,
)
from ics_wt_physicsengine_tpu.core import reactor as R

F64 = jnp.float64


def test_kalman_beats_raw_readings():
    """Tracking a slowly varying truth through noisy samples: the filter's
    MSE must beat the raw measurements' MSE."""
    rng = np.random.default_rng(0)
    n, dt = 400, 1.0
    truth = 2.0 + 0.3 * np.sin(np.arange(n) * 2 * np.pi / 200.0)
    meas = truth + rng.normal(0.0, 0.1, n)

    kp = make_kalman_params(q=1e-4, r=0.1 ** 2, dtype=F64)
    carry = make_kalman_carry(dtype=F64)
    est = []
    for z in meas:
        carry, x = kalman_step(kp, carry, jnp.float64(z), dt)
        est.append(float(x))
    est = np.asarray(est)
    mse_raw = np.mean((meas[50:] - truth[50:]) ** 2)
    mse_kf = np.mean((est[50:] - truth[50:]) ** 2)
    assert mse_kf < 0.4 * mse_raw


def test_kalman_nan_dropouts():
    """NaN measurements (air bubble / open circuit) skip the update:
    the estimate holds, variance grows, and recovery is seamless."""
    kp = make_kalman_params(q=1e-3, r=0.01, dtype=F64)
    carry = make_kalman_carry(dtype=F64)
    carry, x = kalman_step(kp, carry, jnp.float64(5.0), 1.0)
    assert float(x) == 5.0          # first sample seeds directly
    p_before = float(carry.p)
    carry, x = kalman_step(kp, carry, jnp.float64(np.nan), 1.0)
    assert float(x) == 5.0          # held through the dropout
    assert float(carry.p) > p_before
    carry, x = kalman_step(kp, carry, jnp.float64(5.2), 1.0)
    assert np.isfinite(float(x)) and 5.0 < float(x) <= 5.2


def test_filtered_pid_reduces_actuator_churn():
    """Closed loop on the REAL instrument suite: Kalman-filtering the
    chlorine reading before the PID cuts command-to-command churn
    (actuator wear) while keeping comparable tracking."""
    from ics_wt_physicsengine_tpu.models.plant import make_plant

    # start AT the setpoint: the loop regulates around steady dosing, so
    # commands respond to measurement noise instead of sitting on the
    # saturation rail (where churn is trivially zero)
    config = R.ReactorConfiguration(n_zones=4, initial_chlorine=2.0,
                                    flow_rate=20.0)
    params, plant = make_plant(config, seed=5, dtype=jnp.float32)
    dt, n_steps = 30.0, 80
    substeps = R.default_substeps(config, dt)
    gains = C.DualPIDGains(
        chlorine=C.make_gains(1.5, 0.05, 0.0, 2.0, 0.0, 1.0),
        ph=C.make_gains(-0.8, -0.05, 0.0, 7.0, 0.0, 2.0))
    bc = R.BoundaryConditions(inlet_flow_rate=20.0)

    def churn(traj):
        cmd = np.asarray(traj["cmd:chlorine_flow_rate"])
        return float(np.mean(np.abs(np.diff(cmd)))), \
            float(np.asarray(traj["chlorine_outlet"])[-10:].mean())

    _, _, _, raw_traj = C.rollout_closed_loop(
        params, plant, bc, C.dual_pid_controller, gains,
        C.make_dual_pid_carry((), jnp.float32), dt=dt, substeps=substeps,
        n_steps=n_steps, observe="sensors",
        record_obs=("chlorine_outlet",))

    kp = make_kalman_params(q=2e-5, r=0.05 ** 2)
    wrapped = filtered_controller(C.dual_pid_controller,
                                  {"chlorine_outlet": kp})
    carry = (C.make_dual_pid_carry((), jnp.float32),
             {"chlorine_outlet": make_kalman_carry(dtype=jnp.float32)})
    _, _, _, kf_traj = C.rollout_closed_loop(
        params, plant, bc, wrapped, gains, carry, dt=dt,
        substeps=substeps, n_steps=n_steps, observe="sensors",
        record_obs=("chlorine_outlet",))

    raw_churn, raw_track = churn(raw_traj)
    kf_churn, kf_track = churn(kf_traj)
    assert kf_churn < raw_churn          # smoother actuator
    # comparable terminal tracking (both loops converge near setpoint)
    assert abs(kf_track - 2.0) < 0.5 and abs(raw_track - 2.0) < 0.5


def test_batched_kalman_lanes():
    kp = make_kalman_params(q=1e-4, r=0.01)
    carry = make_kalman_carry((8,))
    z = jnp.linspace(1.0, 2.0, 8)
    carry, x = kalman_step(kp, carry, z, 1.0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(z), rtol=1e-6)
    assert carry.x.shape == (8,)
