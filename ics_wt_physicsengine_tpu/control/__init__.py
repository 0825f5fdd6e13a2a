"""
In-graph closed-loop control (TPU-native; reference roadmap Phase 2).

The reference plant contains zero control logic by design (reference
README.md:22) and names ``wt_simulator.control.pid`` / advanced control as
its own roadmap (reference README.md:432-439). This package delivers that
layer the TPU way: controllers are pure scan-carried transforms that run
*inside* the jitted rollout with the physics and instruments, so the
framework's batch throughput applies to the closed loop — a 4096-gain PID
sweep is one device scan, gradient tuning differentiates through the
plant, and shooting MPC re-plans inside the same jit.

Layers:
  - ``pid``: pure PID (bit-matched to the socket controller in
    examples/pid_controller.py).
  - ``closed_loop``: controller+plant scan with orchestrator-parity
    command validation; true-state or full-instrument observation.
  - ``tuning``: batched gain sweeps and multi-start gradient tuning.
  - ``mpc``: receding-horizon shooting MPC for dosing programs.
  - ``estimator``: per-channel scalar Kalman filters for real
    instruments (NaN-robust).
  - ``ekf``: full-state extended Kalman filter — reconstructs every
    zone (measured or not) from the boundary taps, with the plant's own
    ``jax.jacfwd`` Jacobian as the process model.
  - ``enkf``: ensemble Kalman filter — the same full-state estimate by
    Monte-Carlo: a vmapped member batch replaces the Jacobian and the
    explicit covariance, scaling to state sizes where O(n²) won't.
  - ``mhe``: moving-horizon estimation — the optimization member of
    the ladder: each tick re-solves the window-start state by Adam
    through the nonlinear N-step rollout (hard bounds respected in
    the optimization, smoothing re-interprets past measurements).

The external HIL path (a real controller over Modbus/TCP) is unchanged —
this package is for tuning/designing those controllers before deployment.
"""

from ics_wt_physicsengine_tpu.control.closed_loop import (
    DualPIDCarry,
    DualPIDGains,
    apply_commands,
    dual_pid_controller,
    make_dual_pid_carry,
    observe_true,
    rollout_closed_loop,
    validate_commands,
)
from ics_wt_physicsengine_tpu.control.enkf import (
    EnKFCarry,
    ensemble_spread,
    make_enkf,
    make_enkf_carry,
)
from ics_wt_physicsengine_tpu.control.ekf import (
    EKFCarry,
    ekf_observer,
    flatten_state,
    make_augmented_carry,
    make_augmented_ekf,
    make_ekf,
    make_ekf_carry,
    nis_fault_monitor,
    tap_index,
    tss_index,
    unflatten_state,
)
from ics_wt_physicsengine_tpu.control.mhe import (
    MHECarry,
    make_mhe,
    make_mhe_carry,
)
from ics_wt_physicsengine_tpu.control.estimator import (
    KalmanCarry,
    KalmanParams,
    filtered_controller,
    kalman_step,
    make_kalman_carry,
    make_kalman_params,
)
from ics_wt_physicsengine_tpu.control.mpc import (
    mpc_plan,
    run_mpc,
    run_mpc_output_feedback,
)
from ics_wt_physicsengine_tpu.control.pid import (
    PIDCarry,
    PIDGains,
    make_gains,
    make_pid_carry,
    pid_step,
)
from ics_wt_physicsengine_tpu.control.tuning import (
    gain_sweep,
    make_gain_grid,
    n_gains,
    robust_gain_sweep,
    tracking_scores,
    tune_pid_gradient,
)

__all__ = [
    "PIDCarry", "PIDGains", "make_gains", "make_pid_carry", "pid_step",
    "DualPIDCarry", "DualPIDGains", "apply_commands",
    "dual_pid_controller", "make_dual_pid_carry", "observe_true",
    "rollout_closed_loop", "validate_commands",
    "gain_sweep", "make_gain_grid", "n_gains", "robust_gain_sweep",
    "tracking_scores", "tune_pid_gradient",
    "mpc_plan", "run_mpc", "run_mpc_output_feedback",
    "KalmanCarry", "KalmanParams", "filtered_controller", "kalman_step",
    "make_kalman_carry", "make_kalman_params",
    "EKFCarry", "ekf_observer", "flatten_state", "make_augmented_carry",
    "make_augmented_ekf", "make_ekf", "make_ekf_carry",
    "nis_fault_monitor", "tap_index", "tss_index", "unflatten_state",
    "EnKFCarry", "ensemble_spread", "make_enkf", "make_enkf_carry",
    "MHECarry", "make_mhe", "make_mhe_carry",
]
