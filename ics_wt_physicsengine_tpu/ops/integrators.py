"""
Fixed-step ODE integrators over pytrees.

TPU-first design note: the reference integrates with scipy's adaptive implicit
Radau (reference core/reactor.py:476-484), whose data-dependent step control is
host control flow — incompatible with XLA's trace-once compilation model and
wasteful on a SIMD machine where every batched plant would need its own step
sequence. The reactor's stiffness is bounded and known at trace time (the
fastest eigenvalue is set by the inter-zone exchange rate, see
``stable_substeps``), so a fixed-substep classical RK4 inside ``lax.scan``
gives Radau-level accuracy at rtol<=1e-6 for the validated configs while
keeping all plants in lockstep. Accuracy is regression-checked against the
reference Radau trajectories in tests/test_vs_reference.py.
"""

from __future__ import annotations

import math
from typing import Callable, TypeVar

import jax

T = TypeVar("T")

# RK4's real-axis stability boundary is |lambda h| < 2.785; we leave a 2x
# margin for the nonlinear chemistry terms.
RK4_STABILITY_LIMIT = 2.785
RK4_SAFETY = 0.5


def rk4_step(f: Callable[[T], T], y: T, h) -> T:
    """One classical RK4 step of dy/dt = f(y) over a pytree state."""
    ax = jax.tree_util.tree_map

    k1 = f(y)
    k2 = f(ax(lambda a, b: a + 0.5 * h * b, y, k1))
    k3 = f(ax(lambda a, b: a + 0.5 * h * b, y, k2))
    k4 = f(ax(lambda a, b: a + h * b, y, k3))
    return ax(
        lambda a, b1, b2, b3, b4: a + (h / 6.0) * (b1 + 2.0 * b2 + 2.0 * b3 + b4),
        y, k1, k2, k3, k4,
    )


def integrate_fixed(f: Callable[[T], T], y0: T, dt: float, substeps: int) -> T:
    """Advance y by dt using ``substeps`` equal RK4 steps via ``lax.scan``.

    ``dt`` and ``substeps`` are static (trace-time) values: the sequential
    loop compiles to a single fused XLA while-loop, and all batched plants
    advance in lockstep.
    """
    if substeps < 1:
        raise ValueError(f"substeps must be >= 1, got {substeps}")
    h = dt / substeps
    if substeps == 1:
        return rk4_step(f, y0, h)

    def body(y, _):
        return rk4_step(f, y, h), None

    y, _ = jax.lax.scan(body, y0, None, length=substeps)
    return y


def stable_substeps(dt: float, lambda_max: float,
                    min_h: float | None = None) -> int:
    """Choose the RK4 substep count for step size ``dt`` given the stiffest
    linear rate ``lambda_max`` [1/s] of the system.

    For the multi-zone CSTR the dominant rates are the tridiagonal exchange
    operator (spectral radius < 4 * k_exchange) plus the dilution rate Q/V;
    chemistry relaxation is orders of magnitude slower (SURVEY.md section 7).
    ``min_h`` optionally caps the substep size for accuracy (the reference
    caps Radau's max_step at min(dt, 10 s), reactor.py:481).
    """
    h_stab = RK4_SAFETY * RK4_STABILITY_LIMIT / max(lambda_max, 1e-12)
    h = min(dt, h_stab)
    if min_h is not None:
        h = min(h, min_h)
    return max(1, math.ceil(dt / h - 1e-9))


# ---------------------------------------------------------------------------
# Runge-Kutta-Chebyshev (RKC2) — stabilized explicit integrator
# ---------------------------------------------------------------------------
#
# The reactor ODE is mildly stiff: the inter-zone exchange operator
# contributes fast *decaying* linear modes (spectral radius ~ 4 k_exchange)
# while the chemistry/thermal dynamics of interest evolve orders of magnitude
# slower. RK4's real stability interval (2.785) forces the substep count to
# track the fast modes even though they carry no trajectory information once
# relaxed. RKC2 (Sommeijer-Shampine-Verwer, "RKC: an explicit solver for
# parabolic PDEs", J. Comput. Appl. Math. 88 (1997)) is the classical answer:
# an s-stage second-order scheme built on Chebyshev polynomials whose real
# stability interval grows ~ 0.65 s^2 with ~2/13 damping — so per unit of
# stiffness it needs ~s-fold fewer *sequential* derivative evaluations.
# On TPU the sequential evaluation chain is exactly what bounds rollout
# throughput (everything else is parallel), so stage count is the metric
# that matters. No reference counterpart (the reference uses scipy Radau,
# reactor.py:476-484); accuracy is regression-gated against the same Radau
# trajectories in tests/test_rkc.py before this is used anywhere.

RKC_DAMPING = 2.0 / 13.0
RKC_STABILITY_PER_S2 = 0.653   # real-axis stability ~= 0.653 * s^2 (damped)
RKC_SAFETY = 0.8


def _rkc2_coefficients(s: int):
    """Host-side (trace-time) RKC2 coefficient tables for ``s`` stages."""
    import numpy as _np

    if s < 2:
        raise ValueError(f"RKC2 needs s >= 2 stages, got {s}")
    w0 = 1.0 + RKC_DAMPING / s ** 2

    # Chebyshev T_j(w0), T_j'(w0), T_j''(w0) by recurrence.
    t = _np.zeros(s + 1)
    dt_ = _np.zeros(s + 1)
    d2t = _np.zeros(s + 1)
    t[0], t[1] = 1.0, w0
    dt_[0], dt_[1] = 0.0, 1.0
    d2t[0], d2t[1] = 0.0, 0.0
    for j in range(2, s + 1):
        t[j] = 2.0 * w0 * t[j - 1] - t[j - 2]
        dt_[j] = 2.0 * t[j - 1] + 2.0 * w0 * dt_[j - 1] - dt_[j - 2]
        d2t[j] = 4.0 * dt_[j - 1] + 2.0 * w0 * d2t[j - 1] - d2t[j - 2]

    w1 = dt_[s] / d2t[s]
    b = _np.zeros(s + 1)
    for j in range(2, s + 1):
        b[j] = d2t[j] / dt_[j] ** 2
    b[0] = b[2]
    b[1] = 1.0 / w0

    a = _np.array([1.0 - b[j] * t[j] for j in range(s + 1)])

    mu1_tilde = b[1] * w1
    mu = _np.zeros(s + 1)
    nu = _np.zeros(s + 1)
    mu_tilde = _np.zeros(s + 1)
    gamma_tilde = _np.zeros(s + 1)
    for j in range(2, s + 1):
        mu[j] = 2.0 * b[j] * w0 / b[j - 1]
        nu[j] = -b[j] / b[j - 2]
        mu_tilde[j] = 2.0 * b[j] * w1 / b[j - 1]
        gamma_tilde[j] = -a[j - 1] * mu_tilde[j]
    return mu1_tilde, mu, nu, mu_tilde, gamma_tilde


def rkc2_step(f: Callable[[T], T], y: T, h, s: int) -> T:
    """One s-stage RKC2 step of dy/dt = f(y) over a pytree state.

    ``s`` is static; the stage recurrence is unrolled at trace time (the
    coefficient tables are Python floats, so XLA folds them into the fused
    elementwise chain exactly like RK4's 1/6, 2/6 weights).
    """
    ax = jax.tree_util.tree_map
    mu1_tilde, mu, nu, mu_tilde, gamma_tilde = _rkc2_coefficients(s)

    f0 = f(y)
    y_jm2 = y
    y_jm1 = ax(lambda a_, b_: a_ + mu1_tilde * h * b_, y, f0)
    for j in range(2, s + 1):
        fj = f(y_jm1)
        c0 = 1.0 - mu[j] - nu[j]
        y_j = ax(
            lambda y0, a1, a2, fj_, f0_: c0 * y0 + mu[j] * a1 + nu[j] * a2
            + mu_tilde[j] * h * fj_ + gamma_tilde[j] * h * f0_,
            y, y_jm1, y_jm2, fj, f0,
        )
        y_jm2, y_jm1 = y_jm1, y_j
    return y_jm1


def integrate_rkc(f: Callable[[T], T], y0: T, dt: float, substeps: int,
                  stages: int) -> T:
    """Advance y by dt using ``substeps`` equal RKC2(s=stages) steps."""
    if substeps < 1:
        raise ValueError(f"substeps must be >= 1, got {substeps}")
    h = dt / substeps
    if substeps == 1:
        return rkc2_step(f, y0, h, stages)

    def body(y, _):
        return rkc2_step(f, y, h, stages), None

    y, _ = jax.lax.scan(body, y0, None, length=substeps)
    return y


def rkc_plan(dt: float, lambda_max: float, max_stages: int = 8,
             accuracy_span: float | None = 1.5):
    """Pick (substeps, stages) minimizing total sequential evaluations
    (substeps * stages) subject to lambda*h <= min(0.8 * 0.653 * s^2,
    accuracy_span).

    ``accuracy_span`` caps lambda*h per substep for *accuracy* (RKC2 is 2nd
    order; its trajectory error grows ~ (lambda*h)^2). The default 1.5 is
    calibrated the same way as RK4's 1.8 policy: against the reference Radau
    trajectories, it keeps worst-case pH deviation at the 1e-6 regression
    envelope (tests/test_rkc.py). Pass ``None`` for the stability-limited
    fast mode (full ~0.65 s^2 span): ~2-4x fewer sequential evaluations,
    deviations up to ~2e-6 pH / 1e-4 mg/L Cl — far below instrument noise,
    intended for Monte-Carlo ensemble workloads.

    Long-horizon behavior (1M-step TPU soaks): in the buffered operating
    regime (pH 6-9) the RKC-vs-RK4 steady-state gap is <1e-6 pH. In
    buffer-exhausted extremes (sustained net-acid dosing driving pH < 3,
    outside the reference's validated domain) the 2nd-order fixed-point
    offset grows to ~0.03 pH — both schemes remain stable and finite.

    Forcing sensitivity: the envelopes above hold for slowly-varying
    boundary conditions. Under adversarial per-step square-wave forcing
    (tools/fuzz_vs_reference.py --integrator rkc-strict, 40 configs), each
    BC step re-excites the fast mixing transient and the worst case grows
    to ~3e-5 pH / 2e-4 mg/L Cl — still two orders below instrument noise,
    but use RK4 when regression-grade fidelity under fast-switching
    control inputs matters."""
    best = None
    for s in range(2, max_stages + 1):
        span = RKC_SAFETY * RKC_STABILITY_PER_S2 * s ** 2
        if accuracy_span is not None:
            span = min(span, accuracy_span)
        m = max(1, math.ceil(dt * lambda_max / span - 1e-9))
        cost = m * s
        if best is None or cost < best[2]:
            best = (m, s, cost)
    return best[0], best[1]
