"""RKC2 stabilized integrator: order, stability planning, and trajectory
accuracy vs the reference's Radau (the same oracle that calibrated RK4's
lambda*h <= 1.8 policy). RKC2 is the *throughput* integrator — documented
envelope ~2e-6 pH / ~1e-4 mg/L Cl (fuzzed over 12 random configs), vs RK4's
1e-6 regression parity."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.ops.integrators import (
    integrate_rkc,
    rkc2_step,
    rkc_plan,
)


# ---------------------------------------------------------------------------
# Scheme properties on model problems
# ---------------------------------------------------------------------------

def test_rkc2_second_order_convergence():
    lam = 1.0
    f = lambda y: -lam * y  # noqa: E731
    exact = math.exp(-lam)
    errs = []
    for h in (0.25, 0.125, 0.0625):
        y = jnp.asarray(1.0, jnp.float64)
        for _ in range(int(round(1 / h))):
            y = rkc2_step(f, y, h, 4)
        errs.append(abs(float(y) - exact))
    # halving h must shrink the error ~4x (2nd order)
    assert errs[0] / errs[1] > 3.0
    assert errs[1] / errs[2] > 3.0


def test_rkc2_stability_span_grows_quadratically():
    """A lambda far beyond RK4's 2.785 limit must stay stable inside the
    ~0.65 s^2 Chebyshev span."""
    f = lambda y: -20.0 * y  # noqa: E731   lambda*h = 20 at h=1
    y = jnp.asarray(1.0, jnp.float64)
    prev = 1.0
    for _ in range(50):
        y = rkc2_step(f, y, 1.0, 7)   # span ~ 0.65*49 = 32 > 20
        # damped Chebyshev: |R| < 1 inside the span (monotone contraction,
        # not e^(-lambda h) accuracy — that's the stability/accuracy split)
        assert abs(float(y)) < prev
        prev = abs(float(y))
    assert prev < 0.05                # contracted, not exploded
    # RK4 at the same lambda*h must blow up (outside its 2.785 span)
    y4 = jnp.asarray(1.0, jnp.float64)
    from ics_wt_physicsengine_tpu.ops.integrators import rk4_step
    for _ in range(10):
        y4 = rk4_step(f, y4, 1.0)
    assert abs(float(y4)) > 1e6


def test_rkc2_pytree_state():
    f = lambda y: (-y[0], -2.0 * y[1])  # noqa: E731
    y = (jnp.asarray(1.0, jnp.float64), jnp.ones(3, jnp.float64))
    out = integrate_rkc(f, y, dt=1.0, substeps=10, stages=3)
    np.testing.assert_allclose(float(out[0]), math.exp(-1.0), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out[1]), math.exp(-2.0), rtol=1e-2)


def test_rkc_plan_modes():
    # strict caps lambda*h at 1.5 per substep
    m, s = rkc_plan(1.0, 6.0, accuracy_span=1.5)
    assert m == 4 and s == 2
    # fast exploits the quadratic span: one substep, few stages
    m, s = rkc_plan(1.0, 6.0, accuracy_span=None)
    assert m == 1 and s * s * 0.653 * 0.8 >= 6.0
    with pytest.raises(ValueError):
        rkc2_step(lambda y: y, jnp.zeros(2), 0.1, 1)


def test_default_rkc_plan_matches_stiffness():
    cfg = R.ReactorConfiguration(n_zones=20)
    m_strict, s_strict = R.default_rkc_plan(cfg, 1.0, mode="strict")
    m_fast, s_fast = R.default_rkc_plan(cfg, 1.0, mode="fast")
    assert m_fast * s_fast <= m_strict * s_strict <= \
        R.default_substeps(cfg, 1.0) * 4
    with pytest.raises(ValueError, match="mode"):
        R.default_rkc_plan(cfg, 1.0, mode="turbo")


# ---------------------------------------------------------------------------
# Trajectory accuracy vs the reference Radau oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode,tol_ph,tol_cl", [
    ("strict", 2e-6, 1e-4),
    ("fast", 3e-6, 2e-4),
])
def test_rkc_tracks_reference_radau(mode, tol_ph, tol_cl):
    from wt_simulator.core.reactor import (
        BoundaryConditions as RefBC,
        IntegratedCSTR as RefCSTR,
        ReactorConfiguration as RefConfig,
    )

    cfg = dict(volume=1000, height=2.0, diameter=0.798, n_zones=12,
               flow_rate=6.0, impeller_speed=90.0, initial_pH=7.2,
               initial_chlorine=2.0, temperature=22.0)
    bc = dict(inlet_flow_rate=6.0, inlet_pH=7.6, inlet_chlorine=0.5,
              inlet_temperature=18.0, acid_flow_rate=0.3,
              ambient_temperature=10.0, heat_loss_coefficient=60.0)

    ref = RefCSTR(RefConfig(**cfg))
    cfgo = R.ReactorConfiguration(**cfg)
    params = R.make_params(cfgo, dtype=jnp.float64)
    state = R.make_initial_state(cfgo, dtype=jnp.float64)
    m, s = R.default_rkc_plan(cfgo, 1.0, mode=mode)
    step = jax.jit(lambda p, st, b: R.step(p, st, b, dt=1.0, substeps=m,
                                           stages=s))
    worst_ph = worst_cl = 0.0
    for _ in range(40):
        rs = ref.step(1.0, RefBC(**bc))
        state = step(params, state, R.BoundaryConditions(**bc))
        worst_ph = max(worst_ph,
                       float(np.max(np.abs(np.asarray(state.pH) - rs.pH))))
        worst_cl = max(worst_cl, float(np.max(
            np.abs(np.asarray(state.chlorine) - rs.chlorine))))
    assert worst_ph < tol_ph, f"pH deviation {worst_ph:.2e}"
    assert worst_cl < tol_cl, f"Cl deviation {worst_cl:.2e}"


def test_rkc_fast_rollout_stable_high_resolution():
    """Fast mode on a 64-zone plant (lambda*dt ~ 9): the quadratic span
    covers it in ONE substep where RK4 needs 6."""
    cfg = R.ReactorConfiguration(volume=1000, height=2.0, diameter=0.798,
                                 n_zones=64, flow_rate=8.0)
    m, s = R.default_rkc_plan(cfg, 1.0, mode="fast")
    assert m * s < R.default_substeps(cfg, 1.0) * 4
    params = R.make_params(cfg, dtype=jnp.float64)
    state = R.make_initial_state(cfg, dtype=jnp.float64)
    bc = R.BoundaryConditions(inlet_flow_rate=8.0, inlet_pH=7.8,
                              inlet_chlorine=0.5, inlet_temperature=28.0)
    final, _ = jax.jit(lambda p, st, b: R.rollout(
        p, st, b, dt=1.0, substeps=m, stages=s, n_steps=200,
        record=False))(params, state, bc)
    assert np.all(np.isfinite(np.asarray(final.pH)))
    assert np.all(np.isfinite(np.asarray(final.temperature)))
    # physically sensible drift toward inlet conditions
    assert 6.5 < float(np.mean(np.asarray(final.pH))) < 8.0
