"""
Moving-horizon estimation (control/mhe.py).

Same bar as the EKF/EnKF suites: reconstruct UNMEASURED interior zones
from noisy boundary taps, beat open-loop rollout from the same wrong
guess, survive NaN dropouts, agree with the EKF where both are valid —
plus the MHE-specific claims: hard state bounds are respected by the
OPTIMIZATION (not post-hoc clipping), and the step jits/scans/vmaps
like every other estimator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.control import (
    flatten_state,
    make_ekf,
    make_ekf_carry,
    make_mhe,
    make_mhe_carry,
    tap_index,
)
from ics_wt_physicsengine_tpu.core import reactor as R

Z = 6
DT = 30.0
H = 6
TAPS = [("pH", 0), ("pH", -1), ("chlorine", -1), ("temperature", -1)]
SIGMA = np.array([0.02, 0.02, 0.02, 0.05])
P0 = (0.04, 1.0, 4.0)


def _plant():
    config = R.ReactorConfiguration(
        volume=1000.0, n_zones=Z, flow_rate=5.0, initial_pH=7.2,
        initial_chlorine=2.0, temperature=20.0)
    params = R.make_params(config, dtype=jnp.float64)
    substeps = R.default_substeps(config, DT)
    boundary = R.BoundaryConditions(
        inlet_flow_rate=5.0, inlet_pH=7.5, inlet_chlorine=0.5,
        inlet_temperature=18.0, acid_flow_rate=0.1,
        acid_concentration=0.1, chlorine_flow_rate=0.2)
    return config, params, substeps, boundary


def _truth_state(config):
    st = R.make_initial_state(config, dtype=jnp.float64)
    return R.ReactorState(
        time=st.time,
        pH=jnp.linspace(6.8, 7.6, Z).astype(st.pH.dtype),
        chlorine=jnp.linspace(3.0, 1.2, Z).astype(st.pH.dtype),
        temperature=jnp.linspace(22.0, 19.0, Z).astype(st.pH.dtype),
        flow_rate=st.flow_rate).update_derived()


def _wrong_guess(config):
    st = R.make_initial_state(config, dtype=jnp.float64)
    return R.ReactorState(
        time=st.time,
        pH=jnp.full(Z, 7.0, st.pH.dtype),
        chlorine=jnp.full(Z, 0.5, st.pH.dtype),
        temperature=jnp.full(Z, 17.0, st.pH.dtype),
        flow_rate=st.flow_rate).update_derived()


def _measure(truth, rng, nan_mask=None):
    z = np.array([float(flatten_state(truth)[tap_index(f, zz, Z)])
                  for f, zz in TAPS])
    z = z + rng.normal(0.0, SIGMA)
    if nan_mask is not None:
        z = np.where(nan_mask, np.nan, z)
    return jnp.asarray(z)


def _mid_cl_error(x, truth):
    mid = Z // 2
    return abs(float(x[tap_index("chlorine", mid, Z)])
               - float(truth.chlorine[mid]))


def _run(n_steps=25, nan_mask_fn=None, seed=0, **mhe_kw):
    config, params, substeps, boundary = _plant()
    truth = _truth_state(config)
    kw = dict(horizon=H, prior_variance=P0,
              measurement_noise=SIGMA**2, iters=20,
              learning_rate=0.08)
    kw.update(mhe_kw)
    mhe_step = make_mhe(params, Z, TAPS, DT, substeps, **kw)
    carry = make_mhe_carry(_wrong_guess(config), kw["horizon"],
                           len(TAPS), boundary)
    rng = np.random.default_rng(seed + 1)
    errors = []
    for k in range(n_steps):
        truth = R.step(params, truth, boundary, DT, substeps)
        mask = nan_mask_fn(k) if nan_mask_fn else None
        z = _measure(truth, rng, mask)
        carry, x = mhe_step(carry, z, boundary)
        errors.append(_mid_cl_error(x, truth))
    return errors, carry, truth, x


@pytest.fixture(scope="module")
def converged():
    """One shared assimilation drive (the expensive part)."""
    return _run(n_steps=25)


def test_reconstructs_unmeasured_midzone(converged):
    errors, *_ = converged
    assert errors[-1] < 0.1          # mid-zone Cl has NO instrument
    assert errors[-1] < 0.1 * errors[0] + 0.02


def test_beats_open_loop(converged):
    """Open-loop rollout from the same wrong guess never recovers the
    2.5 mg/L chlorine offset on this horizon; MHE does."""
    errors, carry, truth, x = converged
    config, params, substeps, boundary = _plant()
    st = _wrong_guess(config)
    for _ in range(25):
        st = R.step(params, st, boundary, DT, substeps)
    mid = Z // 2
    open_err = abs(float(st.chlorine[mid]) - float(truth.chlorine[mid]))
    assert errors[-1] < 0.3 * open_err


def test_nan_dropout_keeps_estimating(converged):
    """The chlorine tap drops out every other step; the window's
    remaining measurements still converge the estimate."""
    mask = np.zeros(len(TAPS), bool)
    mask[2] = True
    errors, *_ = _run(n_steps=25,
                      nan_mask_fn=lambda k: mask if k % 2 else None)
    assert errors[-1] < 0.3 * errors[0] + 0.05
    assert np.isfinite(errors).all()


def test_all_nan_step_stays_finite():
    """A step with every channel NaN is pure prior propagation —
    finite, in-domain, no poisoning of later updates."""
    def mask_fn(k):
        return np.ones(len(TAPS), bool) if k == 10 else None
    errors, carry, truth, x = _run(n_steps=15, nan_mask_fn=mask_fn)
    assert np.isfinite(errors).all()
    assert np.isfinite(np.asarray(x)).all()


def test_agrees_with_ekf():
    """On the same measurement stream the MHE estimate tracks the
    EKF's (both converge to truth; they agree to the noise floor)."""
    config, params, substeps, boundary = _plant()
    truth = _truth_state(config)
    mhe_step = make_mhe(params, Z, TAPS, DT, substeps, horizon=H,
                        prior_variance=P0, measurement_noise=SIGMA**2,
                        iters=20, learning_rate=0.08)
    m_carry = make_mhe_carry(_wrong_guess(config), H, len(TAPS),
                             boundary)
    ekf_step = make_ekf(params, Z, TAPS, DT, substeps,
                        process_noise=(1e-7, 1e-6, 1e-5),
                        measurement_noise=SIGMA**2)
    e_carry = make_ekf_carry(_wrong_guess(config), p0=P0, n_zones=Z)
    rng = np.random.default_rng(7)
    for k in range(25):
        truth = R.step(params, truth, boundary, DT, substeps)
        z = _measure(truth, rng)
        m_carry, x_mhe = mhe_step(m_carry, z, boundary)
        e_carry, x_ekf = ekf_step(e_carry, z, boundary)
    cl = slice(tap_index("chlorine", 0, Z),
               tap_index("chlorine", Z - 1, Z) + 1)
    d = np.abs(np.asarray(x_mhe)[cl] - np.asarray(x_ekf)[cl])
    assert d.max() < 0.15


def test_hard_bounds_respected_in_optimization():
    """Truth sits AT the chlorine floor (0 mg/L). The MHE estimate
    never goes negative — the bound is enforced inside the optimizer,
    not by clipping a negative answer after the fact."""
    config, params, substeps, boundary = _plant()
    st0 = R.make_initial_state(config, dtype=jnp.float64)
    truth = R.ReactorState(
        time=st0.time, pH=jnp.full(Z, 7.2, jnp.float64),
        chlorine=jnp.zeros(Z, jnp.float64),
        temperature=jnp.full(Z, 20.0, jnp.float64),
        flow_rate=st0.flow_rate).update_derived()
    import dataclasses
    bc = dataclasses.replace(boundary, chlorine_flow_rate=0.0,
                             inlet_chlorine=0.0)
    mhe_step = make_mhe(params, Z, TAPS, DT, substeps, horizon=H,
                        prior_variance=P0, measurement_noise=SIGMA**2,
                        iters=20, learning_rate=0.08)
    carry = make_mhe_carry(_wrong_guess(config), H, len(TAPS), bc)
    rng = np.random.default_rng(3)
    cl = slice(tap_index("chlorine", 0, Z),
               tap_index("chlorine", Z - 1, Z) + 1)
    for k in range(12):
        truth = R.step(params, truth, bc, DT, substeps)
        z = _measure(truth, rng)        # Cl reading = noise around 0
        carry, x = mhe_step(carry, z, bc)
        assert float(np.asarray(x)[cl].min()) >= 0.0
        assert float(np.asarray(carry.x0)[cl].min()) >= 0.0
    assert float(np.asarray(x)[cl].max()) < 0.2


def test_scan_and_vmap_compatible():
    """A 6-step assimilation window as one jitted scan, and a 2-filter
    vmapped bank."""
    config, params, substeps, boundary = _plant()
    mhe_step = make_mhe(params, Z, TAPS, DT, substeps, horizon=4,
                        prior_variance=P0, measurement_noise=SIGMA**2,
                        iters=5, learning_rate=0.08)
    carry = make_mhe_carry(_wrong_guess(config), 4, len(TAPS),
                           boundary)

    @jax.jit
    def window(carry, zs):
        return jax.lax.scan(
            lambda c, z: mhe_step(c, z, boundary), carry, zs)

    zs = jnp.broadcast_to(jnp.asarray([7.2, 7.5, 1.5, 19.0],
                                      jnp.float64), (6, 4))
    carry2, xs = window(carry, zs)
    assert xs.shape == (6, 3 * Z)
    assert bool(jnp.all(jnp.isfinite(xs)))

    bank = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (2,) + a.shape).copy(), carry)
    zb = jnp.broadcast_to(jnp.asarray([7.2, 7.5, 1.5, 19.0],
                                      jnp.float64), (2, 4))
    fn = jax.jit(jax.vmap(mhe_step, in_axes=(0, 0, None)))
    bank2, xb = fn(bank, zb, boundary)
    assert xb.shape == (2, 3 * Z)
    assert bool(jnp.all(jnp.isfinite(xb)))

def test_weak_typed_f64_state_stays_f64():
    """A carry built from weakly-typed float64 leaves (jnp.full with
    Python floats — the natural way users write a guess) must run the
    window rollout in float64: JAX's weak+strong promotion against the
    float32 bound constants would otherwise demote the state mid-scan
    (observed: 'scan carry dtypes do not match' crash)."""
    config, params, substeps, boundary = _plant()
    st0 = R.make_initial_state(config, dtype=jnp.float64)
    guess = R.ReactorState(
        time=st0.time, pH=jnp.full(Z, 7.0), chlorine=jnp.full(Z, 0.5),
        temperature=jnp.full(Z, 17.0),
        flow_rate=st0.flow_rate).update_derived()
    assert guess.pH.dtype == jnp.float64      # weak f64 leaves
    mhe_step = make_mhe(params, Z, TAPS, DT, substeps, horizon=4,
                        prior_variance=P0, measurement_noise=SIGMA**2,
                        iters=2)
    carry = make_mhe_carry(guess, 4, len(TAPS), boundary)
    z = jnp.asarray(np.array([7.2, 7.4, 1.8, 19.5]))
    carry2, x = mhe_step(carry, z, boundary)
    assert x.dtype == jnp.float64
    assert carry2.x0.dtype == jnp.float64
