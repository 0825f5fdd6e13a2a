"""
Ensemble Kalman filter over the full plant state (control/enkf.py).

Same bar as the EKF suite: reconstruct UNMEASURED interior zones from
noisy boundary taps, beat open-loop rollout from the same wrong guess,
survive NaN dropouts, agree with the EKF where both are valid, and
shard its ensemble axis over the device mesh unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.control import (
    ensemble_spread,
    flatten_state,
    make_ekf,
    make_ekf_carry,
    make_enkf,
    make_enkf_carry,
    nis_fault_monitor,
    tap_index,
)
from ics_wt_physicsengine_tpu.core import reactor as R

Z = 6
DT = 30.0
N_ENS = 96
TAPS = [("pH", 0), ("pH", -1), ("chlorine", -1), ("temperature", -1)]
SIGMA = np.array([0.02, 0.02, 0.02, 0.05])
P0 = (0.04, 1.0, 4.0)
QN = (1e-7, 1e-6, 1e-5)


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
    st = R.ReactorState(
        time=st.time,
        pH=jnp.linspace(6.8, 7.6, Z).astype(st.pH.dtype),
        chlorine=jnp.linspace(3.0, 1.2, Z).astype(st.pH.dtype),
        temperature=jnp.linspace(22.0, 19.0, Z).astype(st.pH.dtype),
        flow_rate=st.flow_rate)
    return st.update_derived()


def _wrong_guess(config):
    st = R.make_initial_state(config, dtype=jnp.float64)
    st = R.ReactorState(
        time=st.time,
        pH=jnp.full(Z, 7.0, st.pH.dtype),
        chlorine=jnp.full(Z, 0.5, st.pH.dtype),
        temperature=jnp.full(Z, 17.0, st.pH.dtype),
        flow_rate=st.flow_rate)
    return st.update_derived()


def _measure(truth, rng, nan_mask=None):
    z = np.array([float(flatten_state(truth)[tap_index(f, zz, Z)])
                  for f, zz in TAPS])
    z = z + rng.normal(0.0, SIGMA)
    if nan_mask is not None:
        z = np.where(nan_mask, np.nan, z)
    return jnp.asarray(z)


def _mid_cl_error(x, truth):
    mid = Z // 2
    i = tap_index("chlorine", mid, Z)
    return abs(float(x[i]) - float(truth.chlorine[mid]))


def _run(n_steps=30, nan_mask_fn=None, diagnostics=False, seed=0,
         **enkf_kw):
    """Drive truth + EnKF side by side; returns (errors, carry, diags,
    truth_final)."""
    config, params, substeps, boundary = _plant()
    truth = _truth_state(config)
    carry = make_enkf_carry(_wrong_guess(config), P0, Z, N_ENS,
                            jax.random.PRNGKey(seed))
    enkf_step = jax.jit(make_enkf(
        params, Z, TAPS, DT, substeps, process_noise=QN,
        measurement_noise=SIGMA**2, diagnostics=diagnostics, **enkf_kw))
    rng = np.random.default_rng(seed + 1)
    errors, diags = [], []
    x = jnp.mean(carry.ensemble, axis=0)
    errors.append(_mid_cl_error(x, truth))
    for k in range(n_steps):
        truth = R.step(params, truth, boundary, DT, substeps)
        mask = nan_mask_fn(k) if nan_mask_fn else None
        z = _measure(truth, rng, mask)
        out = enkf_step(carry, z, boundary)
        if diagnostics:
            carry, x, d = out
            diags.append(jax.tree.map(np.asarray, d))
        else:
            carry, x = out
        errors.append(_mid_cl_error(x, truth))
    return errors, carry, diags, truth


def test_enkf_reconstructs_unmeasured_midzone():
    """Mid-zone chlorine (no tap) converges from a 2.5x-wrong guess."""
    errors, carry, _, truth = _run(n_steps=30)
    assert errors[0] > 1.0                     # genuinely wrong start
    assert errors[-1] < 0.15 * errors[0]
    # posterior spread is finite, positive, and collapsed vs the prior
    sp = np.asarray(ensemble_spread(carry))
    assert np.all(np.isfinite(sp)) and np.all(sp >= 0)
    i = tap_index("chlorine", Z // 2, Z)
    assert sp[i] < np.sqrt(P0[1])


def test_enkf_beats_open_loop():
    """Assimilating beats pure model rollout from the same wrong guess."""
    config, params, substeps, boundary = _plant()
    truth = _truth_state(config)
    open_loop = _wrong_guess(config)
    for _ in range(30):
        truth = R.step(params, truth, boundary, DT, substeps)
        open_loop = R.step(params, open_loop, boundary, DT, substeps)
    ol_err = abs(float(open_loop.chlorine[Z // 2])
                 - float(truth.chlorine[Z // 2]))
    errors, *_ = _run(n_steps=30)
    assert errors[-1] < 0.5 * ol_err


def test_all_nan_step_skips_update_exactly():
    """A step where every channel drops out is a pure forecast: the
    posterior mean equals the forecast mean bit-for-bit."""
    config, params, substeps, boundary = _plant()
    carry = make_enkf_carry(_wrong_guess(config), P0, Z, N_ENS,
                            jax.random.PRNGKey(3))
    enkf_step = jax.jit(make_enkf(params, Z, TAPS, DT, substeps,
                                  process_noise=QN,
                                  measurement_noise=SIGMA**2))
    z_nan = jnp.full(len(TAPS), jnp.nan)
    _, x = enkf_step(carry, z_nan, boundary)
    # replay the forecast by hand: same key split, same noise draw
    from ics_wt_physicsengine_tpu.control.enkf import (
        _flat_bounds, unflatten_state)
    key, k_q, _ = jax.random.split(carry.key, 3)

    def f(xm):
        st = unflatten_state(xm, Z)
        return flatten_state(R.step(params, st, boundary, DT, substeps))

    ens = jax.vmap(f)(carry.ensemble)
    w = jax.random.normal(k_q, ens.shape, ens.dtype)
    w = w - jnp.mean(w, axis=0)
    q_std = jnp.sqrt(jnp.repeat(jnp.asarray(QN, jnp.float32) * DT, Z))
    ens = ens + w * q_std[None, :].astype(ens.dtype)
    lo, hi = _flat_bounds(Z, False, False, False, 0, jnp.float32)
    ens = jnp.clip(ens, lo, hi)
    np.testing.assert_array_equal(np.asarray(x),
                                  np.asarray(jnp.mean(ens, axis=0)))


def test_partial_dropout_still_converges():
    """The chlorine tap drops out every other step; convergence holds."""
    mask = np.zeros(len(TAPS), bool)
    mask[2] = True
    errors, *_ = _run(n_steps=40,
                      nan_mask_fn=lambda k: mask if k % 2 else None)
    assert errors[-1] < 0.2 * errors[0]
    assert np.isfinite(errors).all()


def test_enkf_agrees_with_ekf():
    """On the same measurement stream the EnKF posterior tracks the
    EKF's (both converge to truth; they agree to the noise floor)."""
    config, params, substeps, boundary = _plant()
    truth = _truth_state(config)
    ekf_step = jax.jit(make_ekf(params, Z, TAPS, DT, substeps,
                                process_noise=QN,
                                measurement_noise=SIGMA**2))
    ekf_carry = make_ekf_carry(_wrong_guess(config), P0, Z)
    enkf_step = jax.jit(make_enkf(params, Z, TAPS, DT, substeps,
                                  process_noise=QN,
                                  measurement_noise=SIGMA**2,
                                  inflation=1.02))
    enkf_carry = make_enkf_carry(_wrong_guess(config), P0, Z, 256,
                                 jax.random.PRNGKey(7))
    rng = np.random.default_rng(11)
    for _ in range(25):
        truth = R.step(params, truth, boundary, DT, substeps)
        z = _measure(truth, rng)
        ekf_carry, x_ekf = ekf_step(ekf_carry, z, boundary)
        enkf_carry, x_enkf = enkf_step(enkf_carry, z, boundary)
    i = tap_index("chlorine", Z // 2, Z)
    cl_true = float(truth.chlorine[Z // 2])
    assert abs(float(x_ekf[i]) - cl_true) < 0.25
    assert abs(float(x_enkf[i]) - cl_true) < 0.25
    assert abs(float(x_enkf[i]) - float(x_ekf[i])) < 0.2


def test_localization_zeroes_far_gain():
    """With c=1 zone, a tap at zone 0 cannot move entries ≥ 2 zones
    away: their posterior mean equals the forecast mean exactly."""
    config, params, substeps, boundary = _plant()
    carry = make_enkf_carry(_wrong_guess(config), P0, Z, N_ENS,
                            jax.random.PRNGKey(5))
    one_tap = [("pH", 0)]
    loc = jax.jit(make_enkf(params, Z, one_tap, DT, substeps,
                            process_noise=QN, measurement_noise=1e-4,
                            localization_radius=1.0))
    free = jax.jit(make_enkf(params, Z, one_tap, DT, substeps,
                             process_noise=QN, measurement_noise=1e-4))
    z = jnp.asarray([7.4])
    _, x_loc = loc(carry, z, boundary)
    _, x_free = free(carry, z, boundary)
    far = tap_index("chlorine", Z - 1, Z)       # > 2c zones from tap 0
    # the unlocalized filter moves the far entry; the localized one
    # leaves it at the forecast value — recompute the pure forecast
    # (all-NaN z on the SAME carry = same key path) to pin "untouched"
    z_nan = jnp.asarray([jnp.nan])
    _, x_fc = loc(carry, z_nan, boundary)
    assert float(x_loc[far]) == float(x_fc[far])
    assert float(x_free[far]) != float(x_fc[far])


def test_diagnostics_feed_nis_monitor():
    """diagnostics=True emits the EKF-shaped dict; a healthy run keeps
    every channel's NIS EMA below the fault threshold."""
    errors, _, diags, _ = _run(n_steps=30, diagnostics=True,
                               inflation=1.02)
    ema, update = nis_fault_monitor(len(TAPS))
    flags = None
    for d in diags[5:]:                         # skip the transient
        ema, flags = update(ema, {"nis": jnp.asarray(d["nis"])})
    assert not bool(np.any(np.asarray(flags)))
    assert errors[-1] < 0.2 * errors[0]


def test_sharded_ensemble_matches_single_device():
    """The member axis shards over the mesh: same step, same result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    config, params, substeps, boundary = _plant()
    carry = make_enkf_carry(_wrong_guess(config), P0, Z, N_ENS,
                            jax.random.PRNGKey(9))
    enkf_step = jax.jit(make_enkf(params, Z, TAPS, DT, substeps,
                                  process_noise=QN,
                                  measurement_noise=SIGMA**2))
    z = jnp.asarray([7.3, 7.5, 1.1, 19.0])
    _, x_single = enkf_step(carry, z, boundary)
    mesh = Mesh(np.array(devs[:8]), ("ens",))
    sh = NamedSharding(mesh, P("ens", None))
    from ics_wt_physicsengine_tpu.control.enkf import EnKFCarry
    carry_sh = EnKFCarry(
        ensemble=jax.device_put(carry.ensemble, sh),
        key=carry.key)
    _, x_sh = enkf_step(carry_sh, z, boundary)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_single),
                               rtol=0, atol=1e-5)


def test_scan_rollout_jits():
    """The step scans: a 10-step assimilation window as one jit."""
    config, params, substeps, boundary = _plant()
    carry = make_enkf_carry(_wrong_guess(config), P0, Z, 32,
                            jax.random.PRNGKey(1))
    enkf_step = make_enkf(params, Z, TAPS, DT, substeps,
                          process_noise=QN, measurement_noise=SIGMA**2)

    @jax.jit
    def window(carry, zs):
        return jax.lax.scan(
            lambda c, z: enkf_step(c, z, boundary), carry, zs)

    zs = jnp.broadcast_to(jnp.asarray([7.3, 7.5, 1.1, 19.0]), (10, 4))
    carry2, xs = window(carry, zs)
    assert xs.shape == (10, 3 * Z)
    assert bool(jnp.all(jnp.isfinite(xs)))

def test_single_member_ensemble_rejected():
    """n_ensemble < 2 raises up front instead of silently producing
    inf/NaN from the (N-1) anomaly divisors inside jit."""
    config, *_ = _plant()
    with pytest.raises(ValueError, match="n_ensemble"):
        make_enkf_carry(_wrong_guess(config), P0, Z, 1,
                        jax.random.PRNGKey(0))


def test_initial_mean_unbiased_near_bound():
    """A bound-adjacent guess with wide p0 (chlorine 0.4 mg/L, variance
    1.0 against the 0 floor) still starts with ensemble mean ~= x0 —
    the clip-to-bounds no longer shifts it one-sidedly."""
    config, *_ = _plant()
    guess = _wrong_guess(config)        # chlorine 0.5, near the 0 floor
    carry = make_enkf_carry(guess, (0.04, 1.0, 4.0), Z, 256,
                            jax.random.PRNGKey(3))
    mean = np.asarray(jnp.mean(carry.ensemble, axis=0))
    x0 = np.asarray(flatten_state(guess))
    # raw centered-then-clipped draws would sit ~0.2 mg/L high on the
    # chlorine block; the re-centered ensemble holds the mean to <2% of
    # the perturbation std
    cl = slice(tap_index("chlorine", 0, Z),
               tap_index("chlorine", Z - 1, Z) + 1)
    np.testing.assert_allclose(mean[cl], x0[cl], rtol=0, atol=0.02)
    assert float(np.min(np.asarray(carry.ensemble))) >= 0.0


def test_perturbation_variance_not_deflated():
    """Centered observation/process draws are already unbiased under
    the filter's N-1 anomaly convention (E[sum((w-mean)^2)/(N-1)] is
    exactly sigma^2) — no rescale is applied, and the NIS of a
    well-specified filter stays ~1 over many steps."""
    errors, carry, diags, truth = _run(
        n_steps=40, diagnostics=True, seed=7, inflation=1.02)
    nis = np.concatenate([np.atleast_1d(d["nis"]) for d in diags[10:]])
    nis = nis[np.isfinite(nis)]
    # chi-square_1 mean is 1; generous envelope for 120 samples
    assert 0.4 < float(np.mean(nis)) < 2.5
