"""Electrical-environment model tests — closes the reference's three
sensor-model limitations (reference README.md:528-531): EMI pickup,
cable capacitance, ground loops. Checks exact filter math, statistical
envelopes, NaN discipline, neutrality when off, and composition with
the base sensor pipeline under lax.scan + vmap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.sensors import (
    base_read,
    electrical_transform,
    make_electrical_carry,
    make_electrical_params,
    make_sensor_carry,
    make_sensor_params,
)
from ics_wt_physicsengine_tpu.sensors.electrical import cable_time_constant


def _rollout(params, key, values, times):
    """Scan electrical_transform over a value/time series."""
    carry = make_electrical_carry(params, key=key, t0=float(times[0]) - 1.0)

    def step(c, vt):
        v, t = vt
        return electrical_transform(params, c, v, t)

    carry, out = jax.lax.scan(
        step, carry, (jnp.asarray(values), jnp.asarray(times)))
    return np.asarray(out)


def test_defaults_are_bit_neutral():
    """All-off parameters: the stage must not perturb the signal."""
    params = make_electrical_params()
    times = np.arange(1.0, 200.0)
    values = np.sin(times / 7.0).astype(np.float32)
    out = _rollout(params, jax.random.PRNGKey(0), values, times)
    np.testing.assert_array_equal(out, values.astype(np.float32))


def test_cable_time_constant_formula():
    # glass pH electrode: 100 MΩ source, 100 pF/m, 50 m → τ = 0.5 s
    params = make_electrical_params(source_impedance_ohm=1e8,
                                    cable_length_m=50.0,
                                    cable_capacitance_pf_per_m=100.0)
    assert float(cable_time_constant(params)) == pytest.approx(0.5)


def test_cable_rc_step_response():
    """Exact ZOH pole: after one τ the step reaches 1-1/e."""
    params = make_electrical_params(source_impedance_ohm=1e8,
                                    cable_length_m=100.0)  # τ = 1 s
    dt = 0.1
    times = np.arange(1, 200) * dt
    values = np.ones_like(times)          # unit step from rest
    out = _rollout(params, jax.random.PRNGKey(1), values, times)
    # the pole seeds on the first sample (no spurious start transient
    # from an arbitrary zero state) — first output equals the input
    assert out[0] == pytest.approx(1.0)

    # now a genuine step: 0 for a while, then 1
    values = np.concatenate([np.zeros(50), np.ones(150)])
    times = np.arange(1, 201) * dt
    out = _rollout(params, jax.random.PRNGKey(1), values, times)
    # 10 samples (= 1 τ) after the step: 1 - e^-1
    assert out[59] == pytest.approx(1.0 - np.exp(-1.0), rel=1e-3)
    # long after: settled
    assert out[-1] == pytest.approx(1.0, abs=1e-3)


def test_mains_hum_is_deterministic_and_zero_mean():
    params = make_electrical_params(emi_pickup_amplitude=0.05,
                                    mains_frequency_hz=50.0,
                                    emi_phase_rad=0.3)
    # short horizon + off-harmonic sampling: the hum sweeps full cycles
    # while 2π·f·t stays small enough for float32 phase accuracy
    times = (np.arange(1, 2001) * 0.00173).astype(np.float32)
    values = np.full_like(times, 7.0)
    out = _rollout(params, jax.random.PRNGKey(2), values, times)
    resid = out - np.float32(7.0)
    # emulate the float32 intermediate rounding of the in-graph phase
    omega = np.float32(2.0) * np.float32(np.pi) * np.float32(50.0)
    arg = (omega * times + np.float32(0.3)).astype(np.float32)
    expected = np.float32(0.05) * np.sin(arg)
    np.testing.assert_allclose(resid, expected, atol=1e-4)
    assert abs(resid.mean()) < 0.005
    assert resid.std() == pytest.approx(0.05 / np.sqrt(2), rel=0.1)


def test_burst_rate_matches_poisson_expectation():
    params = make_electrical_params(emi_burst_rate_per_hour=360.0,
                                    emi_burst_amplitude=5.0)
    dt = 1.0                               # p_burst = 0.1/read
    times = np.arange(1, 5001) * dt
    values = np.zeros_like(times)
    out = _rollout(params, jax.random.PRNGKey(3), values, times)
    n_bursts = int((np.abs(out) > 1e-9).sum())
    # binomial(5000, 0.1): mean 500, σ≈21 — accept ±5σ
    assert 390 < n_bursts < 610


def test_ground_loop_scales_with_grounding_quality():
    def run(q, key):
        params = make_electrical_params(grounding_quality=q,
                                        ground_loop_amplitude=0.2,
                                        ground_walk_sigma=0.3,
                                        ground_walk_tau_s=30.0)
        times = np.arange(1, 3001) * 1.7
        return _rollout(params, jax.random.PRNGKey(key), times * 0.0,
                        times)

    floating = run(0.0, 5)
    poor = run(0.5, 5)
    good = run(1.0, 5)
    assert np.all(good == 0.0)             # perfect ground: no effect
    assert floating.std() > poor.std() > 0
    # OU walk stays bounded (stationary, not diffusive)
    assert np.isfinite(floating).all()
    assert np.abs(floating).max() < 0.2 * (1 + 5 * 0.3 * np.sqrt(30.0 / 2))


def test_nan_faults_propagate_but_do_not_poison_state():
    params = make_electrical_params(source_impedance_ohm=1e8,
                                    cable_length_m=100.0)   # τ = 1 s
    times = np.arange(1, 61) * 0.5
    values = np.ones(60)
    values[20:25] = np.nan                 # air-bubble dropout window
    out = _rollout(params, jax.random.PRNGKey(7), values, times)
    assert np.isnan(out[20:25]).all()      # faults visible downstream
    assert np.isfinite(out[25:]).all()     # recovery is clean
    assert out[-1] == pytest.approx(1.0, abs=1e-3)


def test_wrapper_attach_electrical():
    """Reference-API path: attach the model to a class wrapper; the
    reported values get the corruption, instrument fields stay clean."""
    from ics_wt_physicsengine_tpu.sensors import TemperatureSensor

    class MockState:
        temperature = np.full(5, 20.0)

    def run(attach):
        s = TemperatureSensor("T1", zone_index=0, seed=42)
        s.calibrate(20.0, 0.0)
        if attach:
            s.attach_electrical(
                make_electrical_params(emi_pickup_amplitude=0.5,
                                       grounding_quality=0.3,
                                       ground_loop_amplitude=0.3,
                                       ground_walk_sigma=0.2),
                seed=9)
        # start past the warm-up window so readings are numeric
        return [s.read(MockState(), float(t)).value
                for t in np.arange(2000.0, 2500.0, 1.3)]

    # drop the first-order-lag settling transient, keep steady state
    clean = np.array(run(False))[60:]
    noisy = np.array(run(True))[60:]
    clean = clean[np.isfinite(clean)]
    noisy = noisy[np.isfinite(noisy)]
    # same instrument stream underneath (same seed), extra corruption on
    # top; the corruption is zero-mean so the averages stay together
    assert noisy.std() > clean.std() * 2
    assert abs(noisy.mean() - clean.mean()) < 0.5


def test_composes_with_base_pipeline_scan_and_vmap():
    """The documented integration: corrupt base_read's output value in
    the same scan, batched over plants."""
    n_plants = 8
    sp = make_sensor_params((0.0, 14.0), precision=0.01, warmup_time_s=0.0)
    ep = make_electrical_params(emi_pickup_amplitude=0.02,
                                grounding_quality=0.6,
                                ground_loop_amplitude=0.05,
                                ground_walk_sigma=0.1,
                                source_impedance_ohm=1e8,
                                cable_length_m=20.0)

    def one_plant(key):
        k1, k2 = jax.random.split(key)
        sc = make_sensor_carry(sp, k1, t0=0.0, initial_value=7.0)
        ec = make_electrical_carry(ep, key=k2, t0=0.0)

        def step(carry, t):
            sc, ec = carry
            sc, out = base_read(sp, sc, 7.0, t)
            ec, v = electrical_transform(ep, ec, out.value, t)
            return (sc, ec), v

        _, vs = jax.lax.scan(step, (sc, ec),
                             jnp.arange(1.0, 501.0))
        return vs

    keys = jax.random.split(jax.random.PRNGKey(11), n_plants)
    vs = jax.jit(jax.vmap(one_plant))(keys)
    vs = np.asarray(vs)
    assert vs.shape == (n_plants, 500)
    finite = vs[np.isfinite(vs)]
    # centered on the true value, with the added corruption visible
    assert abs(finite.mean() - 7.0) < 0.05
    assert finite.std() > 0.01             # more than bare precision noise
    # plants decorrelated (independent keys)
    assert not np.allclose(vs[0], vs[1], equal_nan=True)
