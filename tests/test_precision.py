"""float32 (TPU default) vs float64 trajectory accuracy characterization.

The CPU regression oracle runs float64; the TPU fast path runs float32.
These tests pin the documented accuracy ladder: after a 1-hour simulated
transient (3600 steps), the f32 trajectory stays within engineering
tolerances of f64 — well inside every sensor's noise floor, so f32 is the
right production dtype for serving and Monte-Carlo.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import reactor as R

BC = R.BoundaryConditions(
    inlet_flow_rate=5.0, inlet_pH=7.2, inlet_chlorine=0.5,
    inlet_temperature=26.0, acid_flow_rate=0.1,
    ambient_temperature=15.0, heat_loss_coefficient=50.0)


def _final(dtype, n_steps):
    config = R.ReactorConfiguration(n_zones=20)
    params = R.make_params(config, dtype=dtype)
    state = R.make_initial_state(config, dtype=dtype)
    substeps = R.default_substeps(config, 1.0)
    final, _ = jax.jit(lambda p, s, b: R.rollout(
        p, s, b, dt=1.0, substeps=substeps, n_steps=n_steps,
        record=False))(params, state, BC)
    return final


def test_f32_matches_f64_within_sensor_noise():
    f64 = _final(jnp.float64, 3600)
    f32 = _final(jnp.float32, 3600)

    d_ph = np.max(np.abs(np.asarray(f32.pH, np.float64)
                         - np.asarray(f64.pH)))
    d_cl = np.max(np.abs(np.asarray(f32.chlorine, np.float64)
                         - np.asarray(f64.chlorine)))
    d_t = np.max(np.abs(np.asarray(f32.temperature, np.float64)
                        - np.asarray(f64.temperature)))

    # Sensor noise floors: pH sigma=0.01, Cl sigma=0.01 mg/L, T sigma=0.1 C
    # (reference specs, ph_sensor.py:87 etc.). f32 drift after 1 h must sit
    # well below them.
    assert d_ph < 5e-3, f"f32 pH drift {d_ph:.2e}"
    assert d_cl < 5e-3, f"f32 Cl drift {d_cl:.2e}"
    assert d_t < 5e-2, f"f32 T drift {d_t:.2e}"


def test_f32_conservation():
    """Closed-system mass conservation in f32: total tracer conserved to
    f32 roundoff accumulation over 1000 steps."""
    config = R.ReactorConfiguration(flow_rate=0.0, initial_chlorine=0.0)
    params = R.make_params(config, dtype=jnp.float32)
    state = R.make_initial_state(config, dtype=jnp.float32)
    from dataclasses import replace
    t_profile = jnp.asarray(np.linspace(25.0, 15.0, 5), jnp.float32)
    state = replace(state, temperature=t_profile)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    final, _ = jax.jit(lambda p, s, b: R.rollout(
        p, s, b, dt=1.0, substeps=1, n_steps=1000, record=False))(
            params, state, bc)
    e0 = float(np.sum(np.asarray(t_profile, np.float64)))
    e1 = float(np.sum(np.asarray(final.temperature, np.float64)))
    assert abs(e1 - e0) / e0 < 1e-5   # ~ f32 eps * sqrt(steps)
