"""Transport invariants (reference strategy: validate_transport,
core/transport.py:511-578)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import transport as tr


@pytest.fixture(scope="module")
def model():
    diameter = 2 * math.sqrt(1.0 / (math.pi * 2.0))
    geom = tr.GeometryParameters(volume=1000, height=2.0,
                                 diameter=diameter, n_zones=5)
    flow = tr.FlowParameters(flow_rate=5.0, impeller_speed=60.0,
                             impeller_diameter=0.3)
    return tr.TransportModel(geom, flow, temperature=20.0)


def test_exchange_matrix_conservation(model):
    K = model.K_matrix
    row_sums = K.sum(axis=1)
    assert np.all(np.abs(row_sums[:-1]) < 1e-12)
    assert abs(row_sums[-1] + model.q_per_v) < 1e-12


def test_exchange_matrix_negative_semidefinite(model):
    eig = np.linalg.eigvals(model.K_matrix)
    assert np.all(eig.real <= 1e-10)


def test_stencil_equals_dense(model):
    """apply_exchange must equal K @ x exactly, including with suppression."""
    n = model.geometry.n_zones
    rng = np.random.default_rng(0)
    x = rng.uniform(1.0, 3.0, n)
    supp = rng.uniform(0.4, 1.0, n - 1)
    K = tr.exchange_matrix(n, model.k_exchange, model.q_per_v, suppression=supp)
    dense = K @ x
    stencil = np.asarray(tr.apply_exchange(
        jnp.asarray(x), jnp.asarray(model.k_exchange * supp),
        jnp.asarray(model.q_per_v)))
    np.testing.assert_allclose(stencil, dense, rtol=0, atol=1e-14)


def test_stencil_batched(model):
    """Leading batch axes broadcast with per-plant interface coefficients."""
    n = model.geometry.n_zones
    rng = np.random.default_rng(1)
    xb = rng.uniform(1.0, 3.0, (4, n))
    suppb = rng.uniform(0.4, 1.0, (4, n - 1))
    qb = rng.uniform(0.0, 1e-4, (4,))
    out = np.asarray(tr.apply_exchange(
        jnp.asarray(xb), jnp.asarray(model.k_exchange * suppb),
        jnp.asarray(qb)))
    for b in range(4):
        K = tr.exchange_matrix(n, model.k_exchange, qb[b],
                               suppression=suppb[b])
        np.testing.assert_allclose(out[b], K @ xb[b], rtol=0, atol=1e-14)


def test_coefficients(model):
    assert model.Re > 1000
    assert 30 < model.mixing_time_seconds < 300
    assert model.residence_time == pytest.approx(200.0)  # 1000 L / 5 L/min
    assert model.D_turbulent == pytest.approx(0.1 * 1.0 * 0.09)


def test_mixing_quality(model):
    cv, s = model.calculate_mixing_quality(np.full(5, 2.0))
    assert cv < 1e-12 and s < 1e-12
    cv2, s2 = model.calculate_mixing_quality(np.array([3.0, 2.5, 2.0, 1.5, 1.0]))
    assert cv2 > 0.2 and 0 < s2 <= 1


def test_tracer_pulse_normalizes(model):
    t = np.linspace(0, 3600 * 40, 20000)
    e_t = np.asarray(model.tracer_response(t, "pulse"))
    integral = np.trapezoid(e_t, t)
    assert abs(integral - 1.0) < 0.01


def test_tracer_step_limits(model):
    t = np.array([0.0, 3600 * 100.0])
    f_t = np.asarray(model.tracer_response(t, "step"))
    assert f_t[0] == pytest.approx(0.0, abs=1e-12)
    assert f_t[-1] == pytest.approx(1.0, abs=1e-3)


def test_batch_mode():
    diameter = 2 * math.sqrt(1.0 / (math.pi * 2.0))
    geom = tr.GeometryParameters(volume=1000, height=2.0,
                                 diameter=diameter, n_zones=5)
    model = tr.TransportModel(geom, tr.FlowParameters(flow_rate=0.0))
    assert model.is_batch_mode
    assert model.residence_time is None
    with pytest.raises(ValueError):
        model.tracer_response(np.linspace(0, 10, 5))


def test_validation_suite():
    tr.validate_transport()
