"""Checkpoint/resume: bit-exact state round-trips incl. PRNG keys and
sensor delay buffers (new capability — the reference has none, SURVEY.md 5.4)."""

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import (
    BoundaryConditions,
    IntegratedCSTR,
    ReactorConfiguration,
)
from ics_wt_physicsengine_tpu.sensors import create_realistic_sensor_suite
from ics_wt_physicsengine_tpu.utils import (
    load_metadata,
    load_pytree,
    load_simulation,
    save_pytree,
    save_simulation,
)


def test_pytree_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    tree = {"a": jnp.arange(5.0), "b": (jnp.asarray(2.5), np.ones((2, 3))),
            "key": jax.random.key(7)}
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, tree, metadata={"note": "test"})
    restored = load_pytree(path, tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.arange(5.0))
    np.testing.assert_array_equal(np.asarray(restored["b"][1]),
                                  np.ones((2, 3)))
    # PRNG key round-trips and generates the same stream
    k1 = jax.random.normal(tree["key"])
    k2 = jax.random.normal(restored["key"])
    assert float(k1) == float(k2)
    assert load_metadata(path)["note"] == "test"


def test_structure_mismatch_rejected(tmp_path):
    import jax.numpy as jnp

    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, {"a": jnp.zeros(3)})
    with pytest.raises(ValueError):
        load_pytree(path, {"a": jnp.zeros(3), "b": jnp.zeros(3)})


def test_simulation_resume_continues_identically(tmp_path):
    """Run 30 steps, checkpoint, run 20 more; a resumed reactor must produce
    the same trajectory as the uninterrupted one."""
    config = ReactorConfiguration()
    bc = BoundaryConditions(inlet_flow_rate=5.0, acid_flow_rate=0.2)
    path = str(tmp_path / "sim.npz")

    r1 = IntegratedCSTR(config)
    for _ in range(30):
        r1.step(1.0, bc)
    save_simulation(path, r1, metadata={"t": float(r1.state.time)})
    for _ in range(20):
        r1.step(1.0, bc)

    r2 = IntegratedCSTR(config)
    load_simulation(path, r2)
    assert float(r2.state.time) == pytest.approx(30.0)
    for _ in range(20):
        r2.step(1.0, bc)

    np.testing.assert_allclose(np.asarray(r2.state.pH),
                               np.asarray(r1.state.pH), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(r2.state.chlorine),
                               np.asarray(r1.state.chlorine),
                               rtol=0, atol=0)


def test_sensor_state_resumes(tmp_path):
    """Sensor carries (PRNG stream, lag state, delay rings) resume exactly:
    the post-restore reading stream matches the uninterrupted one."""
    config = ReactorConfiguration()
    path = str(tmp_path / "sim.npz")

    r1 = IntegratedCSTR(config)
    s1 = create_realistic_sensor_suite(config, seed=3)
    for s in s1.values():
        s.calibrate(7.0, 0.0)
    bc = BoundaryConditions()
    state = r1.state
    for i in range(5):
        state = r1.step(1.0, bc)
        s1["pH_inlet"].read(state, 2000.0 + i)
    save_simulation(path, r1, sensors=s1)
    cont = [s1["pH_inlet"].read(state, 2010.0 + i).value for i in range(5)]

    r2 = IntegratedCSTR(config)
    s2 = create_realistic_sensor_suite(config, seed=999)  # different RNG...
    for s in s2.values():
        s.calibrate(7.0, 0.0)
    load_simulation(path, r2, sensors=s2)  # ...overwritten by checkpoint
    resumed = [s2["pH_inlet"].read(r2.state, 2010.0 + i).value
               for i in range(5)]
    np.testing.assert_array_equal(np.asarray(cont), np.asarray(resumed))
