"""Integrated plant model: physics + all seven instruments in one jitted
step/scan (BASELINE config 3)."""

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import BoundaryConditions, ReactorConfiguration
from ics_wt_physicsengine_tpu.models import (
    config1_two_zone,
    config2_stratified_20_zone,
    make_plant,
    plant_rollout,
    plant_step,
)


BC = BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.5,
                        acid_flow_rate=0.3)


def test_plant_step_jits_and_reads():
    params, plant = make_plant(ReactorConfiguration(), seed=1,
                               dtype=jnp.float64)
    step = jax.jit(lambda p, s, b: plant_step(p, s, b, dt=1.0, substeps=1))
    readings = None
    for _ in range(5):
        plant, readings = step(params, plant, BC)
    assert set(readings) == {"pH_inlet", "pH_outlet", "chlorine_inlet",
                             "chlorine_outlet", "flow_main", "temp_inlet",
                             "temp_outlet"}
    # warmed-up plant: finite readings tracking physics
    ph = float(readings["pH_inlet"].value)
    assert 5.5 < ph < 8.5
    assert np.isfinite(float(readings["flow_main"].value))


def test_plant_rollout_records_sensor_trajectories():
    params, plant = make_plant(ReactorConfiguration(), seed=2,
                               dtype=jnp.float64)
    fn = jax.jit(lambda p, s, b: plant_rollout(p, s, b, dt=1.0, substeps=1,
                                               n_steps=50))
    plant, traj = fn(params, plant, BC)
    assert traj["pH_inlet"].shape == (50,)
    vals = np.asarray(traj["pH_inlet"])
    finite = vals[np.isfinite(vals)]
    assert len(finite) > 40
    # acid dosing drags the measured inlet pH down over the rollout
    assert finite[-5:].mean() < finite[:5].mean()
    # sensor noise is present (not a pass-through of the true state)
    assert np.std(np.diff(finite)) > 1e-4


def test_named_configs():
    assert config1_two_zone().n_zones == 2
    cfg2 = config2_stratified_20_zone()
    assert cfg2.n_zones == 20 and cfg2.enable_thermal_stratification
    config1_two_zone().validate()
    cfg2.validate()


def test_plant_rollout_matches_stepping():
    params, plant = make_plant(ReactorConfiguration(), seed=3,
                               dtype=jnp.float64)
    step = jax.jit(lambda p, s, b: plant_step(p, s, b, dt=1.0, substeps=1))
    p1 = plant
    vals_step = []
    for _ in range(10):
        p1, r = step(params, p1, BC)
        vals_step.append(float(r["temp_outlet"].value))

    params2, p2 = make_plant(ReactorConfiguration(), seed=3,
                             dtype=jnp.float64)
    fn = jax.jit(lambda p, s, b: plant_rollout(p, s, b, dt=1.0, substeps=1,
                                               n_steps=10))
    _, traj = fn(params2, p2, BC)
    np.testing.assert_allclose(np.asarray(traj["temp_outlet"]),
                               np.asarray(vals_step), rtol=0, atol=1e-12)


def test_batched_plants_with_sensors():
    """BASELINE configs 3+4 combined: randomized plant batch where every
    plant also runs its full instrument suite."""
    from ics_wt_physicsengine_tpu.models.plant import (
        make_plant_batch, plant_step_batched)

    params, plant = make_plant_batch(ReactorConfiguration(n_zones=4),
                                     n_plants=6, seed=9, dtype=jnp.float64)
    assert params.reactor.k_exchange.shape == (6,)
    assert plant.ph_inlet.base.key.shape == (6,)

    step = jax.jit(lambda p, s, b: plant_step_batched(p, s, b, dt=1.0,
                                                      substeps=4))
    readings = None
    for _ in range(4):
        plant, readings = step(params, plant, BC)
    vals = np.asarray(readings["pH_inlet"].value)
    assert vals.shape == (6,)
    finite = vals[np.isfinite(vals)]
    assert len(finite) >= 5
    assert np.all((finite > 4.0) & (finite < 10.0))
    # per-plant RNG streams differ
    assert np.std(finite) > 1e-4


def test_batched_plant_rollout_measured_uq():
    """Measured-value UQ: ensemble trajectories of instrument readings."""
    from ics_wt_physicsengine_tpu.models.plant import (
        make_plant_batch, plant_rollout_batched)

    params, plant = make_plant_batch(ReactorConfiguration(n_zones=4),
                                     n_plants=5, seed=11, dtype=jnp.float64)
    # params closed over (concrete) so the default O(1) tap path engages
    fn = jax.jit(lambda s, b: plant_rollout_batched(
        params, s, b, dt=1.0, substeps=4, n_steps=20))
    plant, traj = fn(plant, BC)
    assert traj["chlorine_outlet"].shape == (20, 5)
    vals = np.asarray(traj["chlorine_outlet"])
    finite = vals[np.isfinite(vals)]
    assert len(finite) > 80
    # ensemble spread exists in the *measured* values
    assert np.nanstd(vals[-1]) > 1e-3


def test_plant_rollout_scheduled():
    """Instrumented plant under scripted forcing: measured chlorine responds
    to a dosing step change mid-run."""
    from ics_wt_physicsengine_tpu.models import plant_rollout_scheduled

    params, plant = make_plant(ReactorConfiguration(n_zones=4), seed=5,
                               dtype=jnp.float64)
    n = 120
    schedule = BoundaryConditions(
        inlet_flow_rate=np.full(n, 5.0),
        chlorine_flow_rate=np.where(np.arange(n) >= 60, 5.0, 0.0),
        chlorine_concentration=np.full(n, 50.0))
    fn = jax.jit(lambda p, s, sch: plant_rollout_scheduled(
        p, s, sch, dt=1.0, substeps=2))
    plant, traj = fn(params, plant, schedule)
    cl = np.asarray(traj["chlorine_inlet"])
    assert cl.shape == (120,)
    first, second = cl[:60], cl[60:]
    first = first[np.isfinite(first)]
    second = second[np.isfinite(second)]
    # dosing step at t=60 injects ~1 mg/L/min into zone 0, where the inlet
    # chlorine analyzer sits: its reading must rise well above both the
    # decay trend and sensor noise within the next minute
    assert second[-10:].mean() > first[-10:].mean() + 0.2


def test_plant_batch_matches_loop_construction():
    """Vectorized make_plant_batch is leaf-for-leaf identical to building
    each plant separately (distinct PRNG seeds) and stacking — guards the
    broadcast + wrap_key_data construction."""
    import numpy as np
    from dataclasses import replace as dcr
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)
    from ics_wt_physicsengine_tpu.models.plant import (
        make_plant, make_plant_batch)

    cfg = ReactorConfiguration(n_zones=4)
    n = 5
    params, state = make_plant_batch(cfg, n, seed=2, dtype=jnp.float32)

    plants = [make_plant(cfg, seed=2 * 100003 + i, dtype=jnp.float32)
              for i in range(n)]

    def stack(*leaves):
        if isinstance(leaves[0], int):
            return leaves[0]
        return jnp.stack([jnp.asarray(v) for v in leaves])

    p_oracle = jax.tree_util.tree_map(stack, *[p for p, _ in plants])
    s_oracle = jax.tree_util.tree_map(stack, *[s for _, s in plants])
    rp, rs = make_monte_carlo_batch(cfg, n, seed=2, dtype=jnp.float32)
    p_oracle = dcr(p_oracle, reactor=rp)
    s_oracle = dcr(s_oracle, reactor=rs)

    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path((params, state)),
            jax.tree_util.tree_leaves_with_path((p_oracle, s_oracle))):
        if hasattr(a, "dtype") and jax.dtypes.issubdtype(
                a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        a, b = np.asarray(a), np.asarray(b)
        eq = (np.array_equal(a, b, equal_nan=True) if a.dtype.kind == "f"
              else np.array_equal(a, b))
        assert eq, path
