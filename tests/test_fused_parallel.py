"""Multi-chip execution of the fused kernels (shard_map over the plant
axis, 8 virtual CPU devices): each device's shard must be bit-identical to
running that shard through the single-device kernel."""

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.models.monte_carlo import make_monte_carlo_batch
from ics_wt_physicsengine_tpu.models.plant import make_plant_batch
from ics_wt_physicsengine_tpu.ops.fused_plant import (
    N_WORDS,
    plant_rollout_fused,
)
from ics_wt_physicsengine_tpu.ops.fused_rollout import _LANES, rollout_fused
from ics_wt_physicsengine_tpu.parallel import make_mesh, shard_batch
from ics_wt_physicsengine_tpu.parallel.fused import (
    sharded_plant_rollout_fused,
    sharded_rollout_fused,
)

BC = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.2,
                          inlet_chlorine=0.5, acid_flow_rate=0.1)


def test_sharded_fused_rollout_matches_single_device():
    n_dev = 8
    base = R.ReactorConfiguration(n_zones=4)
    params, state = make_monte_carlo_batch(base, 2 * n_dev, seed=2,
                                           dtype=jnp.float32)
    mesh = make_mesh(n_dev)
    fn = sharded_rollout_fused(mesh, dt=1.0, substeps=4, n_steps=25)
    out = fn(shard_batch(params, mesh), shard_batch(state, mesh), BC)

    ref = rollout_fused(params, state, BC, dt=1.0, substeps=4, n_steps=25,
                        interpret=True)
    assert np.array_equal(np.asarray(out.pH), np.asarray(ref.pH))
    assert np.array_equal(np.asarray(out.chlorine),
                          np.asarray(ref.chlorine))
    assert np.array_equal(np.asarray(out.temperature),
                          np.asarray(ref.temperature))


def test_sharded_fused_plant_matches_per_shard():
    """Sharded integrated-plant kernel == per-shard single-device calls fed
    the same (replicated) word stream."""
    n_dev = 8
    n_zones = 4
    per_shard = 2
    B = n_dev * per_shard
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    params, plant = make_plant_batch(cfg, B, seed=4, dtype=jnp.float32)

    n_steps = 10
    rng = np.random.default_rng(3)
    # each shard's rows_padded is 8 (2 plants, 32 plants/row at 4 zones)
    bits = rng.integers(-2**31, 2**31,
                        size=(n_steps, N_WORDS, 8, _LANES), dtype=np.int32)

    mesh = make_mesh(n_dev)
    fn = sharded_plant_rollout_fused(mesh, params, dt=1.0, substeps=4,
                                     n_steps=n_steps, record_every=1,
                                     rng="bits", bits=bits)
    out_plant, out_readings = fn(shard_batch(params, mesh),
                                 shard_batch(plant, mesh), BC)

    # oracle: the single-device kernel per shard, same bits
    def shard_slice(tree, d):
        return jax.tree_util.tree_map(
            lambda x: x[d * per_shard:(d + 1) * per_shard]
            if not isinstance(x, int) else x, tree)

    for d in range(n_dev):
        ref_plant, ref_readings = plant_rollout_fused(
            shard_slice(params, d), shard_slice(plant, d), BC, dt=1.0,
            substeps=4, n_steps=n_steps, record_every=1, rng="bits",
            bits=bits, interpret=True)
        sl = slice(d * per_shard, (d + 1) * per_shard)
        got = np.asarray(out_plant.reactor.pH)[sl]
        want = np.asarray(ref_plant.reactor.pH)
        assert np.array_equal(got, want), f"shard {d} pH"
        for rname in ("pH_outlet", "chlorine_outlet", "flow_main"):
            g = np.asarray(out_readings[rname])[:, sl]
            w = np.asarray(ref_readings[rname])
            both_nan = np.isnan(g) & np.isnan(w)
            assert np.array_equal(np.where(both_nan, 0, g),
                                  np.where(both_nan, 0, w)), \
                f"shard {d} {rname}"


def test_sharded_scheduled_plant_matches_per_shard():
    """Scheduled forcing + instruments + shard_map: the full matrix."""
    n_dev = 8
    n_zones = 4
    per_shard = 2
    B = n_dev * per_shard
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    params, plant = make_plant_batch(cfg, B, seed=6, dtype=jnp.float32)

    n_steps = 8
    t = np.arange(n_steps)
    sched = R.BoundaryConditions(
        inlet_flow_rate=(5.0 + np.sin(t / 3.0)).astype(np.float32),
        acid_flow_rate=np.where(t % 4 < 2, 0.0, 0.3).astype(np.float32))
    rng = np.random.default_rng(8)
    bits = rng.integers(-2**31, 2**31,
                        size=(n_steps, N_WORDS, 8, _LANES), dtype=np.int32)

    mesh = make_mesh(n_dev)
    fn = sharded_plant_rollout_fused(mesh, params, dt=1.0, substeps=4,
                                     n_steps=n_steps, record_every=1,
                                     rng="bits", bits=bits, scheduled=True)
    out_plant, out_readings = fn(shard_batch(params, mesh),
                                 shard_batch(plant, mesh), sched)

    def shard_slice(tree, d):
        return jax.tree_util.tree_map(
            lambda x: x[d * per_shard:(d + 1) * per_shard]
            if not isinstance(x, int) else x, tree)

    for d in (0, 3, 7):
        ref_plant, ref_readings = plant_rollout_fused(
            shard_slice(params, d), shard_slice(plant, d), sched, dt=1.0,
            substeps=4, n_steps=n_steps, record_every=1, rng="bits",
            bits=bits, interpret=True)
        sl = slice(d * per_shard, (d + 1) * per_shard)
        assert np.array_equal(np.asarray(out_plant.reactor.pH)[sl],
                              np.asarray(ref_plant.reactor.pH)), f"shard {d}"
        g = np.asarray(out_readings["pH_outlet"])[:, sl]
        w = np.asarray(ref_readings["pH_outlet"])
        both_nan = np.isnan(g) & np.isnan(w)
        assert np.array_equal(np.where(both_nan, 0, g),
                              np.where(both_nan, 0, w)), f"shard {d}"
