"""Plant-batch sharding over the 8-virtual-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8), plus Monte-Carlo batch assembly
and the driver entry points."""

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.models.monte_carlo import make_monte_carlo_batch
from ics_wt_physicsengine_tpu.parallel import (
    make_mesh, shard_batch, sharded_step)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_monte_carlo_batch_shapes():
    base = R.ReactorConfiguration(n_zones=4)
    params, state = make_monte_carlo_batch(base, 16, seed=1,
                                           dtype=jnp.float64)
    assert params.n_zones == 4
    assert params.k_exchange.shape == (16,)
    assert params.chem.Kw.shape == (16,)
    assert state.pH.shape == (16, 4)
    # distinct plants were actually sampled
    assert float(np.std(np.asarray(params.k_exchange))) > 0


def test_sharded_step_matches_unsharded():
    base = R.ReactorConfiguration(n_zones=4)
    params, state = make_monte_carlo_batch(base, 16, seed=2,
                                           dtype=jnp.float64)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, acid_flow_rate=0.2)

    plain = jax.jit(
        lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))(params, state, bc)

    mesh = make_mesh(8)
    params_s = shard_batch(params, mesh)
    state_s = shard_batch(state, mesh)
    sharded = sharded_step(mesh, dt=1.0, substeps=4)(params_s, state_s, bc)

    np.testing.assert_allclose(np.asarray(sharded.pH), np.asarray(plain.pH),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sharded.chlorine),
                               np.asarray(plain.chlorine), rtol=0, atol=1e-12)
    # leading axis is genuinely sharded over the mesh
    assert len(sharded.pH.sharding.device_set) == 8


def test_batched_monte_carlo_diverges_per_plant():
    """Different sampled parameters must yield different trajectories."""
    base = R.ReactorConfiguration(n_zones=4)
    params, state = make_monte_carlo_batch(base, 8, seed=3, dtype=jnp.float64)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_chlorine=0.0)
    final, _ = jax.jit(lambda p, s, b: R.rollout(
        p, s, b, dt=1.0, substeps=4, n_steps=50, record=False))(
            params, state, bc)
    cl = np.asarray(final.chlorine)
    assert np.std(cl[:, 0]) > 1e-4


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    ph, cl_meas, ph_meas = jax.jit(fn)(*args)
    jax.block_until_ready(ph)
    assert ph.shape == (20,)
    assert np.all(np.isfinite(np.asarray(ph)))
    # instrument readings: finite (fresh warmed-up sensors) and in range
    assert 0.0 < float(cl_meas) < 5.0
    assert 4.0 < float(ph_meas) < 10.0


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_ensemble_statistics_sharded():
    from ics_wt_physicsengine_tpu.parallel import (
        ensemble_statistics, exceedance_probability)

    base = R.ReactorConfiguration(n_zones=4)
    params, state = make_monte_carlo_batch(base, 32, seed=5,
                                           dtype=jnp.float64)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_chlorine=0.1)
    mesh = make_mesh(8)
    params_s = shard_batch(params, mesh)
    state_s = shard_batch(state, mesh)
    final, _ = jax.jit(lambda p, s, b: R.rollout(
        p, s, b, dt=1.0, substeps=4, n_steps=30, record=False))(
            params_s, state_s, bc)

    stats = jax.jit(ensemble_statistics)(final)
    assert stats["pH"]["mean"].shape == (4,)
    assert stats["pH"]["quantiles"].shape == (3, 4)
    assert float(stats["pH"]["std"].max()) > 0      # plants diverged
    assert stats["n_plants"] == 32

    probs = jax.jit(exceedance_probability)(final)
    for key, v in probs.items():
        assert 0.0 <= float(v) <= 1.0


def test_exceedance_threshold_params():
    from ics_wt_physicsengine_tpu.parallel import exceedance_probability

    base = R.ReactorConfiguration(n_zones=4)
    params, state = make_monte_carlo_batch(base, 16, seed=6,
                                           dtype=jnp.float64)
    # everything violates with absurd thresholds
    probs = exceedance_probability(state, ph_low=13.9, ph_high=14.1,
                                   chlorine_min=100.0)
    assert float(probs["p_any_violation"]) == 1.0
    # nothing violates with permissive thresholds
    probs2 = exceedance_probability(state, ph_low=0.0, ph_high=14.0,
                                    chlorine_min=0.0)
    assert float(probs2["p_any_violation"]) == 0.0


def test_monte_carlo_batch_matches_loop_construction():
    """The vectorized batch builder is leaf-for-leaf identical to building
    each sampled plant separately and stacking (the round-1 implementation).
    Guards the elementwise-float64 equivalence the vectorization relies on."""
    from ics_wt_physicsengine_tpu.models.monte_carlo import ParameterRanges

    base = R.ReactorConfiguration(n_zones=4)
    n = 6
    params, state = make_monte_carlo_batch(base, n, seed=3,
                                           dtype=jnp.float32)

    ranges = ParameterRanges()
    rng = np.random.default_rng(3)
    samples = {name: rng.uniform(lo, hi, n)
               for name, (lo, hi) in ranges.ranges.items()}
    ratio = rng.uniform(*ranges.alkalinity_ratio, n)
    samples["alkalinity"] = ratio * 50.0 * samples["total_carbonate"]
    p_list, s_list = [], []
    for i in range(n):
        kwargs = {name: float(vals[i]) for name, vals in samples.items()}
        cfg = R.ReactorConfiguration(**{**base.__dict__, **kwargs})
        p_list.append(R.make_params(cfg, dtype=jnp.float32))
        s_list.append(R.make_initial_state(cfg, dtype=jnp.float32))

    def stack(*leaves):
        return leaves[0] if isinstance(leaves[0], int) else np.stack(leaves)

    p_oracle = jax.tree_util.tree_map(stack, *p_list)
    s_oracle = jax.tree_util.tree_map(stack, *s_list)
    for built, oracle in ((params, p_oracle), (state, s_oracle)):
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(built),
                jax.tree_util.tree_leaves_with_path(oracle)):
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape, (path, a.shape, b.shape)
            assert np.array_equal(a, b), path


def test_monte_carlo_batch_is_host_pure():
    """Batch construction must not commit arrays to any device: the driver's
    multi-chip dryrun builds the batch before placing it on the (possibly
    non-default) mesh backend (round-1 failure MULTICHIP_r01.json)."""
    base = R.ReactorConfiguration(n_zones=4)
    params, state = make_monte_carlo_batch(base, 8, seed=0,
                                           dtype=jnp.float32)
    for leaf in jax.tree_util.tree_leaves((params, state)):
        assert not isinstance(leaf, jax.Array), type(leaf)


def test_graft_entry_device_probe_skips_short_backends():
    from ics_wt_physicsengine_tpu.utils.backend_select import select_devices

    devs = select_devices(8)
    assert len(devs) == 8
    # all selected devices come from one backend
    assert len({d.platform for d in devs}) == 1
