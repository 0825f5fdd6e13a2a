"""
Learned plant surrogate (models/surrogate.py).

The bar: the surrogate must BEAT the trivial identity predictor by a
wide margin one-step (skill ratio < 0.5 per field on held-out
trajectories), hold its open-loop drift over a 24-minute horizon,
plan MPC moves that control the TRUE physics plant as well as
physics-shooting MPC does, survive bfloat16 inference, checkpoint
round-trip bit-exactly, and shard its batch axis over the device mesh
unchanged. Training data comes from the exact engine, so every test
is an engine-vs-surrogate comparison with no external fixtures.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.models import surrogate as SG

Z = 6
DT = 30.0


def _config():
    return R.ReactorConfiguration(
        volume=1000.0, n_zones=Z, flow_rate=5.0, initial_pH=7.2,
        initial_chlorine=2.0, temperature=20.0)


@pytest.fixture(scope="module")
def trained():
    """One shared surrogate + held-out data (training dominates this
    module's runtime; every test reads from it)."""
    config = _config()
    params = R.make_params(config, dtype=jnp.float32)
    substeps = R.default_substeps(config, DT)
    bc = R.BoundaryConditions()
    X, U = SG.make_surrogate_dataset(
        params, Z, bc, jax.random.PRNGKey(0), 256, 48, DT, substeps)
    sp, info = SG.train_surrogate(
        X, U, Z, jax.random.PRNGKey(1), hidden=(128, 128),
        n_steps=4000, batch_size=2048, rollout_steps=400)
    Xv, Uv = SG.make_surrogate_dataset(
        params, Z, bc, jax.random.PRNGKey(99), 24, 48, DT, substeps)
    return {"config": config, "params": params, "substeps": substeps,
            "bc": bc, "sp": sp, "info": info, "Xv": Xv, "Uv": Uv}


def _field_block(i):
    return slice(i * Z, (i + 1) * Z)


def test_dataset_shapes_and_bounds(trained):
    Xv, Uv = trained["Xv"], trained["Uv"]
    assert Xv.shape == (24, 49, 3 * Z) and Uv.shape == (24, 48, 1)
    x = np.asarray(Xv)
    assert (x[..., _field_block(0)] >= 0).all()      # pH
    assert (x[..., _field_block(0)] <= 14).all()
    assert (x[..., _field_block(1)] >= 0).all()      # chlorine
    assert np.asarray(Uv).min() >= 0.0
    assert np.asarray(Uv).max() <= 1.0               # chlorine pump limit


def test_untrained_surrogate_is_identity_dynamics():
    """Zero-initialized output layer: with neutral normalization the
    fresh surrogate is exactly x' = clip(x)."""
    n, m = 3 * Z, 1
    ws = SG._init_mlp(jax.random.PRNGKey(0), (n + m, 32, n))
    sp = SG.SurrogateParams(
        weights=ws, x_mean=jnp.zeros(n), x_std=jnp.ones(n),
        u_scale=jnp.ones(m), r_mean=jnp.zeros(n), r_std=jnp.ones(n),
        lo=jnp.full(n, -1e9), hi=jnp.full(n, 1e9))
    x = jnp.linspace(0.0, 5.0, n)
    np.testing.assert_array_equal(
        np.asarray(SG.surrogate_step(sp, x, jnp.asarray([0.3]))),
        np.asarray(x))


def test_one_step_skill_beats_identity(trained):
    """Held-out one-step error < half the trivial predictor's, for
    every core field."""
    sp, Xv, Uv = trained["sp"], trained["Xv"], trained["Uv"]
    pred = SG.surrogate_step(sp, Xv[:, :-1], Uv)
    err = np.asarray(pred - Xv[:, 1:])
    res = np.asarray(Xv[:, 1:] - Xv[:, :-1])
    for i, field in enumerate(("pH", "chlorine", "temperature")):
        skill = err[..., _field_block(i)].std() \
            / res[..., _field_block(i)].std()
        assert skill < 0.5, f"{field}: skill ratio {skill:.3f}"


def test_multistep_drift_bounded(trained):
    """48-step (24 sim-minutes) open-loop rollout stays within tight
    absolute error of the physics trajectory."""
    sp, Xv, Uv = trained["sp"], trained["Xv"], trained["Uv"]
    roll = jax.vmap(lambda x0, us: SG.surrogate_rollout(sp, x0, us))(
        Xv[:, 0], Uv)
    d = np.asarray(roll - Xv[:, 1:])
    assert d[..., _field_block(1)].std() < 0.05    # chlorine [mg/L]
    assert d[..., _field_block(2)].std() < 0.08    # temperature [C]
    assert np.isfinite(d).all()


def test_surrogate_mpc_controls_true_plant(trained):
    """Receding-horizon MPC planning through the SURROGATE controls the
    exact physics plant to the same tracking score physics-shooting MPC
    reaches on the same program (within 10%)."""
    from ics_wt_physicsengine_tpu.control.mpc import run_mpc
    config, sp = trained["config"], trained["sp"]
    prog = np.concatenate([np.full(45, 1.5), np.full(45, 2.5)]) \
        .astype(np.float32)
    out = SG.run_mpc_surrogate(config, sp, prog, dt=DT, horizon_moves=4,
                               steps_per_move=15, iters=15)
    ref = run_mpc(config, prog, dt=DT, horizon_moves=4,
                  steps_per_move=15, iters=15)
    assert out["score"] < ref["score"] * 1.10, \
        f"surrogate {out['score']:.2f} vs physics {ref['score']:.2f}"
    # and in absolute terms the second setpoint segment is held
    cl = np.asarray(out["chlorine_outlet"])
    assert np.abs(cl[-15:] - 2.5).mean() < 0.15


def test_bfloat16_inference_close(trained):
    """The MXU-native compute dtype tracks f32 inference to the normal
    bf16 tolerance (state-scaled)."""
    sp, Xv, Uv = trained["sp"], trained["Xv"], trained["Uv"]
    x, u = Xv[0, 0], Uv[0, 0]
    a = np.asarray(SG.surrogate_step(sp, x, u))
    b = np.asarray(SG.surrogate_step(sp, x, u,
                                     compute_dtype=jnp.bfloat16))
    scale = np.asarray(sp.x_std)
    assert (np.abs(a - b) / scale).max() < 0.05


def test_checkpoint_roundtrip(trained, tmp_path):
    """SurrogateParams is a plain pytree: save/load via
    utils.checkpoint reproduces predictions bit-exactly."""
    from ics_wt_physicsengine_tpu.utils.checkpoint import (load_pytree,
                                                           save_pytree)
    sp, Xv, Uv = trained["sp"], trained["Xv"], trained["Uv"]
    path = str(tmp_path / "surrogate.npz")
    save_pytree(path, sp, metadata={"n_zones": Z})
    sp2 = load_pytree(path, sp)
    a = np.asarray(SG.surrogate_step(sp, Xv[0, 0], Uv[0, 0]))
    b = np.asarray(SG.surrogate_step(sp2, Xv[0, 0], Uv[0, 0]))
    np.testing.assert_array_equal(a, b)


def test_sharded_batch_matches_single_device(trained):
    """Inference batch axis shards over the 8-device mesh unchanged."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    sp, Xv, Uv = trained["sp"], trained["Xv"], trained["Uv"]
    xb = Xv[:16, 0]
    ub = Uv[:16, 0]
    y0 = np.asarray(SG.surrogate_step(sp, xb, ub))
    mesh = Mesh(np.array(devs[:8]), ("b",))
    xs = jax.device_put(xb, NamedSharding(mesh, P("b", None)))
    us = jax.device_put(ub, NamedSharding(mesh, P("b", None)))
    y1 = np.asarray(jax.jit(SG.surrogate_step)(sp, xs, us))
    # f32 matmul partitioning may legally reassociate the reduction;
    # states are O(10), so 1e-4 abs ~ 1e-5 relative
    np.testing.assert_allclose(y1, y0, rtol=0, atol=1e-4)


def test_disinfection_axis_rejected():
    """The surrogate state layout follows the EKF's flat vector, which
    has no disinfection fields — constructing a dataset for such a
    plant fails loudly instead of silently dropping pathogen state."""
    config = dataclasses.replace(_config(), enable_disinfection=True)
    params = R.make_params(config, dtype=jnp.float32)
    with pytest.raises(NotImplementedError, match="disinfection"):
        SG.make_surrogate_dataset(
            params, Z, R.BoundaryConditions(), jax.random.PRNGKey(0),
            4, 4, DT, 2)


def test_training_is_deterministic(trained):
    """Same data + same key -> identical weights (PRNG-threaded
    minibatching, no host randomness)."""
    config, params = trained["config"], trained["params"]
    bc, substeps = trained["bc"], trained["substeps"]
    X, U = SG.make_surrogate_dataset(
        params, Z, bc, jax.random.PRNGKey(5), 16, 16, DT, substeps)
    sp_a, _ = SG.train_surrogate(X, U, Z, jax.random.PRNGKey(2),
                                 hidden=(16,), n_steps=50,
                                 batch_size=64)
    sp_b, _ = SG.train_surrogate(X, U, Z, jax.random.PRNGKey(2),
                                 hidden=(16,), n_steps=50,
                                 batch_size=64)
    for wa, wb in zip(sp_a.weights, sp_b.weights):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))

def test_extension_axes_supported():
    """The surrogate layout follows the EKF flat vector generically:
    a nitrogen+gas plant (11 fields x zones) datasets, trains, and
    steps with finite in-domain predictions."""
    config = dataclasses.replace(_config(), enable_nitrogen=True,
                                 enable_gas=True,
                                 initial_ammonia=0.5)
    params = R.make_params(config, dtype=jnp.float32)
    substeps = R.default_substeps(config, DT)
    X, U = SG.make_surrogate_dataset(
        params, Z, R.BoundaryConditions(), jax.random.PRNGKey(0),
        8, 12, DT, substeps)
    n = 9 * Z   # pH|Cl|T + 4 nitrogen + O2|C_T
    assert X.shape == (8, 13, n)
    sp, info = SG.train_surrogate(
        X, U, Z, jax.random.PRNGKey(1), hidden=(32,), n_steps=100,
        batch_size=64, rollout_steps=0, nitrogen=True, gas=True)
    pred = SG.surrogate_step(sp, X[0, 0], U[0, 0])
    assert pred.shape == (n,)
    assert bool(jnp.all(jnp.isfinite(pred)))
    assert bool(jnp.all(pred >= sp.lo) and jnp.all(pred <= sp.hi))
