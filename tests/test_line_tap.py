"""
The fixed-dt sample-line tap path (models/plant.py::plant_rollout_batched
``line_mode="tap"``) vs the exact in-carry nearest-timestamp ring.

The tap path is the throughput fix for the ablation's headline finding
(tools/ablate_integrated.py): at 16k plants the O(capacity) masked ring
work is ~70% of the whole integrated step. Under uniform dt with
unconditional appends the two schemes resolve the *same stored sample*, so
readings must agree exactly wherever no warm-up/power-fault append-skip
occurs (reference semantics: base_sensor.py:602-615 nearest-timestamp
lookup with delay = volume/flow).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.models.plant import (
    _static_line_taps,
    make_plant_batch,
    plant_rollout_batched,
)

BC = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.2,
                          inlet_chlorine=0.5, inlet_temperature=24.0,
                          acid_flow_rate=0.05)


def _run(line_mode, n_steps=45, seed=21, dt=1.0, n_plants=4):
    params, plant = make_plant_batch(R.ReactorConfiguration(n_zones=4),
                                     n_plants=n_plants, seed=seed,
                                     dtype=jnp.float64)
    # params closed over (concrete) — the tap path needs Python-visible
    # delays; passing params as a traced jit argument falls back to the
    # exact ring (tested in test_auto_warns_on_traced_params).
    fn = jax.jit(lambda s: plant_rollout_batched(
        params, s, BC, dt, 4, n_steps, record=True, line_mode=line_mode)[1])
    return params, fn(plant)


def test_tap_matches_exact_across_fill_boundary():
    """45 steps crosses the 30 s line delay: early (oldest-sample clamp),
    boundary, and steady-state (k-steps-back) regimes all match the exact
    ring bit for bit when no fault/warm-up append-skips occur."""
    params, traj_exact = _run("exact")
    _, traj_tap = _run("tap")

    # Same PRNG streams on both paths -> identical non-line noise; the
    # delayed sample itself is the same stored float. A random open/short
    # fault (p=1e-4/read) would *not* diverge the readings themselves at
    # this length, only the post-fault ring contents; with this seed none
    # fire (checked below via finiteness).
    for name in ("pH_inlet", "pH_outlet", "temp_inlet", "temp_outlet",
                 "chlorine_inlet", "chlorine_outlet", "flow_main"):
        a, b = np.asarray(traj_exact[name]), np.asarray(traj_tap[name])
        assert np.all(np.isfinite(a)), name
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_auto_uses_taps_for_uniform_delays():
    params, _ = make_plant_batch(R.ReactorConfiguration(n_zones=4),
                                 n_plants=3, seed=1, dtype=jnp.float64)
    taps = _static_line_taps(params, dt=1.0)
    assert set(taps) == {"pH_inlet", "pH_outlet", "temp_inlet",
                         "temp_outlet"}
    assert all(k == 30 for k in taps.values())   # 250 mL @ 500 mL/min

    # delay clamped to ring capacity - 1 (exact ring can't reach further)
    cap = params.ph_inlet.base.line_capacity
    taps2 = _static_line_taps(params, dt=30.0 / (cap + 50))
    assert taps2["pH_inlet"] == cap - 1


def test_tap_mode_raises_without_lines():
    import dataclasses
    params, plant = make_plant_batch(R.ReactorConfiguration(n_zones=4),
                                     n_plants=2, seed=2, dtype=jnp.float64)

    def no_line(sp):
        return dataclasses.replace(sp, base=dataclasses.replace(
            sp.base, line_capacity=0))

    params = dataclasses.replace(
        params,
        ph_inlet=no_line(params.ph_inlet),
        ph_outlet=no_line(params.ph_outlet),
        temp_inlet=no_line(params.temp_inlet),
        temp_outlet=no_line(params.temp_outlet))
    try:
        plant_rollout_batched(params, plant, BC, 1.0, 4, 3,
                              line_mode="tap")
        assert False, "expected ValueError"
    except ValueError:
        pass

    # and auto falls back to the exact scan without error
    _, traj = jax.jit(lambda s: plant_rollout_batched(
        params, s, BC, 1.0, 4, 3, line_mode="auto"))(plant)
    assert np.asarray(traj["pH_inlet"]).shape == (3, 2)


def test_per_sensor_rng_matches_manual_stepping():
    """rng_mode='per-sensor' + line_mode='exact' is bit-identical to
    stepping plant_step_batched by hand (the pre-optimization semantics)."""
    from ics_wt_physicsengine_tpu.models.plant import plant_step_batched

    params, plant = make_plant_batch(R.ReactorConfiguration(n_zones=4),
                                     n_plants=3, seed=7, dtype=jnp.float64)
    step = jax.jit(lambda s: plant_step_batched(params, s, BC, 1.0, 4))
    p1, vals = plant, []
    for _ in range(6):
        p1, r = step(p1)
        vals.append(np.asarray(r["pH_inlet"].value))

    _, traj = jax.jit(lambda s: plant_rollout_batched(
        params, s, BC, 1.0, 4, 6, line_mode="exact",
        rng_mode="per-sensor"))(plant)
    np.testing.assert_array_equal(np.asarray(traj["pH_inlet"]),
                                  np.stack(vals))


def test_packed_rng_statistics():
    """Packed randomness preserves the noise statistics: ensemble std of a
    quiet sensor's readings matches the per-sensor-mode std within
    sampling error."""
    params, plant = make_plant_batch(R.ReactorConfiguration(n_zones=4),
                                     n_plants=64, seed=3, dtype=jnp.float64)

    def run(rng_mode):
        _, traj = jax.jit(lambda s: plant_rollout_batched(
            params, s, BC, 1.0, 4, 30, rng_mode=rng_mode))(plant)
        v = np.asarray(traj["temp_outlet"])
        return np.nanstd(v[10:])     # past the lag transient

    s_packed, s_per = run("packed"), run("per-sensor")
    assert 0.5 < s_packed / s_per < 2.0, (s_packed, s_per)


def test_auto_warns_on_traced_params():
    """Params passed as a traced jit argument hide the delay values: 'auto'
    must warn (not silently lose the 4-6x tap speedup), 'tap' must raise
    with an actionable message, and explicit line_taps= restores the tap
    path under the same traced-params call shape (bit-matching the
    closed-over-params run)."""
    import warnings

    params, plant = make_plant_batch(R.ReactorConfiguration(n_zones=4),
                                     n_plants=3, seed=21, dtype=jnp.float64)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _, traj_traced = jax.jit(lambda p, s: plant_rollout_batched(
            p, s, BC, 1.0, 4, 8, line_mode="auto"))(params, plant)
    assert any("traced" in str(w.message) for w in caught), \
        [str(w.message) for w in caught]

    try:
        jax.jit(lambda p, s: plant_rollout_batched(
            p, s, BC, 1.0, 4, 8, line_mode="tap"))(params, plant)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "line_taps" in str(e)

    taps = _static_line_taps(params, dt=1.0)
    _, traj_taps = jax.jit(lambda p, s: plant_rollout_batched(
        p, s, BC, 1.0, 4, 8, line_mode="tap", line_taps=taps))(params, plant)
    _, traj_closed = jax.jit(lambda s: plant_rollout_batched(
        params, s, BC, 1.0, 4, 8, line_mode="tap"))(plant)
    np.testing.assert_array_equal(np.asarray(traj_taps["pH_outlet"]),
                                  np.asarray(traj_closed["pH_outlet"]))


def test_chained_packed_rollouts_draw_fresh_streams():
    """The carried-forward key advances on a fold branch disjoint from the
    rollout's draw root: a chained second rollout must not re-derive any key
    the first consumed (regression: advance == fold_in(key, n_steps) was
    bit-equal to the draw root, so chained calls replayed spent streams)."""
    params, plant = make_plant_batch(R.ReactorConfiguration(n_zones=4),
                                     n_plants=3, seed=9, dtype=jnp.float64)
    run = jax.jit(lambda s: plant_rollout_batched(
        params, s, BC, 1.0, 4, 6, line_mode="exact", rng_mode="packed"))
    p1, traj1 = run(plant)
    # Carried key must differ from every key the rollout drew from:
    # root and fold_in(root, j) for each step j.
    key0 = plant.ph_inlet.base.key.reshape(-1)[0]
    root = jax.random.fold_in(jax.random.fold_in(key0, 6), 0)
    spent = [root] + [jax.random.fold_in(root, j) for j in range(6)]
    carried = p1.ph_inlet.base.key.reshape(-1)[0]
    cd = np.asarray(jax.random.key_data(carried))
    for k in spent:
        assert not np.array_equal(cd, np.asarray(jax.random.key_data(k)))
    # And the chained rollout's readings differ from a replay of the first
    # (same state, different streams -> different noise).
    _, traj2 = run(p1)
    assert not np.array_equal(np.asarray(traj1["temp_outlet"]),
                              np.asarray(traj2["temp_outlet"]))


def test_scheduled_batched_rollout():
    """plant_rollout_batched(schedule=...): per-step scripted forcing over
    the whole ensemble. exact/per-sensor mode must bit-match manual
    stepping with the same per-step boundaries; the tap fast path must
    bit-match the exact ring under the same schedule."""
    from dataclasses import replace as dc_replace

    from ics_wt_physicsengine_tpu.models.plant import plant_step_batched

    n_steps = 12
    params, plant = make_plant_batch(R.ReactorConfiguration(n_zones=4),
                                     n_plants=3, seed=13, dtype=jnp.float64)
    sched = dc_replace(
        BC,
        acid_flow_rate=jnp.where(jnp.arange(n_steps) % 4 < 2, 0.0, 0.4),
        inlet_chlorine=jnp.linspace(0.2, 1.0, n_steps))

    # oracle: manual stepping with the per-step boundary (one trace)
    step = jax.jit(lambda s, b: plant_step_batched(params, s, b, 1.0, 4))
    p1, vals = plant, []
    for j in range(n_steps):
        bc_j = jax.tree_util.tree_map(
            lambda x: x[j] if jnp.ndim(x) >= 1 else x, sched)
        p1, r = step(p1, bc_j)
        vals.append(np.asarray(r["chlorine_outlet"].value))

    _, traj = jax.jit(lambda s: plant_rollout_batched(
        params, s, None, 1.0, 4, n_steps, schedule=sched,
        line_mode="exact", rng_mode="per-sensor"))(plant)
    np.testing.assert_array_equal(np.asarray(traj["chlorine_outlet"]),
                                  np.stack(vals))

    # tap path under the same schedule == exact ring
    run = lambda mode: jax.jit(lambda s: plant_rollout_batched(  # noqa: E731
        params, s, None, 1.0, 4, n_steps, schedule=sched,
        line_mode=mode)[1])(plant)
    a, b = run("exact"), run("tap")
    for name in ("pH_outlet", "temp_inlet", "chlorine_outlet"):
        np.testing.assert_array_equal(np.asarray(a[name]),
                                      np.asarray(b[name]), err_msg=name)

    # length mismatch fails loudly
    bad = dc_replace(BC, acid_flow_rate=jnp.zeros(n_steps + 1))
    try:
        plant_rollout_batched(params, plant, None, 1.0, 4, n_steps,
                              schedule=bad)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "disagree" in str(e)


def test_non_unit_dt_tap():
    """dt=2 s: tap = 15 steps; still matches the exact ring."""
    params, plant = make_plant_batch(R.ReactorConfiguration(n_zones=4),
                                     n_plants=3, seed=5, dtype=jnp.float64)
    run = lambda mode: jax.jit(lambda s: plant_rollout_batched(  # noqa: E731
        params, s, BC, 2.0, 8, 25, line_mode=mode)[1])(plant)
    a, b = run("exact"), run("tap")
    for name in ("pH_outlet", "temp_inlet"):
        np.testing.assert_array_equal(np.asarray(a[name]),
                                      np.asarray(b[name]), err_msg=name)
