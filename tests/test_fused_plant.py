"""Fused integrated-plant kernel vs the XLA plant_step scan.

Both paths consume the *identical* random word stream (the kernel via its
``rng="bits"`` injection, the oracle via the sensors' ``rand`` hook fed
through ``rand_from_words``), so the comparison isolates the kernel's
arithmetic: physics, taps, sample-line history, and the full sensor fault /
noise / drift pipeline. Runs in interpreter mode on the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.models.plant import (
    make_plant,
    make_plant_batch,
    plant_step,
)
from ics_wt_physicsengine_tpu.ops.fused_plant import (
    N_WORDS,
    SENSORS,
    _RAND,
    _WORD_OFFSET,
    plant_rollout_fused,
    rand_from_words,
    words_per_sensor,
)
from ics_wt_physicsengine_tpu.ops.fused_rollout import _LANES, _unpack_state

BC = R.BoundaryConditions(
    inlet_flow_rate=5.0, inlet_pH=7.2, inlet_chlorine=0.5,
    inlet_temperature=26.0, acid_flow_rate=0.1, acid_concentration=0.1,
    ambient_temperature=15.0, heat_loss_coefficient=50.0)


def _oracle_rollout(params, plant, bc, bits, dt, substeps, n_steps, batch,
                    n_zones, single=False):
    """XLA plant_step scan consuming the kernel's word stream (each plant's
    zone-0 lane)."""
    plants_per_row = _LANES // n_zones

    def plant_words(plane):
        w = _unpack_state(plane, batch, n_zones, plants_per_row)[:, 0]
        return w[0] if single else w

    # [n_steps, N_WORDS, B] per-plant words
    words = jnp.stack([
        jnp.stack([plant_words(bits[i, w]) for w in range(N_WORDS)])
        for i in range(n_steps)])

    def stack_cols(cols):
        return jnp.stack([jnp.asarray(c, jnp.float32) for c in cols.cols],
                         axis=-1)

    def body(p, w):
        rand = {}
        for rname, attr, kind in SENSORS:
            n_n, n_u = _RAND[kind]
            w0 = _WORD_OFFSET[attr]
            sensor_words = [w[w0 + k] for k in range(words_per_sensor(kind))]
            normals, uniforms = rand_from_words(sensor_words, n_n, n_u)
            rand[rname] = (stack_cols(normals), stack_cols(uniforms))
        if single:
            p, readings = plant_step(params, p, bc, dt, substeps, rand=rand)
        else:
            # the delay ring needs per-plant vmap (like plant_step_batched)
            p, readings = jax.vmap(
                lambda pp, st, rd: plant_step(pp, st, bc, dt, substeps,
                                              rand=rd))(params, p, rand)
        return p, {k: v.value for k, v in readings.items()}

    return jax.lax.scan(body, plant, words)


@pytest.mark.parametrize("batch", [None, 5])
def test_fused_plant_matches_xla_oracle(batch):
    n_zones = 5
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, n_steps = 1.0, 12
    substeps = R.default_substeps(cfg, dt)
    if batch is None:
        params, plant = make_plant(cfg, seed=3, dtype=jnp.float32)
        b = 1
    else:
        params, plant = make_plant_batch(cfg, batch, seed=3,
                                         dtype=jnp.float32)
        b = batch

    plants_per_row = _LANES // n_zones
    rows = -(-b // plants_per_row)
    rows_padded = max(rows, 8)
    rng = np.random.default_rng(0)
    bits = rng.integers(-2**31, 2**31, size=(n_steps, N_WORDS, rows_padded,
                                             _LANES), dtype=np.int32)

    new_plant, readings = plant_rollout_fused(
        params, plant, BC, dt=dt, substeps=substeps, n_steps=n_steps,
        rng="bits", bits=bits, interpret=True)

    o_plant, o_readings = _oracle_rollout(
        params, plant, BC, jnp.asarray(bits), dt, substeps, n_steps, b,
        n_zones, single=batch is None)

    # physics
    np.testing.assert_allclose(np.asarray(new_plant.reactor.pH),
                               np.asarray(o_plant.reactor.pH),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_plant.reactor.chlorine),
                               np.asarray(o_plant.reactor.chlorine),
                               rtol=0, atol=2e-5)
    assert float(np.ravel(np.asarray(new_plant.reactor.time))[0]) == \
        pytest.approx(float(np.ravel(np.asarray(o_plant.reactor.time))[0]))

    # measured-value trajectories, every sensor
    for rname, attr, kind in SENSORS:
        got = np.asarray(readings[rname])
        want = np.asarray(o_readings[rname])
        if batch is None:
            want = want.reshape(got.shape)
        both_nan = np.isnan(got) & np.isnan(want)
        np.testing.assert_allclose(np.where(both_nan, 0.0, got),
                                   np.where(both_nan, 0.0, want),
                                   rtol=0, atol=5e-4, err_msg=rname)

    # sensor scalar carries (spot-check the drift/fouling accumulators)
    for attr, field in [("ph_outlet", "membrane_fouling"),
                        ("ph_outlet", "reference_contamination"),
                        ("chlorine_inlet", "membrane_age_days"),
                        ("chlorine_outlet", "reagent_potency"),
                        ("flow_main", "electrode_fouling"),
                        ("temp_outlet", "cold_junction_drift")]:
        got = np.asarray(getattr(getattr(new_plant, attr), field))
        want = np.asarray(getattr(getattr(o_plant, attr), field))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5,
                                   err_msg=f"{attr}.{field}")
    for attr in ("ph_inlet", "flow_main", "temp_inlet"):
        got = np.asarray(getattr(new_plant, attr).base.current_value)
        want = np.asarray(getattr(o_plant, attr).base.current_value)
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-4,
                                   err_msg=f"{attr}.current_value")


def test_fused_plant_sample_line_delay():
    """The in-kernel circular history reproduces the delayed-sample rule
    across the delay boundary (delay_steps = 30 > and < n_steps)."""
    n_zones = 4
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, n_steps = 1.0, 40           # crosses the 30 s pH line delay
    substeps = R.default_substeps(cfg, dt)
    params, plant = make_plant(cfg, seed=11, dtype=jnp.float32)

    plants_per_row = _LANES // n_zones
    rng = np.random.default_rng(4)
    bits = rng.integers(-2**31, 2**31,
                        size=(n_steps, N_WORDS, 8, _LANES), dtype=np.int32)

    _, readings = plant_rollout_fused(
        params, plant, BC, dt=dt, substeps=substeps, n_steps=n_steps,
        rng="bits", bits=bits, interpret=True)
    o_plant, o_readings = _oracle_rollout(
        params, plant, BC, jnp.asarray(bits), dt, substeps, n_steps, 1,
        n_zones, single=True)

    got = np.asarray(readings["pH_outlet"]).ravel()
    want = np.asarray(o_readings["pH_outlet"]).ravel()
    both_nan = np.isnan(got) & np.isnan(want)
    np.testing.assert_allclose(np.where(both_nan, 0, got),
                               np.where(both_nan, 0, want),
                               rtol=0, atol=5e-4)


def test_fused_plant_scheduled_matches_xla():
    """Per-step boundary schedule + full sensor suite in one kernel matches
    the XLA plant_step scan driven with the same per-step BCs and words
    (the reference HIL loop shape). Crosses the 512-step SMEM chunk."""
    import ics_wt_physicsengine_tpu.ops.fused_plant as FP

    n_zones = 4
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, n_steps = 1.0, 50
    # shrink the SMEM slab so the test crosses a chunk boundary cheaply
    old_chunk = FP._PLANT_SCHED_CHUNK
    FP._PLANT_SCHED_CHUNK = 32
    substeps = R.default_substeps(cfg, dt)
    params, plant = make_plant(cfg, seed=5, dtype=jnp.float32)

    t_axis = np.arange(n_steps)
    sched = R.BoundaryConditions(
        inlet_flow_rate=(5.0 + 2.0 * np.sin(2 * np.pi * t_axis / 17.0)
                         ).astype(np.float32),
        inlet_pH=7.2,
        inlet_chlorine=np.where(t_axis % 10 < 5, 0.5, 1.5).astype(np.float32),
        acid_flow_rate=np.where(t_axis % 8 < 4, 0.0, 0.3).astype(np.float32),
        ambient_temperature=15.0, heat_loss_coefficient=50.0)

    rng = np.random.default_rng(9)
    bits = rng.integers(-2**31, 2**31,
                        size=(n_steps, N_WORDS, 8, _LANES), dtype=np.int32)

    try:
        new_plant, readings = plant_rollout_fused(
            params, plant, sched, dt=dt, substeps=substeps,
            n_steps=n_steps, record_every=1, rng="bits", bits=bits,
            interpret=True)
    finally:
        FP._PLANT_SCHED_CHUNK = old_chunk

    # oracle: scan plant_step over (words, per-step bc)
    plants_per_row = _LANES // n_zones

    def plant_words(plane):
        return _unpack_state(plane, 1, n_zones, plants_per_row)[0, 0]

    words = jnp.stack([
        jnp.stack([plant_words(jnp.asarray(bits)[i, w])
                   for w in range(N_WORDS)])
        for i in range(n_steps)])
    bcs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n_steps,)),
        sched)

    def body(p, xs):
        w, bc = xs
        rand = {}
        for rname, attr, kind in SENSORS:
            n_n, n_u = _RAND[kind]
            w0 = _WORD_OFFSET[attr]
            sensor_words = [w[w0 + k] for k in range(words_per_sensor(kind))]
            normals, uniforms = rand_from_words(sensor_words, n_n, n_u)
            rand[rname] = (jnp.stack(normals.cols, -1),
                           jnp.stack(uniforms.cols, -1))
        p, r = plant_step(params, p, bc, dt, substeps, rand=rand)
        return p, {k: v.value for k, v in r.items()}

    o_plant, o_readings = jax.lax.scan(body, plant, (words, bcs))

    np.testing.assert_allclose(np.asarray(new_plant.reactor.pH),
                               np.asarray(o_plant.reactor.pH),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(new_plant.reactor.chlorine),
                               np.asarray(o_plant.reactor.chlorine),
                               rtol=0, atol=5e-5)
    assert float(np.ravel(np.asarray(new_plant.reactor.flow_rate))[0]) == \
        pytest.approx(float(np.asarray(sched.inlet_flow_rate)[-1])
                      + float(np.asarray(sched.acid_flow_rate)[-1]))
    for rname, _, _ in SENSORS:
        got = np.asarray(readings[rname]).ravel()
        want = np.asarray(o_readings[rname]).ravel()
        both_nan = np.isnan(got) & np.isnan(want)
        np.testing.assert_allclose(np.where(both_nan, 0, got),
                                   np.where(both_nan, 0, want),
                                   rtol=0, atol=1e-3, err_msg=rname)


def test_fused_plant_record_every_decimation():
    """record_every=k returns every k-th reading of the record_every=1 run
    (same bits => same trajectory, just decimated)."""
    n_zones = 5
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, n_steps = 1.0, 12
    substeps = R.default_substeps(cfg, dt)
    params, plant = make_plant(cfg, seed=8, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    bits = rng.integers(-2**31, 2**31,
                        size=(n_steps, N_WORDS, 8, _LANES), dtype=np.int32)

    p1, full = plant_rollout_fused(
        params, plant, BC, dt=dt, substeps=substeps, n_steps=n_steps,
        record_every=1, rng="bits", bits=bits, interpret=True)
    p4, deci = plant_rollout_fused(
        params, plant, BC, dt=dt, substeps=substeps, n_steps=n_steps,
        record_every=4, rng="bits", bits=bits, interpret=True)

    for rname, _, _ in SENSORS:
        a = np.asarray(full[rname])[3::4]
        b = np.asarray(deci[rname])
        both_nan = np.isnan(a) & np.isnan(b)
        assert np.array_equal(np.where(both_nan, 0, a),
                              np.where(both_nan, 0, b)), rname
    assert np.array_equal(np.asarray(p1.reactor.pH),
                          np.asarray(p4.reactor.pH))


def test_fused_plant_nonunit_dt_delay():
    """dt=2 s: the static delay conversion (round(30/2)=15 steps) matches
    the oracle ring's time-based nearest lookup."""
    n_zones = 4
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, n_steps = 2.0, 40            # crosses the 15-step delay boundary
    substeps = R.default_substeps(cfg, dt)
    params, plant = make_plant(cfg, seed=13, dtype=jnp.float32)

    rng = np.random.default_rng(6)
    bits = rng.integers(-2**31, 2**31,
                        size=(n_steps, N_WORDS, 8, _LANES), dtype=np.int32)

    _, readings = plant_rollout_fused(
        params, plant, BC, dt=dt, substeps=substeps, n_steps=n_steps,
        rng="bits", bits=bits, interpret=True)
    o_plant, o_readings = _oracle_rollout(
        params, plant, BC, jnp.asarray(bits), dt, substeps, n_steps, 1,
        n_zones, single=True)

    for rname in ("pH_outlet", "temp_outlet"):
        got = np.asarray(readings[rname]).ravel()
        want = np.asarray(o_readings[rname]).ravel()
        both_nan = np.isnan(got) & np.isnan(want)
        np.testing.assert_allclose(np.where(both_nan, 0, got),
                                   np.where(both_nan, 0, want),
                                   rtol=0, atol=1e-3, err_msg=rname)


def test_fused_plant_plants_on_lanes_matches_xla():
    """The plants-on-lanes layout (layout='pl': one plant per lane, zones
    on the major axis) matches the XLA oracle with the same word stream."""
    n_zones = 5
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, n_steps = 1.0, 12
    substeps = R.default_substeps(cfg, dt)
    B = 6
    params, plant = make_plant_batch(cfg, B, seed=3, dtype=jnp.float32)

    rows_padded = 8
    rng = np.random.default_rng(1)
    bits = rng.integers(-2**31, 2**31, size=(n_steps, N_WORDS, rows_padded,
                                             _LANES), dtype=np.int32)

    new_plant, readings = plant_rollout_fused(
        params, plant, BC, dt=dt, substeps=substeps, n_steps=n_steps,
        rng="bits", bits=bits, interpret=True, layout="pl")

    # oracle: plant p lives at (row p//128, lane p%128)
    def plant_words(plane):
        return plane.reshape(rows_padded * _LANES)[:B]

    words = jnp.stack([
        jnp.stack([plant_words(jnp.asarray(bits)[i, w])
                   for w in range(N_WORDS)])
        for i in range(n_steps)])

    def body(p, w):
        rand = {}
        for rname, attr, kind in SENSORS:
            n_n, n_u = _RAND[kind]
            w0 = _WORD_OFFSET[attr]
            sensor_words = [w[w0 + k] for k in range(words_per_sensor(kind))]
            normals, uniforms = rand_from_words(sensor_words, n_n, n_u)
            rand[rname] = (jnp.stack(normals.cols, -1),
                           jnp.stack(uniforms.cols, -1))
        p, r = jax.vmap(
            lambda pp, st, rd: plant_step(pp, st, BC, dt, substeps,
                                          rand=rd))(params, p, rand)
        return p, {k: v.value for k, v in r.items()}

    o_plant, o_readings = jax.lax.scan(body, plant, words)

    np.testing.assert_allclose(np.asarray(new_plant.reactor.pH),
                               np.asarray(o_plant.reactor.pH),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_plant.reactor.chlorine),
                               np.asarray(o_plant.reactor.chlorine),
                               rtol=0, atol=2e-5)
    for rname, attr, kind in SENSORS:
        got = np.asarray(readings[rname])
        want = np.asarray(o_readings[rname])
        both_nan = np.isnan(got) & np.isnan(want)
        np.testing.assert_allclose(np.where(both_nan, 0.0, got),
                                   np.where(both_nan, 0.0, want),
                                   rtol=0, atol=5e-4, err_msg=rname)
    for attr in ("ph_outlet", "chlorine_inlet", "temp_outlet"):
        got = np.asarray(getattr(new_plant, attr).base.current_value)
        want = np.asarray(getattr(o_plant, attr).base.current_value)
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-4,
                                   err_msg=f"{attr}.current_value")


def test_fused_plant_heterogeneous_delays_match_xla():
    """Per-plant sample-line delays (lifted in round 3): a batch whose
    plants have DIFFERENT line delays must bit-match the XLA exact-ring
    oracle with the same word stream (the kernel gathers each lane's own
    tap; delays are exact multiples of dt so nearest-timestamp rounding
    cannot tie)."""
    import dataclasses

    n_zones = 4
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, n_steps, B = 1.0, 30, 5
    substeps = R.default_substeps(cfg, dt)
    params, plant = make_plant_batch(cfg, B, seed=21, dtype=jnp.float32)

    def set_delays(sensor_params, delays):
        return dataclasses.replace(
            sensor_params, base=dataclasses.replace(
                sensor_params.base,
                line_delay_s=jnp.asarray(delays, jnp.float32)))

    params = dataclasses.replace(
        params,
        ph_inlet=set_delays(params.ph_inlet, [3.0, 10.0, 0.0, 25.0, 7.0]),
        ph_outlet=set_delays(params.ph_outlet, [12.0, 12.0, 5.0, 1.0, 0.0]),
        temp_inlet=set_delays(params.temp_inlet, [0.0, 4.0, 9.0, 2.0, 18.0]))

    plants_per_row = _LANES // n_zones
    rng = np.random.default_rng(17)
    bits = rng.integers(-2**31, 2**31,
                        size=(n_steps, N_WORDS, 8, _LANES), dtype=np.int32)

    _, readings = plant_rollout_fused(
        params, plant, BC, dt=dt, substeps=substeps, n_steps=n_steps,
        rng="bits", bits=bits, interpret=True)
    o_plant, o_readings = _oracle_rollout(
        params, plant, BC, jnp.asarray(bits), dt, substeps, n_steps, B,
        n_zones)

    for rname in ("pH_inlet", "pH_outlet", "temp_inlet", "temp_outlet"):
        got = np.asarray(readings[rname])
        want = np.asarray(o_readings[rname])
        both_nan = np.isnan(got) & np.isnan(want)
        np.testing.assert_allclose(np.where(both_nan, 0, got),
                                   np.where(both_nan, 0, want),
                                   rtol=0, atol=5e-4, err_msg=rname)


def test_fused_plant_arbitrary_zone_taps_match_xla():
    """Sensors may tap ANY zone (lifted in round 3: previously inlet /
    outlet only): mid-zone pH, chlorine, and temperature sensors must
    match the XLA oracle."""
    import dataclasses

    n_zones = 5
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, n_steps = 1.0, 12
    substeps = R.default_substeps(cfg, dt)
    params, plant = make_plant(cfg, seed=31, dtype=jnp.float32)
    params = dataclasses.replace(
        params,
        ph_inlet=dataclasses.replace(params.ph_inlet, zone_index=2),
        chlorine_inlet=dataclasses.replace(params.chlorine_inlet,
                                           zone_index=3),
        temp_outlet=dataclasses.replace(params.temp_outlet, zone_index=-4))

    rng = np.random.default_rng(23)
    bits = rng.integers(-2**31, 2**31,
                        size=(n_steps, N_WORDS, 8, _LANES), dtype=np.int32)

    _, readings = plant_rollout_fused(
        params, plant, BC, dt=dt, substeps=substeps, n_steps=n_steps,
        rng="bits", bits=bits, interpret=True)
    o_plant, o_readings = _oracle_rollout(
        params, plant, BC, jnp.asarray(bits), dt, substeps, n_steps, 1,
        n_zones, single=True)

    for rname in ("pH_inlet", "chlorine_inlet", "temp_outlet"):
        got = np.asarray(readings[rname]).ravel()
        want = np.asarray(o_readings[rname]).ravel()
        both_nan = np.isnan(got) & np.isnan(want)
        np.testing.assert_allclose(np.where(both_nan, 0, got),
                                   np.where(both_nan, 0, want),
                                   rtol=0, atol=5e-4, err_msg=rname)


def test_fused_plant_consumes_incoming_ring():
    """Ring consumption (lifted in round 3): after K XLA steps populate
    the sample-line rings, continuing with the fused kernel must resolve
    its first ``delay`` reads from that pre-rollout history, matching an
    XLA continuation sample for sample (previously the kernel restarted
    every line from scratch, losing up to ``delay`` steps of history)."""
    n_zones = 4
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt = 1.0
    k_pre, n_steps = 8, 20          # delay=30 > k_pre: whole run is lead-in
    substeps = R.default_substeps(cfg, dt)
    params, plant = make_plant(cfg, seed=41, dtype=jnp.float32)

    rng = np.random.default_rng(29)
    bits_pre = rng.integers(-2**31, 2**31,
                            size=(k_pre, N_WORDS, 8, _LANES),
                            dtype=np.int32)
    bits_main = rng.integers(-2**31, 2**31,
                             size=(n_steps, N_WORDS, 8, _LANES),
                             dtype=np.int32)

    # phase 1 (XLA): populate the rings
    plant1, _ = _oracle_rollout(params, plant, BC, jnp.asarray(bits_pre),
                                dt, substeps, k_pre, 1, n_zones,
                                single=True)
    assert int(np.asarray(plant1.ph_inlet.base.line_count)) == k_pre

    # phase 2: fused continuation vs XLA continuation, same words
    _, readings = plant_rollout_fused(
        params, plant1, BC, dt=dt, substeps=substeps, n_steps=n_steps,
        rng="bits", bits=bits_main, interpret=True)
    _, o_readings = _oracle_rollout(params, plant1, BC,
                                    jnp.asarray(bits_main), dt, substeps,
                                    n_steps, 1, n_zones, single=True)

    for rname in ("pH_inlet", "pH_outlet", "temp_inlet", "temp_outlet"):
        got = np.asarray(readings[rname]).ravel()
        want = np.asarray(o_readings[rname]).ravel()
        both_nan = np.isnan(got) & np.isnan(want)
        np.testing.assert_allclose(np.where(both_nan, 0, got),
                                   np.where(both_nan, 0, want),
                                   rtol=0, atol=5e-4, err_msg=rname)

    # and consume_line=False restores the old fresh-line behavior
    _, fresh = plant_rollout_fused(
        params, plant1, BC, dt=dt, substeps=substeps, n_steps=n_steps,
        rng="bits", bits=bits_main, interpret=True, consume_line=False)
    assert not np.allclose(
        np.nan_to_num(np.asarray(fresh["pH_inlet"])),
        np.nan_to_num(np.asarray(readings["pH_inlet"])))


def test_plant_rollout_auto_dispatch():
    """plant_rollout_auto: on CPU it must route to the XLA paths (single
    and batched) and return the standard (plant, readings) shape; the
    fused kernel is TPU-only under auto dispatch."""
    from ics_wt_physicsengine_tpu.models.plant import plant_rollout_auto

    n_zones = 4
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, n_steps = 1.0, 6
    substeps = R.default_substeps(cfg, dt)

    params, plant = make_plant(cfg, seed=2, dtype=jnp.float32)
    p2, traj = plant_rollout_auto(params, plant, BC, dt, substeps, n_steps)
    assert np.asarray(traj["pH_inlet"]).shape == (n_steps,)
    assert float(np.asarray(p2.reactor.time)) == pytest.approx(n_steps * dt)

    bparams, bplant = make_plant_batch(cfg, 3, seed=2, dtype=jnp.float32)
    p3, btraj = plant_rollout_auto(bparams, bplant, BC, dt, substeps,
                                   n_steps)
    assert np.asarray(btraj["pH_inlet"]).shape == (n_steps, 3)
    p4, none = plant_rollout_auto(bparams, bplant, BC, dt, substeps,
                                  n_steps, record=False)
    assert none is None


def test_fused_plant_scheduled_hetero_delays_ring_consumption():
    """The hard corner: per-step boundary SCHEDULE (chunked SMEM
    streaming) x heterogeneous per-plant delays x incoming-ring
    consumption, with the lead-in window spanning a chunk boundary —
    must still match the XLA oracle sample for sample."""
    import dataclasses

    import ics_wt_physicsengine_tpu.ops.fused_plant as FP

    n_zones = 4
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, k_pre, n_steps, B = 1.0, 6, 40, 3
    substeps = R.default_substeps(cfg, dt)
    params, plant = make_plant_batch(cfg, B, seed=51, dtype=jnp.float32)

    def set_delays(sp, delays):
        return dataclasses.replace(sp, base=dataclasses.replace(
            sp.base, line_delay_s=jnp.asarray(delays, jnp.float32)))

    params = dataclasses.replace(
        params,
        ph_inlet=set_delays(params.ph_inlet, [4.0, 20.0, 11.0]),
        temp_outlet=set_delays(params.temp_outlet, [0.0, 7.0, 25.0]))

    rng = np.random.default_rng(37)
    bits_pre = rng.integers(-2**31, 2**31,
                            size=(k_pre, N_WORDS, 8, _LANES),
                            dtype=np.int32)
    bits_main = rng.integers(-2**31, 2**31,
                             size=(n_steps, N_WORDS, 8, _LANES),
                             dtype=np.int32)

    # phase 1 (XLA, constant BC): populate the rings
    plant1, _ = _oracle_rollout(params, plant, BC, jnp.asarray(bits_pre),
                                dt, substeps, k_pre, B, n_zones)

    # phase 2: per-step schedule; chunk shrunk so the 20/25-step lead-in
    # windows span chunk boundaries
    t_axis = np.arange(n_steps)
    sched = R.BoundaryConditions(
        inlet_flow_rate=(5.0 + 2.0 * np.sin(2 * np.pi * t_axis / 13.0)
                         ).astype(np.float32),
        inlet_pH=7.2,
        inlet_chlorine=np.where(t_axis % 9 < 4, 0.5, 1.2
                                ).astype(np.float32),
        acid_flow_rate=np.where(t_axis % 7 < 3, 0.0, 0.2
                                ).astype(np.float32))

    old_chunk = FP._PLANT_SCHED_CHUNK
    FP._PLANT_SCHED_CHUNK = 16
    try:
        _, readings = plant_rollout_fused(
            params, plant1, sched, dt=dt, substeps=substeps,
            n_steps=n_steps, rng="bits", bits=bits_main, interpret=True)
    finally:
        FP._PLANT_SCHED_CHUNK = old_chunk

    # oracle: per-step BCs + same words, exact rings carried from phase 1
    plants_per_row = _LANES // n_zones

    def plant_words(plane):
        return _unpack_state(plane, B, n_zones, plants_per_row)[:, 0]

    words = jnp.stack([
        jnp.stack([plant_words(jnp.asarray(bits_main)[i, w])
                   for w in range(N_WORDS)])
        for i in range(n_steps)])
    bcs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n_steps,)),
        sched)

    def body(p, xs):
        w, bc = xs
        rand = {}
        for rname, attr, kind in SENSORS:
            n_n, n_u = _RAND[kind]
            w0 = _WORD_OFFSET[attr]
            sw = [w[w0 + k] for k in range(words_per_sensor(kind))]
            normals, uniforms = rand_from_words(sw, n_n, n_u)
            rand[rname] = (jnp.stack(normals.cols, -1),
                           jnp.stack(uniforms.cols, -1))
        p, r = jax.vmap(
            lambda pp, st, rd: plant_step(pp, st, bc, dt, substeps,
                                          rand=rd))(params, p, rand)
        return p, {k: v.value for k, v in r.items()}

    _, o_readings = jax.lax.scan(body, plant1, (words, bcs))

    for rname in ("pH_inlet", "pH_outlet", "temp_inlet", "temp_outlet",
                  "chlorine_outlet"):
        got = np.asarray(readings[rname])
        want = np.asarray(o_readings[rname])
        both_nan = np.isnan(got) & np.isnan(want)
        np.testing.assert_allclose(np.where(both_nan, 0, got),
                                   np.where(both_nan, 0, want),
                                   rtol=0, atol=1e-3, err_msg=rname)


def test_fused_plant_writes_ring_back():
    """Round 3: the kernel's circular histories are written back and the
    carry rings reconstructed, so a fused -> XLA continuation resolves
    its sample-line lookups exactly (previously the ring left a fused
    rollout stale and a continuation lost up to `delay` samples)."""
    n_zones = 4
    cfg = R.ReactorConfiguration(n_zones=n_zones)
    dt, k1, k2 = 1.0, 35, 20       # k1 > the 30-step delay
    substeps = R.default_substeps(cfg, dt)
    params, plant = make_plant(cfg, seed=61, dtype=jnp.float32)

    rng = np.random.default_rng(41)
    bits1 = rng.integers(-2**31, 2**31, size=(k1, N_WORDS, 8, _LANES),
                         dtype=np.int32)
    bits2 = rng.integers(-2**31, 2**31, size=(k2, N_WORDS, 8, _LANES),
                         dtype=np.int32)

    # fused phase 1 -> XLA phase 2
    plant_f, _ = plant_rollout_fused(
        params, plant, BC, dt=dt, substeps=substeps, n_steps=k1,
        rng="bits", bits=bits1, interpret=True)
    assert int(np.asarray(plant_f.ph_inlet.base.line_count)) > 0
    _, readings_fx = _oracle_rollout(params, plant_f, BC,
                                     jnp.asarray(bits2), dt, substeps, k2,
                                     1, n_zones, single=True)

    # oracle: XLA all the way (phase-1 word streams replayed identically)
    plant_o, _ = _oracle_rollout(params, plant, BC, jnp.asarray(bits1),
                                 dt, substeps, k1, 1, n_zones, single=True)
    _, readings_oo = _oracle_rollout(params, plant_o, BC,
                                     jnp.asarray(bits2), dt, substeps, k2,
                                     1, n_zones, single=True)

    for rname in ("pH_inlet", "pH_outlet", "temp_inlet", "temp_outlet"):
        got = np.asarray(readings_fx[rname]).ravel()
        want = np.asarray(readings_oo[rname]).ravel()
        both_nan = np.isnan(got) & np.isnan(want)
        np.testing.assert_allclose(np.where(both_nan, 0, got),
                                   np.where(both_nan, 0, want),
                                   rtol=0, atol=2e-3, err_msg=rname)
