"""
Integrated plant model: physics + the full sensor suite in one jitted step.

This is BASELINE config 3 ("full sensor suite on") as a single device-side
state transition: the reactor advances dt, then all seven instruments read
the new state through their scan-carried pipelines (delays, drift, fouling,
faults) — no host round-trips between physics and instrumentation. The
orchestrator's host loop only touches the device once per tick (or once per
scan of many ticks).

Also provides the named BASELINE benchmark configurations (configs 1-5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.sensors import ammonia as SA
from ics_wt_physicsengine_tpu.sensors import base as SB
from ics_wt_physicsengine_tpu.sensors import chlorine as SC
from ics_wt_physicsengine_tpu.sensors import flow as SF
from ics_wt_physicsengine_tpu.sensors import oxygen as SO
from ics_wt_physicsengine_tpu.sensors import turbidity as STB
from ics_wt_physicsengine_tpu.core import particles as PC
from ics_wt_physicsengine_tpu.sensors import ph as SP
from ics_wt_physicsengine_tpu.sensors import temperature as ST
from ics_wt_physicsengine_tpu.sensors.types import InstallationQuality, SampleLine


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PlantParams:
    reactor: R.ReactorParams
    ph_inlet: SP.PHSensorParams
    ph_outlet: SP.PHSensorParams
    chlorine_inlet: SC.ChlorineSensorParams
    chlorine_outlet: SC.ChlorineSensorParams
    flow_main: SF.FlowSensorParams
    temp_inlet: ST.TemperatureSensorParams
    temp_outlet: ST.TemperatureSensorParams
    # the nitrogen chemistry's instrument (None unless enable_nitrogen)
    ammonia_outlet: Optional[SA.AmmoniaSensorParams] = None
    # the gas-exchange instrument (None unless enable_gas)
    oxygen_outlet: Optional[SO.OxygenSensorParams] = None
    # the particle-dynamics instrument (None unless enable_particles)
    turbidity_outlet: Optional[STB.TurbiditySensorParams] = None


@jax.tree_util.register_dataclass
@dataclass
class PlantState:
    reactor: R.ReactorState
    ph_inlet: SP.PHSensorCarry
    ph_outlet: SP.PHSensorCarry
    chlorine_inlet: SC.ChlorineSensorCarry
    chlorine_outlet: SC.ChlorineSensorCarry
    flow_main: SF.FlowSensorCarry
    temp_inlet: ST.TemperatureSensorCarry
    temp_outlet: ST.TemperatureSensorCarry
    ammonia_outlet: Optional[SA.AmmoniaSensorCarry] = None
    oxygen_outlet: Optional[SO.OxygenSensorCarry] = None
    turbidity_outlet: Optional[STB.TurbiditySensorCarry] = None


def make_plant(config: R.ReactorConfiguration, seed: int = 0,
               dtype=jnp.float32, warmed_up: bool = True, t0: float = 0.0
               ) -> Tuple[PlantParams, PlantState]:
    """Build the canonical 7-sensor plant (sensor layout matching
    create_realistic_sensor_suite, reference sensors/__init__.py:41-120).

    ``warmed_up=True`` backdates power-on so instruments read immediately
    (otherwise the first 1800 s of readings are warm-up NaN, as in the
    reference)."""
    import numpy as np
    from dataclasses import replace as dc_replace

    good_installation = InstallationQuality(
        flow_velocity=0.5, air_bubble_frequency=0.0, grounding_quality=0.9,
        pipe_vibration_g=0.1, ambient_temperature=30.0)
    line = SampleLine(volume_mL=250, flow_rate_mL_min=500, ambient_temp=25.0)

    keys = jax.random.split(jax.random.key(seed), 7)
    # the optional 8th instrument's key comes from a FOLD, not an 8-way
    # split: splitting 8 would change all seven legacy streams and break
    # seed-pinned reproducibility (cf. CHANGELOG round-2 note)
    am_key = jax.random.fold_in(jax.random.key(seed), 7)
    ox_key = jax.random.fold_in(jax.random.key(seed), 8)
    tb_key = jax.random.fold_in(jax.random.key(seed), 9)

    ph_in_p = SP.make_ph_params(zone_index=0, sample_line=line,
                                installation=good_installation, dtype=dtype)
    ph_out_p = SP.make_ph_params(zone_index=-1, sample_line=line,
                                 installation=good_installation, dtype=dtype)
    cl_in_p = SC.make_chlorine_params(zone_index=0,
                                      sensor_type=SC.AMPEROMETRIC,
                                      installation=good_installation,
                                      dtype=dtype)
    cl_out_p = SC.make_chlorine_params(zone_index=-1, sensor_type=SC.DPD,
                                       installation=good_installation,
                                       dtype=dtype)
    fl_p = SF.make_flow_params(sensor_type=SF.MAGNETIC,
                               full_scale=config.flow_rate * 2.0,
                               installation=good_installation, dtype=dtype)
    t_in_p = ST.make_temperature_params(zone_index=0,
                                        sensor_type=ST.RTD_PT100,
                                        sample_line=line,
                                        installation=good_installation,
                                        dtype=dtype)
    t_out_p = ST.make_temperature_params(zone_index=-1,
                                         sensor_type=ST.RTD_PT100,
                                         sample_line=line,
                                         installation=good_installation,
                                         dtype=dtype)

    am_p = None
    if getattr(config, "enable_nitrogen", False):
        am_p = SA.make_ammonia_params(zone_index=-1,
                                      installation=good_installation,
                                      dtype=dtype)
    ox_p = None
    if getattr(config, "enable_gas", False):
        ox_p = SO.make_oxygen_params(zone_index=-1,
                                     sensor_type=SO.OPTICAL,
                                     installation=good_installation,
                                     dtype=dtype)
    tb_p = None
    if getattr(config, "enable_particles", False):
        tb_p = STB.make_turbidity_params(zone_index=-1,
                                         installation=good_installation,
                                         dtype=dtype)

    params = PlantParams(
        reactor=R.make_params(config, dtype=dtype),
        ph_inlet=ph_in_p, ph_outlet=ph_out_p,
        chlorine_inlet=cl_in_p, chlorine_outlet=cl_out_p,
        flow_main=fl_p, temp_inlet=t_in_p, temp_outlet=t_out_p,
        ammonia_outlet=am_p, oxygen_outlet=ox_p, turbidity_outlet=tb_p)

    def backdate(carry, base_params):
        if not warmed_up:
            return carry
        # ``t0`` anchors the warm start (0.0 at construction; maintenance
        # rebuilds pass the current sim time so calibration age and warm-up
        # restart from the maintenance instant, not from sim start).
        t_on = t0 - float(np.asarray(base_params.warmup_time_s)) - 1.0
        return dc_replace(carry, base=dc_replace(
            carry.base,
            power_on_time=np.asarray(t_on, dtype),
            last_calibration_time=np.asarray(t0, dtype),
            has_calibration=np.asarray(True)))

    state = PlantState(
        reactor=R.make_initial_state(config, dtype=dtype),
        ph_inlet=backdate(SP.make_ph_carry(ph_in_p, keys[0], dtype=dtype),
                          ph_in_p.base),
        ph_outlet=backdate(SP.make_ph_carry(ph_out_p, keys[1], dtype=dtype),
                           ph_out_p.base),
        chlorine_inlet=backdate(
            SC.make_chlorine_carry(cl_in_p, keys[2], dtype=dtype),
            cl_in_p.base),
        chlorine_outlet=backdate(
            SC.make_chlorine_carry(cl_out_p, keys[3], dtype=dtype),
            cl_out_p.base),
        flow_main=backdate(SF.make_flow_carry(fl_p, keys[4], dtype=dtype),
                           fl_p.base),
        temp_inlet=backdate(
            ST.make_temperature_carry(t_in_p, keys[5], dtype=dtype),
            t_in_p.base),
        temp_outlet=backdate(
            ST.make_temperature_carry(t_out_p, keys[6], dtype=dtype),
            t_out_p.base),
        ammonia_outlet=None if am_p is None else backdate(
            SA.make_ammonia_carry(am_p, am_key, dtype=dtype), am_p.base),
        oxygen_outlet=None if ox_p is None else backdate(
            SO.make_oxygen_carry(ox_p, ox_key, dtype=dtype), ox_p.base),
        turbidity_outlet=None if tb_p is None else backdate(
            STB.make_turbidity_carry(tb_p, tb_key, dtype=dtype),
            tb_p.base))
    return params, state


def _zone(arr, idx: int):
    return arr[..., idx]


def plant_step(params: PlantParams, plant: PlantState,
               boundary: R.BoundaryConditions, dt: float, substeps: int,
               stages=None, rand=None, delayed=None
               ) -> Tuple[PlantState, Dict[str, SB.SensorOutput]]:
    """Advance physics by dt, then read all seven instruments — one pure
    function, jittable and batchable. ``stages`` selects the RKC2
    integrator for the physics (core/reactor.py::step). ``rand``: optional
    ``{sensor_name: (normals, uniforms)}`` supplying every instrument's
    randomness externally (sensor-module N_NORMALS/N_UNIFORMS layouts) —
    used by the fused kernel's bit-match oracle; None draws from each
    carry's own key. ``delayed``: optional ``{sensor_name: value}`` of
    externally resolved sample-line taps (pH/temperature sensors only) —
    the fixed-dt fast path resolves delays outside (see
    ``plant_rollout_batched(line_mode=...)``); the caller must pass params
    with ``line_capacity=0`` for those sensors."""
    state = R.step(params.reactor, plant.reactor, boundary, dt=dt,
                   substeps=substeps, stages=stages)
    return _read_all(params, state, plant, rand=rand, delayed=delayed)


def _read_all(params: PlantParams, state: R.ReactorState, plant: PlantState,
              rand=None, delayed=None
              ) -> Tuple[PlantState, Dict[str, SB.SensorOutput]]:
    """Read all seven instruments against an already-stepped reactor state
    (the sensor half of ``plant_step``)."""
    t = state.time
    rand = rand or {}
    delayed = delayed or {}

    ph_in_c, ph_in = SP.ph_read(
        params.ph_inlet, plant.ph_inlet,
        _zone(state.pH, params.ph_inlet.zone_index),
        _zone(state.temperature, params.ph_inlet.zone_index), t,
        rand=rand.get("pH_inlet"), delayed_true=delayed.get("pH_inlet"))
    ph_out_c, ph_out = SP.ph_read(
        params.ph_outlet, plant.ph_outlet,
        _zone(state.pH, params.ph_outlet.zone_index),
        _zone(state.temperature, params.ph_outlet.zone_index), t,
        rand=rand.get("pH_outlet"), delayed_true=delayed.get("pH_outlet"))
    # total-chlorine sensors respond to free + combined; the combined
    # (chloramine) species exists only under the nitrogen chemistry
    def _combined(sensor_params):
        if state.chloramine is None:
            return None
        return _zone(state.chloramine, sensor_params.zone_index)

    cl_in_c, cl_in = SC.chlorine_read(
        params.chlorine_inlet, plant.chlorine_inlet,
        _zone(state.chlorine, params.chlorine_inlet.zone_index),
        _zone(state.pH, params.chlorine_inlet.zone_index), t,
        combined_zone=_combined(params.chlorine_inlet),
        rand=rand.get("chlorine_inlet"))
    cl_out_c, cl_out = SC.chlorine_read(
        params.chlorine_outlet, plant.chlorine_outlet,
        _zone(state.chlorine, params.chlorine_outlet.zone_index),
        _zone(state.pH, params.chlorine_outlet.zone_index), t,
        combined_zone=_combined(params.chlorine_outlet),
        rand=rand.get("chlorine_outlet"))
    fl_c, fl = SF.flow_read(params.flow_main, plant.flow_main,
                            state.flow_rate, t, rand=rand.get("flow_main"))
    t_in_c, t_in = ST.temperature_read(
        params.temp_inlet, plant.temp_inlet,
        _zone(state.temperature, params.temp_inlet.zone_index), t,
        rand=rand.get("temp_inlet"), delayed_true=delayed.get("temp_inlet"))
    t_out_c, t_out = ST.temperature_read(
        params.temp_outlet, plant.temp_outlet,
        _zone(state.temperature, params.temp_outlet.zone_index), t,
        rand=rand.get("temp_outlet"), delayed_true=delayed.get("temp_outlet"))

    am_c, am = plant.ammonia_outlet, None
    if params.ammonia_outlet is not None and state.ammonia is not None:
        ap = params.ammonia_outlet
        am_c, am = SA.ammonia_read(
            ap, plant.ammonia_outlet,
            _zone(state.ammonia, ap.zone_index),
            _zone(state.pH, ap.zone_index),
            _zone(state.temperature, ap.zone_index), t,
            rand=rand.get("ammonia_outlet"))

    ox_c, ox = plant.oxygen_outlet, None
    if params.oxygen_outlet is not None and state.oxygen is not None:
        op = params.oxygen_outlet
        ox_c, ox = SO.oxygen_read(
            op, plant.oxygen_outlet,
            _zone(state.oxygen, op.zone_index),
            _zone(state.temperature, op.zone_index),
            state.flow_rate, t,
            rand=rand.get("oxygen_outlet"))

    tb_c, tb = plant.turbidity_outlet, None
    if params.turbidity_outlet is not None and state.tss is not None:
        tp = params.turbidity_outlet
        true_ntu = PC.turbidity_ntu_tap(_zone(state.tss, tp.zone_index),
                                        params.reactor.particles)
        tb_c, tb = STB.turbidity_read(
            tp, plant.turbidity_outlet, true_ntu, t,
            rand=rand.get("turbidity_outlet"))

    new_plant = PlantState(
        reactor=state, ph_inlet=ph_in_c, ph_outlet=ph_out_c,
        chlorine_inlet=cl_in_c, chlorine_outlet=cl_out_c, flow_main=fl_c,
        temp_inlet=t_in_c, temp_outlet=t_out_c, ammonia_outlet=am_c,
        oxygen_outlet=ox_c, turbidity_outlet=tb_c)
    readings = {
        "pH_inlet": ph_in, "pH_outlet": ph_out,
        "chlorine_inlet": cl_in, "chlorine_outlet": cl_out,
        "flow_main": fl, "temp_inlet": t_in, "temp_outlet": t_out,
    }
    if am is not None:
        readings["ammonia_outlet"] = am
    if ox is not None:
        readings["oxygen_outlet"] = ox
    if tb is not None:
        readings["turbidity_outlet"] = tb
    return new_plant, readings


def plant_rollout(params: PlantParams, plant: PlantState,
                  boundary: R.BoundaryConditions, dt: float, substeps: int,
                  n_steps: int, record: bool = True, stages=None,
                  unroll: int = 1, remat: bool = False):
    """Scan plant_step over n_steps inside one jit: physics + instruments.

    ``unroll`` batches scan iterations into one loop body: the integrated
    step is hundreds of tiny fused ops, so per-iteration loop overhead
    dominates at small batch and unrolling amortizes it. Compile time grows
    with the unroll factor (the integrated step is a large graph and this
    environment's remote compiles are minutes) — the default stays 1;
    throughput-critical offline rollouts should pass 4-8."""

    def body(p, _):
        p, readings = plant_step(params, p, boundary, dt, substeps,
                                 stages=stages)
        out = ({k: v.value for k, v in readings.items()} if record else None)
        return p, out

    if remat:   # long-horizon gradients: see core.reactor.rollout
        body = jax.checkpoint(body)
    return jax.lax.scan(body, plant, None, length=n_steps,
                        unroll=min(unroll, n_steps))


def _normalize_schedule(schedule: R.BoundaryConditions):
    """Broadcast a mixed scalar/[n_steps] boundary pytree to uniform
    [n_steps] leaves; returns (schedule, n_steps)."""
    import jax.numpy as jnp

    lengths = {int(x.shape[0]) for x in jax.tree_util.tree_leaves(schedule)
               if jnp.ndim(x) >= 1}
    if not lengths:
        raise ValueError("schedule has no [n_steps] leaves; use "
                         "plant_rollout() for constant boundary conditions")
    if len(lengths) > 1:
        raise ValueError(f"schedule leaves disagree on n_steps: {lengths}")
    n_steps = lengths.pop()
    schedule = jax.tree_util.tree_map(
        lambda x: (jnp.broadcast_to(jnp.asarray(x), (n_steps,))
                   if jnp.ndim(x) == 0 else x), schedule)
    return schedule, n_steps


def plant_rollout_scheduled(params: PlantParams, plant: PlantState,
                            schedule: R.BoundaryConditions, dt: float,
                            substeps: int, record: bool = True,
                            stages=None):
    """Scan plant_step over a time-varying boundary schedule (see
    core.reactor.rollout_scheduled): physics + all seven instruments under
    scripted forcing — e.g. measured-value response to a dosing program
    without a live control loop."""
    schedule, n_steps = _normalize_schedule(schedule)

    def body(p, bc):
        p, readings = plant_step(params, p, bc, dt, substeps, stages=stages)
        out = ({k: v.value for k, v in readings.items()} if record else None)
        return p, out

    return jax.lax.scan(body, plant, schedule, length=n_steps)


def plant_rollout_serve(params: PlantParams, plant: PlantState,
                        schedule: R.BoundaryConditions, dt: float,
                        substeps: int, stages=None):
    """One fast-time HIL serving chunk (SURVEY §7 hard-part 4): advance the
    plant ``n_steps`` in a SINGLE device call under a per-step boundary
    schedule (zero-order-held validated commands, plus any host-precomputed
    actuator-slew trajectory), recording the FULL SensorOutput pytree every
    step. The host then exports the final step as the register snapshot and
    a decimated slice as history — without re-entering the device.

    This replaces the reference's one-step-per-host-tick serving pattern
    (reference __main__.py:453-457, ~31 steps/s ceiling): with chunking the
    served plane runs at device rollout speed between register exchanges.

    Returns ``(final_plant, per_step_readings)`` where every leaf of
    ``per_step_readings[name]`` is ``[n_steps]``-shaped.
    """
    schedule, n_steps = _normalize_schedule(schedule)

    def body(p, bc):
        p, readings = plant_step(params, p, bc, dt, substeps, stages=stages)
        return p, readings

    return jax.lax.scan(body, plant, schedule, length=n_steps)


def make_plant_batch(config: R.ReactorConfiguration, n_plants: int,
                     seed: int = 0, dtype=jnp.float32,
                     randomize: bool = True, warmed_up: bool = True,
                     t0: float = 0.0):
    """Batched integrated plants: physics params randomized per plant
    (models/monte_carlo.py ranges) and per-plant sensor PRNG streams —
    BASELINE configs 3 + 4 combined. Returns (params, state) pytrees with
    leading [n_plants] axes, consumable by ``plant_step_batched``."""
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)

    import numpy as np

    if n_plants < 1:
        raise ValueError(f"n_plants must be >= 1, got {n_plants}")
    if randomize:
        reactor_params, reactor_states = make_monte_carlo_batch(
            config, n_plants, seed=seed, dtype=dtype)
    else:
        single_p = R.make_params(config, dtype=dtype)
        single_s = R.make_initial_state(config, dtype=dtype)

        def np_bcast(x):
            if isinstance(x, int):
                return x
            x = np.asarray(x)
            return np.broadcast_to(x, (n_plants,) + x.shape).copy()

        reactor_params = jax.tree_util.tree_map(np_bcast, single_p)
        reactor_states = jax.tree_util.tree_map(np_bcast, single_s)

    # Sensor stacks: every plant shares the same static sensor configuration
    # — the ONLY per-plant difference is the PRNG key — so build the pytrees
    # once and broadcast, instead of constructing n_plants full plants in a
    # host loop (65,536 plants: milliseconds instead of minutes on this
    # 1-core host).
    template_p, template_s = make_plant(config, seed=0, dtype=dtype,
                                        warmed_up=warmed_up, t0=t0)

    def bcast(x):
        if isinstance(x, int):
            return x
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            return x        # placeholder; per-plant keys grafted below
        x = np.asarray(x)
        return np.broadcast_to(x, (n_plants,) + x.shape).copy()

    params = jax.tree_util.tree_map(bcast, template_p)
    state = jax.tree_util.tree_map(bcast, template_s)

    # Per-plant key streams, identical to the loop construction's
    # jax.random.split(jax.random.key(seed*100003 + i), 7): threefry seeds
    # pack a 64-bit integer as (hi, lo) uint32 words, built here as one
    # vectorized wrap_key_data + vmapped split.
    s64 = (seed * 100003 + np.arange(n_plants)).astype(np.uint64)
    key_data = np.stack([(s64 >> np.uint64(32)).astype(np.uint32),
                         (s64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
                        axis=-1)
    base_keys = jax.random.wrap_key_data(key_data)           # [n_plants]
    keys = jax.vmap(lambda k: jax.random.split(k, 7))(base_keys)
    am_keys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(base_keys)
    ox_keys = jax.vmap(lambda k: jax.random.fold_in(k, 8))(base_keys)
    tb_keys = jax.vmap(lambda k: jax.random.fold_in(k, 9))(base_keys)

    from dataclasses import replace as dc_replace

    def with_key(carry, k):
        return dc_replace(carry, base=dc_replace(carry.base, key=k))

    state = PlantState(
        reactor=reactor_states,
        ph_inlet=with_key(state.ph_inlet, keys[:, 0]),
        ph_outlet=with_key(state.ph_outlet, keys[:, 1]),
        chlorine_inlet=with_key(state.chlorine_inlet, keys[:, 2]),
        chlorine_outlet=with_key(state.chlorine_outlet, keys[:, 3]),
        flow_main=with_key(state.flow_main, keys[:, 4]),
        temp_inlet=with_key(state.temp_inlet, keys[:, 5]),
        temp_outlet=with_key(state.temp_outlet, keys[:, 6]),
        ammonia_outlet=None if state.ammonia_outlet is None
        else with_key(state.ammonia_outlet, am_keys),
        oxygen_outlet=None if state.oxygen_outlet is None
        else with_key(state.oxygen_outlet, ox_keys),
        turbidity_outlet=None if state.turbidity_outlet is None
        else with_key(state.turbidity_outlet, tb_keys))
    params = dc_replace(params, reactor=reactor_params)
    return params, state


def plant_step_batched(params: PlantParams, plant: PlantState,
                       boundary: R.BoundaryConditions, dt: float,
                       substeps: int, stages=None, rand=None,
                       boundary_axes=None):
    """vmap of plant_step over the leading plant axis. (The physics is
    natively batched, but sensor PRNG keys must split per lane, so the
    integrated plant batches through vmap.) ``rand``: optional externally
    drawn randomness, ``{sensor: (normals[n, k], uniforms[n, k])}`` — see
    ``draw_packed_rand``. ``boundary_axes=0`` maps a BoundaryConditions
    with leading [n_plants] leaves per lane (fleet mode: one independently
    controlled boundary per plant); None broadcasts one boundary."""
    if rand is None:
        return jax.vmap(
            lambda p, s, b: plant_step(p, s, b, dt, substeps,
                                       stages=stages),
            in_axes=(0, 0, boundary_axes))(params, plant, boundary)
    return jax.vmap(
        lambda p, s, b, r: plant_step(p, s, b, dt, substeps,
                                      stages=stages, rand=r),
        in_axes=(0, 0, boundary_axes, 0))(params, plant, boundary, rand)


# Canonical order + per-sensor randomness widths (base layout first, then
# each overlay's extra draws — sensors/<type>.py N_NORMALS/N_UNIFORMS).
_RAND_LAYOUT = (
    ("pH_inlet", SP.N_NORMALS, SP.N_UNIFORMS),
    ("pH_outlet", SP.N_NORMALS, SP.N_UNIFORMS),
    ("chlorine_inlet", SC.N_NORMALS, SC.N_UNIFORMS),
    ("chlorine_outlet", SC.N_NORMALS, SC.N_UNIFORMS),
    ("flow_main", SF.N_NORMALS, SF.N_UNIFORMS),
    ("temp_inlet", ST.N_NORMALS, ST.N_UNIFORMS),
    ("temp_outlet", ST.N_NORMALS, ST.N_UNIFORMS),
)
_TOT_N = sum(n for _, n, _ in _RAND_LAYOUT)
_TOT_U = sum(u for _, _, u in _RAND_LAYOUT)


def draw_packed_rand(key, batch_shape, dtype):
    """All seven instruments' per-read randomness in two batched generates
    from one key (instead of seven per-plant key splits + fourteen
    generates): every element is still an independent standard draw —
    independence across plants/sensors comes from the generate counter
    rather than per-plant key streams. Returns the ``rand=`` dict consumed
    by ``plant_step``/``_read_all``."""
    kn, ku = jax.random.split(key)
    normals = jax.random.normal(kn, batch_shape + (_TOT_N,), dtype)
    uniforms = jax.random.uniform(ku, batch_shape + (_TOT_U,), dtype)
    rand, i, j = {}, 0, 0
    for name, nn, nu in _RAND_LAYOUT:
        rand[name] = (normals[..., i:i + nn], uniforms[..., j:j + nu])
        i, j = i + nn, j + nu
    return rand


# Sensors whose read functions accept an externally resolved sample tap
# (reading name -> PlantParams/PlantState field name).
_LINE_SENSORS = (("pH_inlet", "ph_inlet"), ("pH_outlet", "ph_outlet"),
                 ("temp_inlet", "temp_inlet"), ("temp_outlet", "temp_outlet"))


def _static_line_taps(params: PlantParams, dt: float,
                      collect_traced: list = None):
    """``{reading_name: tap_steps}`` for line sensors whose delay is concrete
    and identical across the batch — the precondition for the O(1) fixed-dt
    tap path. Sensors with traced or per-plant-varying delays are excluded
    (they keep the exact in-carry ring); traced names are appended to
    ``collect_traced`` so callers can warn (a traced delay usually means
    params were passed through ``jax.jit`` as an argument instead of closed
    over — the delay's *value* is static, but the trace can't see it)."""
    import numpy as np

    taps = {}
    for rname, fname in _LINE_SENSORS:
        base = getattr(params, fname).base
        if base.line_capacity <= 0:
            continue
        if isinstance(base.line_delay_s, jax.core.Tracer):
            if collect_traced is not None:
                collect_traced.append(rname)
            continue
        delay = np.asarray(base.line_delay_s)
        if delay.size > 1 and not np.all(delay == delay.flat[0]):
            continue
        k = max(0, int(round(float(delay.flat[0]) / dt)))
        # The exact ring can only reach capacity-1 samples back once full;
        # clamp so both schemes resolve the same (oldest-available) sample.
        taps[rname] = min(k, base.line_capacity - 1)
    return taps


def _disable_lines(params: PlantParams, taps):
    """Params copy with ``line_capacity=0`` on the tap-resolved sensors so
    ``base_read`` skips the in-carry ring (the carried ring arrays pass
    through the scan untouched)."""
    from dataclasses import replace as dc_replace

    fields = {}
    for rname, fname in _LINE_SENSORS:
        if rname not in taps:
            continue
        sp = getattr(params, fname)
        fields[fname] = dc_replace(sp, base=dc_replace(sp.base,
                                                       line_capacity=0))
    return dc_replace(params, **fields)


def _line_true_values(params: PlantParams, state: R.ReactorState, taps):
    """The pre-line 'true' sample per tap sensor, computed exactly where the
    read functions would: Nernst-compensated pH (ph.ph_read) and the raw
    zone temperature (temperature.temperature_read)."""
    out = {}
    for rname, fname in _LINE_SENSORS:
        if rname not in taps:
            continue
        sp = getattr(params, fname)
        if fname.startswith("ph"):
            out[rname] = SP.nernst_compensated_ph(
                sp, _zone(state.pH, sp.zone_index),
                _zone(state.temperature, sp.zone_index))
        else:
            out[rname] = _zone(state.temperature, sp.zone_index)
    return out


def _tap_update(bufs, taps, trues, j):
    """Advance the fixed-dt delay buffers: write this step's sample at row
    ``j mod (k+1)``, read the sample from ``max(j-k, 0)`` (the oldest
    available until the buffer spans the delay — the same clamp the exact
    ring's nearest-timestamp argmin resolves to under uniform dt)."""
    delayed, new_bufs = {}, {}
    for name, buf in bufs.items():
        k = taps[name]
        buf = jax.lax.dynamic_update_index_in_dim(buf, trues[name],
                                                  j % (k + 1), 0)
        ridx = jnp.maximum(j - k, 0) % (k + 1)
        delayed[name] = jax.lax.dynamic_index_in_dim(buf, ridx, 0,
                                                     keepdims=False)
        new_bufs[name] = buf
    return delayed, new_bufs


def plant_rollout_batched(params: PlantParams, plant: PlantState,
                          boundary: R.BoundaryConditions, dt: float,
                          substeps: int, n_steps: int, record: bool = True,
                          stages=None, line_mode: str = "auto",
                          rng_mode: str = "packed", line_taps=None,
                          schedule: R.BoundaryConditions = None):
    """Scan the batched integrated step over n_steps: measured-value
    trajectories for a whole Monte-Carlo ensemble in one jit (uncertainty
    quantification over what the instruments would actually report, not the
    true state).

    Reproducibility: the defaults (``line_mode="auto"``,
    ``rng_mode="packed"``) are the fast path and are *statistically* — not
    bit- — identical to manually stepping ``plant_step_batched``; callers
    pinning seeds against pre-round-2 trajectories should pass
    ``line_mode="exact", rng_mode="per-sensor"`` (see CHANGELOG.md).

    ``line_mode`` selects the sample-line implementation:

    - ``"exact"``: the in-carry nearest-timestamp ring (bit-identical to
      stepping ``plant_step_batched`` manually) — O(capacity) masked work
      per sensor per step, measured ~70% of the whole integrated step at
      16k plants.
    - ``"tap"``: O(1) fixed-dt circular taps resolved outside the sensor
      carries — the fused plant kernel's scheme (ops/fused_plant.py) on the
      XLA path. Identical readings wherever appends are unconditional;
      differences vs "exact" (documented, noise-level): samples are
      recorded every step even while a sensor is warming up or
      power-faulted (the exact ring skips those appends, shifting
      post-fault delays by one step at ~1e-4/read probability), the line
      starts from the first in-rollout sample (pre-existing carry ring
      contents are ignored), and a delay exactly halfway between steps
      rounds to nearest-even instead of the argmin's storage-order tie.
      Requires concrete, batch-identical line delays.
    - ``"auto"`` (default): "tap" for every sensor where it applies,
      "exact" for the rest.

    Tap resolution needs the delays as *Python-visible numbers*: close the
    params over the jit (``jax.jit(lambda state: plant_rollout_batched(
    params, state, ...))``) rather than passing them as a traced argument,
    or pass ``line_taps={reading_name: tap_steps}`` explicitly (as computed
    by ``_static_line_taps(params, dt)`` outside the trace). Under "auto"
    with traced delays a UserWarning is emitted and the exact ring is used.

    ``rng_mode`` selects the sensor-randomness implementation:

    - ``"packed"`` (default): two batched generates per step from one
      rollout-derived key cover all seven instruments
      (``draw_packed_rand``) — every element is still an independent
      standard draw, but independence comes from the generate counter, so
      streams differ from per-sensor key threading (statistically
      identical; ~7x less threefry work per step). The carried per-sensor
      keys pass through untouched except pH-inlet's, which is advanced at
      the end along a fold branch disjoint from the rollout's draw root,
      so chained rollout calls draw genuinely fresh streams.
    - ``"per-sensor"``: each instrument draws from its own carried key,
      bit-identical to stepping ``plant_step_batched`` manually.

    ``schedule``: optional time-varying forcing — a BoundaryConditions
    whose leaves are ``[n_steps]`` arrays (scalars broadcast), applied one
    entry per step to EVERY plant (the batched analogue of
    ``plant_rollout_scheduled``: measured-value UQ of a scripted dosing
    program over the whole ensemble, on the same tap/packed fast path).
    When given, ``boundary`` is ignored and its leaves' common length must
    equal ``n_steps``.
    """
    if line_mode not in ("auto", "tap", "exact"):
        raise ValueError(f"unknown line_mode: {line_mode!r}")
    if rng_mode not in ("packed", "per-sensor"):
        raise ValueError(f"unknown rng_mode: {rng_mode!r}")
    if line_mode == "exact":
        taps = {}
    elif line_taps is not None:
        valid = {r for r, _ in _LINE_SENSORS}
        if not set(line_taps) <= valid:
            raise ValueError(f"unknown line_taps names: "
                             f"{sorted(set(line_taps) - valid)}")
        taps = {r: int(k) for r, k in line_taps.items()}
    else:
        traced = []
        taps = _static_line_taps(params, dt, collect_traced=traced)
        if traced and line_mode == "tap":
            raise ValueError(
                f"line_mode='tap': line delays for {traced} are traced "
                "(params passed as a jit/vmap argument). Close params over "
                "the jit or pass line_taps= explicitly.")
        if traced:     # auto: fall back, but never silently
            import warnings
            warnings.warn(
                f"plant_rollout_batched(line_mode='auto'): line delays for "
                f"{traced} are traced, falling back to the ~4-6x slower "
                "exact delay ring. Close params over the jit or pass "
                "line_taps= to keep the O(1) tap path.", UserWarning,
                stacklevel=2)
    if line_mode == "tap" and not taps:
        raise ValueError("line_mode='tap' needs concrete batch-identical "
                         "line delays (none found)")

    if schedule is not None:
        lengths = {int(jnp.shape(x)[0])
                   for x in jax.tree_util.tree_leaves(schedule)
                   if jnp.ndim(x) >= 1}
        if lengths and lengths != {n_steps}:
            raise ValueError(f"schedule leaves of length {sorted(lengths)} "
                             f"disagree with n_steps={n_steps}")
        schedule = jax.tree_util.tree_map(
            lambda x: (jnp.broadcast_to(jnp.asarray(x), (n_steps,))
                       if jnp.ndim(x) == 0 else jnp.asarray(x)), schedule)

        def bc_at(j):
            return jax.tree_util.tree_map(lambda x: x[j], schedule)
    else:
        def bc_at(j):
            del j
            return boundary

    batch_shape = jnp.shape(plant.reactor.pH)[:-1]
    dtype = plant.reactor.pH.dtype
    packed = rng_mode == "packed"
    if packed:
        # One scalar stream root per rollout call; per-step keys fold in
        # the step index, so the scan carries no key state. The draw root
        # and the carried-forward key advance along DISJOINT fold branches
        # (tags 0 vs 1): the carried key must never equal a key this
        # rollout consumed, or a chained call re-derives spent streams.
        key0 = plant.ph_inlet.base.key.reshape(-1)[0]
        root = jax.random.fold_in(jax.random.fold_in(key0, n_steps), 0)

        def draw(j):
            return draw_packed_rand(jax.random.fold_in(root, j),
                                    batch_shape, dtype)

        def advance_keys(p):
            def adv(k):
                return jax.random.fold_in(jax.random.fold_in(k, n_steps), 1)
            new_keys = jax.vmap(adv)(p.ph_inlet.base.key.reshape(-1))
            from dataclasses import replace as dc_replace
            return dc_replace(p, ph_inlet=dc_replace(
                p.ph_inlet, base=dc_replace(
                    p.ph_inlet.base,
                    key=new_keys.reshape(p.ph_inlet.base.key.shape))))
    else:
        draw = advance_keys = None

    if not taps:
        def body(p, j):
            rand = draw(j) if packed else None
            p, readings = plant_step_batched(params, p, bc_at(j), dt,
                                             substeps, stages=stages,
                                             rand=rand)
            out = ({k: v.value for k, v in readings.items()}
                   if record else None)
            return p, out

        plant, traj = jax.lax.scan(body, plant, jnp.arange(n_steps))
        return (advance_keys(plant) if packed else plant), traj

    params_nl = _disable_lines(params, taps)
    bufs = {name: jnp.zeros((k + 1,) + batch_shape, dtype)
            for name, k in taps.items()}

    read_v = jax.vmap(
        lambda prm, st, cr, dl: _read_all(prm, st, cr, delayed=dl))
    read_v_rand = jax.vmap(
        lambda prm, st, cr, dl, rnd: _read_all(prm, st, cr, delayed=dl,
                                               rand=rnd))

    def body(carry, j):
        p, bufs = carry
        state = R.step(params.reactor, p.reactor, bc_at(j), dt=dt,
                       substeps=substeps, stages=stages)
        delayed, bufs = _tap_update(bufs, taps,
                                    _line_true_values(params, state, taps),
                                    j)
        if packed:
            p, readings = read_v_rand(params_nl, state, p, delayed, draw(j))
        else:
            p, readings = read_v(params_nl, state, p, delayed)
        out = ({k: v.value for k, v in readings.items()} if record else None)
        return (p, bufs), out

    (plant, _), traj = jax.lax.scan(body, (plant, bufs),
                                    jnp.arange(n_steps))
    return (advance_keys(plant) if packed else plant), traj


def plant_rollout_auto(params: PlantParams, plant: PlantState,
                       boundary: R.BoundaryConditions, dt: float,
                       substeps: int, n_steps: int, record: bool = True,
                       stages=None, seed: int = 0,
                       fused_max_batch: int = 4096):
    """Integrated-plant rollout with AUTOMATIC fused-kernel vs XLA
    dispatch — callers can no longer silently pick the order-of-magnitude
    slower path (VERDICT r2 item 2 of 'what's weak').

    Measured crossover (v5e, 20 zones): the fused Pallas kernel
    (ops/fused_plant.py) wins small batches by 8-16x (VMEM-resident state,
    one launch); the XLA batched scan (``plant_rollout_batched``) wins
    large ensembles (>= ~8k plants) by ~18x (better lane utilization).
    Dispatch rule: fused when on TPU and batch < ``fused_max_batch`` and
    the kernel supports the configuration (any zone taps, per-plant
    delays, ring consumption — all supported since round 3); XLA
    otherwise, including always on CPU (the kernel would run interpreted).

    Returns ``(new_plant, readings)`` where readings maps each sensor name
    to its per-step measured-value trajectory ``[n_steps, ...batch]``
    (None when ``record=False``). Fused-path randomness comes from the
    on-chip PRNG seeded with ``seed``; the XLA path draws from the carried
    sensor keys — statistically identical, not bit-identical.
    """
    import jax

    ph = jnp.asarray(plant.reactor.pH)
    single = ph.ndim == 1
    batch = 1 if single else int(ph.shape[0])
    z = params.reactor.n_zones
    use_fused = (jax.default_backend() == "tpu" and batch < fused_max_batch
                 and z <= 128 and params.reactor.nitrogen is None
                 and params.reactor.gas is None
                 and params.reactor.particles is None
                 and params.reactor.disinfection is None
                 and params.reactor.biofilm is None
                 and params.reactor.phase is None)
    if use_fused:
        from ics_wt_physicsengine_tpu.ops.fused_plant import (
            plant_rollout_fused)
        try:
            new_plant, readings = plant_rollout_fused(
                params, plant, boundary, dt=dt, substeps=substeps,
                n_steps=n_steps, stages=stages,
                record_every=1 if record else n_steps, seed=seed)
            return new_plant, (readings if record else None)
        except ValueError:
            pass    # unsupported static config -> XLA path below
    if single:
        if _is_schedule(boundary):
            return plant_rollout_scheduled(params, plant, boundary, dt,
                                           substeps, record=record,
                                           stages=stages)
        return plant_rollout(params, plant, boundary, dt, substeps,
                             n_steps, record=record, stages=stages)
    if _is_schedule(boundary):
        return plant_rollout_batched(params, plant, None, dt, substeps,
                                     n_steps, record=record, stages=stages,
                                     schedule=boundary)
    return plant_rollout_batched(params, plant, boundary, dt, substeps,
                                 n_steps, record=record, stages=stages)


def _is_schedule(boundary) -> bool:
    return any(jnp.ndim(x) >= 1
               for x in jax.tree_util.tree_leaves(boundary))


# ---------------------------------------------------------------------------
# Named BASELINE configurations (BASELINE.json configs 1-5)
# ---------------------------------------------------------------------------

def config1_two_zone() -> R.ReactorConfiguration:
    """Config 1: single 2-zone CSTR, fixed dt, ideal sensors."""
    import math
    diameter = 2 * math.sqrt(1.0 / (math.pi * 2.0))
    return R.ReactorConfiguration(volume=1000, height=2.0, diameter=diameter,
                                  n_zones=2)


def config2_stratified_20_zone() -> R.ReactorConfiguration:
    """Config 2: 20-zone stratified CSTR, Richardson + Corrsin +
    temperature-dependent kinetics."""
    return R.ReactorConfiguration(n_zones=20,
                                  enable_thermal_stratification=True)


def config3_full_sensors(seed: int = 0, dtype=jnp.float32):
    """Config 3: full sensor suite on a 5-zone plant (returns plant pytrees)."""
    return make_plant(R.ReactorConfiguration(), seed=seed, dtype=dtype)


def config4_monte_carlo(n_plants: int = 4096, seed: int = 0,
                        dtype=jnp.float32):
    """Config 4: parameter-randomized Monte-Carlo batch."""
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)

    return make_monte_carlo_batch(R.ReactorConfiguration(n_zones=20),
                                  n_plants, seed=seed, dtype=dtype)


def config5_hil_cli_args(port: int = 5020) -> list:
    """Config 5: closed-loop HIL — argv for the orchestrator CLI."""
    return ["--port", str(port), "--dt", "1.0"]
