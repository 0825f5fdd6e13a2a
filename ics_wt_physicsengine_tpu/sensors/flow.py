"""
Flow sensor (turbine / magnetic) as a pure transform.

Reproduces the reference flow sensor (sensors/flow_sensor.py:40-219):
- turbine: bearing-friction dead band growing with wear x vibration
  (:135-141,180-199)
- magnetic: electrode fouling + conductivity cutoff (<5 uS/cm reads 0,
  :201-219)
- air-bubble dropouts read 0 (not NaN, :150-155), 1% full-scale zero cutoff
  (:156-159)
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.sensors import base as B

TURBINE = "turbine"
MAGNETIC = "magnetic"


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FlowSensorParams:
    sensor_type: str = field(metadata=dict(static=True))
    base: B.SensorParams = None
    full_scale: jnp.ndarray = None


@jax.tree_util.register_dataclass
@dataclass
class FlowSensorCarry:
    base: B.SensorCarry
    bearing_friction: jnp.ndarray     # turbine (:90)
    bearing_wear_days: jnp.ndarray
    electrode_fouling: jnp.ndarray    # magnetic (:93)
    fluid_conductivity: jnp.ndarray   # [uS/cm] (:94)


def make_flow_params(sensor_type=MAGNETIC, full_scale=100.0, precision=None,
                     response_time=0.5, drift_rate=0.0, sample_line=None,
                     installation=None, dtype=jnp.float32) -> FlowSensorParams:
    import numpy as np
    default_precision = (0.01 if sensor_type == TURBINE else 0.005) * full_scale
    base = B.make_sensor_params(
        measurement_range=(0.0, full_scale),
        precision=precision or default_precision,
        response_time=response_time, drift_rate=drift_rate,
        warmup_time_s=10.0, hysteresis_magnitude=0.005 * full_scale,
        max_rate_of_change=full_scale, installation=installation,
        sample_line=sample_line, dtype=dtype)
    return FlowSensorParams(sensor_type=sensor_type, base=base,
                            full_scale=np.asarray(full_scale, dtype))


def make_flow_carry(params: FlowSensorParams, key, t0=0.0,
                    dtype=jnp.float32) -> FlowSensorCarry:
    import numpy as np
    base = B.make_sensor_carry(params.base, key, t0=t0, initial_value=0.0,
                               dtype=dtype)
    arr = lambda x: np.asarray(x, dtype)  # noqa: E731
    return FlowSensorCarry(base=base, bearing_friction=arr(0.01),
                           bearing_wear_days=arr(0.0),
                           electrode_fouling=arr(0.0),
                           fluid_conductivity=arr(100.0))


N_NORMALS = B.BASE_NORMALS + 1     # + vibration/electrical noise
N_UNIFORMS = B.BASE_UNIFORMS + 1   # + air-bubble roll


def flow_read(params: FlowSensorParams, carry: FlowSensorCarry,
              flow_rate, t, rand=None):
    dtype = jnp.asarray(carry.base.current_value).dtype
    prev_ts = carry.base.last_timestamp
    had_prev = carry.base.has_history

    if rand is None:
        key, normals, uniforms = B.draw_read_rand(carry.base.key, dtype,
                                                  extra_normals=1,
                                                  extra_uniforms=1)
    else:
        key = carry.base.key
        normals, uniforms = rand
    base_carry, out = B.base_read(
        params.base, replace(carry.base, key=key),
        jnp.asarray(flow_rate, dtype), t,
        rand=(normals[..., :B.BASE_NORMALS],
              uniforms[..., :B.BASE_UNIFORMS]))
    finite = jnp.isfinite(out.value)
    n1 = normals[..., B.BASE_NORMALS]
    u2 = uniforms[..., B.BASE_UNIFORMS]

    dt = jnp.maximum(out.timestamp - prev_ts, 0.0)
    update = had_prev & finite

    if params.sensor_type == TURBINE:
        wear_factor = 1.0 + params.base.pipe_vibration_g * 5.0
        wear = jnp.where(update,
                         carry.bearing_wear_days
                         + (dt / 86400.0) * wear_factor,
                         carry.bearing_wear_days)
        friction_threshold = carry.bearing_friction \
            * (1.0 + 0.01 * (wear / 365.0))
        friction_loss = friction_threshold * params.full_scale
        effective = jnp.where(out.value < friction_loss, 0.0,
                              out.value - friction_loss)
        vib_noise = n1 * params.base.pipe_vibration_g * 0.01 \
            * params.full_scale
        final = effective + vib_noise
        fouling = carry.electrode_fouling
    else:
        fouling = jnp.where(update,
                            carry.electrode_fouling + 0.001 * dt / 86400.0,
                            carry.electrode_fouling)
        fouling_factor = jnp.maximum(0.9, 1.0 - 0.005 * fouling)
        cond = carry.fluid_conductivity
        conductivity_factor = jnp.where(
            cond < 5.0, 0.0, jnp.where(cond < 20.0, cond / 20.0, 1.0))
        electrical_noise = n1 * 0.001 * params.full_scale
        final = out.value * fouling_factor * conductivity_factor \
            + electrical_noise
        wear = carry.bearing_wear_days

    # air bubbles read zero (:150-155)
    bubble = (params.base.air_bubble_frequency > 0) & (
        u2 < params.base.air_bubble_frequency / 60.0)
    final = jnp.where(bubble, 0.0, final)

    # zero cutoff (:156-159) + clip
    final = jnp.where(final < 0.01 * params.full_scale, 0.0, final)
    final = jnp.clip(final, 0.0, params.base.max_value)
    value = jnp.where(finite, final, out.value)

    output = B.SensorOutput(
        timestamp=out.timestamp, value=value, raw_value=out.raw_value,
        noise=out.noise, drift=out.drift, status=out.status,
        uncertainty=jnp.where(finite, params.base.precision * 2.0,
                              out.uncertainty),
        fault=out.fault)

    base_carry = replace(
        base_carry,
        current_value=jnp.where(finite, value, base_carry.current_value),
        last_value=value)
    return FlowSensorCarry(base=base_carry,
                           bearing_friction=carry.bearing_friction,
                           bearing_wear_days=wear,
                           electrode_fouling=fouling,
                           fluid_conductivity=carry.fluid_conductivity), output
