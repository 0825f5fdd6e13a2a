"""
Glass-electrode pH sensor as a pure scan-carried transform.

Reproduces the reference pH sensor (sensors/ph_sensor.py:62-488):
- Nernst temperature compensation in the true value (:151-180)
- non-linear biofilm/scaling fouling state (:182-214)
- five pH-specific noise/offset overlays on top of the base pipeline
  (:255-312): impedance noise growing with |pH-7|, junction noise scaled by
  reference-electrode contamination, slope degradation outside the
  calibration window, fouling offset/noise, contamination offset
- the reference's replace-history-tail quirk (:318-334): the overlay value
  becomes the carry's ``last_value``, so the next read's rate-of-change check
  sees post-overlay values one step late — matched here.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.sensors import base as B


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PHSensorParams:
    zone_index: int = field(metadata=dict(static=True))
    base: B.SensorParams = None
    temperature_coefficient: jnp.ndarray = None   # [pH/C] (:89)


@jax.tree_util.register_dataclass
@dataclass
class PHSensorCarry:
    base: B.SensorCarry
    membrane_fouling: jnp.ndarray        # 0-1 (:140)
    glass_etching: jnp.ndarray           # permanent damage (:141)
    days_since_cleaning: jnp.ndarray
    water_hardness: jnp.ndarray          # [mg/L CaCO3] (:143)
    reference_contamination: jnp.ndarray  # 0-1 (:146)
    slope_percentage: jnp.ndarray        # % of Nernst slope (:137)
    cal_point_1: jnp.ndarray             # buffer pH (:135)
    cal_point_2: jnp.ndarray


def make_ph_params(zone_index=0, precision=0.01, response_time=15.0,
                   drift_rate=0.01 / 24.0, temperature_coefficient=0.003,
                   sample_line=None, installation=None,
                   calibration_validity_hours=24.0,
                   dtype=jnp.float32) -> PHSensorParams:
    import numpy as np
    base = B.make_sensor_params(
        measurement_range=(0.0, 14.0), precision=precision,
        response_time=response_time, drift_rate=drift_rate,
        warmup_time_s=1800.0, hysteresis_magnitude=0.02,
        max_rate_of_change=0.5, installation=installation,
        sample_line=sample_line, dtype=dtype)
    return PHSensorParams(
        zone_index=zone_index, base=base,
        temperature_coefficient=np.asarray(temperature_coefficient, dtype))


def make_ph_carry(params: PHSensorParams, key, t0=0.0,
                  dtype=jnp.float32) -> PHSensorCarry:
    import numpy as np
    base = B.make_sensor_carry(params.base, key, t0=t0, initial_value=7.0,
                               dtype=dtype)
    arr = lambda x: np.asarray(x, dtype)  # noqa: E731
    return PHSensorCarry(
        base=base, membrane_fouling=arr(0.0), glass_etching=arr(0.0),
        days_since_cleaning=arr(0.0), water_hardness=arr(100.0),
        reference_contamination=arr(0.0), slope_percentage=arr(100.0),
        cal_point_1=arr(4.0), cal_point_2=arr(7.0))


N_NORMALS = B.BASE_NORMALS + 3     # + electrical, junction, fouling noise
N_UNIFORMS = B.BASE_UNIFORMS


def nernst_compensated_ph(params: PHSensorParams, reactor_pH_zone,
                          reactor_T_zone, dtype=None):
    """The electrode's pre-line 'true' sample: Nernst temperature
    compensation around the 25 C calibration point (ph_sensor.py:171-177).
    Shared by ``ph_read`` and the external sample-line resolvers
    (models/plant.py line taps, ops/fused_plant.py) so the two paths can
    never desynchronize."""
    if dtype is not None:
        reactor_pH_zone = jnp.asarray(reactor_pH_zone, dtype)
        reactor_T_zone = jnp.asarray(reactor_T_zone, dtype)
    return reactor_pH_zone + params.temperature_coefficient * (
        reactor_T_zone - 25.0)


def ph_read(params: PHSensorParams, carry: PHSensorCarry,
            reactor_pH_zone, reactor_T_zone, t, rand=None,
            delayed_true=None):
    """One pH reading: base pipeline + glass-electrode overlay.

    ``reactor_pH_zone`` / ``reactor_T_zone`` are the already-selected zone
    values (the wrapper resolves ``zone_index`` against the state arrays).
    ``rand``: optional pre-drawn ``(normals[..., N_NORMALS],
    uniforms[..., N_UNIFORMS])`` (base layout first) — used by fused paths
    that batch randomness across the whole plant; None draws from the
    carry's key.
    ``delayed_true``: optional already-delayed Nernst-compensated sample —
    fused paths resolve the sample line outside (params built with
    ``line_capacity=0``) and pass the delayed value here; None applies the
    in-carry delay ring to the freshly compensated tap.
    """
    dtype = jnp.asarray(carry.base.current_value).dtype
    prev_ts = carry.base.last_timestamp
    had_prev = carry.base.has_history

    # Nernst temperature compensation (:171-177)
    true_value = nernst_compensated_ph(params, reactor_pH_zone,
                                       reactor_T_zone, dtype)
    if delayed_true is not None:
        true_value = jnp.asarray(delayed_true, dtype)

    # One split + two vector draws cover the base pipeline AND the overlay
    # (electrical, junction, fouling noise — base.draw_read_rand).
    if rand is None:
        key, normals, uniforms = B.draw_read_rand(carry.base.key, dtype,
                                                  extra_normals=3)
    else:
        key = carry.base.key
        normals, uniforms = rand
    base_carry, out = B.base_read(
        params.base, replace(carry.base, key=key), true_value, t,
        rand=(normals[..., :B.BASE_NORMALS],
              uniforms[..., :B.BASE_UNIFORMS]))
    finite = jnp.isfinite(out.value)
    n_elec = normals[..., B.BASE_NORMALS]
    n_junc = normals[..., B.BASE_NORMALS + 1]
    n_foul = normals[..., B.BASE_NORMALS + 2]

    # --- fouling state update (:250-253 -> :182-214), gated like reference ---
    dt = jnp.maximum(out.timestamp - prev_ts, 0.0)
    update = had_prev & finite
    temp = jnp.asarray(reactor_T_zone, dtype)
    bio_rate = jnp.where(carry.membrane_fouling > 0.05,
                         0.1 * jnp.exp(0.05 * (temp - 25.0)), 0.001)
    scaling_rate = jnp.where(params.base.flow_velocity < 0.1,
                             carry.water_hardness * 1e-4,
                             carry.water_hardness * 1e-5)
    fouling = jnp.where(
        update,
        jnp.minimum(1.0, carry.membrane_fouling
                    + (bio_rate + scaling_rate) * dt / 86400.0),
        carry.membrane_fouling)
    days_clean = jnp.where(update,
                           carry.days_since_cleaning + dt / 86400.0,
                           carry.days_since_cleaning)

    # --- pH-specific overlay terms (:255-312), gated on finite ---
    ph_dev = jnp.abs(out.value - 7.0)
    electrical = n_elec * 0.002 * (1.0 + 0.1 * ph_dev)
    junction = n_junc * 0.005 * (1.0 + carry.reference_contamination)

    days_since_cal = jnp.where(
        base_carry.has_calibration,
        (out.timestamp - base_carry.last_calibration_time) / 86400.0, 0.0)
    slope_pct = jnp.where(
        base_carry.has_calibration & finite,
        jnp.maximum(90.0, 100.0 - 0.001 * days_since_cal),
        carry.slope_percentage)

    in_cal_window = (carry.cal_point_1 < out.value) \
        & (out.value < carry.cal_point_2)
    distance = jnp.minimum(jnp.abs(out.value - carry.cal_point_1),
                           jnp.abs(out.value - carry.cal_point_2))
    slope_error = jnp.where(in_cal_window, 0.0,
                            distance * (100.0 - slope_pct) / 100.0)

    fouling_offset = fouling * 0.2
    fouling_noise = n_foul * (fouling * 0.05)

    contamination = jnp.where(
        finite,
        jnp.minimum(0.5, carry.reference_contamination
                    + 0.0001 * (days_since_cal / 30.0)),
        carry.reference_contamination)
    reference_offset = contamination * 0.1

    final_value = jnp.clip(
        out.value + electrical + junction + slope_error + fouling_offset
        + fouling_noise + reference_offset,
        params.base.min_value, params.base.max_value)

    value = jnp.where(finite, final_value, out.value)
    noise = jnp.where(finite,
                      out.noise + electrical + junction + fouling_noise,
                      out.noise)
    drift = jnp.where(finite,
                      out.drift + slope_error + fouling_offset
                      + reference_offset,
                      out.drift)
    uncert = jnp.where(finite, params.base.precision * 3.0, out.uncertainty)

    output = B.SensorOutput(
        timestamp=out.timestamp, value=value, raw_value=out.raw_value,
        noise=noise, drift=drift, status=out.status, uncertainty=uncert,
        fault=out.fault)

    base_carry = replace(
        base_carry,
        current_value=jnp.where(finite, value, base_carry.current_value),
        last_value=value,      # history[-1] replacement quirk (:330-331)
    )
    new_carry = PHSensorCarry(
        base=base_carry, membrane_fouling=fouling,
        glass_etching=carry.glass_etching, days_since_cleaning=days_clean,
        water_hardness=carry.water_hardness,
        reference_contamination=contamination,
        slope_percentage=slope_pct, cal_point_1=carry.cal_point_1,
        cal_point_2=carry.cal_point_2)
    return new_carry, output


def clean_electrode(carry: PHSensorCarry, cleaning_method: str, t):
    """Electrode cleaning (reference ph_sensor.py:395-434)."""
    dtype = jnp.asarray(carry.membrane_fouling).dtype
    if cleaning_method == "water_rinse":
        fouling = carry.membrane_fouling * 0.5
        etching = carry.glass_etching
        slope = carry.slope_percentage
    elif cleaning_method == "acid_clean":
        fouling = carry.membrane_fouling * 0.1
        etching = carry.glass_etching + 0.001
        slope = carry.slope_percentage - etching * 10.0
    elif cleaning_method == "pepsin_clean":
        fouling = carry.membrane_fouling * 0.2
        etching = carry.glass_etching
        slope = carry.slope_percentage
    else:
        raise ValueError(f"Unknown cleaning method: {cleaning_method}")
    base = replace(carry.base, power_on_time=jnp.asarray(t, dtype))
    return replace(carry, base=base, membrane_fouling=fouling,
                   glass_etching=etching, slope_percentage=slope,
                   days_since_cleaning=jnp.asarray(0.0, dtype))
