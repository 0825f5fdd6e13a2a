"""
Chlorine sensor (amperometric / DPD colorimetric) as a pure transform.

Reproduces the reference chlorine sensor (sensors/chlorine_sensor.py:75-537):
- HOCl-fraction-weighted response 0.5 + 0.5*alpha_HOCl at fixed pKa 7.5
  (:189-227 — the sensor's own constant, NOT the temperature-corrected
  chemistry value)
- amperometric path: cross-sensitivity interference (O3 x1.2, H2O2 x0.3,
  ClO2 x0.5, :157-168,229-278), membrane fouling up to 80% signal loss,
  polarization noise growing with membrane age, diffusion noise (:405-449)
- DPD path: reagent potency with Arrhenius + photodegradation, 95% reaction
  completeness, optical noise (:280-317,451-484)

The sensor type is a static (Python) branch: each sensor instance owns its
own params/carry pytree, so no in-graph branching is needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.sensors import base as B

AMPEROMETRIC = "amperometric"
DPD = "dpd_colorimetric"

CHLORINE_PKA = 7.5   # sensor-local constant (:184)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ChlorineSensorParams:
    zone_index: int = field(metadata=dict(static=True))
    sensor_type: str = field(metadata=dict(static=True))
    # "free" (HOCl + OCl-) or "total" (free + combined chloramines) — the
    # reference's ChlorineMeasurementType; "total" becomes physically
    # meaningful with the nitrogen chemistry's chloramine species
    # (core/nitrogen.py): pass the combined concentration to
    # ``chlorine_read(combined_zone=...)``.
    measurement_type: str = field(default="free",
                                  metadata=dict(static=True))
    base: B.SensorParams = None
    # amperometric cross-sensitivities (:166-168)
    ozone_sensitivity: jnp.ndarray = None
    h2o2_sensitivity: jnp.ndarray = None
    clo2_sensitivity: jnp.ndarray = None


@jax.tree_util.register_dataclass
@dataclass
class ChlorineSensorCarry:
    base: B.SensorCarry
    # amperometric state (:157-163)
    membrane_fouling: jnp.ndarray
    membrane_age_days: jnp.ndarray
    electrode_polarization: jnp.ndarray
    # DPD state (:169-178)
    reagent_potency: jnp.ndarray
    reagent_age_days: jnp.ndarray
    light_exposure_hours: jnp.ndarray
    storage_temperature: jnp.ndarray


def make_chlorine_params(zone_index=0, sensor_type=AMPEROMETRIC,
                         measurement_type="free",
                         precision=None, response_time=None,
                         drift_rate=0.02 / 24.0, sample_line=None,
                         installation=None, calibration_validity_hours=24.0,
                         dtype=jnp.float32) -> ChlorineSensorParams:
    import numpy as np
    if sensor_type == AMPEROMETRIC:
        default_precision, default_response, warmup = 0.01, 30.0, 300.0
    else:
        default_precision, default_response, warmup = 0.02, 90.0, 60.0
    base = B.make_sensor_params(
        measurement_range=(0.0, 10.0),
        precision=precision or default_precision,
        response_time=response_time or default_response,
        drift_rate=drift_rate, warmup_time_s=warmup,
        hysteresis_magnitude=0.01, max_rate_of_change=1.0,
        installation=installation, sample_line=sample_line, dtype=dtype)
    arr = lambda x: np.asarray(x, dtype)  # noqa: E731
    if hasattr(measurement_type, "value"):   # reference-style enum
        measurement_type = measurement_type.value
    if measurement_type not in ("free", "total"):
        raise ValueError(f"measurement_type must be 'free' or 'total', "
                         f"got {measurement_type!r}")
    return ChlorineSensorParams(
        zone_index=zone_index, sensor_type=sensor_type,
        measurement_type=measurement_type, base=base,
        ozone_sensitivity=arr(1.2), h2o2_sensitivity=arr(0.3),
        clo2_sensitivity=arr(0.5))


def make_chlorine_carry(params: ChlorineSensorParams, key, t0=0.0,
                        dtype=jnp.float32) -> ChlorineSensorCarry:
    import numpy as np
    base = B.make_sensor_carry(params.base, key, t0=t0, initial_value=0.0,
                               dtype=dtype)
    arr = lambda x: np.asarray(x, dtype)  # noqa: E731
    return ChlorineSensorCarry(
        base=base, membrane_fouling=arr(0.0), membrane_age_days=arr(0.0),
        electrode_polarization=arr(0.0), reagent_potency=arr(1.0),
        reagent_age_days=arr(0.0), light_exposure_hours=arr(0.0),
        storage_temperature=arr(20.0))


def chlorine_true_value(chlorine_zone, pH_zone):
    """HOCl-fraction-weighted effective chlorine (:209-227)."""
    ratio = 10.0 ** (CHLORINE_PKA - pH_zone)
    fraction_hocl = ratio / (1.0 + ratio)
    return chlorine_zone * (0.5 + 0.5 * fraction_hocl)


N_NORMALS = B.BASE_NORMALS + 2     # + polarization/optical, diffusion
N_UNIFORMS = B.BASE_UNIFORMS


def chlorine_read(params: ChlorineSensorParams, carry: ChlorineSensorCarry,
                  chlorine_zone, pH_zone, t,
                  ozone=0.0, hydrogen_peroxide=0.0, chlorine_dioxide=0.0,
                  combined_zone=None, rand=None):
    """One chlorine reading: base pipeline + principle-specific overlay.

    ``ozone``/``hydrogen_peroxide``/``chlorine_dioxide`` are optional zone
    concentrations [mg/L] — the functional equivalent of the reference's
    hasattr probing on the state object (:250-276). ``combined_zone``
    [mg/L as Cl2, e.g. monochloramine from the nitrogen chemistry]: a
    ``measurement_type="total"`` sensor responds to free + combined (the
    DPD total test and membrane total-chlorine probes); a "free" sensor
    ignores it."""
    dtype = jnp.asarray(carry.base.current_value).dtype
    prev_ts = carry.base.last_timestamp
    had_prev = carry.base.has_history

    true_value = chlorine_true_value(jnp.asarray(chlorine_zone, dtype),
                                     jnp.asarray(pH_zone, dtype))
    if getattr(params, "measurement_type", "free") == "total" \
            and combined_zone is not None:
        true_value = true_value + jnp.asarray(combined_zone, dtype)
    if rand is None:
        key, normals, uniforms = B.draw_read_rand(carry.base.key, dtype,
                                                  extra_normals=2)
    else:
        key = carry.base.key
        normals, uniforms = rand
    base_carry, out = B.base_read(
        params.base, replace(carry.base, key=key), true_value, t,
        rand=(normals[..., :B.BASE_NORMALS],
              uniforms[..., :B.BASE_UNIFORMS]))
    finite = jnp.isfinite(out.value)
    n1 = normals[..., B.BASE_NORMALS]
    n2 = normals[..., B.BASE_NORMALS + 1]

    dt = jnp.maximum(out.timestamp - prev_ts, 0.0)
    update = had_prev & finite

    if params.sensor_type == AMPEROMETRIC:
        # interference (:229-278)
        interference = (jnp.asarray(ozone, dtype) * params.ozone_sensitivity
                        + jnp.asarray(hydrogen_peroxide, dtype)
                        * params.h2o2_sensitivity
                        + jnp.asarray(chlorine_dioxide, dtype)
                        * params.clo2_sensitivity)
        # membrane fouling update (:319-343)
        fouling_rate = jnp.where(params.base.flow_velocity < 0.1, 0.05, 0.01)
        fouling = jnp.where(
            update,
            jnp.minimum(1.0, carry.membrane_fouling
                        + fouling_rate * dt / 86400.0),
            carry.membrane_fouling)
        age = jnp.where(update, carry.membrane_age_days + dt / 86400.0,
                        carry.membrane_age_days)
        # amperometric effects (:405-449)
        fouling_factor = 1.0 - 0.8 * fouling
        polarization_noise = n1 * 0.005 * (1.0 + age / 365.0)
        diffusion_noise = n2 * 0.003
        final = (out.value + interference) * fouling_factor \
            + polarization_noise + diffusion_noise

        new_carry_fields = dict(
            membrane_fouling=fouling, membrane_age_days=age,
            electrode_polarization=carry.electrode_polarization,
            reagent_potency=carry.reagent_potency,
            reagent_age_days=carry.reagent_age_days,
            light_exposure_hours=carry.light_exposure_hours,
            storage_temperature=carry.storage_temperature)
    else:
        # reagent degradation (:280-317)
        t_storage_k = carry.storage_temperature + 273.15
        thermal = jnp.exp((50000.0 / 8.314) * (1.0 / 293.15 - 1.0 / t_storage_k))
        light = jnp.where(update,
                          carry.light_exposure_hours + dt / 3600.0,
                          carry.light_exposure_hours)
        photo = 1.0 + 0.1 * (light / 100.0)
        degradation = thermal * photo * 0.01
        potency = jnp.where(
            update,
            jnp.maximum(0.0, carry.reagent_potency
                        - degradation * dt / 86400.0),
            carry.reagent_potency)
        reagent_age = jnp.where(update,
                                carry.reagent_age_days + dt / 86400.0,
                                carry.reagent_age_days)
        # DPD effects (:451-484)
        optical_noise = n1 * 0.005
        final = out.value * potency * 0.95 + optical_noise

        new_carry_fields = dict(
            membrane_fouling=carry.membrane_fouling,
            membrane_age_days=carry.membrane_age_days,
            electrode_polarization=carry.electrode_polarization,
            reagent_potency=potency, reagent_age_days=reagent_age,
            light_exposure_hours=light,
            storage_temperature=carry.storage_temperature)

    final = jnp.clip(final, params.base.min_value, params.base.max_value)
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
    return ChlorineSensorCarry(base=base_carry, **new_carry_fields), output


def replace_membrane(carry: ChlorineSensorCarry, t):
    """Membrane replacement (:486-509); caller must recalibrate."""
    dtype = jnp.asarray(carry.membrane_fouling).dtype
    z = jnp.asarray(0.0, dtype)
    base = replace(carry.base, power_on_time=jnp.asarray(t, dtype))
    return replace(carry, base=base, membrane_fouling=z,
                   membrane_age_days=z, electrode_polarization=z)


def replace_reagent(carry: ChlorineSensorCarry, t, storage_temp=20.0):
    """Reagent replacement (:511-537)."""
    dtype = jnp.asarray(carry.reagent_potency).dtype
    z = jnp.asarray(0.0, dtype)
    return replace(carry, reagent_potency=jnp.asarray(1.0, dtype),
                   reagent_age_days=z, light_exposure_hours=z,
                   storage_temperature=jnp.asarray(storage_temp, dtype))
