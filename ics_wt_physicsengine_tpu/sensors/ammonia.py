"""
Ammonia sensor (ion-selective electrode / gas-sensing membrane) as a pure
transform — the instrument for the nitrogen chemistry (core/nitrogen.py).

No reference counterpart (the reference has no nitrogen species to
measure); built in the same idiom as its four sensor families
(reference sensors/base_sensor.py pipeline + a principle-specific
overlay), so it rides the identical scan-carried base pipeline:

- **ISE ("ise")** — ammonium ion-selective electrode, the common in-situ
  process probe. Measures NH4+ ACTIVITY, so the reading under-reports
  total ammonia as pH rises (the NH4+ fraction falls: at pH = pKa only
  half the TAN is visible), relative to its pH-7 calibration. Suffers
  potassium interference (NH4+/K+ have near-identical ionic radii):
  apparent N = k_sel * [K+] * (14/39.1). Membrane slope degrades with
  age, scaling errors away from the calibration point (like the pH
  electrode's slope health, reference ph_sensor.py:272-290).
- **Gas-sensing membrane ("gsm")** — NH3 diffusion electrode with
  alkalizing reagent conditioning (sample pH raised > 11 so ALL ammonia
  is NH3): pH-independent response, but the reagent decays like the DPD
  chlorine reagent (potency multiplier), and the membrane slows/fouls
  with age.

Temperature compensation: both principles are Nernstian — the slope
scales with absolute temperature; the electronics compensate against the
measured temperature with a small residual error per degree from the
calibration temperature.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import nitrogen as NC
from ics_wt_physicsengine_tpu.sensors import base as B

ISE = "ise"
GAS_MEMBRANE = "gsm"

MW_RATIO_N_K = 14.0067 / 39.0983     # apparent mg N per mg K+ interfering


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AmmoniaSensorParams:
    zone_index: int = field(metadata=dict(static=True))
    sensor_type: str = field(metadata=dict(static=True))
    base: B.SensorParams = None
    selectivity_potassium: jnp.ndarray = None   # k_sel (ISE)
    potassium_mgL: jnp.ndarray = None           # background [K+]
    slope_drift_pct_per_day: jnp.ndarray = None
    cal_pH: jnp.ndarray = None                  # ISE calibration pH
    cal_temperature: jnp.ndarray = None         # [C]
    temp_comp_residual: jnp.ndarray = None      # fraction error per degC


@jax.tree_util.register_dataclass
@dataclass
class AmmoniaSensorCarry:
    base: B.SensorCarry
    membrane_age_days: jnp.ndarray
    slope_percentage: jnp.ndarray
    reagent_potency: jnp.ndarray     # gas-membrane conditioning reagent


def make_ammonia_params(zone_index=0, sensor_type=ISE, precision=None,
                        response_time=None, drift_rate=0.02 / 24.0,
                        selectivity_potassium=0.1, potassium_mgL=2.0,
                        slope_drift_pct_per_day=0.05,
                        cal_pH=7.0, cal_temperature=25.0,
                        sample_line=None, installation=None,
                        calibration_validity_hours=24.0,
                        dtype=jnp.float32) -> AmmoniaSensorParams:
    import numpy as np
    if sensor_type == ISE:
        default_precision, default_response, warmup = 0.05, 60.0, 600.0
    elif sensor_type == GAS_MEMBRANE:
        default_precision, default_response, warmup = 0.02, 120.0, 300.0
    else:
        raise ValueError(f"unknown ammonia sensor type {sensor_type!r}")
    base = B.make_sensor_params(
        measurement_range=(0.0, 100.0),
        precision=precision or default_precision,
        response_time=response_time or default_response,
        drift_rate=drift_rate, warmup_time_s=warmup,
        hysteresis_magnitude=0.02, max_rate_of_change=10.0,
        installation=installation, sample_line=sample_line, dtype=dtype)
    arr = lambda x: np.asarray(x, dtype)  # noqa: E731
    return AmmoniaSensorParams(
        zone_index=zone_index, sensor_type=sensor_type, base=base,
        selectivity_potassium=arr(selectivity_potassium),
        potassium_mgL=arr(potassium_mgL),
        slope_drift_pct_per_day=arr(slope_drift_pct_per_day),
        cal_pH=arr(cal_pH), cal_temperature=arr(cal_temperature),
        temp_comp_residual=arr(0.002))


def make_ammonia_carry(params: AmmoniaSensorParams, key, t0=0.0,
                       dtype=jnp.float32) -> AmmoniaSensorCarry:
    import numpy as np
    base = B.make_sensor_carry(params.base, key, t0=t0, initial_value=0.0,
                               dtype=dtype)
    arr = lambda x: np.asarray(x, dtype)  # noqa: E731
    return AmmoniaSensorCarry(base=base, membrane_age_days=arr(0.0),
                              slope_percentage=arr(100.0),
                              reagent_potency=arr(1.0))


N_NORMALS = B.BASE_NORMALS + 2     # + electrode/optical noise, junction
N_UNIFORMS = B.BASE_UNIFORMS


def _nh4_fraction(pH, T_C):
    return 1.0 - NC.ammonia_fraction_nh3(pH, T_C)


def ammonia_read(params: AmmoniaSensorParams, carry: AmmoniaSensorCarry,
                 tan_zone, pH_zone, temperature_zone, t, rand=None):
    """One total-ammonia-nitrogen reading [mg N/L]: base pipeline +
    principle-specific overlay. Returns ``(carry', SensorOutput)``."""
    dtype = jnp.asarray(carry.base.current_value).dtype
    prev_ts = carry.base.last_timestamp
    had_prev = carry.base.has_history

    tan = jnp.asarray(tan_zone, dtype)
    pH = jnp.asarray(pH_zone, dtype)
    T = jnp.asarray(temperature_zone, dtype)

    if rand is None:
        key, normals, uniforms = B.draw_read_rand(carry.base.key, dtype,
                                                  extra_normals=2)
    else:
        key = carry.base.key
        normals, uniforms = rand
    base_carry, out = B.base_read(
        params.base, replace(carry.base, key=key), tan, t,
        rand=(normals[..., :B.BASE_NORMALS],
              uniforms[..., :B.BASE_UNIFORMS]))
    finite = jnp.isfinite(out.value)
    n1 = normals[..., B.BASE_NORMALS]
    n2 = normals[..., B.BASE_NORMALS + 1]

    dt = jnp.maximum(out.timestamp - prev_ts, 0.0)
    update = had_prev & finite
    age = jnp.where(update, carry.membrane_age_days + dt / 86400.0,
                    carry.membrane_age_days)
    slope = jnp.where(
        update,
        jnp.maximum(carry.slope_percentage
                    - params.slope_drift_pct_per_day * dt / 86400.0, 80.0),
        carry.slope_percentage)

    if params.sensor_type == ISE:
        # the electrode sees NH4+ activity: response relative to the
        # NH4+ fraction at the calibration pH (pH-dependent under-read)
        frac = _nh4_fraction(pH, T) / _nh4_fraction(params.cal_pH, T)
        measured = out.value * frac
        # potassium interference (apparent nitrogen)
        measured = measured + params.selectivity_potassium \
            * params.potassium_mgL * MW_RATIO_N_K
        # electrode noise grows with membrane age
        measured = measured + n1 * params.base.precision \
            * (1.0 + 0.05 * age)
        reagent = carry.reagent_potency
    else:
        # gas-sensing membrane with alkalizing conditioning: pH-free, but
        # the reagent potency multiplies the response (like DPD) and
        # decays ~1%/day of use
        reagent = jnp.where(update,
                            jnp.maximum(carry.reagent_potency
                                        - 0.01 * dt / 86400.0, 0.5),
                            carry.reagent_potency)
        measured = out.value * reagent + n1 * params.base.precision
    # junction / electronics noise
    measured = measured + n2 * params.base.precision * 0.5

    # slope degradation: an aged membrane under-responds — the reading is
    # slope% of the span from the (zero-concentration) calibration point,
    # exactly the pH electrode's slope-health model (ph_sensor.py:272-290)
    measured = measured * (slope / 100.0)
    # Nernstian temperature-compensation residual
    measured = measured * (1.0 + params.temp_comp_residual
                           * (T - params.cal_temperature))

    final = jnp.clip(measured, params.base.min_value,
                     params.base.max_value)
    value = jnp.where(finite, final, out.value)

    output = B.SensorOutput(
        timestamp=out.timestamp, value=value, raw_value=out.raw_value,
        noise=out.noise, drift=out.drift, status=out.status,
        uncertainty=jnp.where(finite, params.base.precision * 2.0
                              * (1.0 + 0.1 * age), out.uncertainty),
        fault=out.fault)

    base_carry = replace(
        base_carry,
        current_value=jnp.where(finite, value, base_carry.current_value),
        last_value=value)
    return AmmoniaSensorCarry(base=base_carry, membrane_age_days=age,
                              slope_percentage=slope,
                              reagent_potency=reagent), output


def validate_ammonia_sensor(verbose: bool = True) -> bool:
    """Validation in the reference's ``validate_*`` style: principle
    physics against hand calculations."""
    import numpy as np

    checks = []

    def check(name, ok):
        checks.append((name, bool(ok)))
        if verbose:
            print(f"  {'PASS' if ok else 'FAIL'}: {name}")

    def read_once(sensor_type, tan, pH, T, k_sel=0.0):
        key = jax.random.key(0)
        p = make_ammonia_params(sensor_type=sensor_type,
                                selectivity_potassium=k_sel,
                                dtype=jnp.float64)
        c = make_ammonia_carry(p, key, dtype=jnp.float64)
        c = replace(c, base=replace(
            c.base, power_on_time=jnp.float64(-4000.0),
            last_calibration_time=jnp.float64(0.0),
            has_calibration=jnp.asarray(True),
            current_value=jnp.float64(tan)))   # lag-converged
        n = jnp.zeros((N_NORMALS,), jnp.float64)
        u = jnp.full((N_UNIFORMS,), 0.5, jnp.float64)
        _, out = ammonia_read(p, c, jnp.float64(tan), jnp.float64(pH),
                              jnp.float64(T), jnp.float64(10.0),
                              rand=(n, u))
        return float(out.value)

    # ISE at the calibration point (pH 7, 25 C), no interference: exact
    v = read_once(ISE, 2.0, 7.0, 25.0)
    check("ISE reads TAN at cal point (pH 7, 25C)",
          abs(v - 2.0) < 1e-4)   # base drift at t=10 s is ~1e-6

    # at pH = pKa (9.245 @ 25C) only the NH4+ half is visible:
    # 0.5 / 0.9943 = 0.5029 of TAN
    v = read_once(ISE, 2.0, 9.245, 25.0)
    expect = 2.0 * 0.5 / float(_nh4_fraction(jnp.float64(7.0),
                                             jnp.float64(25.0)))
    check("ISE under-reads at pH = pKa (NH4+ fraction)",
          abs(v - expect) < 0.01)

    # potassium interference: k_sel=0.1 x 2 mg/L K+ x 14/39.1 = 0.0717
    v0 = read_once(ISE, 2.0, 7.0, 25.0, k_sel=0.0)
    v1 = read_once(ISE, 2.0, 7.0, 25.0, k_sel=0.1)
    check("K+ interference adds k_sel*[K]*(14/39.1)",
          abs((v1 - v0) - 0.1 * 2.0 * MW_RATIO_N_K) < 1e-6)

    # gas membrane is pH-independent (fresh reagent)
    va = read_once(GAS_MEMBRANE, 2.0, 7.0, 25.0)
    vb = read_once(GAS_MEMBRANE, 2.0, 9.5, 25.0)
    check("gas-membrane reading is pH-independent", abs(va - vb) < 1e-9)
    check("gas-membrane reads TAN with fresh reagent", abs(va - 2.0) < 0.01)

    ok = all(s for _, s in checks)
    if verbose:
        print(f"Ammonia sensor validation: "
              f"{'ALL PASS' if ok else 'FAILURES PRESENT'}")
    return ok
