"""
Dissolved-oxygen sensor (optical / membrane-amperometric) as a pure
transform — the instrument for the gas-exchange physics (core/gas.py).

No reference counterpart (the reference has no dissolved gases to
measure); built in the same idiom as its four sensor families
(reference sensors/base_sensor.py pipeline + a principle-specific
overlay), so it rides the identical scan-carried base pipeline:

- **Optical / luminescent ("optical", LDO)** — the modern standard:
  O2 quenches the luminescence of a dye cap (Stern-Volmer). No flow
  dependence, no electrolyte, no membrane to foul — but the lumiphore
  PHOTO-DEGRADES with every excitation flash, losing sensitivity
  (~0.03%/day of continuous measurement), and the cap is a consumable
  (replace_cap() restores it, like the chlorine sensor's membrane ops,
  reference chlorine_sensor.py:486-537).
- **Membrane amperometric ("clark", Clark cell)** — the classic probe:
  O2 diffuses through a gas-permeable membrane and is REDUCED at the
  cathode, i.e. the sensor CONSUMES its analyte. Consequences modeled:
  * **flow dependence** — in stagnant water the boundary layer depletes
    and the cell under-reads: factor v/(v + K_flow) with K_flow ~ a few
    cm/s expressed via the plant's flow rate (the same low-flow scatter
    idea as installation effects, but deterministic and principle-bound);
  * **membrane fouling** — progressive signal loss up to 60%, like the
    amperometric chlorine cell;
  * **electrolyte depletion** — the KCl fill is consumed with measured
    charge; response scales with remaining electrolyte and its noise
    grows as it depletes.

Both principles sense O2 PARTIAL PRESSURE (activity), not concentration:
the electronics convert to mg/L through the built-in Benson-Krause
solubility at the MEASURED temperature, so a temperature-compensation
residual (fraction/degC from the calibration temperature) multiplies the
reading — with the extra physical twist that the pO2->mg/L conversion
error follows the solubility curve's local slope (~-2%/degC at 20 C).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import gas as GC
from ics_wt_physicsengine_tpu.sensors import base as B

OPTICAL = "optical"
CLARK = "clark"


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class OxygenSensorParams:
    zone_index: int = field(metadata=dict(static=True))
    sensor_type: str = field(metadata=dict(static=True))
    base: B.SensorParams = None
    cal_temperature: jnp.ndarray = None      # [C]
    temp_comp_residual: jnp.ndarray = None   # fraction error per degC
    photo_decay_pct_per_day: jnp.ndarray = None   # optical cap aging
    fouling_rate_per_day: jnp.ndarray = None      # clark membrane
    max_fouling: jnp.ndarray = None               # clark signal-loss cap
    electrolyte_days: jnp.ndarray = None          # clark KCl lifetime
    flow_K_m3h: jnp.ndarray = None                # clark flow half-sat


@jax.tree_util.register_dataclass
@dataclass
class OxygenSensorCarry:
    base: B.SensorCarry
    cap_age_days: jnp.ndarray        # optical lumiphore exposure
    slope_percentage: jnp.ndarray    # optical sensitivity health
    membrane_fouling: jnp.ndarray    # clark fractional signal loss
    electrolyte: jnp.ndarray         # clark fill remaining [0..1]


def make_oxygen_params(zone_index=0, sensor_type=OPTICAL, precision=None,
                       response_time=None, drift_rate=0.01 / 24.0,
                       cal_temperature=20.0,
                       photo_decay_pct_per_day=0.03,
                       fouling_rate_per_day=0.004, max_fouling=0.6,
                       electrolyte_days=180.0, flow_K_m3h=0.05,
                       sample_line=None, installation=None,
                       calibration_validity_hours=24.0 * 30,
                       dtype=jnp.float32) -> OxygenSensorParams:
    import numpy as np
    if sensor_type == OPTICAL:
        # LDO: slower response (dye diffusion), excellent precision,
        # near-instant warm-up
        default_precision, default_response, warmup = 0.05, 40.0, 60.0
    elif sensor_type == CLARK:
        # Clark: faster cell, needs polarization time after power-up
        default_precision, default_response, warmup = 0.1, 20.0, 900.0
    else:
        raise ValueError(f"unknown oxygen sensor type {sensor_type!r}")
    base = B.make_sensor_params(
        measurement_range=(0.0, 20.0),
        precision=precision or default_precision,
        response_time=response_time or default_response,
        drift_rate=drift_rate, warmup_time_s=warmup,
        hysteresis_magnitude=0.01, max_rate_of_change=2.0,
        installation=installation, sample_line=sample_line, dtype=dtype)
    arr = lambda x: np.asarray(x, dtype)  # noqa: E731
    return OxygenSensorParams(
        zone_index=zone_index, sensor_type=sensor_type, base=base,
        cal_temperature=arr(cal_temperature),
        temp_comp_residual=arr(0.002),
        photo_decay_pct_per_day=arr(photo_decay_pct_per_day),
        fouling_rate_per_day=arr(fouling_rate_per_day),
        max_fouling=arr(max_fouling),
        electrolyte_days=arr(electrolyte_days),
        flow_K_m3h=arr(flow_K_m3h))


def make_oxygen_carry(params: OxygenSensorParams, key, t0=0.0,
                      dtype=jnp.float32) -> OxygenSensorCarry:
    import numpy as np
    base = B.make_sensor_carry(params.base, key, t0=t0, initial_value=8.0,
                               dtype=dtype)
    arr = lambda x: np.asarray(x, dtype)  # noqa: E731
    return OxygenSensorCarry(base=base, cap_age_days=arr(0.0),
                             slope_percentage=arr(100.0),
                             membrane_fouling=arr(0.0),
                             electrolyte=arr(1.0))


N_NORMALS = B.BASE_NORMALS + 2     # + luminescence/polarization, electronics
N_UNIFORMS = B.BASE_UNIFORMS


def oxygen_read(params: OxygenSensorParams, carry: OxygenSensorCarry,
                o2_zone, temperature_zone, flow_rate, t, rand=None):
    """One dissolved-O2 reading [mg/L]: base pipeline + principle-specific
    overlay. Returns ``(carry', SensorOutput)``."""
    dtype = jnp.asarray(carry.base.current_value).dtype
    prev_ts = carry.base.last_timestamp
    had_prev = carry.base.has_history

    o2 = jnp.asarray(o2_zone, dtype)
    T = jnp.asarray(temperature_zone, dtype)
    q = jnp.asarray(flow_rate, dtype)

    if rand is None:
        key, normals, uniforms = B.draw_read_rand(carry.base.key, dtype,
                                                  extra_normals=2)
    else:
        key = carry.base.key
        normals, uniforms = rand
    base_carry, out = B.base_read(
        params.base, replace(carry.base, key=key), o2, t,
        rand=(normals[..., :B.BASE_NORMALS],
              uniforms[..., :B.BASE_UNIFORMS]))
    finite = jnp.isfinite(out.value)
    n1 = normals[..., B.BASE_NORMALS]
    n2 = normals[..., B.BASE_NORMALS + 1]

    dt = jnp.maximum(out.timestamp - prev_ts, 0.0)
    update = had_prev & finite
    dt_days = dt / 86400.0

    if params.sensor_type == OPTICAL:
        # lumiphore photo-degradation: sensitivity (slope) decays with
        # excitation exposure; replace_cap() resets it
        age = jnp.where(update, carry.cap_age_days + dt_days,
                        carry.cap_age_days)
        slope = jnp.where(
            update,
            jnp.maximum(carry.slope_percentage
                        - params.photo_decay_pct_per_day * dt_days, 70.0),
            carry.slope_percentage)
        measured = out.value * (slope / 100.0)
        # luminescence phase-detection noise grows as the dye fades
        measured = measured + n1 * params.base.precision \
            * (100.0 / slope)
        fouling, elec = carry.membrane_fouling, carry.electrolyte
    else:
        # Clark cell -------------------------------------------------
        age, slope = carry.cap_age_days, carry.slope_percentage
        # boundary-layer depletion: the cell consumes O2; stagnant water
        # under-reads (v/(v+K) in plant-flow units)
        flow_factor = q / (q + params.flow_K_m3h)
        # membrane fouling: progressive signal loss (like the
        # amperometric chlorine cell)
        fouling = jnp.where(
            update,
            jnp.minimum(carry.membrane_fouling
                        + params.fouling_rate_per_day * dt_days,
                        params.max_fouling),
            carry.membrane_fouling)
        # electrolyte consumption scales with measured signal (charge)
        elec = jnp.where(
            update,
            jnp.maximum(carry.electrolyte
                        - dt_days / params.electrolyte_days
                        * (out.value / 9.0), 0.1),
            carry.electrolyte)
        response = flow_factor * (1.0 - fouling) \
            * (0.7 + 0.3 * jnp.minimum(elec / 0.3, 1.0))
        measured = out.value * response
        # polarization noise grows as the electrolyte depletes
        measured = measured + n1 * params.base.precision / \
            jnp.maximum(elec, 0.2)

    # electronics noise (both principles)
    measured = measured + n2 * params.base.precision * 0.5

    # pO2 -> mg/L conversion error: temperature-compensation residual
    # follows the Benson-Krause solubility slope at the measured T
    dT = T - params.cal_temperature
    measured = measured * (1.0 + params.temp_comp_residual * dT)

    final = jnp.clip(measured, params.base.min_value,
                     params.base.max_value)
    value = jnp.where(finite, final, out.value)

    output = B.SensorOutput(
        timestamp=out.timestamp, value=value, raw_value=out.raw_value,
        noise=out.noise, drift=out.drift, status=out.status,
        uncertainty=jnp.where(
            finite, params.base.precision * 2.0
            * (1.0 + carry.membrane_fouling), out.uncertainty),
        fault=out.fault)

    base_carry = replace(
        base_carry,
        current_value=jnp.where(finite, value, base_carry.current_value),
        last_value=value)
    return OxygenSensorCarry(base=base_carry, cap_age_days=age,
                             slope_percentage=slope,
                             membrane_fouling=fouling,
                             electrolyte=elec), output


def replace_cap(carry: OxygenSensorCarry) -> OxygenSensorCarry:
    """Replace the optical sensing cap / Clark membrane+electrolyte: all
    consumable aging resets (maintenance op, like chlorine
    replace_membrane, reference chlorine_sensor.py:486-537)."""
    zeros = jnp.zeros_like(carry.cap_age_days)
    return replace(carry, cap_age_days=zeros,
                   slope_percentage=zeros + 100.0,
                   membrane_fouling=zeros, electrolyte=zeros + 1.0)


def percent_saturation(o2_mgL, T_C):
    """Convert a concentration reading to % air saturation (the other
    display unit DO instruments offer)."""
    return 100.0 * o2_mgL / GC.oxygen_saturation(T_C)


def validate_oxygen_sensor(verbose: bool = True) -> bool:
    """Validation in the reference's ``validate_*`` style: principle
    physics against hand calculations."""
    import numpy as np

    checks = []

    def check(name, ok):
        checks.append((name, bool(ok)))
        if verbose:
            print(f"  {'PASS' if ok else 'FAIL'}: {name}")

    def read_once(sensor_type, o2, T=20.0, flow=2.0, fouling=0.0,
                  elec=1.0):
        key = jax.random.key(0)
        p = make_oxygen_params(sensor_type=sensor_type, dtype=jnp.float64)
        c = make_oxygen_carry(p, key, dtype=jnp.float64)
        c = replace(c, base=replace(
            c.base, power_on_time=jnp.float64(-4000.0),
            last_calibration_time=jnp.float64(0.0),
            has_calibration=jnp.asarray(True),
            current_value=jnp.float64(o2)),   # lag-converged
            membrane_fouling=jnp.float64(fouling),
            electrolyte=jnp.float64(elec))
        n = jnp.zeros((N_NORMALS,), jnp.float64)
        u = jnp.full((N_UNIFORMS,), 0.5, jnp.float64)
        _, out = oxygen_read(p, c, jnp.float64(o2), jnp.float64(T),
                             jnp.float64(flow), jnp.float64(10.0),
                             rand=(n, u))
        return float(out.value)

    # optical at the calibration point: exact
    v = read_once(OPTICAL, 8.0)
    check("optical reads true DO at cal point", abs(v - 8.0) < 1e-3)

    # temperature-compensation residual: 0.2%/degC
    v = read_once(OPTICAL, 8.0, T=30.0)
    check("temp-comp residual = 0.2%/degC",
          abs(v - 8.0 * (1.0 + 0.002 * 10.0)) < 1e-3)

    # Clark flow dependence: stagnant water under-reads
    v_flow = read_once(CLARK, 8.0, flow=2.0)
    v_stag = read_once(CLARK, 8.0, flow=0.01)
    check("Clark under-reads in stagnant water",
          v_stag < 0.25 * v_flow)
    check("Clark at high flow ~ true value", abs(v_flow - 8.0) < 0.25)

    # Clark fouling: 30% fouled membrane -> ~30% signal loss
    v_foul = read_once(CLARK, 8.0, fouling=0.3)
    check("Clark fouling scales the signal",
          abs(v_foul / v_flow - 0.7) < 0.02)

    # electrolyte depletion reduces response
    v_dep = read_once(CLARK, 8.0, elec=0.15)
    check("electrolyte depletion reduces response", v_dep < 0.95 * v_flow)

    # % saturation conversion round-trips the Benson-Krause table
    sat20 = float(GC.oxygen_saturation(np.float64(20.0)))
    check("percent_saturation(sat, 20C) = 100%",
          abs(float(percent_saturation(np.float64(sat20),
                                       np.float64(20.0))) - 100.0) < 1e-9)

    ok = all(s for _, s in checks)
    if verbose:
        print(f"Oxygen sensor validation: "
              f"{'ALL PASS' if ok else 'FAILURES PRESENT'}")
    return ok
