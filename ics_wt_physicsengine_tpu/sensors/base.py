"""
Base sensor pipeline as a PRNG-threaded, scan-carried pure transform.

The reference's 14-step stateful ``BaseSensor.read`` (base_sensor.py:509-698)
becomes ``base_read(params, carry, true_value, t) -> (carry', SensorOutput)``:

- mutable members (current value, drift clock, supply voltage, delay deque,
  per-sensor RNG) become one ``SensorCarry`` pytree — batched over plants by
  broadcasting a leading axis, rolled over time by ``lax.scan``;
- the crypto-seeded NumPy RNG (base_sensor.py:330-331) becomes a
  ``jax.random`` key split per read;
- Python early-returns (power fault :553-574, warm-up :580-591) become
  where-select lattices over both the output and the carry updates;
- the SampleLine deque + nearest-timestamp linear search (:177-216) becomes
  a fixed-capacity ring buffer with an in-graph argmin lookup — exact
  semantics for any dt, not just fixed steps;
- random open/short faults at 1e-4/read (:402-407) are draws from the key.

Deliberate deviations from the reference (fix-not-replicate, SURVEY.md 2.2):
- Hysteresis (:438-462) is dead code in the reference — ``_apply_hysteresis``
  is called with the value it compares against, so ``direction`` is always 0
  and the offset never applies. We reproduce that observable behavior by
  omitting the call; the configuration field is retained.
- The reference's shared inlet SampleLine *object* (sensors/__init__.py:62-76)
  interleaves pH and temperature samples in ONE deque, so temp_inlet's
  "delayed value" is actually a pH sample. Every sensor here owns its own
  ring buffer (line configuration may still be shared).

Random-draw alignment: draws happen unconditionally and are masked in, so
the *stream positions* differ from the reference's conditional draws; the
statistical behavior (what the tests check, per the reference's own
validation style) is preserved.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.sensors.types import (
    FAULT_CODE,
    STATUS_CODE,
    SensorFault,
    SensorStatus,
)

_F = {f: FAULT_CODE[f] for f in SensorFault}
_S = {s: STATUS_CODE[s] for s in SensorStatus}

RESPONSE_ALPHA = 0.5          # first-order lag (base_sensor.py:626)
RANDOM_FAULT_PROB = 1e-4      # open/short per read (base_sensor.py:403)
VOLTAGE_NOMINAL = 24.0        # [VDC] (base_sensor.py:312)
VOLTAGE_LO, VOLTAGE_HI = 20.0, 28.0   # (base_sensor.py:313)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SensorParams:
    """Static-per-sensor configuration as a traced pytree
    (mirrors the BaseSensor constructor args, base_sensor.py:241-296)."""

    line_capacity: int = field(metadata=dict(static=True))   # 0 = no line

    min_value: jnp.ndarray = None
    max_value: jnp.ndarray = None
    precision: jnp.ndarray = None
    response_time: jnp.ndarray = None
    drift_rate: jnp.ndarray = None            # [units/hour]
    warmup_time_s: jnp.ndarray = None
    hysteresis_magnitude: jnp.ndarray = None  # retained; dead in reference
    max_rate_of_change: jnp.ndarray = None    # inf = unchecked

    # installation (base_sensor.py:124-145)
    flow_velocity: jnp.ndarray = None
    air_bubble_frequency: jnp.ndarray = None
    grounding_quality: jnp.ndarray = None
    pipe_vibration_g: jnp.ndarray = None
    ambient_temperature: jnp.ndarray = None

    # sample line (base_sensor.py:148-216). Only the transport delay enters
    # the in-graph pipeline: the reference's read() discards the
    # temperature-relaxed sample temp returned by transport_sample
    # (base_sensor.py:611-615), so no temp ring is carried here — the
    # (value, temp) transport lives host-side on types.SampleLine for API
    # parity (same treatment as the dead hysteresis path above).
    line_delay_s: jnp.ndarray = None


@jax.tree_util.register_dataclass
@dataclass
class SensorCarry:
    """All mutable sensor state, as a pytree (see module docstring)."""

    key: jnp.ndarray                 # PRNG key
    current_value: jnp.ndarray
    supply_voltage: jnp.ndarray
    power_on_time: jnp.ndarray
    calibration_offset: jnp.ndarray
    last_calibration_time: jnp.ndarray
    calibration_validity_hours: jnp.ndarray
    has_calibration: jnp.ndarray     # bool
    status: jnp.ndarray              # int32 code
    fault: jnp.ndarray               # int32 code
    last_value: jnp.ndarray          # previous reading value (post-overlay)
    last_timestamp: jnp.ndarray
    has_history: jnp.ndarray         # bool

    # sample-line ring buffer ([capacity] arrays; size-1 dummies if no line)
    line_values: jnp.ndarray = None
    line_times: jnp.ndarray = None
    line_count: jnp.ndarray = None   # int32
    line_ptr: jnp.ndarray = None     # int32


@jax.tree_util.register_dataclass
@dataclass
class SensorOutput:
    """One reading as a pytree of arrays (SensorReading's fields with coded
    enums, base_sensor.py:78-103)."""

    timestamp: jnp.ndarray
    value: jnp.ndarray
    raw_value: jnp.ndarray
    noise: jnp.ndarray
    drift: jnp.ndarray
    status: jnp.ndarray       # int32
    uncertainty: jnp.ndarray
    fault: jnp.ndarray        # int32


def make_sensor_params(measurement_range: Tuple[float, float],
                       precision: float,
                       response_time: float = 15.0,
                       drift_rate: float = 0.0,
                       warmup_time_s: float = 1800.0,
                       hysteresis_magnitude: float = 0.0,
                       max_rate_of_change: Optional[float] = None,
                       installation=None,
                       sample_line=None,
                       dtype=jnp.float32) -> SensorParams:
    from ics_wt_physicsengine_tpu.sensors.types import InstallationQuality

    installation = installation or InstallationQuality()
    installation.validate()

    def arr(x):
        import numpy as np
        return np.asarray(x, dtype)

    return SensorParams(
        line_capacity=(sample_line.buffer_capacity if sample_line else 0),
        min_value=arr(measurement_range[0]),
        max_value=arr(measurement_range[1]),
        precision=arr(precision),
        response_time=arr(response_time),
        drift_rate=arr(drift_rate),
        warmup_time_s=arr(warmup_time_s),
        hysteresis_magnitude=arr(hysteresis_magnitude),
        max_rate_of_change=arr(max_rate_of_change
                               if max_rate_of_change is not None
                               else math.inf),
        flow_velocity=arr(installation.flow_velocity),
        air_bubble_frequency=arr(installation.air_bubble_frequency),
        grounding_quality=arr(installation.grounding_quality),
        pipe_vibration_g=arr(installation.pipe_vibration_g),
        ambient_temperature=arr(installation.ambient_temperature),
        line_delay_s=arr(sample_line.transport_delay_s if sample_line
                         else 0.0),
    )


def make_sensor_carry(params: SensorParams, key, t0=0.0,
                      initial_value: Optional[float] = None,
                      dtype=jnp.float32) -> SensorCarry:
    """Fresh carry mirroring BaseSensor.__init__ state (base_sensor.py:306-334)."""
    import numpy as np

    cap = max(1, params.line_capacity)
    mid = float(np.asarray(params.min_value) + np.asarray(params.max_value)) / 2.0
    if initial_value is None:
        initial_value = mid

    def arr(x):
        return np.asarray(x, dtype)

    return SensorCarry(
        key=key,
        current_value=arr(initial_value),
        supply_voltage=arr(VOLTAGE_NOMINAL),
        power_on_time=arr(t0),
        calibration_offset=arr(0.0),
        last_calibration_time=arr(t0),
        calibration_validity_hours=arr(24.0),
        has_calibration=np.asarray(False),
        status=np.asarray(_S[SensorStatus.NORMAL], np.int32),
        fault=np.asarray(_F[SensorFault.NONE], np.int32),
        last_value=arr(np.nan),
        last_timestamp=arr(-1.0),
        has_history=np.asarray(False),
        line_values=np.zeros(cap, dtype),
        line_times=np.full(cap, -np.inf, dtype),
        line_count=np.asarray(0, np.int32),
        line_ptr=np.asarray(0, np.int32),
    )


def _ring_append_and_lookup(params: SensorParams, carry: SensorCarry,
                            value, t, do_append):
    """Append (t, value) to the delay ring (masked) and fetch the sample
    nearest to ``t - delay`` (reference base_sensor.py:177-216)."""
    cap = max(1, params.line_capacity)
    idx = jnp.arange(cap)

    append_mask = do_append & (idx == carry.line_ptr)
    line_values = jnp.where(append_mask, value, carry.line_values)
    line_times = jnp.where(append_mask, t, carry.line_times)
    line_ptr = jnp.where(do_append, (carry.line_ptr + 1) % cap,
                         carry.line_ptr)
    line_count = jnp.where(do_append,
                           jnp.minimum(carry.line_count + 1, cap),
                           carry.line_count)

    target = t - params.line_delay_s
    valid = idx < line_count
    diffs = jnp.where(valid, jnp.abs(line_times - target), jnp.inf)
    best = jnp.argmin(diffs)
    delayed_value = jnp.where(line_count > 0, line_values[best], value)

    new_carry = replace(carry, line_values=line_values,
                        line_times=line_times, line_ptr=line_ptr,
                        line_count=line_count)
    return new_carry, delayed_value


# Randomness layout of one base read (two batched draws instead of a 9-way
# key split + 8 scalar draws: ~2.5x less threefry work per read, identical
# distributions — each value is still an independent standard draw).
BASE_NORMALS = 5     # supply voltage, noise, stagnation, grounding, vibration
BASE_UNIFORMS = 3    # air bubble, random-fault roll, fault-type pick


def draw_read_rand(key, dtype, extra_normals: int = 0,
                   extra_uniforms: int = 0):
    """(new_key, normals, uniforms) for one read — base layout first, then
    ``extra_*`` overlay values (sensor overlays append their draws so each
    read costs one split + two vector generates total)."""
    key, k_n, k_u = jax.random.split(key, 3)
    normals = jax.random.normal(k_n, (BASE_NORMALS + extra_normals,), dtype)
    uniforms = jax.random.uniform(k_u, (BASE_UNIFORMS + extra_uniforms,),
                                  dtype)
    return key, normals, uniforms


def base_read(params: SensorParams, carry: SensorCarry, true_value, t,
              rand=None):
    """One reading through the full base pipeline (base_sensor.py:509-698).

    Returns ``(carry', SensorOutput)``. ``true_value`` is the physical value
    already extracted by the sensor-specific ``_get_true_value`` equivalent.
    ``rand``: optional ``(normals[..., 5], uniforms[..., 3])`` pre-drawn by
    the caller (overlays batch their draws with the base's); when None the
    read draws its own and advances ``carry.key``.
    """
    dtype = jnp.asarray(carry.current_value).dtype
    t = jnp.asarray(t, dtype)
    true_value = jnp.asarray(true_value, dtype)
    nan = jnp.asarray(jnp.nan, dtype)

    if rand is None:
        key, normals, uniforms = draw_read_rand(carry.key, dtype)
    else:
        key = carry.key                 # caller owns the stream
        normals, uniforms = rand
    n_volt, n_noise, n_stag, n_gnd, n_vib = (
        normals[..., i] for i in range(BASE_NORMALS))
    u_bub, u_fault_roll, u_fault_type = (
        uniforms[..., i] for i in range(BASE_UNIFORMS))

    # --- pre-existing power fault (early return #1, :553-574) ---
    v0 = carry.supply_voltage
    power_bad = ~((VOLTAGE_LO < v0) & (v0 < VOLTAGE_HI))
    power_fault_code = jnp.where(v0 <= VOLTAGE_LO,
                                 _F[SensorFault.POWER_LOW],
                                 _F[SensorFault.POWER_HIGH]).astype(jnp.int32)

    # voltage fluctuation for next read (:577) — skipped on the fault path
    new_voltage = VOLTAGE_NOMINAL + n_volt
    supply_voltage = jnp.where(power_bad, v0, new_voltage)

    # --- warm-up gate (early return #2, :580-591) ---
    warming = (t - carry.power_on_time) < params.warmup_time_s

    normal_path = ~power_bad & ~warming

    # --- calibration expiry (:594-597) ---
    cal_age_h = (t - carry.last_calibration_time) / 3600.0
    cal_expired = ~carry.has_calibration | \
        (cal_age_h > carry.calibration_validity_hours)

    # --- sample line (:602-615) ---
    if params.line_capacity > 0:
        carry, delayed = _ring_append_and_lookup(
            params, carry, true_value, t, normal_path)
        raw_value = delayed
    else:
        raw_value = true_value

    # --- drift + noise + lag (:617-630) ---
    drift = params.drift_rate * cal_age_h + carry.calibration_offset
    noise = n_noise * params.precision
    lagged = RESPONSE_ALPHA * (raw_value + noise + drift) \
        + (1.0 - RESPONSE_ALPHA) * carry.current_value

    # (hysteresis (:633) is a no-op in the reference — see module docstring)

    # --- installation effects (:636-638 -> :464-507) ---
    value = lagged
    value = value + jnp.where(
        params.flow_velocity < 0.1,
        n_stag * params.precision * 2.0, 0.0)
    bubble = (params.air_bubble_frequency > 0) & (
        u_bub < params.air_bubble_frequency / 60.0)
    value = value + jnp.where(
        params.grounding_quality < 0.8,
        n_gnd * params.precision * (2.0 - params.grounding_quality), 0.0)
    value = value + jnp.where(
        params.pipe_vibration_g > 0.2,
        n_vib * params.pipe_vibration_g * params.precision, 0.0)
    value = jnp.where(bubble, nan, value)

    # --- rate of change (:641-649) ---
    dt_hist = t - carry.last_timestamp
    rate = jnp.where(
        carry.has_history & (dt_hist > 0) & jnp.isfinite(carry.last_value),
        (value - carry.last_value) / jnp.maximum(dt_hist, 1e-30), 0.0)

    # --- fault lattice (:652-663 -> :357-409) ---
    span = params.max_value - params.min_value
    post_power_bad = ~((VOLTAGE_LO < supply_voltage)
                       & (supply_voltage < VOLTAGE_HI))
    post_power_code = jnp.where(
        supply_voltage <= VOLTAGE_LO, _F[SensorFault.POWER_LOW],
        _F[SensorFault.POWER_HIGH]).astype(jnp.int32)
    out_of_range = (value < params.min_value - 0.1 * span) | \
        (value > params.max_value + 0.1 * span)
    rate_fault = jnp.abs(rate) > params.max_rate_of_change
    random_fault = u_fault_roll < RANDOM_FAULT_PROB
    random_code = jnp.where(u_fault_type < 0.5,
                            _F[SensorFault.OPEN_CIRCUIT],
                            _F[SensorFault.SHORT_CIRCUIT]).astype(jnp.int32)

    none_code = jnp.asarray(_F[SensorFault.NONE], jnp.int32)
    fault = jnp.where(
        post_power_bad, post_power_code,
        jnp.where(out_of_range, _F[SensorFault.OUT_OF_RANGE],
                  jnp.where(rate_fault, _F[SensorFault.RATE_FAULT],
                            jnp.where(random_fault, random_code, none_code))))

    is_open_short = (fault == _F[SensorFault.OPEN_CIRCUIT]) | \
        (fault == _F[SensorFault.SHORT_CIRCUIT])
    has_fault = fault != none_code

    # --- status resolution + saturation (:652-682) ---
    bounded = jnp.clip(value, params.min_value, params.max_value)
    saturated = ~jnp.isnan(value) & (bounded != value)
    drift_warn = jnp.abs(drift) > 0.1 * span

    status_fault = jnp.where(
        is_open_short, _S[SensorStatus.FAILED],
        jnp.where(fault == _F[SensorFault.OUT_OF_RANGE],
                  _S[SensorStatus.OUT_OF_RANGE],
                  jnp.where((fault == _F[SensorFault.POWER_LOW])
                            | (fault == _F[SensorFault.POWER_HIGH]),
                            _S[SensorStatus.POWER_FAULT],
                            _S[SensorStatus.RATE_OF_CHANGE_FAULT])))

    prior_status = jnp.where(cal_expired,
                             _S[SensorStatus.CALIBRATION_EXPIRED],
                             carry.status)
    status_ok = jnp.where(
        jnp.isnan(value), prior_status,
        jnp.where(saturated, _S[SensorStatus.SATURATED],
                  jnp.where(cal_expired,
                            _S[SensorStatus.CALIBRATION_EXPIRED],
                            _S[SensorStatus.NORMAL])))
    status_ok = jnp.where(drift_warn & (status_ok
                                        != _S[SensorStatus.CALIBRATION_EXPIRED]),
                          _S[SensorStatus.DRIFT_WARNING], status_ok)

    status_norm = jnp.where(has_fault, status_fault, status_ok) \
        .astype(jnp.int32)
    value_norm = jnp.where(is_open_short, nan,
                           jnp.where(has_fault, value, bounded))

    # --- merge the three paths ---
    out_value = jnp.where(power_bad | warming, nan, value_norm)
    out_raw = jnp.where(power_bad | warming, nan, raw_value)
    out_noise = jnp.where(power_bad | warming, 0.0, noise)
    out_drift = jnp.where(power_bad | warming, 0.0, drift)
    out_status = jnp.where(
        power_bad, _S[SensorStatus.POWER_FAULT],
        jnp.where(warming, _S[SensorStatus.WARMING_UP],
                  status_norm)).astype(jnp.int32)
    out_fault = jnp.where(
        power_bad, power_fault_code,
        jnp.where(warming, none_code, fault)).astype(jnp.int32)
    out_uncert = jnp.where(power_bad | warming, 0.0, params.precision * 2.0)

    output = SensorOutput(
        timestamp=t, value=out_value, raw_value=out_raw, noise=out_noise,
        drift=out_drift, status=out_status, uncertainty=out_uncert,
        fault=out_fault)

    # --- carry updates (early-return paths freeze most fields) ---
    new_current = jnp.where(normal_path, value_norm, carry.current_value)
    new_status = jnp.where(normal_path, status_norm, carry.status) \
        .astype(jnp.int32)
    new_fault = jnp.where(normal_path, out_fault, carry.fault) \
        .astype(jnp.int32)

    new_carry = replace(
        carry,
        key=key,
        current_value=new_current,
        supply_voltage=supply_voltage,
        status=new_status,
        fault=new_fault,
        last_value=out_value,
        last_timestamp=t,
        has_history=jnp.asarray(True) | carry.has_history,
    )
    return new_carry, output



def inject_power_fault(carry, kind: str = "power_low"):
    """Scripted fault injection: force the carried supply voltage outside
    the [20, 28] VDC window so the next read takes the power-fault path
    (NaN reading, POWER_FAULT status) and LATCHES — the voltage random
    walk freezes while out of window (base_read; reference
    base_sensor.py:553-574), exactly like a real supply failure. Works on
    single carries and batched ``[n_plants]`` carries alike (scripted
    scenario drives over ensembles). Undo with ``clear_power_fault``."""
    if kind not in ("power_low", "power_high"):
        raise ValueError(f"unknown fault kind: {kind!r} "
                         "(power_low | power_high)")
    v = VOLTAGE_LO - 2.0 if kind == "power_low" else VOLTAGE_HI + 2.0
    return replace(carry,
                   supply_voltage=jnp.full_like(carry.supply_voltage, v))


def clear_power_fault(carry):
    """Restore nominal supply voltage and clear the fault/status codes —
    the repair that ends an injected (or organic) power fault."""
    return replace(
        carry,
        supply_voltage=jnp.full_like(carry.supply_voltage, VOLTAGE_NOMINAL),
        fault=jnp.full_like(carry.fault, _F[SensorFault.NONE]),
        status=jnp.full_like(carry.status, _S[SensorStatus.NORMAL]))


def calibrate(carry: SensorCarry, reference_value, t,
              validity_hours: float = 24.0):
    """Calibration as a pure carry transform (base_sensor.py:701-755).

    Returns ``(carry', offset)``. The wrapper layer records the
    CalibrationRecord.
    """
    dtype = jnp.asarray(carry.current_value).dtype
    offset = jnp.asarray(reference_value, dtype) - carry.current_value
    new_carry = replace(
        carry,
        calibration_offset=offset,
        last_calibration_time=jnp.asarray(t, dtype),
        calibration_validity_hours=jnp.asarray(validity_hours, dtype),
        has_calibration=jnp.asarray(True),
        status=jnp.asarray(_S[SensorStatus.NORMAL], jnp.int32),
        fault=jnp.asarray(_F[SensorFault.NONE], jnp.int32),
        power_on_time=jnp.asarray(t, dtype),   # warm-up restarts (:741)
    )
    return new_carry, offset
