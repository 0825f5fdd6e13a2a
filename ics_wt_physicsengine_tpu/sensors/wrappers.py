"""
API-parity sensor classes over the functional core.

These classes present the reference's sensor API (``BaseSensor`` surface:
``read``/``calibrate``/``get_statistics``/``reset`` etc., base_sensor.py:219-887,
plus the per-type extras) while all measurement math runs through the jitted
pure transforms in ph.py / chlorine.py / flow.py / temperature.py. The
wrapper owns host-side concerns only: the bounded reading/calibration
history, monotonic-time enforcement, duck-typed state access, and enum
conversion.

The duck-typed state contract is preserved: ``read`` accepts any object with
the arrays the sensor needs (``.pH``, ``.chlorine``, ``.temperature``,
``.flow_rate``), exactly like the reference's MockReactorState test pattern.
"""

from __future__ import annotations

import secrets
import threading
import time as time_module
from collections import deque
from typing import Deque, Dict, List, Optional

import jax
import numpy as np

from ics_wt_physicsengine_tpu.sensors import base as B
from ics_wt_physicsengine_tpu.sensors import chlorine as CL
from ics_wt_physicsengine_tpu.sensors import flow as FL
from ics_wt_physicsengine_tpu.sensors import ph as PH
from ics_wt_physicsengine_tpu.sensors import ammonia as AM
from ics_wt_physicsengine_tpu.sensors import oxygen as OX
from ics_wt_physicsengine_tpu.sensors import turbidity as TB
from ics_wt_physicsengine_tpu.sensors import temperature as TP
from ics_wt_physicsengine_tpu.sensors.types import (
    STATUS_FROM_CODE,
    FAULT_FROM_CODE,
    CalibrationRecord,
    InstallationQuality,
    SampleLine,
    SensorFault,
    SensorReading,
    SensorStatus,
)


def _default_dtype():
    import jax.numpy as jnp
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


# Module-level jitted reads, shared across all sensor instances: params are
# traced pytree arguments (static fields live in the treedef), so every
# instance with the same structure reuses one compiled executable instead of
# re-tracing a per-instance closure.
_PH_READ = jax.jit(PH.ph_read)
_CL_READ = jax.jit(lambda params, carry, cl, ph, o3, h2o2, clo2, comb, t:
                   CL.chlorine_read(params, carry, cl, ph, t, ozone=o3,
                                    hydrogen_peroxide=h2o2,
                                    chlorine_dioxide=clo2,
                                    combined_zone=comb))
_FL_READ = jax.jit(FL.flow_read)
_TP_READ = jax.jit(TP.temperature_read)
_AM_READ = jax.jit(AM.ammonia_read)
_OX_READ = jax.jit(OX.oxygen_read)
_TB_READ = jax.jit(TB.turbidity_read)


@jax.jit
def _electrical_jit(params, carry, value, t):
    from ics_wt_physicsengine_tpu.sensors import electrical as E
    return E.electrical_transform(params, carry, value, t)


def _zone(arr, idx):
    arr = np.asarray(arr)
    n = arr.shape[-1]
    if idx >= n or idx < -n:
        raise IndexError(f"zone_index {idx} out of bounds for {n} zones")
    return arr[..., idx]


class _SensorShell:
    """Common wrapper machinery (history, calibration, statistics)."""

    def __init__(self, name: str, params, carry, read_fn,
                 max_history_length: int = 1000,
                 calibration_validity_hours: float = 24.0):
        if not isinstance(name, str) or len(name) == 0:
            raise ValueError("Sensor name must be non-empty string")
        self.name = name
        self.params = params
        self.carry = carry
        self._read_fn = read_fn    # shared module-level jit
        self.max_history_length = max_history_length
        self.calibration_validity_hours = calibration_validity_hours
        self.reading_history: Deque[SensorReading] = deque(
            maxlen=max_history_length)
        self.calibration_history: Deque[CalibrationRecord] = deque(maxlen=100)
        self._state_lock = threading.RLock()
        # opt-in electrical-environment stage (sensors/electrical.py):
        # EMI / cable capacitance / ground loop on the transmitted value
        self._electrical_params = None
        self._electrical_carry = None
        self._electrical_key = None

    def attach_electrical(self, params, seed: int = 0) -> None:
        """Attach an electrical-environment model (EMI pickup, cable RC,
        ground loop — sensors/electrical.py) to this sensor's
        transmitted signal. Closes the reference's EMI/cable/ground-loop
        sensor-model limitations (reference README.md:528-531). The
        stage corrupts the reported value; sensor status/fault fields
        still reflect the instrument itself."""
        import jax as _jax
        with self._state_lock:
            self._electrical_params = params
            self._electrical_carry = None     # lazily seeded on first read
            self._electrical_key = _jax.random.PRNGKey(seed)

    # -- attribute parity helpers --
    @property
    def min_value(self):
        return float(self.params.base.min_value)

    @property
    def max_value(self):
        return float(self.params.base.max_value)

    @property
    def precision(self):
        return float(self.params.base.precision)

    @property
    def current_value(self):
        return float(self.carry.base.current_value)

    @property
    def status(self) -> SensorStatus:
        return STATUS_FROM_CODE[int(self.carry.base.status)]

    @property
    def fault(self) -> SensorFault:
        return FAULT_FROM_CODE[int(self.carry.base.fault)]

    @property
    def cumulative_drift(self):
        if self.reading_history:
            return self.reading_history[-1].drift
        return 0.0

    def _extract_inputs(self, reactor_state):
        raise NotImplementedError

    def read(self, reactor_state,
             current_time: Optional[float] = None) -> SensorReading:
        with self._state_lock:
            if current_time is None:
                current_time = time_module.monotonic()
            if (self.reading_history
                    and current_time < self.reading_history[-1].timestamp):
                raise ValueError(
                    f"Non-monotonic time: {current_time} < "
                    f"{self.reading_history[-1].timestamp}")

            inputs = self._extract_inputs(reactor_state)
            self.carry, out = self._read_fn(self.params, self.carry,
                                            *inputs, float(current_time))
            value = float(out.value)
            if self._electrical_params is not None:
                from ics_wt_physicsengine_tpu.sensors import electrical as E
                if self._electrical_carry is None:
                    # seed at the first read's clock so the first dt is
                    # 0 (no spurious burst/walk jump from a huge gap)
                    self._electrical_carry = E.make_electrical_carry(
                        self._electrical_params,
                        key=self._electrical_key,
                        t0=float(current_time))
                self._electrical_carry, corrupted = _electrical_jit(
                    self._electrical_params, self._electrical_carry,
                    value, float(current_time))
                value = float(corrupted)
            reading = SensorReading(
                timestamp=float(out.timestamp),
                value=value,
                raw_value=float(out.raw_value),
                noise=float(out.noise),
                drift=float(out.drift),
                status=STATUS_FROM_CODE[int(out.status)],
                uncertainty=float(out.uncertainty),
                fault=FAULT_FROM_CODE[int(out.fault)],
            )
            self.reading_history.append(reading)
            return reading

    def calibrate(self, reference_value: float,
                  current_time: Optional[float] = None,
                  operator_id: str = "auto",
                  validity_hours: Optional[float] = None) -> CalibrationRecord:
        with self._state_lock:
            if current_time is None:
                current_time = time_module.monotonic()
            measured = float(self.carry.base.current_value)
            validity = validity_hours or self.calibration_validity_hours
            new_base, offset = B.calibrate(
                self.carry.base, reference_value, current_time,
                validity_hours=validity)
            from dataclasses import replace as dc_replace
            self.carry = dc_replace(self.carry, base=new_base)
            record = CalibrationRecord(
                timestamp=current_time, reference_value=reference_value,
                measured_value=measured, offset=float(offset),
                operator_id=operator_id, validity_hours=validity)
            self.calibration_history.append(record)
            return record

    def get_recent_readings(self, window_seconds: float) -> List[SensorReading]:
        with self._state_lock:
            if not self.reading_history:
                return []
            cutoff = self.reading_history[-1].timestamp - window_seconds
            return [r for r in reversed(self.reading_history)
                    if r.timestamp >= cutoff]

    def calculate_drift_rate(self, window_seconds: float = 3600.0) -> float:
        recent = self.get_recent_readings(window_seconds)
        if len(recent) < 2:
            return 0.0
        dt = recent[0].timestamp - recent[-1].timestamp
        if dt > 0:
            return (recent[0].drift - recent[-1].drift) / dt * 3600.0
        return 0.0

    def get_statistics(self, window_seconds: float = 60.0) -> Dict[str, float]:
        recent = self.get_recent_readings(window_seconds)
        if not recent:
            return {"mean": 0.0, "std": 0.0, "min": 0.0, "max": 0.0,
                    "count": 0, "drift_rate": 0.0, "fault_rate": 0.0}
        values = np.array([r.value for r in recent
                           if np.isfinite(r.value)])
        if len(values) == 0:
            return {"mean": np.nan, "std": np.nan, "min": np.nan,
                    "max": np.nan, "count": len(recent), "drift_rate": 0.0,
                    "fault_rate": 1.0}
        fault_count = sum(1 for r in recent if not np.isfinite(r.value))
        return {
            "mean": float(np.mean(values)), "std": float(np.std(values)),
            "min": float(np.min(values)), "max": float(np.max(values)),
            "count": len(recent),
            "drift_rate": self.calculate_drift_rate(window_seconds),
            "fault_rate": fault_count / len(recent),
        }

    def inject_fault(self, kind: str = "power_low") -> None:
        """Scripted fault injection (fault-scenario tooling; the
        reference's stochastic faults cannot be scheduled): force a
        latching supply-power fault. Reads return NaN with POWER_FAULT
        until ``clear_faults()`` (or maintenance) repairs it."""
        from dataclasses import replace as dc_replace
        with self._state_lock:
            self.carry = dc_replace(
                self.carry,
                base=B.inject_power_fault(self.carry.base, kind))

    def clear_faults(self) -> None:
        """Repair an injected (or organic) power fault: nominal supply
        voltage, fault/status cleared."""
        from dataclasses import replace as dc_replace
        with self._state_lock:
            self.carry = dc_replace(
                self.carry, base=B.clear_power_fault(self.carry.base))

    def reset(self, seed: Optional[int] = None) -> None:
        with self._state_lock:
            self.reading_history.clear()
            self.calibration_history.clear()
            self.carry = self._fresh_carry(seed)

    def _fresh_carry(self, seed: Optional[int] = None):
        raise NotImplementedError

    def __repr__(self) -> str:
        return (f"{self.__class__.__name__}(name='{self.name}', "
                f"value={self.current_value:.3f}, "
                f"status={self.status.value})")


def _new_key(seed: Optional[int] = None):
    if seed is None:
        seed = secrets.randbits(63)
    return jax.random.key(seed)


# The reference's abstract base class name (base_sensor.py:219): users
# subclass BaseSensor to build custom instruments. _SensorShell carries the
# same surface (read/calibrate/statistics/reset/history + the two abstract
# hooks _get_true_value-equivalents raise NotImplementedError), so the name
# is exported as an alias — subclass it exactly as you would the
# reference's, supplying a params pytree + carry + read transform.
BaseSensor = _SensorShell


class pHSensor(_SensorShell):
    """Glass-electrode pH sensor (reference ph_sensor.py:62-488)."""

    def __init__(self, name: str, zone_index: int = 0, precision: float = 0.01,
                 response_time: float = 15.0, drift_rate: float = 0.01 / 24.0,
                 temperature_coefficient: float = 0.003,
                 max_history_length: int = 1000,
                 sample_line: Optional[SampleLine] = None,
                 installation: Optional[InstallationQuality] = None,
                 calibration_validity_hours: float = 24.0,
                 seed: Optional[int] = None, dtype=None):
        dtype = dtype or _default_dtype()
        self._dtype = dtype
        self.zone_index = zone_index
        self.temperature_coefficient = temperature_coefficient
        self.sample_line = sample_line
        self.installation = installation or InstallationQuality()
        params = PH.make_ph_params(
            zone_index=zone_index, precision=precision,
            response_time=response_time, drift_rate=drift_rate,
            temperature_coefficient=temperature_coefficient,
            sample_line=sample_line, installation=installation,
            calibration_validity_hours=calibration_validity_hours,
            dtype=dtype)
        carry = PH.make_ph_carry(params, _new_key(seed), dtype=dtype)
        super().__init__(name, params, carry, _PH_READ, max_history_length,
                         calibration_validity_hours)

    def _fresh_carry(self, seed=None):
        return PH.make_ph_carry(self.params, _new_key(seed),
                                dtype=self._dtype)

    def _extract_inputs(self, reactor_state):
        ph = _zone(reactor_state.pH, self.zone_index)
        if hasattr(reactor_state, "temperature"):
            temp = _zone(reactor_state.temperature, self.zone_index)
        else:
            temp = 25.0
        return float(ph), float(temp)

    # -- pH-specific extras (reference ph_sensor.py:338-488) --
    @property
    def membrane_fouling(self):
        return float(self.carry.membrane_fouling)

    @property
    def slope_percentage(self):
        return float(self.carry.slope_percentage)

    def calibrate_two_point(self, buffer_pH_1, buffer_pH_2, measured_pH_1,
                            measured_pH_2, current_time=None,
                            operator_id="auto"):
        from dataclasses import replace as dc_replace
        if current_time is None:
            current_time = time_module.monotonic()
        if buffer_pH_2 != buffer_pH_1:
            measured_slope = (measured_pH_2 - measured_pH_1) \
                / (buffer_pH_2 - buffer_pH_1)
            slope_pct = measured_slope * 100.0
        else:
            slope_pct = float(self.carry.slope_percentage)
        import jax.numpy as jnp
        self.carry = dc_replace(
            self.carry,
            slope_percentage=jnp.asarray(slope_pct, self._dtype),
            cal_point_1=jnp.asarray(buffer_pH_1, self._dtype),
            cal_point_2=jnp.asarray(buffer_pH_2, self._dtype),
            reference_contamination=jnp.asarray(0.0, self._dtype))
        mid = (buffer_pH_1 + buffer_pH_2) / 2.0
        return self.calibrate(mid, current_time, operator_id)

    def clean_electrode(self, cleaning_method: str, current_time=None):
        if current_time is None:
            current_time = time_module.monotonic()
        self.carry = PH.clean_electrode(self.carry, cleaning_method,
                                        current_time)

    def check_slope_health(self) -> Dict[str, float]:
        slope = float(self.carry.slope_percentage)
        if 95.0 <= slope <= 105.0:
            health = "excellent"
        elif 90.0 <= slope <= 110.0:
            health = "good"
        elif 85.0 <= slope <= 115.0:
            health = "fair"
        else:
            health = "poor"
        days_since_cal = 0.0
        if self.calibration_history:
            days_since_cal = (time_module.monotonic()
                              - self.calibration_history[-1].timestamp) / 86400.0
        return {
            "slope_percentage": slope,
            "health": health,
            "impedance_ohms": 1e8,
            "days_since_calibration": days_since_cal,
            "membrane_fouling": float(self.carry.membrane_fouling),
            "glass_etching": float(self.carry.glass_etching),
            "days_since_cleaning": float(self.carry.days_since_cleaning),
        }

    def set_water_hardness(self, hardness_mg_L: float):
        from dataclasses import replace as dc_replace
        import jax.numpy as jnp
        if hardness_mg_L < 0:
            raise ValueError(
                f"Hardness must be non-negative, got {hardness_mg_L}")
        self.carry = dc_replace(
            self.carry,
            water_hardness=jnp.asarray(hardness_mg_L, self._dtype))


class ChlorineSensor(_SensorShell):
    """Chlorine sensor (reference chlorine_sensor.py:75-537)."""

    def __init__(self, name: str, zone_index: int = 0,
                 sensor_type: str = CL.AMPEROMETRIC,
                 measurement_type: str = "free",
                 precision: Optional[float] = None,
                 response_time: Optional[float] = None,
                 drift_rate: float = 0.02 / 24.0,
                 max_history_length: int = 1000,
                 sample_line: Optional[SampleLine] = None,
                 installation: Optional[InstallationQuality] = None,
                 calibration_validity_hours: float = 24.0,
                 seed: Optional[int] = None, dtype=None):
        dtype = dtype or _default_dtype()
        self._dtype = dtype
        if hasattr(sensor_type, "value"):       # accept reference-style enums
            sensor_type = sensor_type.value
        self.zone_index = zone_index
        self.sensor_type = sensor_type
        self.measurement_type = measurement_type
        if hasattr(measurement_type, "value"):
            measurement_type = measurement_type.value
        params = CL.make_chlorine_params(
            zone_index=zone_index, sensor_type=sensor_type,
            measurement_type=measurement_type,
            precision=precision, response_time=response_time,
            drift_rate=drift_rate, sample_line=sample_line,
            installation=installation,
            calibration_validity_hours=calibration_validity_hours,
            dtype=dtype)
        carry = CL.make_chlorine_carry(params, _new_key(seed), dtype=dtype)
        super().__init__(name, params, carry, _CL_READ, max_history_length,
                         calibration_validity_hours)

    def _fresh_carry(self, seed=None):
        return CL.make_chlorine_carry(self.params, _new_key(seed),
                                      dtype=self._dtype)

    def _extract_inputs(self, reactor_state):
        cl = _zone(reactor_state.chlorine, self.zone_index)
        ph = (_zone(reactor_state.pH, self.zone_index)
              if hasattr(reactor_state, "pH") else 7.5)

        def optional(attr):
            if hasattr(reactor_state, attr):
                v = getattr(reactor_state, attr)
                if hasattr(v, "__getitem__"):
                    return float(_zone(v, self.zone_index))
            return 0.0

        return (float(cl), float(ph), optional("ozone"),
                optional("hydrogen_peroxide"), optional("chlorine_dioxide"),
                optional("chloramine"))

    @property
    def membrane_fouling(self):
        return float(self.carry.membrane_fouling)

    @property
    def reagent_potency(self):
        return float(self.carry.reagent_potency)

    def replace_membrane(self, current_time=None):
        if self.sensor_type != CL.AMPEROMETRIC:
            raise ValueError("Only amperometric sensors have membranes")
        if current_time is None:
            current_time = time_module.monotonic()
        self.carry = CL.replace_membrane(self.carry, current_time)
        self.calibrate(0.0, current_time, operator_id="membrane_replacement")

    def replace_reagent(self, current_time=None, storage_temp: float = 20.0):
        if self.sensor_type != CL.DPD:
            raise ValueError("Only DPD sensors have reagent")
        if current_time is None:
            current_time = time_module.monotonic()
        self.carry = CL.replace_reagent(self.carry, current_time,
                                        storage_temp)
        self.calibrate(0.0, current_time, operator_id="reagent_replacement")


class FlowSensor(_SensorShell):
    """Flow sensor (reference flow_sensor.py:40-219)."""

    def __init__(self, name: str, sensor_type: str = FL.MAGNETIC,
                 full_scale: float = 100.0, precision: Optional[float] = None,
                 response_time: float = 0.5, drift_rate: float = 0.0,
                 max_history_length: int = 1000,
                 sample_line: Optional[SampleLine] = None,
                 installation: Optional[InstallationQuality] = None,
                 seed: Optional[int] = None, dtype=None):
        dtype = dtype or _default_dtype()
        self._dtype = dtype
        if hasattr(sensor_type, "value"):
            sensor_type = sensor_type.value
        self.sensor_type = sensor_type
        self.full_scale = full_scale
        params = FL.make_flow_params(
            sensor_type=sensor_type, full_scale=full_scale,
            precision=precision, response_time=response_time,
            drift_rate=drift_rate, sample_line=sample_line,
            installation=installation, dtype=dtype)
        carry = FL.make_flow_carry(params, _new_key(seed), dtype=dtype)
        super().__init__(name, params, carry, _FL_READ, max_history_length,
                         calibration_validity_hours=8760.0)

    def _fresh_carry(self, seed=None):
        return FL.make_flow_carry(self.params, _new_key(seed),
                                  dtype=self._dtype)

    def _extract_inputs(self, reactor_state):
        if not hasattr(reactor_state, "flow_rate"):
            raise AttributeError("reactor_state missing flow_rate attribute")
        return (float(np.asarray(reactor_state.flow_rate)),)

    def read_flow(self, flow_rate: float, current_time=None) -> SensorReading:
        """Convenience read from a known value (reference flow_sensor.py:104-123)."""

        class MockState:
            pass

        state = MockState()
        state.flow_rate = flow_rate
        return self.read(state, current_time)


class TemperatureSensor(_SensorShell):
    """Temperature sensor (reference temperature_sensor.py:38-194)."""

    def __init__(self, name: str, zone_index: int = 0,
                 sensor_type: str = TP.RTD_PT100,
                 precision: Optional[float] = None,
                 response_time: float = 15.0, drift_rate: float = 0.0,
                 max_history_length: int = 1000,
                 sample_line: Optional[SampleLine] = None,
                 installation: Optional[InstallationQuality] = None,
                 seed: Optional[int] = None, dtype=None):
        dtype = dtype or _default_dtype()
        self._dtype = dtype
        if hasattr(sensor_type, "value"):
            sensor_type = sensor_type.value
        self.zone_index = zone_index
        self.sensor_type = sensor_type
        params = TP.make_temperature_params(
            zone_index=zone_index, sensor_type=sensor_type,
            precision=precision, response_time=response_time,
            drift_rate=drift_rate, sample_line=sample_line,
            installation=installation, dtype=dtype)
        carry = TP.make_temperature_carry(params, _new_key(seed), dtype=dtype)
        super().__init__(name, params, carry, _TP_READ, max_history_length,
                         calibration_validity_hours=8760.0)

    def _fresh_carry(self, seed=None):
        return TP.make_temperature_carry(self.params, _new_key(seed),
                                         dtype=self._dtype)

    def _extract_inputs(self, reactor_state):
        return (float(_zone(reactor_state.temperature, self.zone_index)),)


class AmmoniaSensor(_SensorShell):
    """Total-ammonia-nitrogen sensor (ISE / gas-sensing membrane) — the
    instrument for the nitrogen chemistry; no reference counterpart
    (sensors/ammonia.py)."""

    def __init__(self, name: str, zone_index: int = 0,
                 sensor_type: str = AM.ISE,
                 precision: Optional[float] = None,
                 response_time: Optional[float] = None,
                 drift_rate: float = 0.02 / 24.0,
                 selectivity_potassium: float = 0.1,
                 potassium_mgL: float = 2.0,
                 max_history_length: int = 1000,
                 sample_line: Optional[SampleLine] = None,
                 installation: Optional[InstallationQuality] = None,
                 calibration_validity_hours: float = 24.0,
                 seed: Optional[int] = None, dtype=None):
        dtype = dtype or _default_dtype()
        self._dtype = dtype
        if hasattr(sensor_type, "value"):
            sensor_type = sensor_type.value
        self.zone_index = zone_index
        self.sensor_type = sensor_type
        params = AM.make_ammonia_params(
            zone_index=zone_index, sensor_type=sensor_type,
            precision=precision, response_time=response_time,
            drift_rate=drift_rate,
            selectivity_potassium=selectivity_potassium,
            potassium_mgL=potassium_mgL, sample_line=sample_line,
            installation=installation,
            calibration_validity_hours=calibration_validity_hours,
            dtype=dtype)
        carry = AM.make_ammonia_carry(params, _new_key(seed), dtype=dtype)
        super().__init__(name, params, carry, _AM_READ, max_history_length,
                         calibration_validity_hours)

    def _fresh_carry(self, seed=None):
        return AM.make_ammonia_carry(self.params, _new_key(seed),
                                     dtype=self._dtype)

    def _extract_inputs(self, reactor_state):
        tan = _zone(reactor_state.ammonia, self.zone_index)
        ph = (_zone(reactor_state.pH, self.zone_index)
              if hasattr(reactor_state, "pH") else 7.0)
        temp = (_zone(reactor_state.temperature, self.zone_index)
                if hasattr(reactor_state, "temperature") else 20.0)
        return (float(tan), float(ph), float(temp))

    @property
    def membrane_age_days(self):
        return float(self.carry.membrane_age_days)

    @property
    def slope_percentage(self):
        return float(self.carry.slope_percentage)


class OxygenSensor(_SensorShell):
    """Dissolved-oxygen sensor (optical luminescent / Clark amperometric) —
    the instrument for the gas-exchange physics; no reference counterpart
    (sensors/oxygen.py)."""

    def __init__(self, name: str, zone_index: int = 0,
                 sensor_type: str = OX.OPTICAL,
                 precision: Optional[float] = None,
                 response_time: Optional[float] = None,
                 drift_rate: float = 0.01 / 24.0,
                 cal_temperature: float = 20.0,
                 max_history_length: int = 1000,
                 sample_line: Optional[SampleLine] = None,
                 installation: Optional[InstallationQuality] = None,
                 calibration_validity_hours: float = 24.0 * 30,
                 seed: Optional[int] = None, dtype=None):
        dtype = dtype or _default_dtype()
        self._dtype = dtype
        if hasattr(sensor_type, "value"):
            sensor_type = sensor_type.value
        self.zone_index = zone_index
        self.sensor_type = sensor_type
        params = OX.make_oxygen_params(
            zone_index=zone_index, sensor_type=sensor_type,
            precision=precision, response_time=response_time,
            drift_rate=drift_rate, cal_temperature=cal_temperature,
            sample_line=sample_line, installation=installation,
            calibration_validity_hours=calibration_validity_hours,
            dtype=dtype)
        carry = OX.make_oxygen_carry(params, _new_key(seed), dtype=dtype)
        super().__init__(name, params, carry, _OX_READ, max_history_length,
                         calibration_validity_hours)

    def _fresh_carry(self, seed=None):
        return OX.make_oxygen_carry(self.params, _new_key(seed),
                                    dtype=self._dtype)

    def _extract_inputs(self, reactor_state):
        o2 = _zone(reactor_state.oxygen, self.zone_index)
        temp = (_zone(reactor_state.temperature, self.zone_index)
                if hasattr(reactor_state, "temperature") else 20.0)
        flow = (float(np.asarray(reactor_state.flow_rate))
                if hasattr(reactor_state, "flow_rate") else 1.0)
        return (float(o2), float(temp), flow)

    def replace_cap(self) -> None:
        """Replace the sensing cap (optical) / membrane+electrolyte (Clark):
        resets all consumable aging (maintenance op, in the idiom of the
        chlorine sensor's replace_membrane, reference
        chlorine_sensor.py:486-537)."""
        with self._state_lock:
            self.carry = OX.replace_cap(self.carry)

    @property
    def cap_age_days(self):
        return float(self.carry.cap_age_days)

    @property
    def slope_percentage(self):
        return float(self.carry.slope_percentage)

    @property
    def membrane_fouling(self):
        return float(self.carry.membrane_fouling)

    @property
    def electrolyte(self):
        return float(self.carry.electrolyte)


class TurbiditySensor(_SensorShell):
    """Nephelometric turbidity sensor (ISO 7027 90-degree scatter) — the
    instrument for the particle dynamics; no reference counterpart
    (sensors/turbidity.py).

    The instrument is size-blind: its true value is the class-weighted
    NTU of the water (core/particles.py turbidity weights), computed here
    from the state's ``tss`` classes with ``ntu_weights`` (defaults to
    the particle model's canonical weights)."""

    def __init__(self, name: str, zone_index: int = 0,
                 precision: Optional[float] = None,
                 response_time: Optional[float] = None,
                 drift_rate: float = 0.005 / 24.0,
                 ntu_weights=None,
                 max_history_length: int = 1000,
                 sample_line: Optional[SampleLine] = None,
                 installation: Optional[InstallationQuality] = None,
                 calibration_validity_hours: float = 24.0 * 90,
                 seed: Optional[int] = None, dtype=None):
        from ics_wt_physicsengine_tpu.core import particles as PC
        dtype = dtype or _default_dtype()
        self._dtype = dtype
        self.zone_index = zone_index
        if ntu_weights is None:
            ntu_weights = PC.DEFAULT_NTU_PER_MGL
        self._ntu_weights = np.asarray(ntu_weights, float)
        params = TB.make_turbidity_params(
            zone_index=zone_index, precision=precision,
            response_time=response_time, drift_rate=drift_rate,
            sample_line=sample_line, installation=installation,
            calibration_validity_hours=calibration_validity_hours,
            dtype=dtype)
        carry = TB.make_turbidity_carry(params, _new_key(seed), dtype=dtype)
        super().__init__(name, params, carry, _TB_READ, max_history_length,
                         calibration_validity_hours)

    def _fresh_carry(self, seed=None):
        return TB.make_turbidity_carry(self.params, _new_key(seed),
                                       dtype=self._dtype)

    def _extract_inputs(self, reactor_state):
        tss = np.asarray(reactor_state.tss)          # [..., C, Z]
        col = tss[..., self.zone_index]               # [..., C]
        ntu = float(np.sum(self._ntu_weights * col, axis=-1))
        return (ntu,)

    def wipe_window(self) -> None:
        """Run the mechanical wiper (clears the window-fouling bias)."""
        with self._state_lock:
            self.carry = TB.wipe_window(self.carry)

    @property
    def window_fouling_ntu(self):
        return float(self.carry.window_fouling_ntu)
