"""
Sensor validation suites (API parity with the reference's co-located
``validate_*`` functions: ph_sensor.py:491-552, chlorine_sensor.py:540-585,
flow_sensor.py:222-235, temperature_sensor.py:197-214).

Each follows the reference's strategy: a duck-typed MockReactorState, a
burst of reads, and envelope/behavior checks. Reads are timestamped past the
warm-up window so values are live (the reference's own validations read
inside warm-up and pass vacuously on NaN).
"""

from __future__ import annotations

import numpy as np

from ics_wt_physicsengine_tpu.sensors.types import SampleLine, InstallationQuality
from ics_wt_physicsengine_tpu.sensors.wrappers import (
    ChlorineSensor,
    FlowSensor,
    TemperatureSensor,
    pHSensor,
)
from ics_wt_physicsengine_tpu.sensors import chlorine as _chlorine
from ics_wt_physicsengine_tpu.sensors import flow as _flow
from ics_wt_physicsengine_tpu.sensors import temperature as _temperature


class ChlorineSensorType:
    AMPEROMETRIC = _chlorine.AMPEROMETRIC
    DPD_COLORIMETRIC = _chlorine.DPD


class FlowSensorType:
    TURBINE = _flow.TURBINE
    MAGNETIC = _flow.MAGNETIC


class TemperatureSensorType:
    RTD_PT100 = _temperature.RTD_PT100


class _MockReactorState:
    def __init__(self):
        self.pH = np.array([7.0, 7.1, 7.2, 7.3, 7.4])
        self.chlorine = np.array([2.0, 1.9, 1.8, 1.7, 1.6])
        self.temperature = np.array([20.0, 20.0, 20.0, 20.0, 20.0])
        self.flow_rate = 5.0


def validate_pH_sensor():
    """pH sensor validation (reference ph_sensor.py:491-552)."""
    sample_line = SampleLine(volume_mL=100, flow_rate_mL_min=500,
                             ambient_temp=20.0)
    installation = InstallationQuality(flow_velocity=0.5,
                                       air_bubble_frequency=0.0,
                                       grounding_quality=1.0)
    sensor = pHSensor(name="pH_test", zone_index=0, sample_line=sample_line,
                      installation=installation, seed=101)
    sensor.calibrate(7.0, 0.0)

    state = _MockReactorState()
    readings = [sensor.read(state, 1800.0 + i + 1).value for i in range(10)]
    finite = [v for v in readings if np.isfinite(v)]
    if finite:
        mean_ph = float(np.mean(finite))
        std_ph = float(np.std(finite))
        if not (6.0 < mean_ph < 8.0):
            raise AssertionError(f"Mean pH should be near 7.0, got {mean_ph}")
        if std_ph >= 0.2:
            raise AssertionError(f"pH std should be small, got {std_ph}")
    if not sensor.reading_history:
        raise AssertionError("Should have reading history")

    sensor.calibrate_two_point(4.0, 7.0, 4.05, 7.02, 1900.0)
    if not (90 < sensor.slope_percentage < 110):
        raise AssertionError(
            f"Slope should be reasonable, got {sensor.slope_percentage}")

    health = sensor.check_slope_health()
    if health["health"] not in ("excellent", "good", "fair", "poor"):
        raise AssertionError(f"Unknown health status: {health['health']}")

    sensor.clean_electrode("water_rinse", 2000.0)
    if sensor.membrane_fouling >= 0.5:
        raise AssertionError("Cleaning should reduce fouling")
    print("pH sensor validation passed")


def validate_chlorine_sensor():
    """Chlorine sensor validation incl. cross-sensitivity
    (reference chlorine_sensor.py:540-585)."""
    state = _MockReactorState()
    state.ozone = np.array([0.5] * 5)   # interference injection (:549)

    amp = ChlorineSensor(name="cl_amp", zone_index=0,
                         sensor_type=ChlorineSensorType.AMPEROMETRIC,
                         seed=102)
    amp.calibrate(2.0, 0.0)
    readings = [amp.read(state, 300.0 + i + 1).value for i in range(20)]
    finite = [v for v in readings if np.isfinite(v)]
    if not finite:
        raise AssertionError("No finite amperometric readings")
    if not all(0.0 <= v <= 10.0 for v in finite):
        raise AssertionError("Readings out of range")

    # amperometric over-reads vs clean water due to ozone (:562-564)
    amp2 = ChlorineSensor(name="cl_amp2", zone_index=0,
                          sensor_type=ChlorineSensorType.AMPEROMETRIC,
                          seed=102)
    amp2.calibrate(2.0, 0.0)
    clean = [amp2.read(_MockReactorState(), 300.0 + i + 1).value
             for i in range(20)]
    if not (np.nanmean(finite) > np.nanmean(clean) + 0.3):
        raise AssertionError("Ozone interference not visible")

    dpd = ChlorineSensor(name="cl_dpd", zone_index=0,
                         sensor_type=ChlorineSensorType.DPD_COLORIMETRIC,
                         seed=103)
    dpd.calibrate(2.0, 0.0)
    r = dpd.read(_MockReactorState(), 61.0)
    if not (np.isfinite(r.value) and 0.0 <= r.value <= 10.0):
        raise AssertionError("DPD reading invalid")
    print("Chlorine sensor validation passed")


def validate_flow_sensor():
    """Flow sensor validation (reference flow_sensor.py:222-235)."""
    sensor = FlowSensor(name="flow_test",
                        sensor_type=FlowSensorType.MAGNETIC, seed=104)
    reading = sensor.read_flow(50.0, 11.0)
    if not (0.0 <= reading.value <= 100.0):
        raise AssertionError(f"Reading out of range: {reading.value}")
    sensor2 = FlowSensor(name="flow_zero",
                         sensor_type=FlowSensorType.MAGNETIC, seed=105)
    reading_zero = sensor2.read_flow(0.0, 11.0)
    if reading_zero.value != 0.0:
        raise AssertionError("Should read zero at zero flow")
    print("Flow sensor validation passed")


def validate_temperature_sensor():
    """Temperature sensor validation (reference temperature_sensor.py:197-214)."""
    sensor = TemperatureSensor(name="temp_test", zone_index=0,
                               sensor_type=TemperatureSensorType.RTD_PT100,
                               seed=106)
    state = _MockReactorState()
    reading = sensor.read(state, 31.0)
    # RTD lead-resistance error biases ~+2.6 C (same as the reference model)
    if not (15.0 < reading.value < 26.0):
        raise AssertionError(f"Reading out of expected range: {reading.value}")
    print("Temperature sensor validation passed")


def run_all_sensor_validations():
    from ics_wt_physicsengine_tpu.sensors.ammonia import (
        validate_ammonia_sensor)

    from ics_wt_physicsengine_tpu.sensors.oxygen import (
        validate_oxygen_sensor)
    from ics_wt_physicsengine_tpu.sensors.turbidity import (
        validate_turbidity_sensor)

    validate_pH_sensor()
    validate_chlorine_sensor()
    validate_flow_sensor()
    validate_temperature_sensor()
    if not validate_ammonia_sensor():
        raise RuntimeError("ammonia sensor validation failed")
    if not validate_oxygen_sensor():
        raise RuntimeError("oxygen sensor validation failed")
    if not validate_turbidity_sensor():
        raise RuntimeError("turbidity sensor validation failed")
    print("ALL SENSOR VALIDATIONS PASSED")


if __name__ == "__main__":
    import os

    import jax

    # Host-side oracle checks: CPU backend (same policy as core/__main__).
    jax.config.update("jax_platforms",
                      os.environ.get("WT_VALIDATE_BACKEND", "cpu"))
    run_all_sensor_validations()
