"""Sensor suite tests, following the reference's validation strategy
(mock duck-typed states + statistical envelopes, e.g. ph_sensor.py:491-552)
plus functional-core determinism and fault-injection checks."""

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.sensors import (
    ChlorineSensor,
    ChlorineSensorType,
    FlowSensor,
    FlowSensorType,
    InstallationQuality,
    SampleLine,
    SensorFault,
    SensorStatus,
    TemperatureSensor,
    create_realistic_sensor_suite,
    pHSensor,
)


class MockState:
    """Duck-typed state fixture (the reference's MockReactorState pattern)."""

    def __init__(self, n=5):
        self.pH = np.linspace(7.0, 7.4, n)
        self.chlorine = np.linspace(2.0, 1.6, n)
        self.temperature = np.full(n, 20.0)
        self.flow_rate = 5.0


def _read_series(sensor, state, t0, n, dt=1.0):
    return np.array([sensor.read(state, t0 + (i + 1) * dt).value
                     for i in range(n)])


def test_ph_sensor_statistics():
    s = pHSensor("pH_test", zone_index=0,
                 sample_line=SampleLine(100, 500, 20.0), seed=1)
    s.calibrate(7.0, 0.0)
    vals = _read_series(s, MockState(), 1800.0, 80)
    finite = vals[np.isfinite(vals)]
    # reference envelope: mean near 7, small scatter (ph_sensor.py:523-530)
    assert 6.8 < np.mean(finite) < 7.2
    assert np.std(finite) < 0.2


def test_warmup_yields_nan():
    s = pHSensor("pH", zone_index=0, seed=2)
    s.calibrate(7.0, 0.0)
    r = s.read(MockState(), 100.0)          # within the 1800 s warm-up
    assert np.isnan(r.value)
    assert r.status == SensorStatus.WARMING_UP
    r2 = s.read(MockState(), 2000.0)
    assert np.isfinite(r2.value)


def test_zone_index_bounds():
    s = pHSensor("pH", zone_index=7, seed=3)
    with pytest.raises(IndexError):
        s.read(MockState(n=5), 1.0)
    s_neg = pHSensor("pH", zone_index=-1, seed=3)
    s_neg.calibrate(7.4, 0.0)
    r = s_neg.read(MockState(), 2000.0)
    assert np.isfinite(r.value)


def test_monotonic_time_enforced():
    s = TemperatureSensor("t", seed=4)
    s.read(MockState(), 100.0)
    with pytest.raises(ValueError):
        s.read(MockState(), 50.0)


def test_sample_line_delay():
    """With a 30 s line delay, a step change in the true value appears in
    raw_value only after the transport delay (base_sensor.py:148-216)."""
    line = SampleLine(volume_mL=250, flow_rate_mL_min=500)  # 30 s delay
    assert line.transport_delay_s == pytest.approx(30.0)
    s = TemperatureSensor("t", zone_index=0, sample_line=line, seed=5)
    s.calibrate(20.0, 0.0)
    state = MockState()
    for i in range(40):                      # fill the line with 20 C
        s.read(state, 31.0 + i)
    state.temperature = np.full(5, 30.0)     # step change at t=71
    r_now = s.read(state, 71.0)
    assert r_now.raw_value == pytest.approx(20.0)   # still the old sample
    for i in range(29):
        r = s.read(state, 72.0 + i)
    r_after = s.read(state, 101.5)           # > delay past the step
    assert r_after.raw_value == pytest.approx(30.0)


def test_air_bubble_faults_flow_reads_zero():
    # Two independent bubble draws, matching the reference: the base pipeline
    # NaNs on bubbles (base_sensor.py:489-492) and, when it doesn't fire, the
    # flow overlay's own draw forces a zero reading (flow_sensor.py:150-155).
    inst = InstallationQuality(air_bubble_frequency=30.0)  # p=0.5 per draw
    s = FlowSensor("f", full_scale=10.0, installation=inst, seed=6)
    s.calibrate(5.0, 0.0)
    vals = _read_series(s, MockState(), 11.0, 80)
    nan_idx = np.flatnonzero(np.isnan(vals))
    assert len(nan_idx) > 0
    # a base-pipeline bubble NaN latches through the first-order lag — the
    # reference behaves identically (current_value=NaN at :636-638 feeds the
    # next read's lag at :626-630)
    assert np.all(np.isnan(vals[nan_idx[0]:]))
    # overlay zero-dropouts occur while the sensor is still alive
    assert np.sum(vals[:nan_idx[0]] == 0.0) >= 1 or nan_idx[0] < 4


def test_air_bubble_nans_other_sensors():
    inst = InstallationQuality(air_bubble_frequency=60.0)
    s = TemperatureSensor("t", installation=inst, seed=7)
    s.calibrate(20.0, 0.0)
    vals = _read_series(s, MockState(), 31.0, 50)
    assert np.sum(np.isnan(vals)) > 25      # base pipeline NaN (:489-492)


def test_calibration_offset_applied():
    s = FlowSensor("f", full_scale=10.0, seed=8)
    # current_value starts at 0; calibrating at 5.0 applies +5 offset
    # (reference base_sensor.py:727-734 — faithful, bias included)
    rec = s.calibrate(5.0, 0.0)
    assert rec.offset == pytest.approx(5.0)
    vals = _read_series(s, MockState(), 11.0, 40)
    assert np.nanmean(vals) > 7.0           # 5 true + 5 offset, lagged


def test_drift_accumulates():
    s = pHSensor("pH", zone_index=0, drift_rate=0.1, seed=9)  # 0.1 pH/h
    s.calibrate(7.0, 0.0)
    r1 = s.read(MockState(), 1900.0)
    r2 = s.read(MockState(), 1900.0 + 3600.0)
    assert r2.drift - r1.drift == pytest.approx(0.1, abs=0.01)


def test_open_short_fault_latches():
    """A random open/short fault NaNs the sensor until recalibration — the
    NaN propagates through the first-order lag (reference behavior:
    base_sensor.py:655-657 + :626-630)."""
    s = TemperatureSensor("t", seed=10)
    s.calibrate(20.0, 0.0)
    import jax.numpy as jnp
    from dataclasses import replace
    # force the fault path by injecting NaN into the carry
    s.carry = replace(s.carry, base=replace(
        s.carry.base, current_value=jnp.asarray(np.nan, s.carry.base.current_value.dtype)))
    r = s.read(MockState(), 100.0)
    assert np.isnan(r.value)
    # calibrate() cannot recover a latched sensor (offset = ref - NaN = NaN,
    # same as the reference base_sensor.py:727-734); reset() can.
    s.calibrate(20.0, 200.0)
    r2 = s.read(MockState(), 200.0 + 31.0)
    assert np.isnan(r2.value)
    s.reset(seed=10)
    s.calibrate(20.0, 300.0)
    r3 = s.read(MockState(), 300.0 + 31.0)
    assert np.isfinite(r3.value)


def test_chlorine_interference():
    """Amperometric sensors over-read in the presence of ozone; DPD does not
    (chlorine_sensor.py:157-168,229-278)."""
    state = MockState()
    state.ozone = np.full(5, 1.0)

    amp = ChlorineSensor("a", sensor_type=ChlorineSensorType.AMPEROMETRIC,
                         seed=11)
    amp.calibrate(0.0, 0.0)
    amp_with = np.nanmean(_read_series(amp, state, 301.0, 40))

    amp2 = ChlorineSensor("a2", sensor_type=ChlorineSensorType.AMPEROMETRIC,
                          seed=11)
    amp2.calibrate(0.0, 0.0)
    amp_without = np.nanmean(_read_series(amp2, MockState(), 301.0, 40))

    assert amp_with > amp_without + 0.8     # ~1.2 mg/L apparent from ozone

    dpd = ChlorineSensor("d", sensor_type=ChlorineSensorType.DPD_COLORIMETRIC,
                         seed=12)
    dpd.calibrate(0.0, 0.0)
    state2 = MockState()
    state2.ozone = np.full(5, 1.0)
    dpd_with = np.nanmean(_read_series(dpd, state2, 61.0, 40))
    assert dpd_with < amp_with - 0.5        # DPD is selective


def test_dpd_reagent_replacement():
    d = ChlorineSensor("d", sensor_type=ChlorineSensorType.DPD_COLORIMETRIC,
                       seed=13)
    from dataclasses import replace
    import jax.numpy as jnp
    d.carry = replace(d.carry,
                      reagent_potency=jnp.asarray(0.5, d.carry.reagent_potency.dtype))
    assert d.reagent_potency == pytest.approx(0.5)
    d.replace_reagent(1000.0)
    assert d.reagent_potency == pytest.approx(1.0)
    with pytest.raises(ValueError):
        d.replace_membrane()


def test_ph_cleaning_and_slope_health():
    s = pHSensor("pH", zone_index=0, seed=14)
    from dataclasses import replace
    import jax.numpy as jnp
    s.carry = replace(s.carry, membrane_fouling=jnp.asarray(
        0.8, s.carry.membrane_fouling.dtype))
    s.clean_electrode("water_rinse", 100.0)
    assert s.membrane_fouling == pytest.approx(0.4)
    s.clean_electrode("acid_clean", 200.0)
    assert s.membrane_fouling == pytest.approx(0.04)
    health = s.check_slope_health()
    assert health["health"] in ("excellent", "good", "fair", "poor")
    with pytest.raises(ValueError):
        s.clean_electrode("sandblast")


def test_two_point_calibration():
    s = pHSensor("pH", zone_index=0, seed=15)
    s.calibrate_two_point(4.0, 7.0, 4.05, 7.02, 100.0)
    assert 90 < s.slope_percentage < 110


def test_statistics_and_reset():
    s = TemperatureSensor("t", seed=16)
    s.calibrate(20.0, 0.0)
    _read_series(s, MockState(), 31.0, 30)
    stats = s.get_statistics(window_seconds=60.0)
    assert stats["count"] == 30
    assert np.isfinite(stats["mean"])
    s.reset(seed=17)
    assert len(s.reading_history) == 0
    assert s.status == SensorStatus.NORMAL


def test_suite_factory():
    from ics_wt_physicsengine_tpu.core import ReactorConfiguration

    suite = create_realistic_sensor_suite(ReactorConfiguration(), seed=99)
    assert set(suite) == {"pH_inlet", "pH_outlet", "chlorine_inlet",
                          "chlorine_outlet", "flow_main", "temp_inlet",
                          "temp_outlet"}
    assert suite["flow_main"].full_scale == pytest.approx(10.0)
    assert suite["chlorine_inlet"].sensor_type == \
        ChlorineSensorType.AMPEROMETRIC
    assert suite["chlorine_outlet"].sensor_type == \
        ChlorineSensorType.DPD_COLORIMETRIC
    # each sensor owns its own delay ring (aliasing fix, sensors/__init__.py)
    ph_carry = suite["pH_inlet"].carry.base
    tp_carry = suite["temp_inlet"].carry.base
    assert ph_carry.line_values is not tp_carry.line_values

    # end-to-end: all 7 read from a live reactor state
    state = MockState()
    t0 = 2000.0
    for name, sensor in suite.items():
        sensor.calibrate(20.0 if "temp" in name else 7.0 if "pH" in name
                         else 2.0 if "chlorine" in name else 5.0, 0.0)
    readings = {name: sensor.read(state, t0) for name, sensor in
                suite.items()}
    assert set(readings) == set(suite)


def test_reproducible_with_seed():
    a = pHSensor("pH", zone_index=0, seed=42)
    b = pHSensor("pH", zone_index=0, seed=42)
    a.calibrate(7.0, 0.0)
    b.calibrate(7.0, 0.0)
    va = _read_series(a, MockState(), 1800.0, 20)
    vb = _read_series(b, MockState(), 1800.0, 20)
    np.testing.assert_array_equal(va, vb)


def test_recent_readings_and_drift_rate():
    s = pHSensor("pH", zone_index=0, drift_rate=0.2, seed=20)  # 0.2 pH/h
    s.calibrate(7.0, 0.0)
    for i in range(30):
        s.read(MockState(), 1801.0 + i * 60.0)   # one read per minute
    recent = s.get_recent_readings(window_seconds=600.0)
    assert len(recent) == 11                      # inclusive window
    assert recent[0].timestamp > recent[-1].timestamp
    rate = s.calculate_drift_rate(window_seconds=1740.0)
    assert rate == pytest.approx(0.2, rel=0.05)   # recovers the drift rate


def test_misc_api_parity():
    """Small API-parity surfaces: repr, CalibrationRecord.is_expired,
    InstallationQuality.validate, constructor validation."""
    from ics_wt_physicsengine_tpu.sensors import CalibrationRecord

    s = TemperatureSensor("t_repr", seed=30)
    assert "t_repr" in repr(s) and "status" in repr(s)

    rec = CalibrationRecord(timestamp=0.0, reference_value=7.0,
                            measured_value=6.9, offset=0.1,
                            validity_hours=24.0)
    assert not rec.is_expired(23.9 * 3600)
    assert rec.is_expired(24.1 * 3600)

    with pytest.raises(ValueError):
        InstallationQuality(flow_velocity=99.0).validate()
    with pytest.raises(ValueError):
        InstallationQuality(grounding_quality=2.0).validate()
    with pytest.raises(ValueError):
        pHSensor("", zone_index=0)

    from ics_wt_physicsengine_tpu.sensors import SensorReading
    with pytest.raises(ValueError):
        SensorReading(timestamp=-1.0, value=7.0, raw_value=7.0,
                      noise=0.0, drift=0.0)
    with pytest.raises(TypeError):
        SensorReading(timestamp="now", value=7.0, raw_value=7.0,
                      noise=0.0, drift=0.0)


def test_aging_dynamics_over_days():
    """Degradation states evolve at the reference's rates over simulated
    days: pH membrane fouling (ph_sensor.py:182-214), DPD reagent decay
    (chlorine_sensor.py:280-317), turbine bearing wear (flow_sensor.py:135-141)."""
    state = MockState()

    ph = pHSensor("pH", zone_index=0, seed=40)
    ph.calibrate(7.0, 0.0)
    dt, n = 600.0, 288                      # 2 simulated days
    for i in range(n):
        ph.read(state, 1801.0 + i * dt)
    # base fouling rate 0.001/day (+ hardness scaling 100*1e-5 = 0.001/day)
    assert 0.5 * 0.004 < ph.membrane_fouling < 2 * 0.004

    from ics_wt_physicsengine_tpu.sensors import ChlorineSensorType
    dpd = ChlorineSensor("dpd", zone_index=0,
                         sensor_type=ChlorineSensorType.DPD_COLORIMETRIC,
                         seed=41)
    dpd.calibrate(2.0, 0.0)
    for i in range(n):
        dpd.read(state, 61.0 + i * dt)
    # ~1%/day at 20 C storage + photo factor -> ~2% after 2 days
    assert 0.95 < dpd.reagent_potency < 0.995

    from ics_wt_physicsengine_tpu.sensors import FlowSensorType
    vib = InstallationQuality(pipe_vibration_g=0.4)
    turb = FlowSensor("turb", sensor_type=FlowSensorType.TURBINE,
                      full_scale=10.0, installation=vib, seed=42)
    turb.calibrate(5.0, 0.0)
    for i in range(n):
        turb.read(state, 11.0 + i * dt)
    # wear accelerates 1 + 5*vibration = 3x -> ~6 wear-days in 2 days
    assert 4.0 < float(turb.carry.bearing_wear_days) < 8.0


def test_set_water_hardness_scales_fouling():
    s_soft = pHSensor("soft", zone_index=0, seed=43)
    s_soft.calibrate(7.0, 0.0)
    s_soft.set_water_hardness(0.0)
    s_hard = pHSensor("hard", zone_index=0, seed=43)
    s_hard.calibrate(7.0, 0.0)
    s_hard.set_water_hardness(1000.0)
    with pytest.raises(ValueError):
        s_hard.set_water_hardness(-1.0)
    state = MockState()
    for i in range(100):
        s_soft.read(state, 1801.0 + i * 600.0)
        s_hard.read(state, 1801.0 + i * 600.0)
    assert s_hard.membrane_fouling > s_soft.membrane_fouling * 2


def test_scripted_fault_injection():
    """inject_fault forces a latching power fault (NaN + POWER_FAULT across
    consecutive reads — the voltage walk freezes out of window, reference
    base_sensor.py:553-574); clear_faults repairs it. Batched carries work
    through the pure helpers (scripted scenario drives over ensembles)."""
    import math

    import jax.numpy as jnp

    from ics_wt_physicsengine_tpu.core import reactor as R
    from ics_wt_physicsengine_tpu.sensors import base as B
    from ics_wt_physicsengine_tpu.sensors import (
        create_realistic_sensor_suite)
    from ics_wt_physicsengine_tpu.sensors.types import (
        SensorFault, SensorStatus)

    config = R.ReactorConfiguration(n_zones=4)
    reactor = R.IntegratedCSTR(config)
    suite = create_realistic_sensor_suite(config, seed=3)
    ph = suite["pH_outlet"]
    ph.calibrate(7.0, current_time=0.0)
    state = reactor.step(1.0, R.BoundaryConditions())

    assert ph.read(state, current_time=2000.0).fault == SensorFault.NONE
    ph.inject_fault("power_low")
    for t in (2001.0, 2002.0):        # latches across reads
        r = ph.read(state, current_time=t)
        assert r.status == SensorStatus.POWER_FAULT
        assert r.fault == SensorFault.POWER_LOW
        assert math.isnan(r.value)
    ph.clear_faults()
    r = ph.read(state, current_time=2003.0)
    assert r.fault == SensorFault.NONE and not math.isnan(r.value)

    # power_high variant + invalid kind
    ph.inject_fault("power_high")
    assert ph.read(state,
                   current_time=2004.0).fault == SensorFault.POWER_HIGH
    ph.clear_faults()
    try:
        ph.inject_fault("nonsense")
        assert False, "expected ValueError"
    except ValueError:
        pass

    # pure helpers on a batched carry (ensemble scenario drive)
    from ics_wt_physicsengine_tpu.models.plant import make_plant_batch
    _, plant = make_plant_batch(config, 3, seed=5, dtype=jnp.float64)
    injected = B.inject_power_fault(plant.ph_inlet.base)
    assert injected.supply_voltage.shape == plant.ph_inlet.base.\
        supply_voltage.shape
    assert float(injected.supply_voltage[0]) < 20.0
    cleared = B.clear_power_fault(injected)
    assert float(cleared.supply_voltage[1]) == 24.0
