"""
Sensors package: the instrument suite as PRNG-threaded scan-carried
transforms, with API-parity class wrappers.

Functional core (device path): ph.py / chlorine.py / flow.py /
temperature.py over base.py. Class wrappers (host path, reference API):
wrappers.py. Suite factory mirrors the reference's canonical 7-sensor plant
(reference sensors/__init__.py:41-120).
"""

from ics_wt_physicsengine_tpu.sensors.types import (  # noqa: F401
    CalibrationRecord,
    InstallationQuality,
    SampleLine,
    SensorFault,
    SensorReading,
    SensorStatus,
)
from ics_wt_physicsengine_tpu.sensors.base import (  # noqa: F401
    SensorCarry,
    SensorOutput,
    SensorParams,
    base_read,
    calibrate,
    make_sensor_carry,
    make_sensor_params,
)
from ics_wt_physicsengine_tpu.sensors.electrical import (  # noqa: F401
    ElectricalCarry,
    ElectricalParams,
    electrical_transform,
    make_electrical_carry,
    make_electrical_params,
)
from ics_wt_physicsengine_tpu.sensors.sampleline import (  # noqa: F401
    LineThermalConfig,
    PhysicalSampleLine,
    validate_sample_line,
)
from ics_wt_physicsengine_tpu.sensors.wrappers import (  # noqa: F401
    AmmoniaSensor,
    BaseSensor,
    ChlorineSensor,
    FlowSensor,
    OxygenSensor,
    TemperatureSensor,
    TurbiditySensor,
    pHSensor,
)
from ics_wt_physicsengine_tpu.sensors.ammonia import (  # noqa: F401
    validate_ammonia_sensor,
)
from ics_wt_physicsengine_tpu.sensors.oxygen import (  # noqa: F401
    validate_oxygen_sensor,
)
from ics_wt_physicsengine_tpu.sensors.turbidity import (  # noqa: F401
    validate_turbidity_sensor,
)
from ics_wt_physicsengine_tpu.sensors.validation import (  # noqa: F401
    run_all_sensor_validations,
    validate_chlorine_sensor,
    validate_flow_sensor,
    validate_pH_sensor,
    validate_temperature_sensor,
)
from ics_wt_physicsengine_tpu.sensors import chlorine as _chlorine
from ics_wt_physicsengine_tpu.sensors import flow as _flow
from ics_wt_physicsengine_tpu.sensors import temperature as _temperature


# Enum-style aliases matching the reference names
class ChlorineSensorType:
    AMPEROMETRIC = _chlorine.AMPEROMETRIC
    DPD_COLORIMETRIC = _chlorine.DPD


class ChlorineMeasurementType:
    FREE_CHLORINE = "free"
    TOTAL_CHLORINE = "total"


class FlowSensorType:
    TURBINE = _flow.TURBINE
    MAGNETIC = _flow.MAGNETIC


class TemperatureSensorType:
    RTD_PT100 = _temperature.RTD_PT100
    RTD_PT1000 = _temperature.RTD_PT1000
    THERMOCOUPLE_K = _temperature.THERMOCOUPLE_K
    THERMOCOUPLE_J = _temperature.THERMOCOUPLE_J


class OxygenSensorType:
    OPTICAL = "optical"
    CLARK = "clark"


def _suite_installation() -> InstallationQuality:
    """The canonical good-installation profile every suite sensor shares
    (reference sensors/__init__.py:41-120)."""
    return InstallationQuality(
        flow_velocity=0.5, air_bubble_frequency=0.0, grounding_quality=0.9,
        pipe_vibration_g=0.1, ambient_temperature=30.0)


def _suite_seed(seed, i):
    """Per-sensor sub-seed derivation shared by the whole suite."""
    return None if seed is None else seed * 1000 + i


def _base_suite(reactor_config, seed: int | None = None):
    """The canonical 7-sensor plant (reference sensors/__init__.py:41-120).

    Deviation from the reference (deliberate, see sensors/base.py docstring):
    the reference shares one SampleLine *object* between pH_inlet and
    temp_inlet, interleaving pH and temperature samples in a single delay
    deque so each sensor can retrieve the other's values. Here the two
    sensors share the line *configuration* but own separate delay buffers.
    """
    good_installation = _suite_installation()

    inlet_sample_line = SampleLine(volume_mL=250, flow_rate_mL_min=500,
                                   ambient_temp=25.0)
    outlet_sample_line = SampleLine(volume_mL=250, flow_rate_mL_min=500,
                                    ambient_temp=25.0)

    def sub_seed(i):
        return _suite_seed(seed, i)

    return {
        "pH_inlet": pHSensor(
            name="pH_inlet", zone_index=0, sample_line=inlet_sample_line,
            installation=good_installation, seed=sub_seed(0)),
        "pH_outlet": pHSensor(
            name="pH_outlet", zone_index=-1, sample_line=outlet_sample_line,
            installation=good_installation, seed=sub_seed(1)),
        "chlorine_inlet": ChlorineSensor(
            name="chlorine_inlet", zone_index=0,
            sensor_type=ChlorineSensorType.AMPEROMETRIC,
            installation=good_installation, seed=sub_seed(2)),
        "chlorine_outlet": ChlorineSensor(
            name="chlorine_outlet", zone_index=-1,
            sensor_type=ChlorineSensorType.DPD_COLORIMETRIC,
            installation=good_installation, seed=sub_seed(3)),
        "flow_main": FlowSensor(
            name="flow_main", sensor_type=FlowSensorType.MAGNETIC,
            full_scale=reactor_config.flow_rate * 2.0,
            installation=good_installation, seed=sub_seed(4)),
        "temp_inlet": TemperatureSensor(
            name="temp_inlet", zone_index=0,
            sensor_type=TemperatureSensorType.RTD_PT100,
            sample_line=inlet_sample_line, installation=good_installation,
            seed=sub_seed(5)),
        "temp_outlet": TemperatureSensor(
            name="temp_outlet", zone_index=-1,
            sensor_type=TemperatureSensorType.RTD_PT100,
            sample_line=outlet_sample_line, installation=good_installation,
            seed=sub_seed(6)),
    }


def create_realistic_sensor_suite(reactor_config, seed: int | None = None):
    suite = _base_suite(reactor_config, seed)
    # nitrogen chemistry adds its instrument: an outlet ammonia ISE (the
    # canonical 7-sensor layout is untouched when the chemistry is off)
    if getattr(reactor_config, "enable_nitrogen", False):
        suite["ammonia_outlet"] = AmmoniaSensor(
            name="ammonia_outlet", zone_index=-1,
            installation=_suite_installation(),
            seed=_suite_seed(seed, 7))
    # gas exchange adds its instrument: an optical DO probe at the outlet
    if getattr(reactor_config, "enable_gas", False):
        suite["oxygen_outlet"] = OxygenSensor(
            name="oxygen_outlet", zone_index=-1,
            sensor_type=OxygenSensorType.OPTICAL,
            installation=_suite_installation(),
            seed=_suite_seed(seed, 8))
    # particle dynamics adds its instrument: an outlet nephelometer
    if getattr(reactor_config, "enable_particles", False):
        suite["turbidity_outlet"] = TurbiditySensor(
            name="turbidity_outlet", zone_index=-1,
            installation=_suite_installation(),
            seed=_suite_seed(seed, 9))
    return suite
