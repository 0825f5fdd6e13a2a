"""Programmatic API parity vs the reference package.

Enumerates every PUBLIC symbol the reference's modules export (classes,
functions, constants — skipping re-imports and stdlib/typing noise) and
asserts a same-named attribute exists in the corresponding module(s) here;
for classes defined in both, every public reference method must exist on
our class. This makes "a reference user finds everything they need"
checkable, not asserted — any future reference-API drift fails loudly.

Intentional differences are listed in ALLOW_MISSING with their reasons
(each is also documented in docs/MIGRATION.md). Skipped automatically when
the reference mount is absent.
"""

import importlib
import importlib.util
import inspect
import os

import pytest

REF_SRC = "/root/reference/src"
pytest.importorskip("wt_simulator.core",
                    reason="reference mount absent")

# reference module -> our modules that together must cover its API
PAIRS = [
    ("wt_simulator.core.thermodynamics",
     ["ics_wt_physicsengine_tpu.core.thermodynamics"]),
    ("wt_simulator.core.chemistry",
     ["ics_wt_physicsengine_tpu.core.chemistry"]),
    ("wt_simulator.core.transport",
     ["ics_wt_physicsengine_tpu.core.transport"]),
    ("wt_simulator.core.spatial",
     ["ics_wt_physicsengine_tpu.core.spatial"]),
    ("wt_simulator.core.reactor",
     ["ics_wt_physicsengine_tpu.core.reactor"]),
    ("wt_simulator.core",
     ["ics_wt_physicsengine_tpu.core"]),
    ("wt_simulator.sensors.base_sensor",
     ["ics_wt_physicsengine_tpu.sensors.wrappers",
      "ics_wt_physicsengine_tpu.sensors.types",
      "ics_wt_physicsengine_tpu.sensors.base"]),
    ("wt_simulator.sensors.ph_sensor",
     ["ics_wt_physicsengine_tpu.sensors.wrappers",
      "ics_wt_physicsengine_tpu.sensors"]),
    ("wt_simulator.sensors.chlorine_sensor",
     ["ics_wt_physicsengine_tpu.sensors.wrappers",
      "ics_wt_physicsengine_tpu.sensors"]),
    ("wt_simulator.sensors.flow_sensor",
     ["ics_wt_physicsengine_tpu.sensors.wrappers",
      "ics_wt_physicsengine_tpu.sensors"]),
    ("wt_simulator.sensors.temperature_sensor",
     ["ics_wt_physicsengine_tpu.sensors.wrappers",
      "ics_wt_physicsengine_tpu.sensors"]),
    ("wt_simulator.sensors",
     ["ics_wt_physicsengine_tpu.sensors"]),
    # modbus protocols/register_map are loaded standalone below (the
    # reference's modbus package __init__ imports pymodbus, not installed
    # here).
]

# name -> reason it is intentionally absent (documented differences)
ALLOW_MISSING = {
    # none currently — keep the reasons here if one ever becomes necessary
}

# Method names on reference classes that are deliberately not mirrored.
ALLOW_METHOD_MISSING = {
}


def _public_defined_names(ref, ref_name):
    """Public names that ref actually DEFINES (or plain constants) —
    re-imported classes/functions/modules and typing aliases are covered
    where they are defined, not at every import site."""
    out = []
    for n in dir(ref):
        if n.startswith("_"):
            continue
        obj = getattr(ref, n)
        if inspect.ismodule(obj):
            continue
        if inspect.isclass(obj) or inspect.isfunction(obj):
            if getattr(obj, "__module__", ref_name) != ref_name \
                    and not ref_name.endswith(("sensors", "core", "modbus")):
                continue        # re-import inside a leaf module
            if getattr(obj, "__module__", "").split(".")[0] in (
                    "typing", "abc", "enum", "collections", "numpy",
                    "scipy", "logging", "threading", "struct", "dataclasses"):
                continue
        if type(obj).__module__ in ("typing",) or n in ("np", "logger"):
            continue
        out.append(n)
    return out


@pytest.mark.parametrize("ref_name,our_names", PAIRS,
                         ids=[p[0] for p in PAIRS])
def test_module_symbols_covered(ref_name, our_names):
    ref = importlib.import_module(ref_name)
    ours = [importlib.import_module(m) for m in our_names]

    missing = [n for n in _public_defined_names(ref, ref_name)
               if not any(hasattr(o, n) for o in ours)
               and n not in ALLOW_MISSING]
    assert not missing, (f"{ref_name}: reference symbols with no "
                         f"counterpart in {our_names}: {missing}")


@pytest.mark.parametrize("ref_name,our_names", PAIRS,
                         ids=[p[0] for p in PAIRS])
def test_class_methods_covered(ref_name, our_names):
    ref = importlib.import_module(ref_name)
    ours = [importlib.import_module(m) for m in our_names]

    missing = []
    for n in _public_defined_names(ref, ref_name):
        obj = getattr(ref, n)
        if not (inspect.isclass(obj)
                and getattr(obj, "__module__", "").startswith("wt_simulator")):
            continue
        target = next((getattr(o, n) for o in ours if hasattr(o, n)), None)
        if target is None:
            continue                       # caught by the symbol test
        for m, _ in inspect.getmembers(obj, inspect.isfunction):
            if m.startswith("_"):
                continue
            if not hasattr(target, m) \
                    and f"{n}.{m}" not in ALLOW_METHOD_MISSING:
                missing.append(f"{n}.{m}")
    assert not missing, (f"{ref_name}: reference methods with no "
                         f"counterpart: {missing}")


def _load_standalone(fname):
    """Load a reference modbus module without triggering its package
    __init__ (which imports pymodbus, not installed here)."""
    path = os.path.join(REF_SRC, "wt_simulator", "modbus", fname)
    if not os.path.exists(path):
        pytest.skip(f"reference {fname} absent")
    name = f"_ref_{fname[:-3]}"
    spec = importlib.util.spec_from_file_location(name, path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    return ref, name


def test_protocols_parity_standalone():
    ref, name = _load_standalone("protocols.py")
    ours = importlib.import_module(
        "ics_wt_physicsengine_tpu.modbus.protocols")
    missing = [n for n in _public_defined_names(ref, name)
               if not hasattr(ours, n) and n not in ALLOW_MISSING]
    assert not missing, missing


def test_register_map_parity_standalone():
    ref, name = _load_standalone("register_map.py")
    ours = importlib.import_module(
        "ics_wt_physicsengine_tpu.modbus.register_map")
    missing = [n for n in _public_defined_names(ref, name)
               if not hasattr(ours, n) and n not in ALLOW_MISSING]
    assert not missing, missing

    # And the address space itself must be identical, register for register.
    ref_map, our_map = ref.ModbusRegisterMap(), ours.ModbusRegisterMap()
    for kind in ("input_registers", "holding_registers", "coils",
                 "discrete_inputs"):
        ref_regs = {r.name: (r.address, r.size_words)
                    for r in getattr(ref_map, kind)}
        our_regs = {r.name: (r.address, r.size_words)
                    for r in getattr(our_map, kind)}
        assert ref_regs == our_regs, kind


def test_reference_ode_entry_point():
    """IntegratedCSTR.derivatives(t, y, boundary) — the reference's ODE
    entry point for external integrators — matches the reference on the
    packed state vector."""
    import numpy as np
    from wt_simulator.core.reactor import (
        BoundaryConditions as RefBC, IntegratedCSTR as RefCSTR,
        ReactorConfiguration as RefCfg)

    from ics_wt_physicsengine_tpu.core.reactor import (
        BoundaryConditions, IntegratedCSTR, ReactorConfiguration)

    cfg = dict(volume=1000.0, n_zones=4, flow_rate=5.0, initial_pH=7.2,
               initial_chlorine=2.0, temperature=20.0)
    bcv = dict(inlet_flow_rate=5.0, inlet_pH=7.4, inlet_chlorine=0.5,
               inlet_temperature=22.0, acid_flow_rate=0.2)
    ref = RefCSTR(RefCfg(**cfg))
    ours = IntegratedCSTR(ReactorConfiguration(**cfg), dtype="float64")

    y = np.concatenate([np.linspace(7.0, 7.3, 4),
                        np.linspace(2.0, 1.5, 4),
                        np.linspace(20.0, 21.0, 4)])
    dy_ref = np.asarray(ref.derivatives(0.0, y, RefBC(**bcv)))
    dy_our = np.asarray(ours.derivatives(0.0, y, BoundaryConditions(**bcv)))
    np.testing.assert_allclose(dy_our, dy_ref, rtol=1e-9, atol=1e-12)


def test_update_derived_method():
    import numpy as np

    from ics_wt_physicsengine_tpu.core.reactor import (
        ReactorConfiguration, make_initial_state)
    import jax.numpy as jnp

    state = make_initial_state(ReactorConfiguration(n_zones=3),
                               dtype=jnp.float64)
    state2 = state.update_derived()
    np.testing.assert_allclose(np.asarray(state2.H_concentration),
                               10.0 ** (-np.asarray(state.pH)))
