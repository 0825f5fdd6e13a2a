"""
Physics core: pure-functional multi-zone CSTR over dense zone arrays.

Layering (mirrors reference core/__init__.py:229-263 re-exports):
  thermodynamics -> chemistry / transport / spatial -> reactor

All compute paths are jittable pure functions; the exported classes are thin
API-parity shells over them (same names and signatures as the reference
``wt_simulator.core``).
"""

from ics_wt_physicsengine_tpu.core.thermodynamics import (  # noqa: F401
    ArrheniusParameters,
    TemperatureDependentKinetics,
    validate_thermodynamics,
)
from ics_wt_physicsengine_tpu.core.chemistry import (  # noqa: F401
    AqueousChemistry,
    BufferSystem,
    ChemistryConstants,
    make_chemistry_constants,
    solve_pH,
    validate_chemistry,
)
from ics_wt_physicsengine_tpu.core.transport import (  # noqa: F401
    FlowParameters,
    GeometryParameters,
    TransportModel,
    apply_exchange,
    exchange_matrix,
    validate_transport,
)
from ics_wt_physicsengine_tpu.core.spatial import (  # noqa: F401
    SpatialModel,
    StratificationParameters,
    validate_spatial,
)
from ics_wt_physicsengine_tpu.core.reactor import (  # noqa: F401
    BoundaryConditions,
    IntegratedCSTR,
    ReactorConfiguration,
    ReactorParams,
    ReactorState,
    conservation_metrics,
    default_substeps,
    derivatives,
    make_initial_state,
    make_params,
    rollout,
    rollout_scheduled,
    stack_boundary_schedule,
    step,
    validate_integrated_reactor,
)
from ics_wt_physicsengine_tpu.core.network import (  # noqa: F401
    NetworkState,
    NetworkTopology,
    make_network,
    network_step,
    rollout_network,
    rollout_network_scheduled,
    topology_arrays,
)
from ics_wt_physicsengine_tpu.core.nitrogen import (  # noqa: F401
    NitrogenParams,
    make_nitrogen_params,
    total_nitrogen_mgN,
    validate_nitrogen,
)
from ics_wt_physicsengine_tpu.core.gas import (  # noqa: F401
    GasParams,
    co2_henry_constant,
    make_gas_params,
    oxygen_saturation,
    validate_gas,
)
from ics_wt_physicsengine_tpu.core.particles import (  # noqa: F401
    ParticleParams,
    make_particle_params,
    stokes_velocity,
    total_solids_mgl,
    turbidity_ntu,
    turbidity_ntu_tap,
    validate_particles,
)
from ics_wt_physicsengine_tpu.core.disinfection import (  # noqa: F401
    DisinfectionParams,
    PATHOGEN_NAMES,
    absorbance_254,
    log_inactivation,
    make_disinfection_params,
    uvt_percent,
    validate_disinfection,
)
from ics_wt_physicsengine_tpu.core.biofilm import (  # noqa: F401
    BiofilmParams,
    hpc_cfu_per_ml,
    make_biofilm_params,
    total_biomass_carbon,
    validate_biofilm,
)
from ics_wt_physicsengine_tpu.core.phase import (  # noqa: F401
    PhaseParams,
    enthalpy,
    evaporation_flux,
    ice_fraction,
    make_phase_params,
    saturation_vapor_pressure,
    validate_phase,
)


def run_all_validations() -> None:
    """Run the validation suites (reference core/__init__.py:266-294, plus
    the nitrogen-chemistry and gas-exchange extensions' suites)."""
    print("Running all physics validations...")
    validate_thermodynamics()
    validate_chemistry()
    validate_transport()
    validate_spatial()
    validate_integrated_reactor()
    if not validate_nitrogen():
        raise RuntimeError("nitrogen chemistry validation failed")
    if not validate_gas():
        raise RuntimeError("gas exchange validation failed")
    if not validate_particles():
        raise RuntimeError("particle dynamics validation failed")
    if not validate_disinfection():
        raise RuntimeError("disinfection validation failed")
    if not validate_biofilm():
        raise RuntimeError("biofilm validation failed")
    if not validate_phase():
        raise RuntimeError("phase-change validation failed")
    print("ALL PHYSICS VALIDATIONS PASSED")


if __name__ == "__main__":
    run_all_validations()
