"""
Integrated multi-zone CSTR — the physics engine, as a pure JAX state transition.

TPU-first architecture (vs reference core/reactor.py:189-645):

- State is a pytree of dense ``[..., n_zones]`` arrays; batched plant axes
  broadcast on the left, so the same ``derivatives`` serves one plant and a
  Monte-Carlo batch of 4096 without vmap overhead.
- All per-zone Python loops of the reference (reactor.py:349-443) collapse to
  elementwise VPU ops; the tridiagonal exchange matmul becomes an O(n)
  shift/add stencil (``transport.apply_exchange``).
- scipy's adaptive Radau (reactor.py:476-484) is replaced by fixed-substep RK4
  chosen from the known spectral radius at trace time
  (``ops.integrators.stable_substeps``) — regression-checked against Radau
  trajectories in tests/test_vs_reference.py.
- ``step`` advances one dt; ``rollout`` scans ``step`` over many dt inside a
  single jit — this is where the >=10,000x real-time factor comes from.

ODE system reproduced from the reference (reactor.py:272-448):
  pH:  dosing + inlet + mixing, each converted through the buffering-capacity
       chain rule dpH = -dH / (beta ln10)        (reactor.py:339-376)
  Cl:  dosing + inlet + mixing - k(T) f(pH) Cl   (reactor.py:378-411)
  T:   inlet + mixing - U A (T - T_amb)/(rho cp V)  (reactor.py:413-443)
with the stratification-modified exchange operator rebuilt each evaluation
(reactor.py:304-337).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import chemistry as chem
from ics_wt_physicsengine_tpu.core import constants as c
from ics_wt_physicsengine_tpu.core import spatial as spatial_mod
from ics_wt_physicsengine_tpu.core import thermodynamics as thermo
from ics_wt_physicsengine_tpu.core import biofilm as biofilm_mod
from ics_wt_physicsengine_tpu.core import disinfection as disinfection_mod
from ics_wt_physicsengine_tpu.core import gas as gas_mod
from ics_wt_physicsengine_tpu.core import particles as particles_mod
from ics_wt_physicsengine_tpu.core import nitrogen as nitrogen_mod
from ics_wt_physicsengine_tpu.core import phase as phase_mod
from ics_wt_physicsengine_tpu.core import transport as transport_mod
from ics_wt_physicsengine_tpu.core.chemistry import ChemistryConstants, LN10
from ics_wt_physicsengine_tpu.ops import integrators
from ics_wt_physicsengine_tpu.utils.dispatch import align_trailing, array_namespace

# ---------------------------------------------------------------------------
# Configuration (static, host-side — mirrors reference reactor.py:52-110)
# ---------------------------------------------------------------------------


@dataclass
class ReactorConfiguration:
    """Complete reactor configuration (field-for-field parity with
    reference reactor.py:52-110)."""

    # Geometry
    volume: float = 1000.0        # [L]
    height: float = 2.0           # [m]
    diameter: float = 0.798       # [m]
    n_zones: int = 5

    # Flow
    flow_rate: float = 5.0        # [L/min]
    turbulent_intensity: float = 0.15
    recirculation_ratio: float = 5.0
    impeller_speed: float = 60.0  # [rpm]
    impeller_diameter: float = 0.3  # [m]
    power_number: float = 5.0

    # Chemistry
    initial_pH: float = 7.0
    alkalinity: float = 100.0     # [mg/L as CaCO3]
    total_carbonate: float = 2.0  # [mmol/L]

    # Chlorination
    initial_chlorine: float = 2.0  # [mg/L]

    # Temperature
    temperature: float = 20.0     # [C]
    enable_thermal_stratification: bool = True

    # Inlet conditions
    inlet_pH: float = 7.5
    inlet_chlorine: float = 0.0   # [mg/L]
    inlet_temperature: float = 20.0  # [C]

    # Nitrogen / biological chemistry (core/nitrogen.py — the reference's
    # roadmap "Advanced chemistry (nitrification/denitrification)",
    # reference README.md:448; disabled by default for exact reference
    # parity: when off, the state carries no nitrogen species and every
    # code path is unchanged)
    enable_nitrogen: bool = False
    initial_ammonia: float = 0.0     # [mg N/L] total ammonia nitrogen
    initial_nitrite: float = 0.0     # [mg N/L]
    initial_nitrate: float = 0.0     # [mg N/L]
    initial_chloramine: float = 0.0  # [mg/L as Cl2] (combined chlorine)
    nitrogen_kinetics: Optional[dict] = None  # make_nitrogen_params overrides

    # Gas exchange (core/gas.py — closes the reference's "No gas exchange
    # (O2, CO2 dissolution)" limitation, reference README.md:521; disabled
    # by default for exact reference parity: when off, the state carries no
    # gas species and every code path is unchanged)
    enable_gas: bool = False
    initial_oxygen: Optional[float] = None   # [mg/L]; None = saturation(T)
    gas_params: Optional[dict] = None        # make_gas_params overrides

    # Particle dynamics (core/particles.py — closes the reference's "No
    # particle dynamics (settling, filtration)" limitation, reference
    # README.md:522; disabled by default for exact reference parity)
    enable_particles: bool = False
    initial_tss: float = 10.0                # [mg/L] total suspended solids
    particle_params: Optional[dict] = None   # make_particle_params overrides

    # Disinfection (core/disinfection.py — pathogen inactivation, CT credit,
    # UV dose, THM/DBP formation; delivers the reference's roadmap row
    # "Disinfection byproduct (DBP) formation", reference README.md:449;
    # disabled by default for exact reference parity)
    enable_disinfection: bool = False
    initial_pathogens: float = 0.0           # [org/L] every pathogen class
    initial_toc: float = 2.0                 # [mg/L] organic carbon
    initial_thm: float = 0.0                 # [ug/L] trihalomethanes
    disinfection_params: Optional[dict] = None  # make_disinfection_params kw

    # Biofilm / bacterial regrowth (core/biofilm.py — wall-attached biomass,
    # planktonic HPC and BDOC substrate; closes the biofilm half of the
    # reference's "No biological processes (bacteria, biofilms)" limitation,
    # reference core/README.md:98, README.md:304,521; disabled by default
    # for exact reference parity)
    enable_biofilm: bool = False
    initial_bacteria: float = 1e-4           # [mg C/L] (~5e2 CFU/mL HPC)
    initial_bdoc: float = 0.3                # [mg/L] biodegradable DOC
    initial_biofilm: float = 0.0             # [mg C/m2] wall film
    biofilm_params: Optional[dict] = None    # make_biofilm_params overrides

    # Phase change (core/phase.py — freezing/ice and the boiling cap via the
    # apparent-heat-capacity method, plus Dalton surface evaporation; closes
    # the reference's "Temperature limited to 0-100 C" and "Single-phase
    # only (no ice, no vapor)" limitations, reference README.md:523-524;
    # disabled by default for exact reference parity: when off, the [0,100]
    # clip and every code path are unchanged)
    enable_phase: bool = False
    phase_params: Optional[dict] = None      # make_phase_params overrides

    def validate(self) -> None:
        """Configuration consistency (reference reactor.py:91-110; the bare
        asserts there are replaced by explicit raises, per the project's own
        'no asserts in production' rule, reference README.md:468).

        Fields may be NumPy arrays (a Monte-Carlo batch of configurations,
        models/monte_carlo.py) — every check is elementwise over the batch.
        """
        import numpy as np

        def ok(cond) -> bool:
            return bool(np.all(cond))

        calculated_volume = math.pi * (np.asarray(self.diameter) / 2) ** 2 \
            * np.asarray(self.height) * 1000
        volume_error = np.abs(calculated_volume - self.volume) / np.asarray(
            self.volume)
        if not ok(volume_error <= 0.01):
            raise ValueError(
                f"Volume mismatch: specified {self.volume}L, calculated "
                f"{calculated_volume}L from geometry. "
                f"Max error: {float(np.max(volume_error)) * 100:.1f}%"
            )
        v = np.asarray(self.volume)
        if not ok((0 < v) & (v < 1e6)):
            raise ValueError("Volume out of range")
        q = np.asarray(self.flow_rate)
        if not ok((0 <= q) & (q < 1e5)):
            raise ValueError("Flow rate out of range (use 0 for batch mode)")
        ph = np.asarray(self.initial_pH)
        if not ok((0 <= ph) & (ph <= 14)):
            raise ValueError("pH out of range")
        cl = np.asarray(self.initial_chlorine)
        if not ok((0 <= cl) & (cl <= 10)):
            raise ValueError("Chlorine out of range")
        t = np.asarray(self.temperature)
        if getattr(self, "enable_phase", False):
            # phase change widens the admissible initial state: sub-zero
            # states are ice, the hot end is capped by the boil band
            if not ok((-60 <= t) & (t <= 100)):
                raise ValueError("Temperature out of phase-change range")
        elif not ok((0 <= t) & (t <= 40)):
            raise ValueError("Temperature out of typical range")


# ---------------------------------------------------------------------------
# Traced parameter / boundary / state pytrees
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ReactorParams:
    """Physical parameters as a pytree of traced scalars.

    Everything except the zone count is a leaf, so a Monte-Carlo batch is just
    this same structure with ``[n_plants]`` leaves (see models/monte_carlo.py):
    parameter uncertainty is data, not code.
    """

    n_zones: int = field(metadata=dict(static=True))

    # geometry
    volume_L: jnp.ndarray = None
    zone_volume_L: jnp.ndarray = None
    zone_height: jnp.ndarray = None
    heat_area_m2: jnp.ndarray = None       # lateral + two ends (reactor.py:429-431)

    # transport
    k_exchange: jnp.ndarray = None         # [1/s] interface exchange rate
    velocity_scale: jnp.ndarray = None     # [m/s] superficial velocity @ config flow

    # kinetics
    cl_k_ref: jnp.ndarray = None           # [1/s]
    cl_ea: jnp.ndarray = None              # [J/mol]

    # chemistry constants cached at config temperature (chemistry.py:116-132)
    chem: ChemistryConstants = None

    # stratification
    strat_enabled: jnp.ndarray = None      # 0.0 / 1.0
    ri_crit: jnp.ndarray = None
    supp_factor: jnp.ndarray = None

    # nitrogen / biological chemistry (None = disabled; trace-time static
    # via None-ness, so the disabled path compiles exactly as before)
    nitrogen: Optional[nitrogen_mod.NitrogenParams] = None

    # gas exchange (None = disabled; same trace-time static gating)
    gas: Optional[gas_mod.GasParams] = None

    # particle dynamics (None = disabled; same trace-time static gating)
    particles: Optional[particles_mod.ParticleParams] = None

    # disinfection (None = disabled; same trace-time static gating)
    disinfection: Optional[disinfection_mod.DisinfectionParams] = None

    # biofilm / regrowth (None = disabled; same trace-time static gating)
    biofilm: Optional[biofilm_mod.BiofilmParams] = None

    # phase change (None = disabled; same trace-time static gating — this
    # axis adds NO state: ice fraction is diagnostic in temperature)
    phase: Optional[phase_mod.PhaseParams] = None


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BoundaryConditions:
    """Physical boundary conditions / forcing (field parity with reference
    reactor.py:150-186). A pytree of scalars so controllers can feed traced
    values and Monte-Carlo batches can vmap it."""

    inlet_flow_rate: float = 5.0       # [L/min]
    inlet_pH: float = 7.5
    inlet_chlorine: float = 0.0        # [mg/L]
    inlet_temperature: float = 20.0    # [C]

    acid_flow_rate: float = 0.0        # [L/min]
    acid_concentration: float = 0.1    # [mol/L]

    chlorine_flow_rate: float = 0.0    # [L/min]
    chlorine_concentration: float = 50.0  # [mg/L]

    ambient_temperature: float = 20.0  # [C]
    heat_loss_coefficient: float = 0.0  # [W/K]

    inlet_ammonia: float = 0.0         # [mg N/L] (nitrogen chemistry only)

    # gas exchange only (core/gas.py): source-water dissolved O2 / total
    # carbonate, and the diffused-aeration actuator (volumetric O2 kLa the
    # air flow provides; CO2 rides the same bubbles scaled by the film
    # ratio — bubbling air strips CO2 and raises pH)
    inlet_oxygen: float = 9.0          # [mg/L]
    inlet_carbonate: float = 2.0       # [mmol/L]
    aeration_kla: float = 0.0          # [1/s]

    # particle dynamics only (core/particles.py): source-water solids and
    # the three treatment actuators (coagulant dosing shifts mass into
    # fast-settling classes; a recirculating filter strips solids at the
    # outlet zone; blowdown wastes the settled sludge inventory)
    inlet_tss: float = 10.0            # [mg/L]
    coagulant_dose: float = 0.0        # [mg/L]
    filter_flow_rate: float = 0.0      # [L/min]
    sludge_blowdown: float = 0.0       # [1/s]
    # Optional per-class source-water solids [..., C] [mg/L]. When set it
    # OVERRIDES inlet_tss x inlet_fractions — the connected-network path
    # (core/network.py) uses it to pipe an upstream plant's class-resolved
    # effluent into a downstream inlet (a clarifier's effluent is
    # fines-enriched; the downstream filter must see that, not the static
    # source-water split).
    inlet_tss_classes: Optional[jnp.ndarray] = None

    # disinfection only (core/disinfection.py): source-water pathogens and
    # organics; inlet CT / water-age / THM so a connected network
    # (core/network.py) can route a multi-barrier train's accumulated
    # credit and byproducts downstream; and the UV-bank actuator (lamp wall
    # fluence rate applied at the outlet zone).
    inlet_pathogens: float = 0.0       # [org/L] every class
    inlet_toc: float = 2.0             # [mg/L]
    inlet_ct: float = 0.0              # [mg min/L]
    inlet_age: float = 0.0             # [s]
    inlet_thm: float = 0.0             # [ug/L]
    uv_intensity: float = 0.0          # [mW/cm2] lamp wall fluence rate
    # Optional per-class source-water pathogens [..., P] [org/L]; OVERRIDES
    # inlet_pathogens (the network path routes class-resolved survivors).
    inlet_pathogen_classes: Optional[jnp.ndarray] = None

    # biofilm / regrowth only (core/biofilm.py): source-water planktonic
    # biomass and biodegradable organic carbon. The wall film itself has no
    # inlet term — it is attached. A connected network (core/network.py)
    # routes an upstream plant's bulk biomass/substrate downstream through
    # these (regrowth propagates down a treatment train; the film does not).
    inlet_bacteria: float = 0.0        # [mg C/L]
    inlet_bdoc: float = 0.3            # [mg/L]

    # phase change only (core/phase.py): the ambient moisture/wind state the
    # Dalton evaporation model needs. Inert unless ``enable_phase`` — the
    # core path never reads them.
    ambient_humidity: float = 0.5      # relative humidity in [0, 1]
    wind_speed: float = 0.0            # [m/s] over the free surface


@jax.tree_util.register_dataclass
@dataclass
class ReactorState:
    """Reactor state pytree (field parity with reference reactor.py:113-147).

    Primary variables are ``[..., n_zones]`` arrays; derived quantities are
    recomputed by ``step`` exactly like the reference's
    ``_update_derived_state`` (reactor.py:511-524).
    """

    time: jnp.ndarray
    pH: jnp.ndarray
    chlorine: jnp.ndarray
    temperature: jnp.ndarray
    flow_rate: jnp.ndarray

    H_concentration: jnp.ndarray = None
    density: jnp.ndarray = None
    chlorine_decay_rate: jnp.ndarray = None

    # nitrogen species (None unless enable_nitrogen; [..., n_zones] arrays)
    ammonia: jnp.ndarray = None      # total ammonia nitrogen [mg N/L]
    nitrite: jnp.ndarray = None      # [mg N/L]
    nitrate: jnp.ndarray = None      # [mg N/L]
    chloramine: jnp.ndarray = None   # monochloramine [mg/L as Cl2]

    # gas species (None unless enable_gas; [..., n_zones] arrays)
    oxygen: jnp.ndarray = None       # dissolved O2 [mg/L]
    carbonate: jnp.ndarray = None    # total carbonate C_T [mmol/L] (dynamic
    #                                  — CO2 exchange shifts it; pH follows
    #                                  at constant alkalinity)

    # particle classes (None unless enable_particles)
    tss: jnp.ndarray = None          # [..., n_classes, n_zones] [mg/L]
    sludge: jnp.ndarray = None       # [..., n_classes] settled inventory
    #                                  [mg/L of bottom-zone volume]

    # disinfection (None unless enable_disinfection)
    pathogens: jnp.ndarray = None    # [..., n_pathogens, n_zones] [org/L]
    ct: jnp.ndarray = None           # [..., n_zones] CT credit [mg min/L]
    age: jnp.ndarray = None          # [..., n_zones] water age [s]
    toc: jnp.ndarray = None          # [..., n_zones] organics [mg/L]
    thm: jnp.ndarray = None          # [..., n_zones] THMs [ug/L]

    # biofilm / regrowth (None unless enable_biofilm)
    bacteria: jnp.ndarray = None     # [..., n_zones] planktonic [mg C/L]
    bdoc: jnp.ndarray = None         # [..., n_zones] substrate [mg/L]
    biofilm: jnp.ndarray = None      # [..., n_zones] wall film [mg C/m2]

    def update_derived(self) -> "ReactorState":
        """Recompute derived quantities from the primary variables
        (reference ReactorState.update_derived, reactor.py:138-150).

        Arrays are immutable here, so this *returns* the updated state
        instead of mutating in place — the one signature difference from
        the reference, noted in docs/MIGRATION.md."""
        return _update_derived(self)


def make_params(config: ReactorConfiguration, dtype=jnp.float32) -> ReactorParams:
    """Derive the traced parameter pytree from a validated configuration."""
    config.validate()
    geometry = transport_mod.GeometryParameters(
        volume=config.volume, height=config.height,
        diameter=config.diameter, n_zones=config.n_zones,
    )
    flow = transport_mod.FlowParameters(
        flow_rate=config.flow_rate,
        turbulent_intensity=config.turbulent_intensity,
        recirculation_ratio=config.recirculation_ratio,
        impeller_speed=config.impeller_speed,
        impeller_diameter=config.impeller_diameter,
        power_number=config.power_number,
    )
    coeffs = transport_mod.transport_coefficients(
        geometry, flow, config.temperature)

    a_lateral = math.pi * config.diameter * config.height
    a_ends = 2 * math.pi * (config.diameter / 2) ** 2

    def arr(x):
        return np.asarray(x, dtype)

    nitrogen = None
    if getattr(config, "enable_nitrogen", False):
        nitrogen = nitrogen_mod.make_nitrogen_params(
            dtype=dtype, **(config.nitrogen_kinetics or {}))
    gas = None
    if getattr(config, "enable_gas", False):
        gas = gas_mod.make_gas_params(
            dtype=dtype, **(config.gas_params or {}))
    particles = None
    if getattr(config, "enable_particles", False):
        particles = particles_mod.make_particle_params(
            dtype=dtype, **(config.particle_params or {}))
    disinfection = None
    if getattr(config, "enable_disinfection", False):
        disinfection = disinfection_mod.make_disinfection_params(
            dtype=dtype, **(config.disinfection_params or {}))
    biofilm = None
    if getattr(config, "enable_biofilm", False):
        biofilm = biofilm_mod.make_biofilm_params(
            dtype=dtype, **(config.biofilm_params or {}))
    phase = None
    if getattr(config, "enable_phase", False):
        phase = phase_mod.make_phase_params(
            dtype=dtype, **(config.phase_params or {}))
    return ReactorParams(
        n_zones=config.n_zones,
        volume_L=arr(config.volume),
        zone_volume_L=arr(config.volume / config.n_zones),
        zone_height=arr(geometry.zone_height),
        heat_area_m2=arr(a_lateral + a_ends),
        k_exchange=arr(coeffs["k_exchange"]),
        velocity_scale=arr(coeffs["superficial_velocity"]),
        cl_k_ref=arr(c.CL_DECAY_K_REF),
        cl_ea=arr(c.CL_DECAY_EA),
        chem=chem.make_chemistry_constants(
            config.alkalinity, config.total_carbonate, config.temperature,
            dtype=dtype),
        strat_enabled=arr(1.0 if config.enable_thermal_stratification else 0.0),
        ri_crit=arr(0.25),
        supp_factor=arr(0.5),
        nitrogen=nitrogen,
        gas=gas,
        particles=particles,
        disinfection=disinfection,
        biofilm=biofilm,
        phase=phase,
    )


def make_initial_state(config: ReactorConfiguration,
                       dtype=jnp.float32) -> ReactorState:
    """Initial state from configuration (reference reactor.py:217-222).

    Built host-side in NumPy (cheap); becomes device arrays on first jit call.
    Array-valued config fields (a Monte-Carlo batch, models/monte_carlo.py)
    produce ``[B, n_zones]`` state leaves.
    """
    z = config.n_zones

    batch = np.shape(np.asarray(config.initial_pH))

    def full(v):
        v = np.asarray(v, dtype)
        v = np.broadcast_to(v[..., None], v.shape + (z,))
        # scalar config fields follow the batch set by initial_pH so every
        # state leaf carries the same [B, Z] rank
        return np.broadcast_to(v, batch + (z,)).copy()
    n_kw = {}
    if getattr(config, "enable_nitrogen", False):
        n_kw = dict(ammonia=full(config.initial_ammonia),
                    nitrite=full(config.initial_nitrite),
                    nitrate=full(config.initial_nitrate),
                    chloramine=full(config.initial_chloramine))
    if getattr(config, "enable_gas", False):
        o2_0 = config.initial_oxygen
        if o2_0 is None:
            o2_0 = gas_mod.oxygen_saturation(
                np.asarray(config.temperature, np.float64))
        n_kw.update(oxygen=full(o2_0),
                    carbonate=full(config.total_carbonate))
    if getattr(config, "enable_particles", False):
        pp = particles_mod.make_particle_params(
            dtype=np.float64, **(config.particle_params or {}))
        fr = np.asarray(pp.inlet_fractions, dtype)        # [C]
        tss0 = np.asarray(config.initial_tss, dtype)      # [...] or scalar
        # [..., C, Z]: batch x class x zone
        tss = np.broadcast_to(
            (tss0[..., None] * fr)[..., None],
            batch + (particles_mod.N_CLASSES, z)).copy()
        n_kw.update(tss=tss,
                    sludge=np.zeros(batch + (particles_mod.N_CLASSES,),
                                    dtype))
    if getattr(config, "enable_disinfection", False):
        n0 = np.asarray(config.initial_pathogens, dtype)
        n_kw.update(
            pathogens=np.broadcast_to(
                n0[..., None, None],
                batch + (disinfection_mod.N_PATHOGENS, z)).copy(),
            ct=full(0.0), age=full(0.0),
            toc=full(config.initial_toc), thm=full(config.initial_thm))
    if getattr(config, "enable_biofilm", False):
        n_kw.update(bacteria=full(config.initial_bacteria),
                    bdoc=full(config.initial_bdoc),
                    biofilm=full(config.initial_biofilm))
    state = ReactorState(
        time=np.zeros(batch, dtype) if batch else np.asarray(0.0, dtype),
        pH=full(config.initial_pH),
        chlorine=full(config.initial_chlorine),
        temperature=full(config.temperature),
        flow_rate=np.broadcast_to(
            np.asarray(config.flow_rate, dtype), batch).copy()
        if batch else np.asarray(config.flow_rate, dtype),
        **n_kw,
    )
    return _update_derived(state)


# ---------------------------------------------------------------------------
# The derivative evaluation (hot path; reference reactor.py:272-448)
# ---------------------------------------------------------------------------


def derivatives(params: ReactorParams, pH, Cl, T,
                boundary: BoundaryConditions,
                inlet_mask=None, outlet_mask=None, nitrogen=None,
                gas=None, particles=None, disinfection=None,
                biofilm=None):
    """d(pH, Cl, T)/dt for ``[..., Z]`` zone arrays. Fully vectorized —
    semantics match reference reactor.py:272-448 term by term.

    ``inlet_mask``/``outlet_mask`` (optional, ``[..., Z]`` one-hot floats)
    relocate the inlet/dosing source terms and the outlet sink away from the
    array ends. The default (None) places them at zones 0 and Z-1 — the
    canonical layout. The zone-sharded SPMD path (parallel/spatial.py) passes
    masks because each device sees only a halo-padded slice of the domain, so
    "zone 0" and "zone Z-1" are positions on specific shards, not array ends.
    """
    k = params.chem

    # Robustness clamp: evaluate every term at in-domain values (no-op for
    # in-bounds trajectories, so reference parity is unaffected). Without
    # this, an extreme forcing (e.g. massive acid dosing) can drive a raw
    # intermediate RK4 stage far out of domain, where 10**(-pH) overflows to
    # inf/NaN. The reference's adaptive Radau sidesteps this by shrinking
    # steps; a fixed-step SPMD integrator bounds the RHS instead, and the
    # end-of-step clip (reactor.py:526-541) lands on the same bound.
    pH = jnp.clip(pH, 0.0, 14.0)
    Cl = jnp.maximum(Cl, 0.0)
    pp_ph = phi = None
    if params.phase is not None:
        # Phase change widens the liquid-only clamp: sub-zero states are
        # ice (latent-buffered below), and the hot end is capped by the
        # boil band instead of the 100 C clip (core/phase.py).
        pp_ph = jax.tree_util.tree_map(lambda x: align_trailing(x, T),
                                       params.phase)
        T = jnp.clip(T, pp_ph.t_min, pp_ph.t_boil + pp_ph.delta_boil)
        phi = phase_mod.ice_fraction(T, pp_ph)
    else:
        T = jnp.clip(T, 0.0, 100.0)

    # Gas exchange makes total carbonate a per-zone STATE: the buffering
    # capacity and carbonate speciation below must see the dynamic C_T, so
    # the constant bundle is rebuilt with the state value (no-op while C_T
    # still equals the configured value — reference parity is bit-exact
    # until CO2 transfer actually moves it).
    if gas is not None:
        o2_s, ct_s = (jnp.maximum(x, 0.0) for x in gas)
        ct_mol = ct_s * 1e-3
        k = dataclasses.replace(k, C_T_mol=ct_mol)

    # Stratification-modified exchange operator (reactor.py:304-337):
    # density profile -> Richardson per interface -> suppression -> k_iface.
    # With phase change on, the Richardson path sees the ICE-WATER mixture
    # density (ice floats — icy zones stratify buoyantly), and the exchange
    # itself is throttled by the interface mobility (ice immobilizes;
    # both are interface-local, so the SPMD halo covers them).
    if phi is None:
        rho = spatial_mod.water_density(T)
    else:
        rho = phase_mod.effective_density(T, pp_ph)
    supp = spatial_mod.mixing_suppression(
        rho, params.zone_height, params.velocity_scale,
        critical_richardson=params.ri_crit,
        suppression_factor=params.supp_factor,
        enabled=params.strat_enabled > 0.5,
    )
    k_iface = params.k_exchange[..., None] * supp if jnp.ndim(params.k_exchange) \
        else params.k_exchange * supp
    if phi is not None:
        k_iface = k_iface * phase_mod.interface_mobility(phi)

    # Dilution rate from the *boundary* inlet flow (reactor.py:336,362).
    q_per_v = (boundary.inlet_flow_rate / 60.0) / params.volume_L

    if outlet_mask is None:
        mix = partial(transport_mod.apply_exchange, k_iface=k_iface,
                      q_per_v=q_per_v)
    else:
        def mix(x):  # outlet sink relocated onto the masked zone
            return transport_mod.apply_exchange(x, k_iface=k_iface,
                                                q_per_v=0.0) \
                - align_trailing(q_per_v, x) * x * outlet_mask

    # --- pH dynamics (reactor.py:339-376) ---
    H = 10.0 ** (-pH)
    beta = chem.buffering_capacity(pH, k)
    inv_beta_ln10 = 1.0 / (beta * LN10)

    dpH = -mix(H) * inv_beta_ln10  # mixing through the chain rule

    # zone-0 dosing + inlet terms
    dH_dosing = (boundary.acid_flow_rate / 60.0) * boundary.acid_concentration \
        / params.zone_volume_L
    H_inlet = 10.0 ** (-boundary.inlet_pH)
    dCl_dosing = (boundary.chlorine_flow_rate / 60.0) \
        * boundary.chlorine_concentration / params.zone_volume_L

    if inlet_mask is None:
        dH_inlet = q_per_v * (H_inlet - H[..., 0])
        dpH = dpH.at[..., 0].add(
            -(dH_dosing + dH_inlet) * inv_beta_ln10[..., 0])
    else:
        qv = align_trailing(q_per_v, H)
        dpH = dpH - align_trailing(dH_dosing, H) * inlet_mask \
            * inv_beta_ln10 - qv * (H_inlet - H) * inlet_mask * inv_beta_ln10

    # --- chlorine dynamics (reactor.py:378-411) ---
    dCl = mix(Cl)
    if inlet_mask is None:
        dCl = dCl.at[..., 0].add(
            dCl_dosing + q_per_v * (boundary.inlet_chlorine - Cl[..., 0]))
    else:
        dCl = dCl + align_trailing(dCl_dosing, Cl) * inlet_mask \
            + align_trailing(q_per_v, Cl) * (boundary.inlet_chlorine - Cl) \
            * inlet_mask

    k_base = thermo.arrhenius_rate(T, k_ref=params.cl_k_ref, e_a=params.cl_ea)
    ph_factor = chem.pH_dependent_chlorine_decay_factor(pH, k.Ka_HOCl)
    dCl = dCl - k_base * ph_factor * Cl

    # --- temperature dynamics (reactor.py:413-443) ---
    dT = mix(T)
    if inlet_mask is None:
        dT = dT.at[..., 0].add(
            q_per_v * (boundary.inlet_temperature - T[..., 0]))
    else:
        dT = dT + align_trailing(q_per_v, T) \
            * (boundary.inlet_temperature - T) * inlet_mask
    # Heat loss uses the TOTAL tank volume in the denominator, matching the
    # reference exactly (reactor.py:435-443).
    v_m3 = params.volume_L / 1000.0
    heat_rate = boundary.heat_loss_coefficient * params.heat_area_m2 \
        / (c.WATER_DENSITY_20C * c.WATER_CP * v_m3)
    loss = align_trailing(heat_rate, T) \
        * (T - align_trailing(boundary.ambient_temperature, T))
    if phi is not None:
        # --- phase change (core/phase.py; closes reference README.md:523-524
        #     "Temperature limited to 0-100 C" / "Single-phase only").
        #     Ice insulates the ambient loss; the free surface loses latent
        #     heat to Dalton evaporation (blocked by an ice lid); and the
        #     whole temperature tendency is divided by the apparent heat
        #     capacity, which carries the latent heat of the freeze/boil
        #     bands — temperatures PIN at the phase fronts instead of
        #     integrating through them. ---
        loss = loss * (1.0 - pp_ph.ice_insulation * phi)
        if outlet_mask is None:
            surf_ph = jnp.zeros_like(T).at[..., -1].set(1.0)
        else:
            surf_ph = outlet_mask
        q_evap = phase_mod.evaporative_cooling_flux(
            T, align_trailing(jnp.asarray(boundary.ambient_temperature), T),
            align_trailing(jnp.asarray(boundary.ambient_humidity), T),
            align_trailing(jnp.asarray(boundary.wind_speed), T), pp_ph)
        a_cross = params.volume_L / 1000.0 \
            / (params.zone_height * params.n_zones)          # [m^2]
        evap_rate = q_evap * align_trailing(
            a_cross / (c.WATER_DENSITY_20C * c.WATER_CP
                       * (params.zone_volume_L / 1000.0)), T)  # [K/s]
        sink = loss + evap_rate * (1.0 - phi) * surf_ph
        dT = (dT - sink) * (1.0 / phase_mod.heat_capacity_ratio(T, pp_ph))
    else:
        dT = dT - loss

    if nitrogen is None and gas is None and particles is None \
            and disinfection is None and biofilm is None:
        return dpH, dCl, dT

    # shared inlet/source helper for the extension species
    def species(x, inlet_conc, reaction):
        d = mix(x) + reaction
        if inlet_mask is None:
            return d.at[..., 0].add(q_per_v * (inlet_conc - x[..., 0]))
        return d + align_trailing(q_per_v, x) * (inlet_conc - x) \
            * inlet_mask

    # The two extension axes couple both ways: O2 limitation (gas) scales
    # the nitrification rates, and the nitrification rates (nitrogen) set
    # the O2 demand — so rates are computed first, equations second.
    gp = None
    if gas is not None:
        gp = jax.tree_util.tree_map(lambda x: align_trailing(x, T),
                                    params.gas)

    extra = ()
    r1 = r2 = None
    if nitrogen is not None:
        # --- nitrogen species dynamics (core/nitrogen.py; roadmap item,
        #     reference README.md:448). Chloramine FORMATION is deliberately
        #     absent here — its seconds-scale rate would set the global
        #     substep count; step() applies it as an exact analytic
        #     operator split. ---
        # per-plant kinetics leaves are [B] while zone arrays are [B, Z]:
        # right-pad for broadcasting (same pattern as k_exchange[..., None])
        np_ = jax.tree_util.tree_map(lambda x: align_trailing(x, T),
                                     params.nitrogen)
        nh, no2, no3, nhcl = (jnp.maximum(x, 0.0) for x in nitrogen)
        r1 = nitrogen_mod.nitrification_rate(nh, T, np_)      # [mg N/L/s]
        r2 = nitrogen_mod.nitratation_rate(no2, T, np_)
        r3 = nitrogen_mod.denitrification_rate(no3, T, np_)
        if gas is not None:
            # aerobic steps are Monod-limited in O2; denitrification is
            # O2-INHIBITED — anoxic zones emerge from the physics
            lim = gas_mod.o2_monod(o2_s, gp.K_o2_nitrif)
            r1 = r1 * lim
            r2 = r2 * lim
            r3 = r3 * gas_mod.o2_inhibition(o2_s, gp.K_o2_denit)
        r_cm_decay = (np_.k_cm_decay / nitrogen_mod.SECONDS_PER_DAY) * nhcl

        dNH = species(nh, boundary.inlet_ammonia, -r1)
        dNO2 = species(no2, 0.0, r1 - r2)
        dNO3 = species(no3, 0.0, r2 - r3)
        dNHCl = species(nhcl, 0.0, -r_cm_decay)

        # alkalinity coupling through the same buffering chain rule the acid
        # dosing uses: nitrification releases 2 H+/N, denitrification
        # consumes 1 H+/N (7.14 / 3.57 g CaCO3 per g N)
        dH_bio = (nitrogen_mod.H_PER_N_NITRIF * r1
                  + nitrogen_mod.H_PER_N_DENIT * r3) \
            / nitrogen_mod._N_MGL_PER_MOL                    # [mol/L/s]
        dpH = dpH - dH_bio * inv_beta_ln10
        extra += (dNH, dNO2, dNO3, dNHCl)

    if gas is not None:
        # --- gas exchange (core/gas.py; closes reference README.md:521
        #     "No gas exchange"). Two-film surface transfer acts on the TOP
        #     zone (Z-1 — the outlet zone, so the sharded path's
        #     outlet_mask doubles as the surface selector); diffused
        #     aeration (boundary.aeration_kla) acts volumetrically. ---
        if outlet_mask is None:
            surf = jnp.zeros_like(T).at[..., -1].set(1.0)
        else:
            surf = outlet_mask
        kla_surf = gas_mod.kla_temperature(
            gp.kl_surface / align_trailing(params.zone_height, T),
            T, gp.theta_kla) * surf
        if phi is not None:
            # an ice lid blocks the surface film (diffused aeration below
            # the ice keeps working — the bubbles don't care)
            kla_surf = kla_surf * (1.0 - phi)
        kla_o2 = kla_surf + align_trailing(
            jnp.asarray(boundary.aeration_kla), T)
        r_o2 = kla_o2 * (gas_mod.oxygen_saturation(T) - o2_s)  # [mg/L/s]
        demand = 0.0
        if r1 is not None:
            # nitrification oxygen demand: 3.43 + 1.14 g O2 / g N
            demand = gas_mod.O2_PER_N_AOB * r1 + gas_mod.O2_PER_N_NOB * r2
        dO2 = species(o2_s, boundary.inlet_oxygen, r_o2 - demand)

        # CO2 exchanges against the dissolved (alpha0) fraction of the
        # carbonate pool; the film coefficient scales by sqrt(D_CO2/D_O2)
        a0, _, _ = chem.alpha_carbonate(pH, k.Ka1, k.Ka2)
        r_co2_mol = (kla_o2 * gas_mod.CO2_FILM_RATIO) * (
            gas_mod.co2_saturation_mol(T, gp.p_co2_atm) - a0 * ct_mol)
        dCT = species(ct_s, boundary.inlet_carbonate, 1e3 * r_co2_mol)

        # equilibrium pH shift at constant alkalinity:
        # dpH/dC_T = -(a1 + 2 a2) / beta (k already carries the dynamic C_T)
        dpH = dpH + gas_mod.ph_per_carbonate(pH, k) * r_co2_mol
        extra += (dO2, dCT)

    if particles is not None:
        # --- particle dynamics (core/particles.py; closes reference
        #     README.md:522 "No particle dynamics"). The class axis sits
        #     ahead of the zone axis ([..., C, Z]); the exchange stencil
        #     vectorizes over it by inserting a class axis into the
        #     interface rates. Under inlet/outlet masks (the zone-sharded
        #     SPMD path) the bottom/top source terms relocate onto the
        #     owning shard, and the sludge tendency is GATED to the
        #     bottom-owning shard: the sludge leaf is replicated across
        #     zone shards, so the SPMD wrapper psums the gated tendency
        #     to recover the (bit-exact) global value. ---
        pp = params.particles
        tss, sludge = particles
        tss = jnp.maximum(tss, 0.0)
        sludge = jnp.maximum(sludge, 0.0)

        # inter-zone mixing + outlet advection, class-vectorized
        if outlet_mask is None:
            dTSS = transport_mod.apply_exchange(
                tss, k_iface=k_iface[..., None, :], q_per_v=q_per_v)
        else:
            dTSS = transport_mod.apply_exchange(
                tss, k_iface=k_iface[..., None, :], q_per_v=0.0) \
                - align_trailing(q_per_v, tss) * tss \
                * outlet_mask[..., None, :]
        # inlet advection at zone 0, split by the source-water fractions
        # (or taken class-resolved from inlet_tss_classes — routed
        # upstream effluent in a connected network, core/network.py)
        if boundary.inlet_tss_classes is None:
            tss_in = align_trailing(jnp.asarray(boundary.inlet_tss), T) \
                * pp.inlet_fractions
        else:
            tss_in = jnp.asarray(boundary.inlet_tss_classes,
                                 dtype=tss.dtype)
        if inlet_mask is None:
            dTSS = dTSS.at[..., 0].add(
                align_trailing(q_per_v, tss_in) * (tss_in - tss[..., 0]))
        else:
            dTSS = dTSS + align_trailing(q_per_v, tss) \
                * (tss_in[..., None] - tss) * inlet_mask[..., None, :]

        # Stokes settling toward zone 0 (the tank bottom): per-zone rates
        # from each zone's own temperature (purely local in the zone axis)
        w_rate = particles_mod.settling_rates_zonal(
            pp, T, params.zone_height)
        dsettle, deposit = particles_mod.settle(
            tss, w_rate, top_mask=outlet_mask, bottom_mask=inlet_mask)
        dTSS = dTSS + dsettle

        # coagulation chain (mass-conserving across classes)
        dTSS = dTSS + particles_mod.coagulation_chain(
            tss, jnp.asarray(boundary.coagulant_dose), pp)

        # recirculating filtration at the outlet zone
        q_filter = (jnp.asarray(boundary.filter_flow_rate) / 60.0) \
            / params.zone_volume_L
        if outlet_mask is None:
            dTSS = dTSS.at[..., -1].add(
                -align_trailing(q_filter, tss[..., -1])
                * pp.filter_eff * tss[..., -1])
        else:
            dTSS = dTSS - align_trailing(q_filter, tss) \
                * pp.filter_eff[..., None] * tss \
                * outlet_mask[..., None, :]

        # sludge inventory: deposit in, resuspension + blowdown out
        resusp = align_trailing(pp.k_resuspension, sludge) * sludge
        dSludge = deposit - resusp \
            - align_trailing(jnp.asarray(boundary.sludge_blowdown),
                             sludge) * sludge
        if inlet_mask is None:
            dTSS = dTSS.at[..., 0].add(resusp)
        else:
            dTSS = dTSS + resusp[..., None] * inlet_mask[..., None, :]
            # gate to the bottom-owning shard so the wrapper's psum
            # reproduces the global tendency exactly
            dSludge = dSludge * jnp.sum(inlet_mask, axis=-1)[..., None]
        extra += (dTSS, dSludge)

    if disinfection is not None:
        # --- disinfection axis (core/disinfection.py; delivers reference
        #     README.md:449 "Disinfection byproduct (DBP) formation").
        #     Chick-Watson chlorine kill rides the RHS (~0.1 1/s at 2 mg/L
        #     on the fastest class — same stiffness scale as the exchange
        #     operator the substep policy already resolves); the UV bank is
        #     an exact analytic operator split in step() (a 10 mW/cm2 bank
        #     is a ~6 1/s Crypto timescale that would otherwise set the
        #     global substep budget, like chloramination). ---
        # align the scalar-like kinetic leaves against the zone arrays;
        # the per-class leaves (k_cl/k_uv, [..., P]) broadcast through
        # their own [..., P, Z] expansion and must NOT be padded
        dp0 = params.disinfection
        dp = dataclasses.replace(
            jax.tree_util.tree_map(lambda x: align_trailing(x, T), dp0),
            k_cl=dp0.k_cl, k_uv=dp0.k_uv)
        path, ct_min, age_s, toc, thm = disinfection
        path = jnp.maximum(path, 0.0)
        toc = jnp.maximum(toc, 0.0)

        # organics exert a chlorine demand (the classic bulk-decay term on
        # top of the Arrhenius wall decay); a pH-enhanced yield of that
        # exerted demand becomes THMs, and TOC is consumed
        # stoichiometrically
        r_dem = disinfection_mod.chlorine_demand_rate(toc, Cl, T, dp)
        dCl = dCl - r_dem
        dTOC = species(toc, boundary.inlet_toc, -dp.s_toc * r_dem)
        dTHM = species(jnp.maximum(thm, 0.0), boundary.inlet_thm,
                       disinfection_mod.thm_formation_rate(r_dem, pH, dp))

        # CT credit and water age as advected scalars: every parcel
        # accumulates residual-minutes (and seconds of age) on its way
        # through the tank, so the outlet values ARE the flow-weighted
        # credit/age the plant can claim (steady single-CSTR oracles:
        # CT_out = Cl tau/60, age_out = tau)
        dCTcred = species(jnp.maximum(ct_min, 0.0), boundary.inlet_ct,
                          Cl / disinfection_mod.SECONDS_PER_MIN)
        dAge = species(jnp.maximum(age_s, 0.0), boundary.inlet_age,
                       jnp.ones_like(T))

        # pathogen classes [..., P, Z]: mixing/advection vectorized over
        # the class axis (the tss pattern), Chick-Watson sink
        lam = disinfection_mod.chlorine_lethality(
            Cl, pH, T, align_trailing(k.Ka_HOCl, pH), dp)
        if outlet_mask is None:
            dN = transport_mod.apply_exchange(
                path, k_iface=k_iface[..., None, :], q_per_v=q_per_v)
        else:
            dN = transport_mod.apply_exchange(
                path, k_iface=k_iface[..., None, :], q_per_v=0.0) \
                - align_trailing(q_per_v, path) * path \
                * outlet_mask[..., None, :]
        dN = dN - lam * path
        if boundary.inlet_pathogen_classes is None:
            n_in = jnp.asarray(boundary.inlet_pathogens, dtype=path.dtype) \
                + jnp.zeros(path.shape[:-1], path.dtype)    # [..., P]
        else:
            n_in = jnp.asarray(boundary.inlet_pathogen_classes,
                               dtype=path.dtype)
        if inlet_mask is None:
            dN = dN.at[..., 0].add(
                align_trailing(q_per_v, n_in) * (n_in - path[..., 0]))
        else:
            dN = dN + align_trailing(q_per_v, path) \
                * (n_in[..., None] - path) * inlet_mask[..., None, :]
        extra += (dN, dCTcred, dAge, dTOC, dTHM)

    if biofilm is not None:
        # --- biofilm / regrowth axis (core/biofilm.py; closes the biofilm
        #     half of reference core/README.md:98 "No biological processes
        #     (bacteria, biofilms)"). Planktonic biomass X and substrate S
        #     are bulk species (mixed + advected via the shared helper);
        #     the wall film B is attached — its tendency is purely
        #     zone-local, so the zone-sharded SPMD path needs no halo or
        #     psum gating for it. All rates here are slow (1/day..1/hour
        #     scales), far below the exchange operator's stiffness, so the
        #     axis rides the RHS with no operator split. ---
        bp = jax.tree_util.tree_map(lambda x: align_trailing(x, T),
                                    params.biofilm)
        x_b, s_b, b_w = biofilm
        x_b = jnp.maximum(x_b, 0.0)
        s_b = jnp.maximum(s_b, 0.0)
        b_w = jnp.maximum(b_w, 0.0)

        # colonizable area-to-volume ratio [m2/L]: the thermal model's
        # lateral+ends area (reference reactor.py:429-431) split evenly
        # across zones
        a_v = align_trailing(
            params.heat_area_m2 / (params.n_zones * params.zone_volume_L),
            T)
        u = align_trailing(params.velocity_scale, T)

        mu_x = biofilm_mod.specific_growth_bulk(s_b, Cl, T, bp)
        mu_b = biofilm_mod.specific_growth_film(s_b, Cl, T, b_w, bp)
        kx = biofilm_mod.kill_rate_bulk(Cl, bp)
        kb = biofilm_mod.kill_rate_film(Cl, bp)
        det = biofilm_mod.detachment_rate(u, bp)

        # bulk biomass: growth - kill - attachment + sloughed film
        r_x = mu_x * x_b - kx * x_b - bp.k_att * x_b + det * b_w * a_v
        # wall film (areal units): growth - kill + attachment - detachment
        r_b = mu_b * b_w - kb * b_w + bp.k_att * x_b / a_v - det * b_w
        # substrate: consumed by BOTH compartments at the carbon yield;
        # a lysis fraction of killed biomass is recycled back
        r_s = -(mu_x * x_b + mu_b * b_w * a_v) / bp.yield_c \
            + bp.f_lysis * (kx * x_b + kb * b_w * a_v)

        dX = species(x_b, boundary.inlet_bacteria, r_x)
        dS = species(s_b, boundary.inlet_bdoc, r_s)
        dB = r_b    # attached: no mixing, no advection, no inlet

        # the film exerts a wall chlorine demand on the residual — the
        # operational signature of a biofouled tank
        dCl = dCl - biofilm_mod.wall_demand_rate(Cl, b_w, a_v, bp)
        extra += (dX, dS, dB)

    return (dpH, dCl, dT) + extra


# ---------------------------------------------------------------------------
# Step / rollout
# ---------------------------------------------------------------------------


def _update_derived(state: ReactorState) -> ReactorState:
    """Recompute derived quantities (reference reactor.py:511-524).

    Derived leaves are cast to the primary-state dtype: the pure formulas
    promote Python-float constants to float64 on the NumPy host path, which
    would poison an f32 pytree's scan-carry types."""
    dtype = state.pH.dtype
    return ReactorState(
        time=state.time,
        pH=state.pH,
        chlorine=state.chlorine,
        temperature=state.temperature,
        flow_rate=state.flow_rate,
        H_concentration=(10.0 ** (-state.pH)).astype(dtype),
        density=spatial_mod.water_density(state.temperature).astype(dtype),
        chlorine_decay_rate=thermo.chlorine_decay_rate(
            state.temperature).astype(dtype),
        ammonia=state.ammonia,
        nitrite=state.nitrite,
        nitrate=state.nitrate,
        chloramine=state.chloramine,
        oxygen=state.oxygen,
        carbonate=state.carbonate,
        tss=state.tss,
        sludge=state.sludge,
        pathogens=state.pathogens,
        ct=state.ct,
        age=state.age,
        toc=state.toc,
        thm=state.thm,
        bacteria=state.bacteria,
        bdoc=state.bdoc,
        biofilm=state.biofilm,
    )


def _enforce_bounds(pH, Cl, T, phase=None):
    """Physical bound clipping (reference reactor.py:526-541). With the
    phase axis on, the liquid-only [0, 100] temperature clip widens to
    [t_min, t_boil + delta_boil] — sub-zero states are ice and the hot end
    is capped by the boil band's latent heat (core/phase.py)."""
    if phase is None:
        t_clip = jnp.clip(T, 0.0, 100.0)
    else:
        t_clip = jnp.clip(T, align_trailing(phase.t_min, T),
                          align_trailing(phase.t_boil + phase.delta_boil, T))
    return (
        jnp.clip(pH, 0.0, 14.0),
        jnp.maximum(Cl, 0.0),
        t_clip,
    )


def step(params: ReactorParams, state: ReactorState,
         boundary: BoundaryConditions, dt: float,
         substeps: int, deriv_fn=None,
         stages: Optional[int] = None,
         deriv_fn_nitrogen: bool = False,
         deriv_fn_gas: bool = False,
         deriv_fn_particles: bool = False,
         deriv_fn_disinfection: bool = False,
         deriv_fn_biofilm: bool = False,
         uv_mask=None) -> ReactorState:
    """Advance the reactor by ``dt`` seconds (reference reactor.py:450-509).

    ``dt`` and ``substeps`` must be static (Python) values. ``deriv_fn``
    optionally replaces the derivative evaluation ``(pH, Cl, T) -> d/dt``
    (the zone-sharded SPMD path injects a halo-exchanging variant).
    ``stages`` switches the integrator from RK4 to s-stage RKC2
    (ops/integrators.py) — fewer sequential derivative evaluations for the
    same stability span; accuracy-gated against the reference Radau
    trajectories in tests/test_rkc.py.

    ``uv_mask`` (disinfection only) relocates the UV bank's operator split
    onto a masked zone — the zone-sharded SPMD path passes the local
    outlet-owning mask; the default (None) applies it at zone Z-1 (the
    outlet), matching the surface-gas-exchange convention.
    """
    has_n = params.nitrogen is not None and state.ammonia is not None
    has_gas = params.gas is not None and state.oxygen is not None
    has_p = params.particles is not None and state.tss is not None
    has_d = params.disinfection is not None and state.pathogens is not None
    has_b = params.biofilm is not None and state.bacteria is not None
    if deriv_fn is not None and has_n and not deriv_fn_nitrogen:
        raise ValueError(
            "this custom deriv_fn was not declared nitrogen-capable "
            "(pass deriv_fn_nitrogen=True if it accepts and returns the "
            "4 extra species); the zone-sharded SPMD paths "
            "(parallel/spatial.py) support nitrogen via their "
            "nitrogen=True option")
    if deriv_fn is not None and has_gas and not deriv_fn_gas:
        raise ValueError(
            "this custom deriv_fn was not declared gas-capable "
            "(pass deriv_fn_gas=True if it accepts and returns the oxygen "
            "and carbonate species after any nitrogen species)")
    if deriv_fn is not None and has_p and not deriv_fn_particles:
        raise ValueError(
            "this custom deriv_fn was not declared particle-capable "
            "(pass deriv_fn_particles=True if it accepts and returns the "
            "tss/sludge leaves after any nitrogen and gas species)")
    if deriv_fn is not None and has_d and not deriv_fn_disinfection:
        raise ValueError(
            "this custom deriv_fn was not declared disinfection-capable "
            "(pass deriv_fn_disinfection=True if it accepts and returns "
            "the pathogens/ct/age/toc/thm leaves after any nitrogen, gas "
            "and particle species)")
    if deriv_fn is not None and has_b and not deriv_fn_biofilm:
        raise ValueError(
            "this custom deriv_fn was not declared biofilm-capable "
            "(pass deriv_fn_biofilm=True if it accepts and returns the "
            "bacteria/bdoc/biofilm leaves after any nitrogen, gas, "
            "particle and disinfection species)")
    # species tuple layout:
    # (pH, Cl, T) [+ 4 nitrogen] [+ 2 gas] [+ tss, sludge]
    # [+ pathogens, ct, age, toc, thm] [+ bacteria, bdoc, biofilm]
    n_sl = slice(3, 7) if has_n else None
    g_off = 7 if has_n else 3
    g_sl = slice(g_off, g_off + 2) if has_gas else None
    p_off = g_off + (2 if has_gas else 0)
    p_sl = slice(p_off, p_off + 2) if has_p else None
    d_off = p_off + (2 if has_p else 0)
    d_sl = slice(d_off, d_off + 5) if has_d else None
    b_off = d_off + (5 if has_d else 0)
    b_sl = slice(b_off, b_off + 3) if has_b else None
    if deriv_fn is None:
        def f(y):
            return derivatives(
                params, y[0], y[1], y[2], boundary,
                nitrogen=y[n_sl] if has_n else None,
                gas=y[g_sl] if has_gas else None,
                particles=y[p_sl] if has_p else None,
                disinfection=y[d_sl] if has_d else None,
                biofilm=y[b_sl] if has_b else None)
    else:
        f = deriv_fn

    y = (state.pH, state.chlorine, state.temperature)
    if has_n:
        y = y + (state.ammonia, state.nitrite, state.nitrate,
                 state.chloramine)
    if has_gas:
        y = y + (state.oxygen, state.carbonate)
    if has_p:
        y = y + (state.tss, state.sludge)
    if has_d:
        y = y + (state.pathogens, state.ct, state.age, state.toc,
                 state.thm)
    if has_b:
        y = y + (state.bacteria, state.bdoc, state.biofilm)
    if stages is None:
        out = integrators.integrate_fixed(f, y, dt, substeps)
    else:
        out = integrators.integrate_rkc(f, y, dt, substeps, stages)
    pH, Cl, T = _enforce_bounds(*out[:3], phase=params.phase)
    n_kw = {}
    if has_gas:
        n_kw = dict(oxygen=jnp.maximum(out[g_sl.start], 0.0),
                    carbonate=jnp.maximum(out[g_sl.start + 1], 0.0))
    if has_p:
        n_kw.update(tss=jnp.maximum(out[p_sl.start], 0.0),
                    sludge=jnp.maximum(out[p_sl.start + 1], 0.0))
    if has_d:
        path, ct_v, age_v, toc_v, thm_v = (
            jnp.maximum(x, 0.0) for x in out[d_sl])
        # Operator split for the UV bank (exact analytic survival over dt;
        # same pattern as chloramination): the average fluence across the
        # lamp gap follows Beer-Lambert from the absorbance the stepped
        # water itself carries — organics and particles shade the lamps.
        dpar = dataclasses.replace(
            jax.tree_util.tree_map(
                lambda x: align_trailing(x, pH), params.disinfection),
            k_cl=params.disinfection.k_cl,
            k_uv=params.disinfection.k_uv)
        tss_tot = jnp.sum(n_kw["tss"], axis=-2) if has_p \
            else jnp.zeros_like(toc_v)
        a254 = disinfection_mod.absorbance_254(toc_v, tss_tot, dpar)
        e0 = align_trailing(
            jnp.asarray(boundary.uv_intensity, dtype=pH.dtype), pH)
        e_avg = disinfection_mod.average_fluence(e0, a254, dpar)
        surv = disinfection_mod.uv_survival(e_avg, dt, dpar)  # [..., P, Z]
        if uv_mask is None:
            mask = jnp.zeros_like(pH).at[..., -1].set(1.0)
        else:
            mask = uv_mask
        path = path * (1.0 + mask[..., None, :] * (surv - 1.0))
        n_kw.update(pathogens=path, ct=ct_v, age=age_v, toc=toc_v,
                    thm=thm_v)
    if has_b:
        n_kw.update(bacteria=jnp.maximum(out[b_sl.start], 0.0),
                    bdoc=jnp.maximum(out[b_sl.start + 1], 0.0),
                    biofilm=jnp.maximum(out[b_sl.start + 2], 0.0))
    if has_n:
        nh, no2, no3, nhcl = (jnp.maximum(x, 0.0) for x in out[n_sl])
        # Operator split for the FAST reaction (chloramination: HOCl + NH3
        # -> NH2Cl, pseudo-first-order ~60 1/s at 2 mg/L free chlorine):
        # exact analytic second-order extent over dt against the stepped
        # state, so the slow-process substep count is untouched. The H+
        # release (1/N) shifts pH through the same buffering chain rule.
        n_aligned = jax.tree_util.tree_map(
            lambda x: align_trailing(x, pH), params.nitrogen)
        x_mol = nitrogen_mod.chloramination_extent(
            Cl, nh, pH, T, align_trailing(params.chem.Ka_HOCl, pH),
            n_aligned, dt)
        Cl = jnp.maximum(Cl - x_mol * nitrogen_mod._CL2_MGL_PER_MOL, 0.0)
        nh = jnp.maximum(nh - x_mol * nitrogen_mod._N_MGL_PER_MOL, 0.0)
        nhcl = nhcl + x_mol * nitrogen_mod._CL2_MGL_PER_MOL
        k_split = params.chem
        if has_gas:  # buffering must see the dynamic carbonate pool
            k_split = dataclasses.replace(
                k_split, C_T_mol=n_kw["carbonate"] * 1e-3)
        beta = chem.buffering_capacity(pH, k_split)
        pH = jnp.clip(
            pH - nitrogen_mod.H_PER_N_CHLORAMINE * x_mol / (beta * LN10),
            0.0, 14.0)
        n_kw.update(ammonia=nh, nitrite=no2, nitrate=no3, chloramine=nhcl)

    total_flow = (boundary.inlet_flow_rate + boundary.acid_flow_rate
                  + boundary.chlorine_flow_rate)
    new_state = ReactorState(
        time=state.time + dt,
        pH=pH,
        chlorine=Cl,
        temperature=T,
        flow_rate=jnp.asarray(total_flow, dtype=pH.dtype)
        + jnp.zeros_like(state.flow_rate),
        **n_kw,
    )
    return _update_derived(new_state)


def rollout(params: ReactorParams, state: ReactorState,
            boundary: BoundaryConditions, dt: float, substeps: int,
            n_steps: int, record: bool = True,
            stages: Optional[int] = None, remat: bool = False):
    """Scan ``step`` over ``n_steps`` inside one jit.

    Returns ``(final_state, trajectory)`` where trajectory stacks the primary
    variables per step (or ``None`` when ``record=False`` for pure-throughput
    benchmarking).

    ``remat=True`` wraps the scan body in ``jax.checkpoint``: reverse-mode
    differentiation then stores only the per-step carry (O(n_steps ·
    state)) and recomputes the step's internal residuals (every substep's
    intermediates, ~100x the carry) during the backward pass — parameter
    estimation and gradient-based MPC scale to >=100k-step horizons at the
    cost of one extra forward evaluation (docs/PERFORMANCE.md has the
    measured trade).
    """
    def body(s, _):
        s = step(params, s, boundary, dt, substeps, stages=stages)
        out = {"pH": s.pH, "chlorine": s.chlorine,
               "temperature": s.temperature} if record else None
        return s, out

    if remat:
        body = jax.checkpoint(body)
    return jax.lax.scan(body, state, None, length=n_steps)


def rollout_scheduled(params: ReactorParams, state: ReactorState,
                      schedule: BoundaryConditions, dt: float,
                      substeps: int, record: bool = True,
                      stages: Optional[int] = None, remat: bool = False):
    """Scan ``step`` over a time-varying boundary-condition *schedule* inside
    one jit — dosing profiles, diurnal temperature swings, demand curves.

    ``schedule`` is a BoundaryConditions pytree whose leaves carry a leading
    time axis ``[n_steps]`` (per-step forcing; the reference drives this by
    mutating BCs between ``step()`` calls in its HIL loop, __main__.py:398-457 —
    here the whole schedule is device-resident data consumed by the scan).
    Scalar leaves (e.g. untouched defaults) broadcast over time; array
    leaves must agree on ``n_steps``. Returns ``(final_state, trajectory)``
    like ``rollout``.
    """
    lengths = {int(x.shape[0]) for x in jax.tree_util.tree_leaves(schedule)
               if jnp.ndim(x) >= 1}
    if not lengths:
        raise ValueError("schedule has no [n_steps] leaves; use rollout() "
                         "for constant boundary conditions")
    if len(lengths) > 1:
        raise ValueError(f"schedule leaves disagree on n_steps: {lengths}")
    n_steps = lengths.pop()
    schedule = jax.tree_util.tree_map(
        lambda x: (jnp.broadcast_to(jnp.asarray(x), (n_steps,))
                   if jnp.ndim(x) == 0 else x), schedule)

    def body(s, bc):
        s = step(params, s, bc, dt, substeps, stages=stages)
        out = {"pH": s.pH, "chlorine": s.chlorine,
               "temperature": s.temperature} if record else None
        return s, out

    if remat:   # long-horizon gradients: see rollout()
        body = jax.checkpoint(body)
    return jax.lax.scan(body, state, schedule, length=n_steps)


def stack_boundary_schedule(boundaries) -> BoundaryConditions:
    """Stack a Python sequence of BoundaryConditions into the [n_steps]-leaf
    pytree ``rollout_scheduled`` consumes (host-side convenience)."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *boundaries)


def default_substeps(config: ReactorConfiguration, dt: float) -> int:
    """Substep policy: the stiffest linear rate is the exchange operator
    (spectral radius < 4 k_exchange) plus dilution; target lambda*h <= 1.8
    (RK4 stable to 2.785). Calibrated against the reference's Radau
    trajectories (tools/compare_vs_reference.py): at lambda*h = 1.8 the
    deviation is already at Radau's own rtol=1e-6 error floor, so more
    substeps buy nothing."""
    geometry = transport_mod.GeometryParameters(
        volume=config.volume, height=config.height,
        diameter=config.diameter, n_zones=config.n_zones)
    flow = transport_mod.FlowParameters(
        flow_rate=config.flow_rate, impeller_speed=config.impeller_speed,
        impeller_diameter=config.impeller_diameter,
        power_number=config.power_number)
    coeffs = transport_mod.transport_coefficients(geometry, flow,
                                                  config.temperature)
    lambda_max = 4.0 * coeffs["k_exchange"] + coeffs["q_per_v"]
    return max(1, math.ceil(dt * lambda_max / 1.8 - 1e-9))


def default_rkc_plan(config: ReactorConfiguration, dt: float,
                     max_stages: int = 8, mode: str = "strict"):
    """(substeps, stages) for the RKC2 integrator at this configuration's
    stiffness — same spectral-radius estimate as ``default_substeps``, but
    exploiting RKC2's ~0.65 s^2 stability span (ops/integrators.py).

    ``mode="strict"`` holds the 1e-6 Radau-parity envelope; ``mode="fast"``
    is stability-limited (ensemble-grade accuracy, fewest evaluations)."""
    geometry = transport_mod.GeometryParameters(
        volume=config.volume, height=config.height,
        diameter=config.diameter, n_zones=config.n_zones)
    flow = transport_mod.FlowParameters(
        flow_rate=config.flow_rate, impeller_speed=config.impeller_speed,
        impeller_diameter=config.impeller_diameter,
        power_number=config.power_number)
    coeffs = transport_mod.transport_coefficients(geometry, flow,
                                                  config.temperature)
    if mode not in ("strict", "fast"):
        raise ValueError(f"mode must be 'strict' or 'fast', got {mode!r}")
    lambda_max = 4.0 * coeffs["k_exchange"] + coeffs["q_per_v"]
    return integrators.rkc_plan(
        dt, lambda_max, max_stages=max_stages,
        accuracy_span=1.5 if mode == "strict" else None)


# ---------------------------------------------------------------------------
# Conservation audit (reference reactor.py:570-611)
# ---------------------------------------------------------------------------


def conservation_metrics(params: ReactorParams,
                         state: ReactorState) -> Dict[str, jnp.ndarray]:
    """Mass/charge/energy audit as a pure pytree function — runnable in-graph."""
    xp = array_namespace(state.pH, params.zone_volume_L)
    zone_volume = params.zone_volume_L
    H = 10.0 ** (-state.pH)

    total_cl_mg = xp.sum(state.chlorine, axis=-1) * zone_volume
    total_h_mol = xp.sum(H, axis=-1) * zone_volume / 1000.0
    kw = thermo.water_ionization_constant(state.temperature[..., 0])
    total_oh_mol = xp.sum(align_trailing(kw, H) / H, axis=-1) \
        * zone_volume / 1000.0

    v_m3 = params.volume_L / 1000.0
    thermal_kj = (c.WATER_DENSITY_20C * c.WATER_CP * v_m3
                  * xp.mean(state.temperature - 20.0, axis=-1) / 1000.0)

    return {
        "total_chlorine_mg": total_cl_mg,
        "total_H_mol": total_h_mol,
        "total_OH_mol": total_oh_mol,
        "charge_balance_mol": total_h_mol - total_oh_mol,
        "thermal_energy_kJ": thermal_kj,
        "zones": params.n_zones,
        "timestamp": state.time,
    }


# ---------------------------------------------------------------------------
# API-parity class wrapper (reference reactor.py:189-645)
# ---------------------------------------------------------------------------


class IntegratedCSTR:
    """Drop-in replacement for the reference engine (reactor.py:189-645).

    A thin stateful shell over the pure functions above: it owns a params
    pytree and the current state, and calls a cached jitted ``step``.
    """

    def __init__(self, config: ReactorConfiguration, dtype=None,
                 substeps: Optional[int] = None,
                 integrator: str = "rk4"):
        """``integrator``: "rk4" (default, 1e-6 Radau regression parity),
        "rkc-strict" (~1.5x fewer sequential evals, <= 2e-6 pH), or
        "rkc-fast" (stability-limited Chebyshev, ~3x fewer evals, <= 3e-6 pH
        — ensemble/throughput grade; tests/test_rkc.py)."""
        if integrator not in ("rk4", "rkc-strict", "rkc-fast"):
            raise ValueError(f"Unknown integrator: {integrator!r}")
        config.validate()
        self.config = config
        self.integrator = integrator
        if dtype is None:
            dtype = jnp.float64 if jax.config.read("jax_enable_x64") \
                else jnp.float32
        self._dtype = dtype
        self._substeps_override = substeps
        self._step_cache = {}
        self._rollout_cache = {}

        # Sub-models kept for API parity / diagnostics.
        self.thermo = thermo.TemperatureDependentKinetics()
        self.buffer = chem.BufferSystem(
            alkalinity=config.alkalinity,
            total_carbonate=config.total_carbonate,
            temperature=config.temperature,
        )
        self.chemistry = chem.AqueousChemistry(self.buffer, dtype=dtype)
        self.transport = transport_mod.TransportModel(
            transport_mod.GeometryParameters(
                volume=config.volume, height=config.height,
                diameter=config.diameter, n_zones=config.n_zones),
            transport_mod.FlowParameters(
                flow_rate=config.flow_rate,
                turbulent_intensity=config.turbulent_intensity,
                recirculation_ratio=config.recirculation_ratio,
                impeller_speed=config.impeller_speed,
                impeller_diameter=config.impeller_diameter,
                power_number=config.power_number),
            config.temperature,
        )
        self.spatial = spatial_mod.SpatialModel(
            n_zones=config.n_zones, height=config.height,
            stratification_params=spatial_mod.StratificationParameters(
                enable_thermal_stratification=config.enable_thermal_stratification),
        )

        self.params = make_params(config, dtype=dtype)
        self.state = make_initial_state(config, dtype=dtype)

    def _jitted_step(self, dt: float, substeps: int, stages):
        key = (dt, substeps, stages)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                partial(step, dt=dt, substeps=substeps, stages=stages))
        return self._step_cache[key]

    def substeps_for(self, dt: float) -> int:
        if self._substeps_override is not None:
            return self._substeps_override
        return default_substeps(self.config, dt)

    def _plan_for(self, dt: float):
        """(substeps, stages) for the configured integrator; stages=None
        selects RK4."""
        if self.integrator == "rk4":
            return self.substeps_for(dt), None
        mode = "strict" if self.integrator == "rkc-strict" else "fast"
        if self._substeps_override is not None:
            m, s = self._substeps_override, 4
        else:
            m, s = default_rkc_plan(self.config, dt, mode=mode)
        return m, s

    def step(self, dt: float, boundary: BoundaryConditions) -> ReactorState:
        m, s = self._plan_for(float(dt))
        fn = self._jitted_step(float(dt), m, s)
        self.state = fn(self.params, self.state, boundary)
        return self.state

    def derivatives(self, t, y, boundary: BoundaryConditions):
        """d y/dt for the packed state vector y = [pH_0..n, Cl_0..n, T_0..n]
        — the reference's ODE-system entry point (reactor.py:272-448), for
        users who drive their own integrator. ``t`` is accepted for ODE-API
        compatibility; the system is autonomous (as in the reference)."""
        del t
        n = self.config.n_zones
        y = jnp.asarray(y)
        dpH, dCl, dT = derivatives(self.params, y[..., :n], y[..., n:2 * n],
                                   y[..., 2 * n:], boundary)
        return jnp.concatenate([dpH, dCl, dT], axis=-1)

    def _jitted_rollout(self, kind: str, **statics):
        """Per-instance jit cache for the rollout family — a second call with
        identical statics compiles nothing (mirrors ``_jitted_step``; this
        environment's remote compiles cost seconds to minutes)."""
        fns = {"rollout": rollout, "scheduled": rollout_scheduled}
        key = (kind,) + tuple(sorted(statics.items()))
        if key not in self._rollout_cache:
            self._rollout_cache[key] = jax.jit(partial(fns[kind], **statics))
        return self._rollout_cache[key]

    def rollout(self, dt: float, boundary: BoundaryConditions, n_steps: int,
                record: bool = True):
        """Run many steps in a single jitted scan (no reference counterpart —
        this is the TPU fast path)."""
        m, s = self._plan_for(float(dt))
        fn = self._jitted_rollout("rollout", dt=float(dt), substeps=m,
                                  stages=s, n_steps=int(n_steps),
                                  record=record)
        self.state, traj = fn(self.params, self.state, boundary)
        return self.state, traj

    def rollout_scheduled(self, dt: float, schedule: BoundaryConditions,
                          record: bool = True):
        """Run a time-varying boundary *schedule* ([n_steps]-leaf
        BoundaryConditions pytree, see module-level ``rollout_scheduled`` /
        ``stack_boundary_schedule``) in one jitted scan."""
        m, s = self._plan_for(float(dt))
        fn = self._jitted_rollout("scheduled", dt=float(dt), substeps=m,
                                  stages=s, record=record)
        self.state, traj = fn(self.params, self.state, schedule)
        return self.state, traj

    def rollout_fused(self, dt: float, boundary: BoundaryConditions,
                      n_steps: int, record_every: Optional[int] = None):
        """Run many steps in ONE Pallas kernel launch (ops/fused_rollout.py)
        — the fastest single/small-batch path on TPU. Jit caching is handled
        by the fused op itself (static_argnames jit)."""
        from ics_wt_physicsengine_tpu.ops.fused_rollout import rollout_fused
        m, s = self._plan_for(float(dt))
        out = rollout_fused(self.params, self.state, boundary, dt=float(dt),
                            substeps=m, stages=s, n_steps=int(n_steps),
                            record_every=record_every)
        if record_every is None:
            self.state = out
            return self.state
        self.state, traj = out
        return self.state, traj

    def get_state_at_location(self, zone_idx: int, parameter: str) -> float:
        if zone_idx < 0 or zone_idx >= self.config.n_zones:
            raise ValueError(
                f"Zone index {zone_idx} out of range "
                f"[0, {self.config.n_zones - 1}]")
        arrays = {
            "pH": self.state.pH,
            "chlorine": self.state.chlorine,
            "temperature": self.state.temperature,
            "density": self.state.density,
        }
        # extension species (present only when their axis is enabled)
        for name in ("ammonia", "nitrite", "nitrate", "chloramine",
                     "oxygen", "carbonate"):
            v = getattr(self.state, name, None)
            if v is not None:
                arrays[name] = v
        if self.state.tss is not None:
            arrays["tss"] = particles_mod.total_solids_mgl(self.state.tss)
            arrays["turbidity"] = particles_mod.turbidity_ntu(
                self.state.tss, self.params.particles)
        if parameter not in arrays:
            raise ValueError(f"Unknown parameter: {parameter}")
        return float(arrays[parameter][..., zone_idx])

    def validate_conservation(self) -> Dict[str, float]:
        metrics = conservation_metrics(self.params, self.state)
        return {k: (v if isinstance(v, int) else float(v))
                for k, v in metrics.items()}

    def print_diagnostics(self) -> None:
        print("\n" + "=" * 70)
        print("CSTR PHYSICS DIAGNOSTICS (TPU engine)")
        print("=" * 70)
        print(f"\nTime: {float(self.state.time):.1f} s")
        rt = self.transport.residence_time
        print(f"Residence time: "
              f"{'%.1f min' % rt if rt is not None else 'n/a (batch)'}")
        print(f"Mixing time: {self.transport.mixing_time_seconds:.1f} s")
        print(f"\n{'Zone':<6} {'pH':<8} {'Cl(mg/L)':<10} {'T(C)':<8} "
              f"{'rho(kg/m3)':<10}")
        print("-" * 50)
        pH = np.asarray(self.state.pH)
        cl = np.asarray(self.state.chlorine)
        t = np.asarray(self.state.temperature)
        rho = np.asarray(self.state.density)
        for i in range(self.config.n_zones):
            print(f"{i:<6} {pH[i]:<8.3f} {cl[i]:<10.3f} {t[i]:<8.2f} "
                  f"{rho[i]:<10.2f}")
        cons = self.validate_conservation()
        print("\nConservation Laws:")
        print(f"  Total Chlorine: {cons['total_chlorine_mg']:.2f} mg")
        print(f"  Charge Balance: {cons['charge_balance_mol']:.2e} mol")
        _, ph_s = transport_mod.mixing_quality(self.state.pH)
        _, cl_s = transport_mod.mixing_quality(self.state.chlorine)
        print("\nMixing Quality:")
        print(f"  pH segregation index: {float(ph_s):.4f}")
        print(f"  Chlorine segregation index: {float(cl_s):.4f}")
        print("=" * 70 + "\n")


def validate_integrated_reactor() -> None:
    """Integration oracle (reference reactor.py:648-700)."""
    config = ReactorConfiguration(
        volume=1000, height=2.0, diameter=0.798, n_zones=5,
        flow_rate=5.0, initial_pH=7.5, initial_chlorine=2.0, temperature=20.0,
    )
    reactor = IntegratedCSTR(config)

    boundary = BoundaryConditions(
        inlet_flow_rate=0.0, inlet_pH=7.5, inlet_chlorine=0.0,
        inlet_temperature=20.0, acid_flow_rate=0.0, chlorine_flow_rate=0.0,
    )

    for _ in range(10):
        reactor.step(dt=1.0, boundary=boundary)

    mean_ph = float(np.mean(np.asarray(reactor.state.pH)))
    mean_cl = float(np.mean(np.asarray(reactor.state.chlorine)))
    assert 6.0 < mean_ph < 9.0, f"pH drift: {mean_ph}"
    assert 0.0 < mean_cl < 5.0, f"Chlorine drift: {mean_cl}"

    conservation = reactor.validate_conservation()
    assert conservation["total_chlorine_mg"] > 0, "Chlorine conservation"

    pH_before = float(reactor.state.pH[0])
    boundary_with_acid = BoundaryConditions(
        inlet_flow_rate=0.0, acid_flow_rate=0.5, acid_concentration=0.1,
        chlorine_flow_rate=0.0,
    )
    for _ in range(20):
        reactor.step(dt=1.0, boundary=boundary_with_acid)
    assert float(reactor.state.pH[0]) < pH_before, "Acid should decrease pH"

    print("All integrated reactor validations passed")
