"""
Phase change: freezing (ice) and the boiling cap (vapor).

The reference's physics is explicitly single-phase liquid water on a hard
[0, 100] C gate — its own limitation table lists "Temperature limited to
0-100 C (liquid water at standard pressure)" and "Single-phase only (no ice,
no vapor)" (reference README.md:523-524; the gate itself raises at
thermodynamics.py:129-158). This module closes both rows TPU-natively with
the **apparent-heat-capacity (fixed-grid enthalpy) method**: no new state
variables, no moving boundaries, no data-dependent control flow — the phase
fronts live inside the existing ``[..., Z]`` temperature field as narrow
"mushy" bands where the effective heat capacity carries the latent heat.
Everything stays a pure vectorized rate law riding the same fixed-step
integrators, scan/vmap/shard_map transforms, and halo exchange as the rest
of the physics (ice effects are zone- or interface-local).

Processes (all opt-in via ``ReactorConfiguration(enable_phase=True)``):

- **Freezing / melting (Stefan problem on a fixed grid)**: across the mushy
  band ``[t_freeze - delta_freeze, t_freeze]`` the effective heat capacity
  is ``c_m + L_f / delta_freeze`` — the exact integral of c_eff over the
  band equals the latent heat of fusion (333.55 kJ/kg, CRC), so a cooling
  zone's temperature pins at the freezing point until the full latent heat
  has been extracted (the classic freezing plateau), then continues down
  with ice's heat capacity (2108 J/(kg K)). Ice fraction is DIAGNOSTIC:
  ``phi(T) = clip((t_freeze - T)/delta_freeze, 0, 1)``.
- **Freezing-point depression**: ``dT_f = -K_f m`` with the cryoscopic
  constant K_f = 1.86 K kg/mol (Atkins), applied by ``make_phase_params``
  when a solute molality is configured.
- **Ice immobilizes transport**: inter-zone exchange is scaled by the
  interface mobility ``(1 - phi_i)(1 - phi_i+1)`` — a frozen zone neither
  mixes nor convects. Interface-local, so the zone-sharded SPMD path needs
  nothing beyond the halo it already exchanges.
- **Ice floats**: the density the Richardson/stratification path sees is the
  mixture ``(1 - phi) rho_w(T) + phi rho_ice`` (916.7 kg/m^3) — icy zones
  become strongly buoyant, which is why real tanks freeze top-down.
- **Ice insulates**: each zone's ambient heat-loss term is scaled by
  ``1 - ice_insulation * phi`` (an ice lid throttles the dominant
  convective loss), and a frozen surface blocks BOTH gas exchange
  (core/gas.py's surface film) and evaporation.
- **Surface evaporation (Dalton / Penman mass transfer)**: evaporative mass
  flux ``m'' = k_e (1 + c_w W)(e_s(T_w) - RH e_s(T_a))`` over the free
  surface with the WMO/Penman wind function (0.26(1 + 0.54 u) mm/day/hPa
  -> k_e = 3.0e-5 kg/(m^2 s kPa), c_w = 0.54 s/m), Magnus saturation
  pressure (Alduchov & Eskridge 1996), and evaporative cooling
  ``q'' = lambda(T) m''`` on the top zone — the "no vapor" half of the
  limitation at ordinary temperatures (a 20 C pond loses 100-200 W/m^2 and
  several mm/day to a dry breeze; the reference loses nothing).
- **Boiling cap**: a second latent band ``[t_boil, t_boil + delta_boil]``
  carries the latent heat of vaporization (2256 kJ/kg at 100 C) — under
  extreme heating the temperature pins at the boil point with the energy
  going to vapor generation instead of integrating through 100 C into the
  clip (the reference hard-raises there). Bulk steam/pressure dynamics are
  out of scope: an open treatment tank boils at constant pressure; the cap
  is thermodynamically exact for the energy balance.

Scope notes (documented, deliberate): the commanded hydraulic flow is
assumed maintained (heat-traced pipes) — a fully frozen inlet zone still
passes the commanded advection; evaporative VOLUME loss is not fed back
into the constant-volume hydraulics (it is ~1e-6 of the tank per hour);
sublimation through an ice lid is neglected.

Accuracy note: band-crossing fidelity scales with the per-substep sensible
temperature motion — a substep that crosses INTO a mushy band at
liquid-phase speed skips the latent content of the overshoot depth (the
standard sharp-apparent-capacity caveat). Keep the per-substep motion under
~delta_freeze/4 near a front (tests/test_phase.py's Stefan and enthalpy
audits hold to <5% / <2% at that sizing); far from fronts the default
substep policy is untouched because c_eff == cp there exactly.

Validation: ``validate_phase()`` pins the literature values (latent heats,
Magnus pressures, cryoscopic constant, ice properties, pond-evaporation
magnitudes) and the structural facts (c_eff integral == latent heat exactly,
enthalpy exactly inverts, phi monotone); the Stefan freezing-time oracle and
the end-to-end pinning/insulation/buoyancy behavior live in
tests/test_phase.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import constants as c
from ics_wt_physicsengine_tpu.core import spatial as spatial_mod
from ics_wt_physicsengine_tpu.utils.dispatch import array_namespace

# --- literature constants ---
LATENT_FUSION = 333550.0        # [J/kg] ice <-> water at 0 C (CRC)
LATENT_VAP_100C = 2256400.0     # [J/kg] water <-> steam at 100 C
LATENT_VAP_0C = 2500900.0       # [J/kg] at 0 C
CP_ICE = 2108.0                 # [J/(kg K)] ice near 0 C
RHO_ICE = 916.7                 # [kg/m^3] ice at 0 C
K_CRYOSCOPIC = 1.86             # [K kg/mol] water cryoscopic constant
# WMO/Penman open-water wind function 0.26 (1 + 0.54 u) mm/day per hPa
K_EVAP = 3.0e-5                 # [kg/(m^2 s kPa)] at u = 0
C_WIND = 0.54                   # [s/m]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PhaseParams:
    """Phase-change parameters as a pytree of traced scalars (batchable like
    ReactorParams — parameter uncertainty is data, not code)."""

    t_freeze: jnp.ndarray = None       # [C] liquidus (after depression)
    delta_freeze: jnp.ndarray = None   # [K] mushy band width (freeze)
    t_boil: jnp.ndarray = None         # [C] boil point
    delta_boil: jnp.ndarray = None     # [K] mushy band width (boil)
    t_min: jnp.ndarray = None          # [C] hard lower clip
    latent_fusion: jnp.ndarray = None  # [J/kg]
    cp_ice: jnp.ndarray = None         # [J/(kg K)]
    rho_ice: jnp.ndarray = None        # [kg/m^3]
    ice_insulation: jnp.ndarray = None  # in [0, 1]: heat-loss throttle
    k_evap: jnp.ndarray = None         # [kg/(m^2 s kPa)]
    c_wind: jnp.ndarray = None         # [s/m] wind-function slope


def make_phase_params(t_freeze: float = 0.0, solute_molality: float = 0.0,
                      delta_freeze: float = 0.5, t_boil: float = 100.0,
                      delta_boil: float = 0.5, t_min: float = -60.0,
                      latent_fusion: float = LATENT_FUSION,
                      cp_ice: float = CP_ICE, rho_ice: float = RHO_ICE,
                      ice_insulation: float = 0.7,
                      k_evap: float = K_EVAP, c_wind: float = C_WIND,
                      dtype=jnp.float32) -> PhaseParams:
    a = lambda x: np.asarray(x, dtype)  # noqa: E731
    return PhaseParams(
        t_freeze=a(t_freeze
                   - freezing_point_depression(float(solute_molality))),
        delta_freeze=a(delta_freeze), t_boil=a(t_boil),
        delta_boil=a(delta_boil), t_min=a(t_min),
        latent_fusion=a(latent_fusion), cp_ice=a(cp_ice), rho_ice=a(rho_ice),
        ice_insulation=a(ice_insulation), k_evap=a(k_evap), c_wind=a(c_wind))


# ---------------------------------------------------------------------------
# Thermodynamic property fits (pure, vectorized)
# ---------------------------------------------------------------------------

def freezing_point_depression(molality):
    """Colligative liquidus depression dT_f = K_f m [K] (K_f = 1.86)."""
    return K_CRYOSCOPIC * molality


def latent_heat_vaporization(T_C):
    """lambda(T) [J/kg]: linear through (0 C, 2500.9) and (100 C, 2256.4)
    kJ/kg — within 2 kJ/kg of the steam tables over the whole liquid range
    (2452 at 20 C vs 2453.5 tabulated)."""
    return LATENT_VAP_0C + (LATENT_VAP_100C - LATENT_VAP_0C) / 100.0 * T_C


def saturation_vapor_pressure(T_C):
    """Saturation vapor pressure over liquid water [kPa], Magnus form with
    the Alduchov & Eskridge (1996) coefficients: 0.611 kPa at 0 C, 2.339 at
    20 C, 3.168 at 25 C."""
    xp = array_namespace(T_C)
    return 0.61094 * xp.exp(17.625 * T_C / (T_C + 243.04))


# ---------------------------------------------------------------------------
# Apparent heat capacity / enthalpy (the fixed-grid Stefan formulation)
# ---------------------------------------------------------------------------

def ice_fraction(T_C, p: PhaseParams):
    """Diagnostic ice fraction phi(T): linear ramp across the mushy band,
    0 above ``t_freeze``, 1 below ``t_freeze - delta_freeze``."""
    xp = array_namespace(T_C)
    return xp.clip((p.t_freeze - T_C) / p.delta_freeze, 0.0, 1.0)


def heat_capacity_ratio(T_C, p: PhaseParams):
    """c_eff(T) / cp_water — the apparent-heat-capacity factor every
    temperature tendency is divided by:

    - ``cp_ice/cp_w``                      below the freeze band
    - ``(c_m + L_f/delta_f)/cp_w``         inside the freeze band
    - ``1``                                liquid range
    - ``(cp_w + lambda(t_b)/delta_b)/cp_w`` inside the boil band (and above,
      where the hard clip lands)

    with ``c_m = (cp_w + cp_ice)/2`` so the band's sensible part is the
    phase-average. The integral of ``c_eff`` across each band is EXACTLY the
    latent heat — checked by ``validate_phase``.
    """
    xp = array_namespace(T_C)
    cpw = c.WATER_CP
    c_mushy = (0.5 * (cpw + p.cp_ice) + p.latent_fusion / p.delta_freeze)
    c_boil = cpw + latent_heat_vaporization(p.t_boil) / p.delta_boil
    r = xp.where(T_C < p.t_freeze - p.delta_freeze, p.cp_ice / cpw,
                 xp.ones_like(xp.asarray(T_C)))
    r = xp.where((T_C >= p.t_freeze - p.delta_freeze)
                 & (T_C < p.t_freeze), c_mushy / cpw, r)
    return xp.where(T_C >= p.t_boil, c_boil / cpw, r)


def enthalpy(T_C, p: PhaseParams):
    """Specific enthalpy h(T) [J/kg], the exact integral of ``c_eff`` with
    ``h(t_freeze) = 0`` — the conserved quantity for energy audits across
    phase change (``dh/dT = cp_w * heat_capacity_ratio``)."""
    xp = array_namespace(T_C)
    cpw = c.WATER_CP
    c_mushy = 0.5 * (cpw + p.cp_ice) + p.latent_fusion / p.delta_freeze
    lam_b = latent_heat_vaporization(p.t_boil)
    h = cpw * xp.maximum(T_C - p.t_freeze, 0.0)
    h = h + (lam_b / p.delta_boil) * xp.clip(T_C - p.t_boil, 0.0,
                                             p.delta_boil)
    h = h - c_mushy * xp.clip(p.t_freeze - T_C, 0.0, p.delta_freeze)
    return h - p.cp_ice * xp.maximum((p.t_freeze - p.delta_freeze) - T_C,
                                     0.0)


def effective_density(T_C, p: PhaseParams):
    """Mixture density the stratification path sees:
    ``(1 - phi) rho_w(T) + phi rho_ice`` — ice floats."""
    phi = ice_fraction(T_C, p)
    return (1.0 - phi) * spatial_mod.water_density(T_C) + phi * p.rho_ice


def interface_mobility(phi):
    """Per-interface transport mobility from zone ice fractions ``[..., Z]``:
    ``(1 - phi_i)(1 - phi_{i+1})`` for interfaces 0..Z-2 — exchange needs
    liquid on BOTH sides."""
    liq = 1.0 - phi
    return liq[..., :-1] * liq[..., 1:]


# ---------------------------------------------------------------------------
# Evaporation (Dalton mass transfer, Penman wind function)
# ---------------------------------------------------------------------------

def evaporation_flux(T_water, T_ambient, humidity, wind_speed,
                     p: PhaseParams):
    """Evaporative mass flux m'' [kg/(m^2 s)] from the free surface:

        m'' = k_e (1 + c_w W) max(e_s(T_w) - RH e_s(T_a), 0)

    ~2.5 mm/day for a 20 C pond under 50 % RH calm air, ~6 mm/day with a
    2 m/s breeze (WMO open-water range). Condensation (negative deficit) is
    clipped — dew on the tank is not modeled."""
    xp = array_namespace(T_water)
    deficit = xp.maximum(
        saturation_vapor_pressure(T_water)
        - humidity * saturation_vapor_pressure(T_ambient), 0.0)
    return p.k_evap * (1.0 + p.c_wind * wind_speed) * deficit


def evaporative_cooling_flux(T_water, T_ambient, humidity, wind_speed,
                             p: PhaseParams):
    """Latent cooling flux q'' = lambda(T) m'' [W/m^2] (~100-200 W/m^2 for
    a 20 C pond in a dry breeze)."""
    return latent_heat_vaporization(T_water) * evaporation_flux(
        T_water, T_ambient, humidity, wind_speed, p)


# ---------------------------------------------------------------------------
# Validation (literature oracles + structural invariants)
# ---------------------------------------------------------------------------

def validate_phase(verbose: bool = True) -> bool:
    """Validation suite in the reference's ``validate_*`` style
    (e.g. reference thermodynamics.py:386-450)."""
    p = make_phase_params(dtype=jnp.float64)
    checks = []

    def check(name, ok):
        checks.append((name, bool(ok)))
        if verbose:
            print(f"  {'PASS' if ok else 'FAIL'}: {name}")

    f64 = np.float64

    # latent heats (CRC / steam tables)
    check("latent heat of fusion = 333.55 kJ/kg",
          abs(float(p.latent_fusion) - 333550.0) < 1.0)
    check("latent heat of vaporization at 100 C = 2256.4 kJ/kg",
          abs(float(latent_heat_vaporization(f64(100.0))) - 2256400.0) < 1.0)
    check("latent heat of vaporization at 20 C ~ 2453.5 kJ/kg",
          abs(float(latent_heat_vaporization(f64(20.0))) - 2453500.0)
          < 3000.0)

    # Magnus saturation pressure (Alduchov & Eskridge 1996)
    check("e_s(0 C) = 0.611 kPa",
          abs(float(saturation_vapor_pressure(f64(0.0))) - 0.611) < 0.002)
    check("e_s(20 C) = 2.339 kPa",
          abs(float(saturation_vapor_pressure(f64(20.0))) - 2.339) < 0.01)
    check("e_s(25 C) = 3.168 kPa",
          abs(float(saturation_vapor_pressure(f64(25.0))) - 3.168) < 0.02)
    es = saturation_vapor_pressure(np.linspace(0.0, 50.0, 51))
    check("e_s monotonically increasing",
          bool(np.all(np.diff(np.asarray(es)) > 0)))

    # cryoscopic constant and ice properties
    check("freezing-point depression K_f = 1.86 K kg/mol",
          abs(freezing_point_depression(1.0) - 1.86) < 1e-12)
    check("ice density = 916.7 kg/m^3 (ice floats)",
          float(p.rho_ice) < 999.0 and abs(float(p.rho_ice) - 916.7) < 0.1)
    check("ice heat capacity = 2108 J/(kg K)",
          abs(float(p.cp_ice) - 2108.0) < 1.0)

    # structural: the c_eff integral across each mushy band IS the latent
    # heat, exactly (the whole point of the apparent-capacity method)
    dT = float(p.delta_freeze)
    c_band = c.WATER_CP * float(heat_capacity_ratio(
        f64(float(p.t_freeze) - 0.5 * dT), p))
    sensible = 0.5 * (c.WATER_CP + float(p.cp_ice))
    check("integral of c_eff over freeze band == L_f (exact)",
          abs(c_band * dT - (sensible * dT + float(p.latent_fusion)))
          < 1e-6)
    db = float(p.delta_boil)
    c_bb = c.WATER_CP * float(heat_capacity_ratio(
        f64(float(p.t_boil) + 0.5 * db), p))
    check("integral of c_eff over boil band == lambda(t_boil) (exact)",
          abs(c_bb * db - (c.WATER_CP * db
                           + float(latent_heat_vaporization(
                               float(p.t_boil)))))
          < 1e-3)

    # structural: enthalpy is the exact antiderivative (finite differences
    # of h reproduce c_eff away from the kinks)
    for t0 in (-10.0, -0.25, 10.0, 100.25):
        eps = 1e-4
        dh = (float(enthalpy(f64(t0 + eps), p))
              - float(enthalpy(f64(t0 - eps), p))) / (2 * eps)
        ceff = c.WATER_CP * float(heat_capacity_ratio(f64(t0), p))
        check(f"dh/dT == c_eff at T = {t0} C",
              abs(dh - ceff) / ceff < 1e-6)
    check("enthalpy drop across the freeze band >= L_f",
          float(enthalpy(f64(0.0), p))
          - float(enthalpy(f64(-0.5), p))
          >= float(p.latent_fusion))

    # phi: 0 liquid, 1 frozen, monotone non-increasing in T
    check("phi = 0 above freezing",
          float(ice_fraction(f64(5.0), p)) == 0.0)
    check("phi = 1 below the band",
          float(ice_fraction(f64(-5.0), p)) == 1.0)
    phis = np.asarray(ice_fraction(
        np.linspace(-2.0, 2.0, 101), p))
    check("phi monotone non-increasing in T",
          bool(np.all(np.diff(phis) <= 0)))

    # mixture density: fully frozen zone is ice-buoyant
    check("effective density of frozen zone = rho_ice",
          abs(float(effective_density(f64(-5.0), p))
              - float(p.rho_ice)) < 1e-9)
    check("effective density of liquid zone = rho_w(T)",
          abs(float(effective_density(f64(20.0), p))
              - float(spatial_mod.water_density(f64(20.0)))) < 1e-9)

    # interface mobility: frozen on either side kills the exchange
    mob = interface_mobility(np.asarray([0.0, 1.0, 0.0]))
    check("interface mobility zero against a frozen zone",
          float(mob[0]) == 0.0 and float(mob[1]) == 0.0)

    # pond evaporation magnitudes (WMO open-water range)
    m = float(evaporation_flux(f64(20.0), f64(20.0), f64(0.5), f64(2.0), p))
    mm_day = m / 1000.0 * 86400.0 * 1000.0
    check("evaporation 20 C / 50% RH / 2 m/s in 2-8 mm/day",
          2.0 < mm_day < 8.0)
    q = float(evaporative_cooling_flux(f64(20.0), f64(20.0), f64(0.5),
                                       f64(2.0), p))
    check("evaporative cooling ~ 100-250 W/m^2", 80.0 < q < 250.0)
    check("no evaporation at 100% RH, T_w = T_a",
          float(evaporation_flux(f64(20.0), f64(20.0), f64(1.0), f64(0.0),
                                 p)) == 0.0)

    ok = all(s for _, s in checks)
    if verbose:
        print(f"Phase-change validation: "
              f"{'ALL PASS' if ok else 'FAILURES PRESENT'}")
    return ok


if __name__ == "__main__":
    raise SystemExit(0 if validate_phase() else 1)
