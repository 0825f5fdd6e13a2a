"""
Gas exchange: dissolved oxygen and CO2 <-> atmosphere.

The reference explicitly lists "No gas exchange (O2, CO2 dissolution)" as a
physics limitation (reference README.md:521). This module delivers that axis
TPU-natively: pure vectorized rate laws over ``[..., Z]`` zone arrays that
ride the same fixed-step integrators as the core physics (gas transfer is a
slow process — kLa ~ 1e-5..1e-3 1/s — so the global substep budget is
untouched; no operator split needed, unlike chloramination).

Processes (all opt-in via ``ReactorConfiguration(enable_gas=True)``):

- **Surface O2/CO2 transfer (two-film theory)**: the free surface exchanges
  with the atmosphere at rate ``k_L * A / V_top = k_L / h_zone`` [1/s]
  applied to the TOP zone only (zone ``Z-1`` — zone 0 is the tank bottom,
  ``spatial.py`` zone_centers), driving each gas toward its saturation
  value. CO2's film coefficient is scaled by ``sqrt(D_CO2 / D_O2)``
  (penetration theory, Higbie 1935).
- **Diffused aeration**: an optional volumetric ``aeration_kla`` [1/s]
  boundary forcing (an actuator — air flow is a controllable input) that
  drives ALL zones toward saturation for both gases. Its classic side
  effect falls out of the coupling for free: bubbling air through water
  strips dissolved CO2 and RAISES pH.
- **O2 saturation**: Benson & Krause (1984) fifth-order fit as published in
  APHA Standard Methods 4500-O (freshwater, 1 atm): 14.62 mg/L at 0 C,
  9.09 at 20 C.
- **CO2 solubility**: Henry's law with van't Hoff temperature correction,
  K_H(25C) = 0.034 mol/(L atm), d(ln K)/d(1/T) = 2400 K (Sander 2015).
  Dissolved CO2 is the alpha0 fraction of the total carbonate pool.
- **Carbonate <-> pH coupling**: CO2 dissolution adds H2CO3* to the total
  carbonate C_T at CONSTANT alkalinity; the equilibrium pH shift follows
  from the charge balance f(pH, C_T) = 0:

      dpH/dC_T |_Alk = -(alpha1 + 2 alpha2) / beta,

  with beta the same Van Slyke buffering capacity the acid-dosing path
  uses (chemistry.buffering_capacity) — so aerating low-alkalinity water
  relaxes its pH toward the textbook atmospheric-CO2 equilibrium (~5.6 at
  420 ppm), and stripping CO2 raises pH, both thermodynamically
  consistently with the dosing chemistry.
- **Biology coupling** (when ``enable_nitrogen`` is also on): nitrification
  consumes 3.43 g O2 / g N (AOB) + 1.14 g O2 / g N (NOB) and is
  Monod-limited in O2 (K_O2 ~ 0.5 mg/L, EPA nitrogen-control manual);
  denitrification is INHIBITED by O2 (K_I ~ 0.2 mg/L) — anoxic zones emerge
  from the physics instead of being declared.

Validation: ``validate_gas()`` checks literature oracles (Benson-Krause
table values, Henry constant, the 0.63 mg/L dissolved-CO2 atmospheric
equilibrium, theta ratio) and structural invariants (saturation is a fixed
point, coupling signs); the end-to-end pH relaxation toward the
atmospheric equilibrium is checked in tests/test_gas.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import chemistry as chem
from ics_wt_physicsengine_tpu.utils.dispatch import align_trailing, array_namespace

# molar masses [g/mol]
MW_O2 = 31.9988
MW_CO2 = 44.0095

# mg/L per mol/L
_O2_MGL_PER_MOL = MW_O2 * 1000.0
_CO2_MGL_PER_MOL = MW_CO2 * 1000.0

# molecular diffusivities in water at 25 C [m^2/s] — sets the film-coefficient
# ratio k_L,CO2 / k_L,O2 = sqrt(D_CO2 / D_O2) (penetration theory)
D_O2_25C = 2.10e-9
D_CO2_25C = 1.92e-9
CO2_FILM_RATIO = float(np.sqrt(D_CO2_25C / D_O2_25C))   # ~0.956

# nitrification oxygen stoichiometry [g O2 / g N] (Metcalf & Eddy)
O2_PER_N_AOB = 3.43
O2_PER_N_NOB = 1.14


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GasParams:
    """Gas-exchange parameters as a pytree of traced scalars (batchable like
    ReactorParams — parameter uncertainty is data, not code)."""

    kl_surface: jnp.ndarray = None     # [m/s] surface film coefficient (O2)
    theta_kla: jnp.ndarray = None      # kLa temperature model (ASCE 1.024)
    p_o2_atm: jnp.ndarray = None       # [atm] O2 partial pressure
    p_co2_atm: jnp.ndarray = None      # [atm] CO2 partial pressure
    K_o2_nitrif: jnp.ndarray = None    # [mg/L] Monod half-sat, nitrification
    K_o2_denit: jnp.ndarray = None     # [mg/L] O2 inhibition, denitrification


def make_gas_params(kl_surface: float = 2.0e-5, theta_kla: float = 1.024,
                    p_o2_atm: float = 0.2095, p_co2_atm: float = 420e-6,
                    K_o2_nitrif: float = 0.5, K_o2_denit: float = 0.2,
                    dtype=jnp.float32) -> GasParams:
    a = lambda x: np.asarray(x, dtype)  # noqa: E731
    return GasParams(
        kl_surface=a(kl_surface), theta_kla=a(theta_kla),
        p_o2_atm=a(p_o2_atm), p_co2_atm=a(p_co2_atm),
        K_o2_nitrif=a(K_o2_nitrif), K_o2_denit=a(K_o2_denit))


# ---------------------------------------------------------------------------
# Saturation / solubility (pure, vectorized)
# ---------------------------------------------------------------------------

def oxygen_saturation(T_C):
    """Dissolved-O2 saturation [mg/L] in freshwater at 1 atm.

    Benson & Krause (1984) as adopted by APHA Standard Methods 4500-O:
    14.62 at 0 C, 9.09 at 20 C, 8.26 at 25 C."""
    xp = array_namespace(T_C)
    T = T_C + 273.15
    lnC = (-139.34411 + 1.575701e5 / T - 6.642308e7 / T ** 2
           + 1.2438e10 / T ** 3 - 8.621949e11 / T ** 4)
    return xp.exp(lnC)


def co2_henry_constant(T_C):
    """Henry solubility K_H(T) [mol/(L atm)] for CO2 in water.

    van't Hoff form around 25 C: K_H = 0.034 exp(2400 (1/T - 1/298.15))
    (Sander 2015 compilation)."""
    xp = array_namespace(T_C)
    T = T_C + 273.15
    return 0.034 * xp.exp(2400.0 * (1.0 / T - 1.0 / 298.15))


def co2_saturation_mol(T_C, p_co2_atm):
    """Equilibrium dissolved CO2 (as H2CO3*) [mol/L] under partial pressure
    ``p_co2_atm``: ~1.4e-5 M (0.63 mg/L) at 25 C, 420 ppm."""
    return co2_henry_constant(T_C) * p_co2_atm


def kla_temperature(kla_20, T_C, theta):
    """kLa(T) = kLa(20C) * theta^(T-20) (ASCE standard, theta = 1.024)."""
    return kla_20 * theta ** (T_C - 20.0)


# ---------------------------------------------------------------------------
# Carbonate <-> pH coupling
# ---------------------------------------------------------------------------

def ph_per_carbonate(pH, k: chem.ChemistryConstants):
    """dpH/dC_T at constant alkalinity [pH per (mol/L)]:

        -(alpha1 + 2 alpha2) / beta(pH)

    from implicit differentiation of the charge balance. Negative: adding
    CO2 lowers pH; stripping it raises pH. ``k.C_T_mol`` must already carry
    the DYNAMIC per-zone carbonate (reactor.derivatives builds that bundle
    when gas exchange is on)."""
    _, a1, a2 = chem.alpha_carbonate(pH, k.Ka1, k.Ka2)
    beta = chem.buffering_capacity(pH, k)
    return -(a1 + 2.0 * a2) / beta


# ---------------------------------------------------------------------------
# Biology coupling factors (used by reactor.derivatives when both the
# nitrogen and gas axes are enabled)
# ---------------------------------------------------------------------------

def o2_monod(o2, K):
    """Monod O2 limitation factor for aerobic processes."""
    o2 = jnp.maximum(o2, 0.0)
    return o2 / (align_trailing(K, o2) + o2)


def o2_inhibition(o2, K_I):
    """O2 inhibition factor for anoxic processes (denitrification)."""
    o2 = jnp.maximum(o2, 0.0)
    K_I = align_trailing(K_I, o2)
    return K_I / (K_I + o2)


# ---------------------------------------------------------------------------
# Validation (literature oracles + structural invariants)
# ---------------------------------------------------------------------------

def validate_gas(verbose: bool = True) -> bool:
    """Validation suite in the reference's ``validate_*`` style
    (e.g. reference thermodynamics.py:386-450)."""
    p = make_gas_params(dtype=jnp.float64)
    checks = []

    def check(name, ok):
        checks.append((name, bool(ok)))
        if verbose:
            print(f"  {'PASS' if ok else 'FAIL'}: {name}")

    f64 = np.float64

    # Benson-Krause table values (APHA 4500-O, freshwater, 1 atm)
    check("O2 saturation at 0 C = 14.62 mg/L",
          abs(float(oxygen_saturation(f64(0.0))) - 14.62) < 0.05)
    check("O2 saturation at 20 C = 9.09 mg/L",
          abs(float(oxygen_saturation(f64(20.0))) - 9.09) < 0.05)
    check("O2 saturation at 25 C = 8.26 mg/L",
          abs(float(oxygen_saturation(f64(25.0))) - 8.26) < 0.05)
    # colder water holds more gas, monotonically
    sat = oxygen_saturation(np.linspace(0.0, 40.0, 41))
    check("O2 saturation monotonically decreasing in T",
          bool(np.all(np.diff(np.asarray(sat)) < 0)))

    # Henry constant and the atmospheric dissolved-CO2 equilibrium
    kh25 = float(co2_henry_constant(f64(25.0)))
    check("CO2 Henry K_H(25C) = 0.034 mol/(L atm)",
          abs(kh25 - 0.034) < 1e-4)
    co2_eq = float(co2_saturation_mol(f64(25.0), 420e-6)) * _CO2_MGL_PER_MOL
    check("dissolved CO2 at 420 ppm, 25C ~ 0.63 mg/L",
          abs(co2_eq - 0.628) < 0.02)

    # kLa theta model: r(30)/r(20) = theta^10
    r = float(kla_temperature(f64(1.0), f64(30.0), f64(1.024))
              / kla_temperature(f64(1.0), f64(20.0), f64(1.024)))
    check("kLa theta ratio r(30C)/r(20C) = 1.024^10",
          abs(r - 1.024 ** 10) < 1e-9)

    # penetration-theory film ratio
    check("CO2/O2 film ratio = sqrt(D ratio) ~ 0.956",
          abs(CO2_FILM_RATIO - 0.956) < 0.002)

    # coupling sign: adding CO2 lowers pH, with the pure-water magnitude
    # -(alpha1)/beta at pH 7 (alpha2 negligible there)
    k = chem.make_chemistry_constants(
        alkalinity=f64(100.0), total_carbonate=f64(2.0),
        temperature=f64(25.0))
    dpH_dCT = float(ph_per_carbonate(jnp.float64(7.0), k))
    check("dpH/dC_T < 0 (CO2 acidifies)", dpH_dCT < 0.0)
    a0, a1, a2 = chem.alpha_carbonate(jnp.float64(7.0), k.Ka1, k.Ka2)
    beta = chem.buffering_capacity(jnp.float64(7.0), k)
    expected = -float((a1 + 2.0 * a2) / beta)
    check("dpH/dC_T matches -(a1+2a2)/beta analytically",
          abs(dpH_dCT - expected) < 1e-12)

    # Monod / inhibition limits
    check("O2 Monod -> 0 at O2 = 0",
          float(o2_monod(jnp.float64(0.0), p.K_o2_nitrif)) == 0.0)
    check("O2 Monod -> 1 at O2 >> K",
          abs(float(o2_monod(jnp.float64(1e3), p.K_o2_nitrif)) - 1.0) < 1e-3)
    check("denitrification inhibition -> 1 at O2 = 0",
          abs(float(o2_inhibition(jnp.float64(0.0), p.K_o2_denit)) - 1.0)
          < 1e-12)
    check("denitrification inhibition -> 0 at O2 >> K_I",
          float(o2_inhibition(jnp.float64(1e3), p.K_o2_denit)) < 1e-3)

    ok = all(s for _, s in checks)
    if verbose:
        print(f"Gas exchange validation: "
              f"{'ALL PASS' if ok else 'FAILURES PRESENT'}")
    return ok


if __name__ == "__main__":
    raise SystemExit(0 if validate_gas() else 1)
