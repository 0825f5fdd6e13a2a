"""
Aqueous carbonate/chlorine chemistry — pure JAX.

All functions are elementwise in pH/temperature and explicitly parameterized
by the equilibrium constants, so a single code path serves:

- scalar API-parity calls (the ``AqueousChemistry`` class below),
- dense per-zone evaluation inside the reactor derivative,
- Monte-Carlo batches where the constants themselves are vmapped arrays.

The Newton-Raphson pH solver is a *fixed-iteration, masked-update* loop: every
lane runs the same instruction stream (SPMD-friendly, no data-dependent trip
count), but lanes stop moving once |delta pH| < tol, which reproduces the
reference's early-exit semantics exactly (chemistry.py:271-330). A Pallas TPU
kernel with the same contract lives in ``ops/ph_solver.py``.

Physics reproduced from the reference (citations per function):
- carbonate speciation alphas         reference core/chemistry.py:158-191
- charge-balance residual + derivative reference core/chemistry.py:193-269
- Newton-Raphson pH solve              reference core/chemistry.py:271-330
- strong acid/base addition            reference core/chemistry.py:332-398
- buffering capacity beta(pH)          reference core/chemistry.py:400-437
- HOCl/OCl- speciation                 reference core/chemistry.py:439-481
- pH-dependent chlorine decay factor   reference core/chemistry.py:483-523
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import constants as c
from ics_wt_physicsengine_tpu.core import thermodynamics as thermo
from ics_wt_physicsengine_tpu.utils.dispatch import align_trailing, array_namespace

LN10 = math.log(10.0)

PH_TOLERANCE = 1e-6
MAX_ITERATIONS = 100
# Newton step cap [pH units/iteration], decayed geometrically per iteration.
# The reference's undamped Newton (chemistry.py:271-330) oscillates without
# converging for strongly alkaline/low-carbonate waters (roots near pH
# 11-13.5 from the pH-7 guess), and a fixed cap can limit-cycle (+cap/-cap
# around the root); a decaying cap breaks the cycle and makes the solve
# globally convergent. For compositions where the reference converges, its
# steps stay far below the cap at every iteration (<= 0.6 initially,
# quadratically shrinking), so results there are bit-identical.
MAX_NEWTON_STEP = 2.0
NEWTON_STEP_DECAY = 0.95


# ---------------------------------------------------------------------------
# Equilibrium-constant bundle
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ChemistryConstants:
    """Temperature-dependent equilibrium constants, cached at the buffer
    temperature exactly like the reference (chemistry.py:116-132) — the
    reference does NOT re-derive them per zone per step, and we match that.

    A pytree of scalars (or batched arrays under vmap).
    """

    Kw: jnp.ndarray
    Ka1: jnp.ndarray
    Ka2: jnp.ndarray
    Ka_HOCl: jnp.ndarray
    C_T_mol: jnp.ndarray   # total carbonate [mol/L]
    alk_eq: jnp.ndarray    # alkalinity [eq/L]


def make_chemistry_constants(alkalinity, total_carbonate, temperature,
                             dtype=None) -> ChemistryConstants:
    """Derive the constant bundle from buffer parameters
    (reference chemistry.py:102-132).

    Host path (NumPy inputs): computed in float64 NumPy — no XLA dispatch —
    then optionally cast. Traced path (JAX inputs): stays in-graph.
    """
    xp = array_namespace(temperature, alkalinity, total_carbonate)
    t = temperature if xp is jnp else np.float64(temperature)
    k = ChemistryConstants(
        Kw=thermo.water_ionization_constant(t),
        Ka1=10.0 ** (-thermo.carbonate_pKa1(t)),
        Ka2=10.0 ** (-thermo.carbonate_pKa2(t)),
        Ka_HOCl=10.0 ** (-thermo.pKa_HOCl(t)),
        C_T_mol=xp.asarray(total_carbonate) / 1000.0,
        alk_eq=xp.asarray(alkalinity) / c.ALK_MG_CACO3_PER_EQ,
    )
    if dtype is not None:
        k = jax.tree_util.tree_map(lambda v: xp.asarray(v, dtype), k)
    return k


# ---------------------------------------------------------------------------
# Pure functions
# ---------------------------------------------------------------------------

def H_from_pH(pH):
    return 10.0 ** (-pH)


def pH_from_H(H):
    return -array_namespace(H).log10(H)


def alpha_carbonate(pH, Ka1, Ka2):
    """Carbonate speciation fractions (alpha0, alpha1, alpha2)
    (reference chemistry.py:158-191)."""
    Ka1 = align_trailing(Ka1, pH)
    Ka2 = align_trailing(Ka2, pH)
    H = H_from_pH(pH)
    D = H * H + Ka1 * H + Ka1 * Ka2
    return H * H / D, Ka1 * H / D, Ka1 * Ka2 / D


def charge_balance_error(pH, k: ChemistryConstants):
    """f(pH) = [H+] - [OH-] + [HCO3-] + 2[CO3--] - alk  [eq/L]
    (reference chemistry.py:193-228)."""
    H = H_from_pH(pH)
    OH = align_trailing(k.Kw, pH) / H
    ct = align_trailing(k.C_T_mol, pH)
    _, a1, a2 = alpha_carbonate(pH, k.Ka1, k.Ka2)
    return H - OH + a1 * ct + 2.0 * a2 * ct - align_trailing(k.alk_eq, pH)


def charge_balance_derivative(pH, k: ChemistryConstants):
    """Analytic df/dpH (reference chemistry.py:230-269)."""
    Kw = align_trailing(k.Kw, pH)
    Ka1 = align_trailing(k.Ka1, pH)
    Ka2 = align_trailing(k.Ka2, pH)
    ct = align_trailing(k.C_T_mol, pH)
    H = H_from_pH(pH)
    dH_dpH = -LN10 * H
    dOH_dpH = -(Kw / (H * H)) * dH_dpH

    D = H * H + Ka1 * H + Ka1 * Ka2
    dD_dH = 2.0 * H + Ka1
    dalpha1_dH = Ka1 * (D - H * dD_dH) / (D * D)
    dalpha2_dH = -Ka1 * Ka2 * dD_dH / (D * D)

    dHCO3_dpH = ct * dalpha1_dH * dH_dpH
    dCO3_dpH = ct * dalpha2_dH * dH_dpH

    return dH_dpH - dOH_dpH + dHCO3_dpH + 2.0 * dCO3_dpH


def solve_pH(k: ChemistryConstants, initial_guess=7.0,
             tolerance: float = PH_TOLERANCE,
             max_iter: int = MAX_ITERATIONS):
    """Fixed-iteration masked Newton-Raphson on the charge balance.

    Elementwise over whatever shape ``initial_guess`` / the constants carry
    (vmap-free batching). Converged lanes freeze (delta masked to 0), so the
    result matches the reference's early-exit loop (chemistry.py:271-330) to
    machine precision while keeping a static trip count for XLA.
    """
    pH0 = jnp.asarray(initial_guess, dtype=jnp.result_type(k.Kw))

    def body(i, carry):
        pH, done = carry
        f = charge_balance_error(pH, k)
        df = charge_balance_derivative(pH, k)
        cap = MAX_NEWTON_STEP * NEWTON_STEP_DECAY ** i
        delta = jnp.clip(-f / df, -cap, cap)
        pH_new = jnp.clip(pH + delta, 0.0, 14.0)
        newly_done = jnp.abs(delta) < tolerance
        pH = jnp.where(done, pH, pH_new)
        return pH, done | newly_done

    pH, _ = jax.lax.fori_loop(
        0, max_iter, body, (pH0, jnp.zeros_like(pH0, dtype=bool))
    )
    return pH


def solve_pH_host(k: ChemistryConstants, initial_guess=7.0,
                  tolerance: float = PH_TOLERANCE,
                  max_iter: int = MAX_ITERATIONS) -> float:
    """Host-side (NumPy scalar) Newton-Raphson with the reference's exact
    control flow, including RuntimeError on non-convergence
    (chemistry.py:271-330). Used by the API-parity wrapper; the jittable
    ``solve_pH`` above is the device path."""
    pH = float(initial_guess)
    f = float("nan")
    for i in range(max_iter):
        f = float(charge_balance_error(np.float64(pH), k))
        df = float(charge_balance_derivative(np.float64(pH), k))
        if abs(df) < 1e-15:
            raise RuntimeError(
                f"Derivative too small at pH={pH:.3f}, cannot continue")
        cap = MAX_NEWTON_STEP * NEWTON_STEP_DECAY ** i
        delta = min(max(-f / df, -cap), cap)
        pH_new = min(max(pH + delta, 0.0), 14.0)
        if abs(delta) < tolerance:
            return pH_new
        pH = pH_new
    raise RuntimeError(
        f"pH calculation did not converge after {max_iter} iterations. "
        f"Final pH={pH:.3f}, error={f:.2e}")


def pH_after_alkalinity_shift(k: ChemistryConstants, delta_alk_eq, current_pH):
    """Re-solve pH after shifting alkalinity by ``delta_alk_eq`` [eq/L] —
    the primitive behind strong acid/base addition (chemistry.py:332-398)."""
    k_shifted = ChemistryConstants(
        Kw=k.Kw, Ka1=k.Ka1, Ka2=k.Ka2, Ka_HOCl=k.Ka_HOCl,
        C_T_mol=k.C_T_mol, alk_eq=k.alk_eq + delta_alk_eq,
    )
    return solve_pH(k_shifted, initial_guess=current_pH)


def buffering_capacity(pH, k: ChemistryConstants):
    """beta(pH) = water + carbonate contributions (chemistry.py:400-437)."""
    H = H_from_pH(pH)
    beta_water = 2.303 * (H + align_trailing(k.Kw, pH) / H)
    a0, a1, a2 = alpha_carbonate(pH, k.Ka1, k.Ka2)
    beta_carb = 2.303 * align_trailing(k.C_T_mol, pH) \
        * (a0 * a1 + 4.0 * a1 * a2 + a0 * a2)
    return beta_water + beta_carb


def hocl_fraction(pH, Ka_HOCl):
    """alpha_HOCl = [H+] / ([H+] + Ka) (chemistry.py:464-470)."""
    H = H_from_pH(pH)
    return H / (H + align_trailing(Ka_HOCl, pH))


def pH_dependent_chlorine_decay_factor(pH, Ka_HOCl):
    """Weighted decay multiplier: HOCl at 1.0, OCl- at 0.02
    (chemistry.py:483-523)."""
    a_hocl = hocl_fraction(pH, Ka_HOCl)
    return a_hocl * 1.0 + (1.0 - a_hocl) * c.K_OCL_RELATIVE


# ---------------------------------------------------------------------------
# API-parity wrappers (reference chemistry.py:54-523)
# ---------------------------------------------------------------------------

@dataclass
class BufferSystem:
    """Buffer parameters (reference chemistry.py:54-80)."""

    alkalinity: float              # [mg/L as CaCO3]
    total_carbonate: float         # [mmol/L]
    temperature: float = 20.0      # [C]

    def validate(self) -> None:
        if self.alkalinity < 0:
            raise ValueError(f"Alkalinity cannot be negative: {self.alkalinity}")
        if self.total_carbonate < 0:
            raise ValueError(
                f"Total carbonate cannot be negative: {self.total_carbonate}"
            )
        if self.temperature < 0 or self.temperature > 40:
            warnings.warn(
                f"Temperature {self.temperature}C outside typical range [0, 40]"
            )


class AqueousChemistry:
    """Drop-in replacement for the reference class (chemistry.py:83-523)."""

    CACO3_MW = c.CACO3_MW
    PH_TOLERANCE = PH_TOLERANCE
    MAX_ITERATIONS = MAX_ITERATIONS

    def __init__(self, buffer_system: BufferSystem, dtype=None):
        buffer_system.validate()
        self.buffer = buffer_system
        self.thermo = thermo.TemperatureDependentKinetics()
        # The wrapper computes on the host in NumPy float64 (no XLA dispatch);
        # ``dtype`` is kept for constructing traced constants on demand.
        self._dtype = dtype
        self._update_temperature_constants()

    def _update_temperature_constants(self) -> None:
        self.constants = make_chemistry_constants(
            self.buffer.alkalinity, self.buffer.total_carbonate,
            self.buffer.temperature,
        )
        self.Kw = float(self.constants.Kw)
        self.pKw = -math.log10(self.Kw)
        self.pKa1 = float(thermo.carbonate_pKa1(self.buffer.temperature))
        self.Ka1 = float(self.constants.Ka1)
        self.pKa2 = float(thermo.carbonate_pKa2(self.buffer.temperature))
        self.Ka2 = float(self.constants.Ka2)
        self.pKa_HOCl = float(thermo.pKa_HOCl(self.buffer.temperature))
        self.Ka_HOCl = float(self.constants.Ka_HOCl)

    # -- scalar/array API (host NumPy path; pass jax arrays for in-graph) --
    def H_from_pH(self, pH):
        return H_from_pH(np.asarray(pH))

    def pH_from_H(self, H):
        return pH_from_H(np.asarray(H))

    def alpha_carbonate(self, pH):
        return alpha_carbonate(np.asarray(pH),
                               self.constants.Ka1, self.constants.Ka2)

    def charge_balance_error(self, pH):
        return charge_balance_error(np.asarray(pH), self.constants)

    def charge_balance_derivative(self, pH):
        return charge_balance_derivative(np.asarray(pH), self.constants)

    def calculate_pH(self, initial_guess: float = 7.0,
                     tolerance: float = PH_TOLERANCE,
                     max_iter: int = MAX_ITERATIONS):
        return solve_pH_host(self.constants, initial_guess,
                             tolerance=tolerance, max_iter=max_iter)

    def add_acid(self, volume_L: float, acid_mol: float, current_pH: float):
        """New pH after strong-acid addition (chemistry.py:332-370)."""
        k = self.constants
        delta_alk_eq = -(acid_mol / volume_L)
        k_shifted = ChemistryConstants(
            Kw=k.Kw, Ka1=k.Ka1, Ka2=k.Ka2, Ka_HOCl=k.Ka_HOCl,
            C_T_mol=k.C_T_mol, alk_eq=k.alk_eq + delta_alk_eq)
        return solve_pH_host(k_shifted, initial_guess=current_pH)

    def add_base(self, volume_L: float, base_mol: float, current_pH: float):
        """New pH after strong-base addition (chemistry.py:372-398)."""
        k = self.constants
        delta_alk_eq = base_mol / volume_L
        k_shifted = ChemistryConstants(
            Kw=k.Kw, Ka1=k.Ka1, Ka2=k.Ka2, Ka_HOCl=k.Ka_HOCl,
            C_T_mol=k.C_T_mol, alk_eq=k.alk_eq + delta_alk_eq)
        return solve_pH_host(k_shifted, initial_guess=current_pH)

    def buffering_capacity(self, pH):
        return buffering_capacity(np.asarray(pH), self.constants)

    def chlorine_speciation(self, total_chlorine_mg_L, pH):
        a_hocl = hocl_fraction(np.asarray(pH), self.constants.Ka_HOCl)
        a_ocl = 1.0 - a_hocl
        return {
            "HOCl": a_hocl * total_chlorine_mg_L,
            "OCl": a_ocl * total_chlorine_mg_L,
            "HOCl_fraction": a_hocl,
            "OCl_fraction": a_ocl,
            "effective_disinfection": a_hocl,
        }

    def pH_dependent_chlorine_decay_factor(self, pH):
        return pH_dependent_chlorine_decay_factor(
            np.asarray(pH), self.constants.Ka_HOCl)


def validate_chemistry() -> None:
    """Oracle suite (reference chemistry.py:526-565)."""
    buffer = BufferSystem(alkalinity=100, total_carbonate=2.0, temperature=20)
    chem = AqueousChemistry(buffer)

    pH = chem.calculate_pH()
    assert 6.0 < pH < 9.0, f"pH {pH} outside expected range"

    a0, a1, a2 = chem.alpha_carbonate(pH)
    assert abs(float(a0 + a1 + a2) - 1.0) < 1e-6, "Alphas don't sum to 1"

    pH_after_acid = chem.add_acid(1000, 0.001, pH)
    assert pH_after_acid < pH, "Acid should decrease pH"

    pH_after_base = chem.add_base(1000, 0.001, pH)
    assert pH_after_base > pH, "Base should increase pH"

    beta_635 = float(chem.buffering_capacity(6.35))
    beta_80 = float(chem.buffering_capacity(8.0))
    assert beta_635 > beta_80, "Buffering should be stronger near pKa"

    spec = chem.chlorine_speciation(2.0, 7.0)
    assert abs(float(spec["HOCl"] + spec["OCl"]) - 2.0) < 1e-6, \
        "Chlorine doesn't balance"

    print("All chemistry validations passed")
