"""
Nitrogen / biological chemistry: nitrification, denitrification, and
chlorine-ammonia (chloramine) interaction.

The reference explicitly lists "no biological processes" as a limitation
(reference README.md:304,521) and "Advanced chemistry (nitrification/
denitrification)" on its roadmap (reference README.md:448). This module
delivers that axis TPU-natively: pure vectorized rate laws over ``[..., Z]``
zone arrays that ride the same fixed-step integrators as the core physics,
plus an analytic operator-split for the one FAST reaction (chloramine
formation, pseudo-first-order rate ~60 1/s at 2 mg/L free chlorine) so the
slow-process substep count — and therefore throughput — is unchanged.

Processes (all opt-in via ``ReactorConfiguration(enable_nitrogen=True)``):

- **Nitrification step 1 (AOB)**: NH4+ -> NO2-, Monod in total ammonia
  nitrogen with theta-model temperature correction (theta=1.072, EPA
  nitrogen-control manual), releasing 2 H+ per N oxidized (alkalinity
  consumption 7.14 g CaCO3 / g N) — coupled into the pH equation through
  the same buffering-capacity chain rule the acid dosing uses.
- **Nitrification step 2 (NOB)**: NO2- -> NO3-, Monod, theta=1.06.
- **Denitrification**: NO3- -> N2 (leaves the system), Monod, consuming
  1 H+ per N (alkalinity recovery 3.57 g CaCO3 / g N); zero by default
  (aerobic plant) — enable with ``k_denit``.
- **Chloramination**: HOCl + NH3 -> NH2Cl (monochloramine, tracked in
  mg/L as Cl2, the convention of combined-chlorine measurement). The rate
  constant is Morris & Isaac's k(T) = 6.6e8 exp(-1510/T_K) 1/(M s),
  applied to the REACTIVE species fractions: alpha_HOCl from the core
  carbonate/HOCl speciation (chemistry.py Ka_HOCl) and alpha_NH3 from the
  temperature-dependent ammonium pKa (Emerson et al. 1975) — this is the
  axis that stresses the speciation chemistry hardest. Integrated
  analytically per step (exact second-order A+B solution) as an operator
  split, because its timescale (seconds) would otherwise set the global
  substep count.

Validation: ``validate_nitrogen()`` checks literature oracles (theta
ratios, NH3 fraction = 0.5 at pH = pKa, Morris rate at 25 C, chloramine
Cl:N mass stoichiometry 5.06) and structural invariants (extent bounded by
both reagents, exact limiting behavior); closed-batch nitrogen
conservation is checked end-to-end in tests/test_nitrogen.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# molar masses [g/mol]
MW_N = 14.0067
MW_CL2 = 70.906
# mg/L -> mol/L divisors
_N_MGL_PER_MOL = MW_N * 1000.0
_CL2_MGL_PER_MOL = MW_CL2 * 1000.0

SECONDS_PER_DAY = 86400.0


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NitrogenParams:
    """Kinetic parameters as a pytree of traced scalars (batchable like
    ReactorParams — parameter uncertainty is data, not code)."""

    # AOB nitrification: zero-order max rate with Monod saturation
    k_nitrif: jnp.ndarray = None        # [mg N/L/day] at 20 C
    K_nh: jnp.ndarray = None            # [mg N/L] half saturation
    theta_aob: jnp.ndarray = None       # temperature theta model

    # NOB nitratation
    k_nitrat: jnp.ndarray = None        # [mg N/L/day] at 20 C
    K_no2: jnp.ndarray = None           # [mg N/L]
    theta_nob: jnp.ndarray = None

    # denitrification (0 = off; aerobic plant default)
    k_denit: jnp.ndarray = None         # [mg N/L/day] at 20 C
    K_no3: jnp.ndarray = None           # [mg N/L]
    theta_dn: jnp.ndarray = None

    # chloramination (Morris & Isaac 1983: k = A exp(-B / T_K) [1/(M s)])
    k_cm_A: jnp.ndarray = None
    k_cm_B: jnp.ndarray = None
    # monochloramine auto-decomposition (slow, first order)
    k_cm_decay: jnp.ndarray = None      # [1/day]


def make_nitrogen_params(k_nitrif: float = 2.0, K_nh: float = 1.0,
                         theta_aob: float = 1.072,
                         k_nitrat: float = 3.0, K_no2: float = 0.5,
                         theta_nob: float = 1.06,
                         k_denit: float = 0.0, K_no3: float = 0.5,
                         theta_dn: float = 1.07,
                         k_cm_A: float = 6.6e8, k_cm_B: float = 1510.0,
                         k_cm_decay: float = 0.02,
                         dtype=jnp.float32) -> NitrogenParams:
    a = lambda x: np.asarray(x, dtype)  # noqa: E731
    return NitrogenParams(
        k_nitrif=a(k_nitrif), K_nh=a(K_nh), theta_aob=a(theta_aob),
        k_nitrat=a(k_nitrat), K_no2=a(K_no2), theta_nob=a(theta_nob),
        k_denit=a(k_denit), K_no3=a(K_no3), theta_dn=a(theta_dn),
        k_cm_A=a(k_cm_A), k_cm_B=a(k_cm_B), k_cm_decay=a(k_cm_decay))


# ---------------------------------------------------------------------------
# Rate laws (pure, vectorized)
# ---------------------------------------------------------------------------

def ammonium_pKa(T_C):
    """NH4+ acid dissociation pKa(T) (Emerson et al. 1975):
    pKa = 0.09018 + 2729.92 / T_K. 9.245 at 25 C."""
    return 0.09018 + 2729.92 / (T_C + 273.15)


def ammonia_fraction_nh3(pH, T_C):
    """Fraction of total ammonia present as reactive NH3 (un-ionized)."""
    return 1.0 / (1.0 + 10.0 ** (ammonium_pKa(T_C) - pH))


def _theta(theta, T_C):
    return theta ** (T_C - 20.0)


def nitrification_rate(tan, T_C, p: NitrogenParams):
    """AOB: NH4+ -> NO2- [mg N/L/s], Monod in TAN, theta T-correction."""
    tan = jnp.maximum(tan, 0.0)
    return (p.k_nitrif / SECONDS_PER_DAY) * _theta(p.theta_aob, T_C) \
        * tan / (p.K_nh + tan)


def nitratation_rate(no2, T_C, p: NitrogenParams):
    """NOB: NO2- -> NO3- [mg N/L/s]."""
    no2 = jnp.maximum(no2, 0.0)
    return (p.k_nitrat / SECONDS_PER_DAY) * _theta(p.theta_nob, T_C) \
        * no2 / (p.K_no2 + no2)


def denitrification_rate(no3, T_C, p: NitrogenParams):
    """NO3- -> N2 (leaves the water) [mg N/L/s]."""
    no3 = jnp.maximum(no3, 0.0)
    return (p.k_denit / SECONDS_PER_DAY) * _theta(p.theta_dn, T_C) \
        * no3 / (p.K_no3 + no3)


def chloramination_rate_constant(T_C, p: NitrogenParams):
    """Morris & Isaac k(T) [1/(M s)] for HOCl + NH3 -> NH2Cl.
    ~3.1e6 at 25 C."""
    return p.k_cm_A * jnp.exp(-p.k_cm_B / (T_C + 273.15))


def hocl_fraction(pH, Ka_HOCl):
    """alpha_HOCl of free chlorine (same speciation the decay factor uses,
    chemistry.py:439-481)."""
    H = 10.0 ** (-jnp.clip(pH, 0.0, 14.0))
    return H / (H + Ka_HOCl)


def chloramination_extent(cl_mgL, tan_mgNL, pH, T_C, Ka_HOCl,
                          p: NitrogenParams, dt: float):
    """Exact extent x [mol/L] of HOCl + NH3 -> NH2Cl over one step of
    length ``dt`` seconds.

    Treats the free-chlorine and total-ammonia pools as the reservoirs
    (intra-pool speciation re-equilibrates much faster than the reaction
    consumes it) with the effective bimolecular rate
    k_eff = k(T) * alpha_HOCl * alpha_NH3, and integrates the second-order
    A + B -> P system analytically:

      unequal pools:  x = C N (1 - E) / (C - N E),  E = exp(-k (C-N) dt)
      equal pools:    x = k C^2 dt / (1 + k C dt)

    This is the operator split that keeps the fast chloramination
    timescale (pseudo-first-order ~60 1/s at 2 mg/L Cl2) out of the global
    substep budget. Exact for frozen speciation fractions over the step;
    the split error is validated against a brute-force fine-substep ODE
    reference in tests/test_nitrogen.py.
    """
    C = jnp.maximum(cl_mgL, 0.0) / _CL2_MGL_PER_MOL     # mol/L as Cl2
    N = jnp.maximum(tan_mgNL, 0.0) / _N_MGL_PER_MOL     # mol/L as N
    k_eff = chloramination_rate_constant(T_C, p) \
        * hocl_fraction(pH, Ka_HOCl) * ammonia_fraction_nh3(pH, T_C)
    kd = k_eff * dt
    # the extent is symmetric in the two pools: order them so the decaying
    # exponential form is numerically safe for any imbalance (the naive
    # C-N form overflows exp() when the other pool is larger)
    A = jnp.maximum(C, N)
    B = jnp.minimum(C, N)
    D = A - B
    # guard the near-equal-pool limit (the general formula is 0/0 there);
    # threshold is RELATIVE — absolute pools are ~1e-5 M. <= so EXACTLY
    # equal pools (including both-zero) take the safe branch.
    near = D <= 1e-6 * A
    E = jnp.exp(-kd * jnp.where(near, 0.0, D))
    x_neq = A * B * (1.0 - E) / jnp.where(near, 1.0, A - B * E)
    x_eq = A * B * kd / (1.0 + B * kd)
    x = jnp.where(near, x_eq, x_neq)
    return jnp.clip(x, 0.0, B)


# mol H+ released per mol N by each process (net, at drinking-water pH
# where NH4+ dominates): nitrification +2, denitrification -1,
# chloramination +1 (NH4+ + HOCl -> NH2Cl + H2O + H+).
H_PER_N_NITRIF = 2.0
H_PER_N_DENIT = -1.0
H_PER_N_CHLORAMINE = 1.0


def total_nitrogen_mgN(nh, no2, no3, nhcl):
    """Total nitrogen per zone [mg N/L] incl. the N bound in
    monochloramine (tracked in mg/L as Cl2 -> x MW_N / MW_CL2)."""
    return nh + no2 + no3 + nhcl * (MW_N / MW_CL2)


# ---------------------------------------------------------------------------
# Validation (literature oracles + structural invariants)
# ---------------------------------------------------------------------------

def validate_nitrogen(verbose: bool = True) -> bool:
    """Validation suite in the reference's ``validate_*`` style
    (e.g. reference thermodynamics.py:386-450)."""
    p = make_nitrogen_params(dtype=jnp.float64)
    checks = []

    def check(name, ok):
        checks.append((name, bool(ok)))
        if verbose:
            print(f"  {'PASS' if ok else 'FAIL'}: {name}")

    # theta temperature model: r(30)/r(20) = theta^10 (EPA theta=1.072
    # doubles the rate per ~10 C)
    r20 = nitrification_rate(jnp.float64(100.0), jnp.float64(20.0), p)
    r30 = nitrification_rate(jnp.float64(100.0), jnp.float64(30.0), p)
    check("AOB theta ratio r(30C)/r(20C) = 1.072^10",
          abs(float(r30 / r20) - 1.072 ** 10) < 1e-6)

    # Monod saturation: rate at TAN >> K approaches k_max
    r_sat = nitrification_rate(jnp.float64(1e6), jnp.float64(20.0), p)
    check("Monod saturation -> k_max",
          abs(float(r_sat) * SECONDS_PER_DAY - 2.0) < 1e-3)

    # ammonium pKa at 25 C = 9.245 (Emerson et al. 1975)
    check("NH4+ pKa(25C) = 9.245",
          abs(float(ammonium_pKa(jnp.float64(25.0))) - 9.245) < 0.01)

    # NH3 fraction is exactly 1/2 at pH = pKa; ~0.5% at pH 7, 25 C
    pka = float(ammonium_pKa(jnp.float64(25.0)))
    check("alpha_NH3(pH=pKa) = 0.5",
          abs(float(ammonia_fraction_nh3(jnp.float64(pka), 25.0)) - 0.5)
          < 1e-9)
    check("alpha_NH3(pH 7, 25C) ~ 0.57%",
          abs(float(ammonia_fraction_nh3(jnp.float64(7.0), 25.0)) - 0.0057)
          < 5e-4)

    # Morris & Isaac rate constant at 25 C ~ 4.2e6 / (M s) within a factor
    # accounting for the Arrhenius fit (3.1e6 from A exp(-B/T))
    k25 = float(chloramination_rate_constant(jnp.float64(25.0), p))
    check("chloramination k(25C) in 2e6..6e6 1/(M s)", 2e6 < k25 < 6e6)

    # stoichiometry: the classic 5:1 Cl2:N mass ratio
    check("Cl2:N mass stoichiometry = 5.06",
          abs(MW_CL2 / MW_N - 5.06) < 0.01)

    # extent: bounded by the limiting reagent, exact in the t->inf limit
    x = chloramination_extent(jnp.float64(2.0), jnp.float64(10.0),
                              jnp.float64(8.0), jnp.float64(25.0),
                              jnp.float64(10 ** -7.5), p, dt=1e9)
    check("extent -> limiting reagent (Cl2-limited)",
          abs(float(x) * _CL2_MGL_PER_MOL - 2.0) < 1e-6)
    x2 = chloramination_extent(jnp.float64(20.0), jnp.float64(1.0),
                               jnp.float64(8.0), jnp.float64(25.0),
                               jnp.float64(10 ** -7.5), p, dt=1e9)
    check("extent -> limiting reagent (N-limited)",
          abs(float(x2) * _N_MGL_PER_MOL - 1.0) < 1e-6)

    # the two formula branches agree across the near-equal switch point
    # (imbalance just below vs just above the 1e-6 relative threshold)
    kwargs = dict(pH=jnp.float64(8.0), T_C=jnp.float64(25.0),
                  Ka_HOCl=jnp.float64(10 ** -7.5), p=p, dt=1.0)
    n_eq = 2.0 * MW_N / MW_CL2       # same mol/L as 2.0 mg/L Cl2
    xa = chloramination_extent(jnp.float64(2.0),
                               jnp.float64(n_eq * (1 + 2e-6)), **kwargs)
    xb = chloramination_extent(jnp.float64(2.0),
                               jnp.float64(n_eq * (1 + 0.5e-6)), **kwargs)
    # precision-aware tolerance: the general branch's 1-exp() cancels near
    # the switch, so f32 (x64 disabled — e.g. the TPU default backend)
    # legitimately carries ~3e-3 relative there; f64 carries <1e-5
    f64_active = jnp.zeros((), jnp.float64).dtype == jnp.dtype("float64")
    tol = 1e-5 if f64_active else 1e-2
    check(f"branch switch continuous (rel diff < {tol})",
          abs(float(xa) - float(xb)) < tol * float(xb))

    ok = all(s for _, s in checks)
    if verbose:
        print(f"Nitrogen chemistry validation: "
              f"{'ALL PASS' if ok else 'FAILURES PRESENT'}")
    return ok


if __name__ == "__main__":
    raise SystemExit(0 if validate_nitrogen() else 1)
