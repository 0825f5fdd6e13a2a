"""
Disinfection: pathogen inactivation, CT credit, UV dose, and DBP formation.

The reference simulates the chlorine RESIDUAL (reference reactor.py:378-411)
but never the thing the residual is for — killing pathogens — and lists
"Disinfection byproduct (DBP) formation" on its roadmap (reference
README.md:449). This module delivers the disinfection axis TPU-natively:
pure vectorized rate laws over ``[..., Z]`` zone arrays (pathogen classes on
a leading ``[..., P, Z]`` class axis, the same layout as the particle
classes) that ride the same fixed-step integrators as the core physics.

Processes (all opt-in via ``ReactorConfiguration(enable_disinfection=True)``):

- **Chick-Watson chlorine inactivation** of three pathogen classes
  (virus, Giardia, Cryptosporidium):

      dN/dt = -k_p * theta^(T-20) * phi(pH, T) * Cl * N

  with ``k_p`` calibrated from the EPA surface-water-treatment-rule CT
  tables at 20 C / pH 7 (k = logs * ln10 / (60 * CT)): virus 3-log
  CT = 2 mg min/L, Giardia 3-log CT = 56 mg min/L (EPA guidance manual,
  halving per 10 C from the 10 C table row), Cryptosporidium 3-log
  CT ~ 1e4 mg min/L (effectively chlorine-resistant — the class exists
  to make the UV coupling below load-bearing). ``phi`` weights the free
  chlorine by its germicidal speciation, alpha_HOCl + r_OCl (1 -
  alpha_HOCl) with OCl- ~ 1/20th as biocidal (White's handbook),
  normalized to 1 at the 20 C / pH 7 calibration point — the same
  Ka_HOCl(T) speciation the decay factor uses (chemistry.py).
  Temperature follows the CT tables' halving per 10 C (theta = 2^0.1).
- **UV inactivation** in the outlet zone (a UV bank at the tank outlet,
  gated by the same top-zone mask the surface gas exchange uses):
  first-order in fluence rate with ``k_uv`` from the EPA UV disinfection
  guidance manual dose tables (3-log: Crypto 12, Giardia 11, virus 143
  mJ/cm2 — adenovirus, the regulatory worst case). The average fluence
  across the water gap follows Beer-Lambert from the ABSORBANCE THE WATER
  ITSELF CARRIES: a254 = a_w + a_TOC*TOC + a_TSS*TSS, so high turbidity
  or organics shade the lamps (the particle axis couples in). UV kill is
  applied as an exact analytic operator split in ``reactor.step`` —
  10 mW/cm2 on Crypto is a ~6 1/s timescale that would otherwise set the
  global substep budget (same pattern as chloramination).
- **CT credit as an advected scalar**: dCT/dt = mix(CT) + Cl/60 with
  inlet CT = 0 — every water parcel accumulates residual-minutes on its
  way through the tank, so the outlet value IS the flow-weighted CT the
  plant can claim (steady single-CSTR oracle: CT_out = Cl * tau / 60).
  **Water age** rides the same transport with source 1 (outlet age = tau
  in steady state) — the classic distribution-system tracer.
- **DBP formation (THMs)**: organics exert a chlorine demand
  r = k_TOC * theta^(T-20) * TOC * Cl (a first-order-in-both bulk-decay
  term that adds to the Arrhenius wall decay), and a yield of that
  exerted demand becomes trihalomethanes: dTHM/dt = Y * 10^(b*(pH-7.5))
  * r — base-catalyzed, so high-pH operation trades CT efficiency for
  DBPs in the control problem. TOC is consumed stoichiometrically
  (s_TOC mg TOC per mg Cl, most organics persist).

Validation: ``validate_disinfection()`` checks the EPA table oracles
(CT reconstruction by construction, UV 3-log doses, halving per 10 C),
speciation weighting limits, Beer-Lambert fluence limits, and THM yield
accounting; reactor-level oracles (batch kill vs analytic, steady-CSTR
CT/age) live in tests/test_disinfection.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LN10 = float(np.log(10.0))
SECONDS_PER_MIN = 60.0

# pathogen class axis order (fixed, like particles.N_CLASSES)
PATHOGEN_NAMES = ("virus", "giardia", "cryptosporidium")
N_PATHOGENS = len(PATHOGEN_NAMES)

# EPA CT tables, 20 C / pH 7 free chlorine [mg min/L for 3-log]:
# virus 4-log @10C = 6 -> 3-log = 4 -> halve to 20 C = 2;
# Giardia 3-log @10C = 112 (1.0 mg/L row) -> 56 @20C;
# Crypto: chlorine-impractical, ~1e4 (Korich et al. 1990 scale).
CT_3LOG_20C_PH7 = (2.0, 56.0, 1.0e4)

# EPA UV disinfection guidance manual (2006) validated 3-log doses
# [mJ/cm2]: adenovirus 143 (regulatory worst-case virus), Giardia 11,
# Cryptosporidium 12.
UV_DOSE_3LOG = (143.0, 11.0, 12.0)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DisinfectionParams:
    """Kinetic parameters as a pytree of traced values (batchable like
    ReactorParams — parameter uncertainty is data, not code)."""

    # Chick-Watson chlorine kill: [P] rates, pH-7/20C-calibrated [L/mg/s]
    k_cl: jnp.ndarray = None
    theta_cl: jnp.ndarray = None     # CT halves per 10 C -> 2^0.1
    r_ocl: jnp.ndarray = None        # OCl- relative biocidal activity

    # UV kill: [P] fluence sensitivities [cm2/mJ]
    k_uv: jnp.ndarray = None
    uv_path_cm: jnp.ndarray = None   # lamp-to-wall water gap [cm]
    a_water: jnp.ndarray = None      # background absorbance [1/cm]
    a_toc: jnp.ndarray = None        # TOC specific absorbance [L/(mg cm)]
    a_tss: jnp.ndarray = None        # TSS attenuation [L/(mg cm)]

    # organics chlorine demand + THM formation
    k_toc: jnp.ndarray = None        # [L/(mg s)] demand rate constant
    theta_toc: jnp.ndarray = None    # Arrhenius-ish theta model
    y_thm: jnp.ndarray = None        # [ug THM / mg Cl demand] at pH 7.5
    b_ph_thm: jnp.ndarray = None     # base-catalysis exponent [1/pH]
    s_toc: jnp.ndarray = None        # [mg TOC consumed / mg Cl demand]


def _phi_ref(r_ocl: float) -> float:
    """Germicidal speciation weight at the 20 C / pH 7 calibration point
    (pKa_HOCl(20C) = 7.5 + 0.01*(20-25) = 7.45, chemistry.py)."""
    alpha = 1.0 / (1.0 + 10.0 ** (7.0 - 7.45))
    return alpha + r_ocl * (1.0 - alpha)


def make_disinfection_params(
        ct_3log=CT_3LOG_20C_PH7, theta_cl: float = 2.0 ** 0.1,
        r_ocl: float = 0.05,
        uv_dose_3log=UV_DOSE_3LOG, uv_path_cm: float = 5.0,
        a_water: float = 0.02, a_toc: float = 0.03, a_tss: float = 0.01,
        k_toc: float = 5e-6, theta_toc: float = 1.04,
        y_thm: float = 40.0, b_ph_thm: float = 0.15, s_toc: float = 0.05,
        dtype=jnp.float32) -> DisinfectionParams:
    """Build params from the EPA-table anchors. ``ct_3log`` /
    ``uv_dose_3log`` are per-class (virus, giardia, crypto) 3-log
    requirements; the rate constants are derived so those tables are
    reproduced exactly at the calibration point."""
    a = lambda x: np.asarray(x, dtype)  # noqa: E731
    ct = np.asarray(ct_3log, np.float64)
    # germicidal_weight is normalized to 1 at the 20 C / pH 7 calibration
    # point, so k_cl carries the CT table directly
    k_cl = 3.0 * LN10 / (SECONDS_PER_MIN * ct)
    dose = np.asarray(uv_dose_3log, np.float64)
    k_uv = 3.0 * LN10 / dose
    return DisinfectionParams(
        k_cl=a(k_cl), theta_cl=a(theta_cl), r_ocl=a(r_ocl),
        k_uv=a(k_uv), uv_path_cm=a(uv_path_cm), a_water=a(a_water),
        a_toc=a(a_toc), a_tss=a(a_tss),
        k_toc=a(k_toc), theta_toc=a(theta_toc), y_thm=a(y_thm),
        b_ph_thm=a(b_ph_thm), s_toc=a(s_toc))


# ---------------------------------------------------------------------------
# Rate laws (pure, vectorized)
# ---------------------------------------------------------------------------

def germicidal_weight(pH, T_C, Ka_HOCl, p: DisinfectionParams):
    """phi(pH, T): HOCl-weighted biocidal activity of the free-chlorine
    pool, normalized to 1 at 20 C / pH 7 (so k_cl carries the CT tables
    unchanged there). Same speciation the decay factor uses
    (chemistry.py pH_dependent_chlorine_decay_factor)."""
    H = 10.0 ** (-jnp.clip(pH, 0.0, 14.0))
    alpha = H / (H + Ka_HOCl)
    phi = alpha + p.r_ocl * (1.0 - alpha)
    # normalization at the 20 C / pH 7 calibration point, in-graph so a
    # batched (traced) r_ocl stays calibrated per lane
    alpha_ref = 1.0 / (1.0 + 10.0 ** (7.0 - 7.45))
    return phi / (alpha_ref + p.r_ocl * (1.0 - alpha_ref))


def chlorine_lethality(Cl, pH, T_C, Ka_HOCl, p: DisinfectionParams):
    """Chick-Watson specific kill rate [1/s] per pathogen class:
    ``[..., P, Z]`` from ``[..., Z]`` chlorine/pH/temperature fields."""
    phi = germicidal_weight(pH, T_C, Ka_HOCl, p)
    base = p.theta_cl ** (T_C - 20.0) * phi * jnp.maximum(Cl, 0.0)
    return p.k_cl[..., :, None] * base[..., None, :]


def absorbance_254(toc, tss_total, p: DisinfectionParams):
    """UV254 absorbance [1/cm] the water carries: background + organics
    + particle shading (the TSS coupling that makes turbidity matter to
    the UV bank)."""
    return p.a_water + p.a_toc * jnp.maximum(toc, 0.0) \
        + p.a_tss * jnp.maximum(tss_total, 0.0)


def uvt_percent(a254):
    """UV transmittance over the standard 1 cm path [%] — the quantity a
    UVT analyzer reports."""
    return 100.0 * 10.0 ** (-a254)


def average_fluence(e0, a254, p: DisinfectionParams):
    """Beer-Lambert average fluence rate across the ``uv_path_cm`` water
    gap [mW/cm2] for wall intensity ``e0``:

        E_avg = E0 (1 - 10^(-a d)) / (a d ln 10)

    -> E0 as a d -> 0; ~E0/(a d ln10) in the opaque limit."""
    ad = jnp.maximum(a254 * p.uv_path_cm, 0.0)
    small = ad < 1e-6
    safe = jnp.where(small, 1.0, ad)
    frac = jnp.where(small, 1.0 - 0.5 * LN10 * ad,
                     (1.0 - 10.0 ** (-safe)) / (safe * LN10))
    return jnp.maximum(e0, 0.0) * frac


def uv_survival(e_avg, dt, p: DisinfectionParams):
    """Exact per-class survival fraction over ``dt`` seconds of exposure
    at average fluence rate ``e_avg`` ``[..., Z]`` -> ``[..., P, Z]``.
    Used by the operator split in reactor.step (a 10 mW/cm2 bank is a
    ~6 1/s kill timescale on Crypto — in-RHS it would set the global
    substep budget the way chloramination would)."""
    return jnp.exp(-p.k_uv[..., :, None] * e_avg[..., None, :] * dt)


def chlorine_demand_rate(toc, Cl, T_C, p: DisinfectionParams):
    """Organics-exerted chlorine demand [mg Cl/L/s]: first order in both
    TOC and residual (the classic bulk-decay term water-quality models add
    to wall decay; ~0.9 1/day at TOC 2 mg/L with the default k_toc)."""
    return p.k_toc * p.theta_toc ** (T_C - 20.0) \
        * jnp.maximum(toc, 0.0) * jnp.maximum(Cl, 0.0)


def thm_formation_rate(demand_rate, pH, p: DisinfectionParams):
    """THM formation [ug/L/s] as a pH-enhanced yield on the exerted
    demand (base-catalyzed haloform route: ~40% more THM per pH unit at
    the default exponent)."""
    return p.y_thm * 10.0 ** (p.b_ph_thm * (jnp.clip(pH, 0.0, 14.0)
                                            - 7.5)) * demand_rate


def log_inactivation(n, n0):
    """log10 removal relative to the reference (inlet) concentration,
    floored so a sterile zone reports a large finite credit."""
    n0 = jnp.maximum(n0, 1e-30)
    return jnp.log10(n0 / jnp.clip(n, 1e-30 * n0, None))


# ---------------------------------------------------------------------------
# Validation (literature oracles + structural invariants)
# ---------------------------------------------------------------------------

def validate_disinfection(verbose: bool = True) -> bool:
    """Validation suite in the reference's ``validate_*`` style
    (reference thermodynamics.py:386-450)."""
    p = make_disinfection_params(dtype=jnp.float64)
    checks = []

    def check(name, ok):
        checks.append((name, bool(ok)))
        if verbose:
            print(f"  {'PASS' if ok else 'FAIL'}: {name}")

    ka20 = 10.0 ** -7.45  # chemistry.py pKa_HOCl at 20 C
    one = jnp.ones((1,), jnp.float64)

    # precision-aware tolerances (the nitrogen validator's pattern): with
    # x64 disabled (e.g. the TPU default backend) every jnp.float64 above
    # truncates to f32 and vectorized pow/exp carry ~1e-6 relative error
    f64_active = jnp.zeros((), jnp.float64).dtype == jnp.dtype("float64")

    def tol(f64_tol, f32_tol):
        return f64_tol if f64_active else f32_tol

    # CT-table reconstruction: at 1 mg/L, pH 7, 20 C the kill integrates
    # to exactly 3 logs over CT_3log minutes, per class
    lam = chlorine_lethality(one, 7.0 * one, 20.0 * one, ka20, p)[..., 0]
    for i, name in enumerate(PATHOGEN_NAMES):
        t3 = 3.0 * LN10 / float(lam[i])
        check(f"CT table reproduced ({name}): "
              f"t(3-log) @1 mg/L = {CT_3LOG_20C_PH7[i]} min",
              abs(t3 / 60.0 - CT_3LOG_20C_PH7[i]) < 1e-6 * CT_3LOG_20C_PH7[i])

    # temperature: CT requirement halves per 10 C (EPA table structure)
    lam30 = chlorine_lethality(one, 7.0 * one, 30.0 * one, ka20, p)[..., 0]
    check("kill rate doubles per 10 C (theta = 2^0.1)",
          abs(float(lam30[1] / lam[1]) - 2.0) < tol(1e-9, 1e-4))

    # speciation weighting: phi = 1 at the calibration point; drops toward
    # r_ocl at high pH; rises toward 1/phi_ref at low pH
    phi7 = float(germicidal_weight(jnp.float64(7.0), 20.0, ka20, p))
    phi10 = float(germicidal_weight(jnp.float64(10.0), 20.0, ka20, p))
    phi4 = float(germicidal_weight(jnp.float64(4.0), 20.0, ka20, p))
    # XLA's vectorized f64 pow carries ~5e-9 relative error vs libm
    check("phi(pH 7, 20C) = 1 (calibration point)", abs(phi7 - 1.0) < 1e-6)
    check("phi(pH 10) -> r_ocl/phi_ref (OCl- dominated)",
          abs(phi10 - 0.05 / _phi_ref(0.05)) < 0.01)
    check("phi(pH 4) -> 1/phi_ref (pure HOCl)",
          abs(phi4 - 1.0 / _phi_ref(0.05)) < 0.01)

    # UV dose table: 12 mJ/cm2 delivered -> exactly 3-log Crypto
    surv = uv_survival(jnp.float64([1.0]), 12.0, p)[..., 2, 0]
    check("UV 12 mJ/cm2 -> 3-log Crypto",
          abs(float(surv) - 1e-3) < tol(1e-12, 1e-7))
    surv_g = uv_survival(jnp.float64([1.0]), 11.0, p)[..., 1, 0]
    check("UV 11 mJ/cm2 -> 3-log Giardia",
          abs(float(surv_g) - 1e-3) < tol(1e-12, 1e-7))

    # Beer-Lambert fluence: clear-water limit E_avg -> E0; opaque limit
    # E_avg -> E0 / (a d ln10)
    e_clear = float(average_fluence(jnp.float64(10.0), jnp.float64(1e-9), p))
    check("fluence clear-water limit E_avg -> E0", abs(e_clear - 10.0) < 1e-6)
    a_big = jnp.float64(2.0)
    e_opaque = float(average_fluence(jnp.float64(10.0), a_big, p))
    check("fluence opaque limit E0/(a d ln10)",
          abs(e_opaque - 10.0 / (2.0 * 5.0 * LN10)) < 1e-6)

    # UVT: pure water default = 10^-0.02 ~ 95.5%; 2 mg/L TOC + 10 mg/L TSS
    # shades it below 70%
    a0 = absorbance_254(jnp.float64(0.0), jnp.float64(0.0), p)
    check("UVT(clean) ~ 95.5%", abs(float(uvt_percent(a0)) - 95.5) < 0.1)
    a1 = absorbance_254(jnp.float64(2.0), jnp.float64(10.0), p)
    check("UVT(TOC 2, TSS 10) < 70%", float(uvt_percent(a1)) < 70.0)

    # THM yield accounting: at pH 7.5 exactly y_thm ug per mg demand;
    # one pH unit up multiplies by 10^b
    r = chlorine_demand_rate(jnp.float64(2.0), jnp.float64(1.0), 20.0, p)
    f75 = float(thm_formation_rate(r, jnp.float64(7.5), p) / r)
    f85 = float(thm_formation_rate(r, jnp.float64(8.5), p) / r)
    check("THM yield @pH 7.5 = y_thm", abs(f75 - 40.0) < 1e-9)
    check("THM base catalysis = 10^b per pH",
          abs(f85 / f75 - 10 ** 0.15) < tol(1e-6, 1e-4))

    # demand sanity: TOC 2 mg/L -> ~0.86 1/day first-order residual decay
    kday = float(r / 1.0) * 86400.0
    check("bulk demand at TOC 2 ~ 0.5..1.5 1/day", 0.5 < kday < 1.5)

    # log_inactivation floor: sterile water reports finite credit
    li = float(log_inactivation(jnp.float64(0.0), jnp.float64(1e4)))
    check("log_inactivation(0) finite", np.isfinite(li) and li > 20)

    ok = all(s for _, s in checks)
    if verbose:
        print(f"Disinfection validation: "
              f"{'ALL PASS' if ok else 'FAILURES PRESENT'}")
    return ok


if __name__ == "__main__":
    raise SystemExit(0 if validate_disinfection() else 1)
