"""
Biofilm / bacterial regrowth: wall-attached biomass, planktonic bacteria,
and biodegradable organic carbon.

The reference explicitly lists "No biological processes (bacteria,
biofilms)" as a limitation (reference core/README.md:98, README.md:304,521)
and models biofilm only as a SENSOR artifact (glass-membrane fouling,
reference ph_sensor.py:13-17,196). Round 3 closed the nitrification half of
that row (core/nitrogen.py); this module closes the biofilm half
TPU-natively: pure vectorized rate laws over ``[..., Z]`` zone arrays that
ride the same fixed-step integrators as the core physics. The model follows
the classic drinking-water biofilm/regrowth structure (SANCHO / BAM-style:
Monod growth on BDOC, chlorine-inhibited, first-order attachment/detachment
between a bulk and a wall compartment).

State (all opt-in via ``ReactorConfiguration(enable_biofilm=True)``):

- **bacteria** X ``[..., Z]`` [mg C/L] — planktonic heterotrophic biomass
  (the HPC-count proxy; ``hpc_cfu_per_ml`` converts). Advected and mixed
  like every bulk species.
- **bdoc** S ``[..., Z]`` [mg/L] — biodegradable dissolved organic carbon,
  the growth substrate (a biodegradable SUBSET of the disinfection axis's
  THM-precursor TOC; the two pools are deliberately independent state).
- **biofilm** B ``[..., Z]`` [mg C/m2] — wall-attached areal biomass.
  NOT advected (it is attached): its tendency is purely zone-local, which
  makes the zone-sharded SPMD path trivial (no halo term).

Processes:

- **Monod growth** on BDOC with theta-model temperature correction and
  free-chlorine inhibition ``K_I / (K_I + Cl)`` — bulk bacteria use the
  bulk half-constant; the biofilm uses a larger ``K_I_film`` (chlorine
  penetrates the matrix poorly — the protection that makes biofilm the
  hard problem). Film growth carries a logistic carrying-capacity factor
  ``(1 - B/B_max)`` (substratum saturation).
- **Chick-Watson chlorine kill** of bulk biomass, ``k_kill * Cl * X``,
  calibrated from a 3-log CT of 10 mg min/L (chlorine-tolerant HPC flora,
  far more resistant than lab E. coli); the film is killed at
  ``k_kill / protection`` (Chen & Stewart-scale protection factors).
  A ``f_lysis`` fraction of killed biomass returns to the BDOC pool
  (lysis recycles substrate — the regrowth feedback loop).
- **Attachment / detachment**: first-order attachment ``k_att * X`` from
  the bulk onto the wall; detachment ``(k_det + k_det_shear * u) * B``
  back into the bulk, with the shear term driven by the reactor's own
  superficial velocity scale (flow surges slough biofilm — the classic
  distribution-system turbidity/HPC event).
- **Wall chlorine demand**: the film exerts ``k_cl_film * Cl * (B a_v)``
  on the residual — biofouled tanks lose chlorine faster, which is the
  operational signature plants actually observe.

Area/volume coupling: wall quantities convert through the zone's
colonizable-area-to-volume ratio ``a_v = A_zone / V_zone`` [m2/L], built
from the same lateral+ends heat-transfer area the thermal model uses
(reference reactor.py:429-431), split evenly across zones.

Carbon accounting: with ``yield_c = 1`` and ``f_lysis = 1`` the closed
pool ``S + X + B a_v`` is exactly conserved (checked end-to-end in
tests/test_biofilm.py); with the defaults, ``1 - yield_c`` of consumed
BDOC is mineralized to CO2 and leaves the pool (it does NOT feed the gas
axis's carbonate — the coupling is negligible at mg/L scales and keeping
it out preserves the axes' independence).

Validation: ``validate_biofilm()`` checks the Monod/theta/inhibition
limits, the kill-CT calibration, the logistic cap, the attachment/
detachment equilibrium, and the conservative-limit carbon balance;
reactor-level oracles (regrowth bloom without residual, suppression with
residual, closed-batch carbon conservation) live in tests/test_biofilm.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LN10 = float(np.log(10.0))
SECONDS_PER_DAY = 86400.0
SECONDS_PER_MIN = 60.0

# HPC conversion: ~5e9 cells per mg biomass C (0.2 pg C/cell, typical
# aquatic heterotroph) — used only for reporting, never in the dynamics.
CELLS_PER_MG_C = 5.0e9


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BiofilmParams:
    """Kinetic parameters as a pytree of traced values (batchable like
    ReactorParams — parameter uncertainty is data, not code)."""

    # Monod growth on BDOC
    mu_max: jnp.ndarray = None       # [1/day] max specific growth at 20 C
    K_s: jnp.ndarray = None          # [mg/L] BDOC half-saturation
    yield_c: jnp.ndarray = None      # [mg biomass C / mg BDOC consumed]
    theta_mu: jnp.ndarray = None     # temperature theta model

    # chlorine inhibition of growth (bulk vs matrix-protected film)
    K_I_bulk: jnp.ndarray = None     # [mg/L]
    K_I_film: jnp.ndarray = None     # [mg/L]

    # Chick-Watson chlorine kill (bulk), film protected by `protection`
    k_kill: jnp.ndarray = None       # [L/mg/s]
    protection: jnp.ndarray = None   # film kill = k_kill / protection
    f_lysis: jnp.ndarray = None      # killed-biomass fraction -> BDOC

    # attachment / detachment
    k_att: jnp.ndarray = None        # [1/s] bulk -> wall
    k_det: jnp.ndarray = None        # [1/s] wall -> bulk (quiescent)
    k_det_shear: jnp.ndarray = None  # [1/m] x velocity [m/s] -> [1/s]

    # film carrying capacity and wall chlorine demand
    B_max: jnp.ndarray = None        # [mg C/m2]
    k_cl_film: jnp.ndarray = None    # [L/mg/s] on the B*a_v equivalent


def make_biofilm_params(
        mu_max: float = 2.0, K_s: float = 0.2, yield_c: float = 0.4,
        theta_mu: float = 1.07,
        K_I_bulk: float = 0.05, K_I_film: float = 0.5,
        ct_3log_hpc: float = 10.0, protection: float = 150.0,
        f_lysis: float = 0.5,
        k_att: float = 1e-5, k_det: float = 2e-6, k_det_shear: float = 0.0,
        B_max: float = 1000.0, k_cl_film: float = 1e-5,
        dtype=jnp.float32) -> BiofilmParams:
    """Build params from literature-scale anchors. ``ct_3log_hpc`` is the
    3-log chlorine CT [mg min/L] for the bulk flora; ``k_kill`` is derived
    so that table value is reproduced exactly (same construction as the
    disinfection axis's CT tables, core/disinfection.py)."""
    a = lambda x: np.asarray(x, dtype)  # noqa: E731
    k_kill = 3.0 * LN10 / (SECONDS_PER_MIN * float(ct_3log_hpc))
    return BiofilmParams(
        mu_max=a(mu_max), K_s=a(K_s), yield_c=a(yield_c),
        theta_mu=a(theta_mu),
        K_I_bulk=a(K_I_bulk), K_I_film=a(K_I_film),
        k_kill=a(k_kill), protection=a(protection), f_lysis=a(f_lysis),
        k_att=a(k_att), k_det=a(k_det), k_det_shear=a(k_det_shear),
        B_max=a(B_max), k_cl_film=a(k_cl_film))


# ---------------------------------------------------------------------------
# Rate laws (pure, vectorized)
# ---------------------------------------------------------------------------

def monod(s, K_s):
    """Substrate saturation S/(K_s + S), floored at 0."""
    s = jnp.maximum(s, 0.0)
    return s / (K_s + s)


def chlorine_inhibition(Cl, K_I):
    """Non-competitive chlorine inhibition of growth: 1 at Cl=0, 1/2 at
    Cl=K_I, -> 0 as the residual climbs."""
    return K_I / (K_I + jnp.maximum(Cl, 0.0))


def specific_growth_bulk(s, Cl, T_C, p: BiofilmParams):
    """Bulk specific growth rate mu [1/s]: Monod x theta x inhibition."""
    return (p.mu_max / SECONDS_PER_DAY) * p.theta_mu ** (T_C - 20.0) \
        * monod(s, p.K_s) * chlorine_inhibition(Cl, p.K_I_bulk)


def specific_growth_film(s, Cl, T_C, B, p: BiofilmParams):
    """Film specific growth rate [1/s]: matrix-protected inhibition plus
    the logistic carrying-capacity factor (1 - B/B_max)."""
    room = jnp.maximum(1.0 - jnp.maximum(B, 0.0) / p.B_max, 0.0)
    return (p.mu_max / SECONDS_PER_DAY) * p.theta_mu ** (T_C - 20.0) \
        * monod(s, p.K_s) * chlorine_inhibition(Cl, p.K_I_film) * room


def kill_rate_bulk(Cl, p: BiofilmParams):
    """Chick-Watson specific kill of planktonic biomass [1/s]."""
    return p.k_kill * jnp.maximum(Cl, 0.0)


def kill_rate_film(Cl, p: BiofilmParams):
    """Matrix-protected specific kill of wall biomass [1/s]."""
    return (p.k_kill / p.protection) * jnp.maximum(Cl, 0.0)


def detachment_rate(u, p: BiofilmParams):
    """Specific detachment [1/s]: quiescent base + shear term in the
    superficial velocity scale (flow surges slough the film)."""
    return p.k_det + p.k_det_shear * jnp.maximum(u, 0.0)


def wall_demand_rate(Cl, B, a_v, p: BiofilmParams):
    """Chlorine demand the film exerts [mg Cl/L/s]: first order in both
    the residual and the bulk-equivalent film mass B*a_v [mg/L]."""
    return p.k_cl_film * jnp.maximum(Cl, 0.0) * jnp.maximum(B, 0.0) * a_v


def hpc_cfu_per_ml(x_mgC_L):
    """Report planktonic biomass as an HPC plate count [CFU/mL]."""
    return jnp.maximum(x_mgC_L, 0.0) * CELLS_PER_MG_C / 1000.0


def total_biomass_carbon(x, s, b, a_v):
    """Closed organic-carbon pool per zone [mg C/L]: bulk biomass +
    substrate + wall film in bulk-equivalent units. Exactly conserved in
    a closed batch when yield_c = 1 and f_lysis = 1."""
    return x + s + b * a_v


# ---------------------------------------------------------------------------
# Validation (literature oracles + structural invariants)
# ---------------------------------------------------------------------------

def validate_biofilm(verbose: bool = True) -> bool:
    """Validation suite in the reference's ``validate_*`` style
    (reference thermodynamics.py:386-450)."""
    p = make_biofilm_params(dtype=jnp.float64)
    checks = []

    def check(name, ok):
        checks.append((name, bool(ok)))
        if verbose:
            print(f"  {'PASS' if ok else 'FAIL'}: {name}")

    # precision-aware tolerances (the nitrogen validator's pattern): with
    # x64 disabled (e.g. the TPU default backend) every jnp.float64 above
    # truncates to f32 and vectorized pow/exp carry ~1e-6 relative error
    f64_active = jnp.zeros((), jnp.float64).dtype == jnp.dtype("float64")

    def tol(f64_tol, f32_tol):
        return f64_tol if f64_active else f32_tol

    # Monod limits: saturation -> 1; linear S/K_s when S << K_s
    check("Monod saturation -> 1",
          abs(float(monod(jnp.float64(1e6), p.K_s)) - 1.0) < 1e-5)
    check("Monod dilute limit -> S/K_s",
          abs(float(monod(jnp.float64(2e-4), p.K_s)) - 1e-3) < 1e-6)

    # theta temperature model: mu(30)/mu(20) = theta^10
    m20 = specific_growth_bulk(jnp.float64(10.0), 0.0, jnp.float64(20.0), p)
    m30 = specific_growth_bulk(jnp.float64(10.0), 0.0, jnp.float64(30.0), p)
    check("theta ratio mu(30C)/mu(20C) = 1.07^10",
          abs(float(m30 / m20) - 1.07 ** 10) < tol(1e-6, 1e-4))

    # growth scale: mu_max at saturation, 20 C, no chlorine = 2/day
    m_sat = specific_growth_bulk(jnp.float64(1e6), 0.0, jnp.float64(20.0), p)
    check("mu_max reproduced at saturation",
          abs(float(m_sat) * SECONDS_PER_DAY - 2.0) < tol(1e-4, 1e-3))

    # chlorine inhibition: 1 at zero, 1/2 at K_I, strongly off at 0.5 mg/L
    check("inhibition(0) = 1",
          abs(float(chlorine_inhibition(jnp.float64(0.0), p.K_I_bulk)) - 1.0)
          < 1e-12)
    check("inhibition(K_I) = 1/2",
          abs(float(chlorine_inhibition(p.K_I_bulk, p.K_I_bulk)) - 0.5)
          < 1e-12)
    check("bulk growth < 10% at 0.5 mg/L residual",
          float(chlorine_inhibition(jnp.float64(0.5), p.K_I_bulk)) < 0.1)
    # the film's matrix protection: 10x less inhibited at the same residual
    check("film K_I is 10x the bulk (matrix protection)",
          abs(float(p.K_I_film / p.K_I_bulk) - 10.0) < tol(1e-9, 1e-5))

    # kill CT calibration: at 1 mg/L the bulk kill integrates to exactly
    # 3 logs over ct_3log_hpc minutes (construction, like the EPA tables)
    lam = float(kill_rate_bulk(jnp.float64(1.0), p))
    t3_min = 3.0 * LN10 / lam / SECONDS_PER_MIN
    check("bulk kill CT(3-log) = 10 mg min/L",
          abs(t3_min - 10.0) < tol(1e-9, 1e-5))
    # film protection: kill slower by exactly the protection factor
    lam_f = float(kill_rate_film(jnp.float64(1.0), p))
    check("film kill = bulk / protection",
          abs(lam / lam_f - 150.0) < tol(1e-9, 1e-3))

    # logistic cap: film growth is zero at B = B_max, halved at B_max/2
    g_full = float(specific_growth_film(jnp.float64(10.0), 0.0, 20.0,
                                        jnp.float64(0.0), p))
    g_half = float(specific_growth_film(jnp.float64(10.0), 0.0, 20.0,
                                        p.B_max / 2.0, p))
    g_cap = float(specific_growth_film(jnp.float64(10.0), 0.0, 20.0,
                                       p.B_max, p))
    check("film growth capped at B_max", abs(g_cap) < 1e-15)
    check("film growth halved at B_max/2",
          abs(g_half / g_full - 0.5) < tol(1e-9, 1e-6))

    # attachment/detachment equilibrium (growth and kill off): the wall
    # balance k_att X = k_det B a_v gives B* = k_att X / (k_det a_v)
    a_v = 0.01  # [m2/L] typical tank
    x = 0.001   # [mg/L]
    b_star = float(p.k_att) * x / (float(p.k_det) * a_v)
    flux_on = float(p.k_att) * x / a_v            # [mg/m2/s]
    flux_off = float(detachment_rate(jnp.float64(0.0), p)) * b_star
    check("attach/detach equilibrium closes",
          abs(flux_on - flux_off) < tol(1e-15, 1e-6) * flux_on)
    # shear term raises detachment linearly in the velocity scale
    p_sh = make_biofilm_params(k_det_shear=1e-4, dtype=jnp.float64)
    d0 = float(detachment_rate(jnp.float64(0.0), p_sh))
    d1 = float(detachment_rate(jnp.float64(0.02), p_sh))
    check("shear detachment linear in u",
          abs((d1 - d0) - 2e-6) < tol(1e-12, 1e-10))

    # wall demand: biofouled tank (B a_v = 1 mg/L equivalent) exerts
    # ~0.86 1/day extra first-order residual decay — the operational
    # signature scale
    r = float(wall_demand_rate(jnp.float64(1.0), jnp.float64(100.0),
                               jnp.float64(0.01), p))
    check("wall demand at B a_v = 1 mg/L ~ 0.5..1.5 1/day",
          0.5 < r * SECONDS_PER_DAY < 1.5)

    # carbon accounting in the conservative limit: growth moves carbon
    # S -> X at yield 1 with zero mineralization
    p1 = make_biofilm_params(yield_c=1.0, f_lysis=1.0, dtype=jnp.float64)
    mu = specific_growth_bulk(jnp.float64(1.0), 0.0, 20.0, p1)
    x0 = jnp.float64(0.5)
    dX = mu * x0
    dS = -mu * x0 / p1.yield_c
    check("conservative limit: dX + dS = 0", abs(float(dX + dS)) < 1e-18)

    # HPC conversion: 1 ug C/L ~ 5e3 CFU/mL (typical regrowth event scale)
    check("HPC proxy: 1 ug C/L -> 5e3 CFU/mL",
          abs(float(hpc_cfu_per_ml(jnp.float64(1e-3))) - 5e3)
          < tol(1e-6, 1e-2))

    ok = all(s for _, s in checks)
    if verbose:
        print(f"Biofilm validation: "
              f"{'ALL PASS' if ok else 'FAILURES PRESENT'}")
    return ok


if __name__ == "__main__":
    raise SystemExit(0 if validate_biofilm() else 1)
