"""
Particle dynamics: suspended solids, settling, coagulation, filtration.

The reference explicitly lists "No particle dynamics (settling,
filtration)" as a physics limitation (reference README.md:522). This
module delivers that axis TPU-natively: a static small number of particle
SIZE CLASSES carried as one ``[..., C, Z]`` zone array (class axis ahead
of the zone axis so the O(n) exchange stencil and the settling stencil
both vectorize over classes with zero reshuffling), riding the same
fixed-step integrators as the core physics.

Processes (all opt-in via ``ReactorConfiguration(enable_particles=True)``):

- **Gravitational settling (Stokes law)**: per-class terminal velocity
  w = g (rho_p - rho_w) d^2 / (18 mu(T)), with the temperature-dependent
  viscosity the transport module already models implicitly via D(T) —
  here mu(T) uses the Vogel equation (0.89 mPa s at 25 C). Settling is an
  upwind advection toward zone 0 (the tank bottom, spatial.py
  zone_centers): zone i receives w/h * x[i+1] from above and loses
  w/h * x[i] downward; the bottom zone deposits into a per-class SLUDGE
  inventory (units: mg/L of bottom-zone volume, so resuspension is a
  plain rate exchange and total mass audits exactly).
- **Resuspension**: settled sludge re-entrains at a slow first-order rate
  (bottom shear from the impeller); a ``sludge_blowdown`` boundary input
  [1/s] wastes sludge from the inventory (the clarifier underflow
  actuator).
- **Coagulation/flocculation**: a ``coagulant_dose`` boundary input
  [mg/L] drives a first-order aggregation CHAIN fine -> medium -> coarse
  with Monod dose response r = k_coag * dose/(dose + K_d) — the jar-test
  control axis: dosing coagulant shifts mass into fast-settling classes
  and the effluent clears. Mass-conserving across classes by
  construction.
- **Recirculating filtration**: a ``filter_flow_rate`` boundary input
  [L/min] pulls water from the outlet zone through a granular-media
  filter with per-class pass efficiencies (fines pass more) and returns
  the filtrate — net per-class first-order removal at the outlet zone.
- **Turbidity**: NTU = sum_c k_ntu[c] * tss[c], fines scattering more per
  unit mass (light scattering per mass rises as d falls toward the
  wavelength) — the measurand for sensors/turbidity.py.

Everything else (inter-zone mixing with stratification suppression,
inlet/outlet advection) the particles inherit from the same exchange
operator as every dissolved species — a quiescent stratified column
therefore settles out while a stirred one stays suspended, and the
clarifier emerges from the physics instead of being declared.

Validation: ``validate_particles()`` checks Stokes velocities against
hand values (10 um silica at 20 C ~ 0.089 mm/s), viscosity oracles,
coagulation mass conservation, settling mass conservation including the
sludge inventory, and the turbidity weighting.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.utils.dispatch import align_trailing, array_namespace

G_GRAVITY = 9.80665          # [m/s^2]

# canonical three size classes (diameters in meters): fine clay/silt,
# silt/small floc, large floc / grit
N_CLASSES = 3
DEFAULT_DIAMETERS_M = (2e-6, 10e-6, 50e-6)
DEFAULT_DENSITY = 2650.0     # [kg/m^3] silica
# NTU per mg/L per class: scattering efficiency per mass falls with size
DEFAULT_NTU_PER_MGL = (3.0, 1.0, 0.25)
# granular-media single-pass capture per class: fines pass, flocs caught
DEFAULT_FILTER_EFF = (0.35, 0.85, 0.99)


def water_viscosity(T_C):
    """Dynamic viscosity of water [Pa s], Vogel/VFT fit:
    1.0016 mPa s at 20 C, 0.890 at 25 C, 0.547 at 50 C."""
    xp = array_namespace(T_C)
    T = T_C + 273.15
    return 1e-3 * xp.exp(-3.7188 + 578.919 / (T - 137.546))


def stokes_velocity(diameter_m, rho_p, T_C):
    """Stokes terminal settling velocity [m/s] (laminar regime, valid for
    the micron-to-100-um classes modeled here)."""
    rho_w = 998.2   # constant reference density; the (rho_p - rho_w)
    #                 contrast dwarfs the water-density T dependence
    contrast = align_trailing(rho_p - rho_w, diameter_m)  # [B] vs [B, C]
    return G_GRAVITY * contrast * diameter_m ** 2 \
        / (18.0 * water_viscosity(T_C))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ParticleParams:
    """Particle-dynamics parameters (pytree of traced scalars/[C] arrays,
    batchable like ReactorParams)."""

    diameters_m: jnp.ndarray = None      # [C]
    density_kgm3: jnp.ndarray = None     # particle density
    inlet_fractions: jnp.ndarray = None  # [C] source-water class split
    ntu_per_mgl: jnp.ndarray = None      # [C] turbidity weights
    filter_eff: jnp.ndarray = None       # [C] single-pass capture
    k_coag: jnp.ndarray = None           # [1/s] max aggregation rate
    K_dose: jnp.ndarray = None           # [mg/L] coagulant half-sat
    k_resuspension: jnp.ndarray = None   # [1/s] sludge re-entrainment


def make_particle_params(diameters_m=DEFAULT_DIAMETERS_M,
                         density_kgm3=DEFAULT_DENSITY,
                         inlet_fractions=(0.5, 0.35, 0.15),
                         ntu_per_mgl=DEFAULT_NTU_PER_MGL,
                         filter_eff=DEFAULT_FILTER_EFF,
                         k_coag=2e-3, K_dose=10.0,
                         k_resuspension=1e-6,
                         dtype=jnp.float32) -> ParticleParams:
    a = lambda x: np.asarray(x, dtype)  # noqa: E731
    fr = a(inlet_fractions)
    return ParticleParams(
        diameters_m=a(diameters_m), density_kgm3=a(density_kgm3),
        inlet_fractions=fr / fr.sum(axis=-1, keepdims=True),
        ntu_per_mgl=a(ntu_per_mgl), filter_eff=a(filter_eff),
        k_coag=a(k_coag), K_dose=a(K_dose),
        k_resuspension=a(k_resuspension))


def settling_rates(p: ParticleParams, T_surface, zone_height):
    """Per-class settling rate w/h [1/s]; ``T_surface`` sets the viscosity
    (one representative temperature — the reference's own transport
    coefficients are similarly bulk-valued)."""
    w = stokes_velocity(p.diameters_m, p.density_kgm3, T_surface)
    return w / align_trailing(zone_height, w)


def settling_rates_zonal(p: ParticleParams, T_zone, zone_height):
    """Per-class, per-zone settling rate w/h [1/s]: each zone's Stokes
    velocity from its OWN temperature's viscosity
    (``[..., Z] -> [..., C, Z]``). Strictly more physical than a
    bulk-valued rate (a warm top layer settles its solids faster), and
    purely local in the zone axis — the property the zone-sharded SPMD
    path (parallel/spatial.py) needs: no global temperature reduction
    inside the stencil."""
    contrast = align_trailing(p.density_kgm3 - 998.2, p.diameters_m)
    w_c = G_GRAVITY * contrast * p.diameters_m ** 2 / 18.0  # mu-free
    w_cz = w_c[..., :, None] / water_viscosity(T_zone)[..., None, :]
    return w_cz / align_trailing(zone_height, w_cz)


def settle(x, rate_cz, top_mask=None, bottom_mask=None):
    """Upwind settling stencil on ``x[..., C, Z]`` with per-class rates
    ``rate_cz`` (``[..., C, 1]`` or ``[..., C, Z]``; zone 0 = bottom).
    Returns ``(dx, deposit)``: the in-column tendency and the per-class
    bottom deposition flux [mg/L/s of bottom-zone volume].

    ``top_mask``/``bottom_mask`` (``[..., Z]`` one-hot floats) relocate
    the no-receive condition and the deposit extraction away from the
    array ends for the zone-sharded SPMD path, exactly like
    ``reactor.derivatives``'s inlet/outlet masks (the default None
    keeps the canonical array-end layout)."""
    fall = rate_cz * x                        # downward flux out of each zone
    zeros = jnp.zeros_like(x[..., :1])
    # zone i receives zone i+1's fall; the top zone receives nothing
    recv = jnp.concatenate([fall[..., 1:], zeros], axis=-1)
    if top_mask is not None:
        recv = recv * (1.0 - top_mask[..., None, :])
    if bottom_mask is None:
        deposit = fall[..., 0]                # bottom zone -> sludge
    else:
        deposit = jnp.sum(fall * bottom_mask[..., None, :], axis=-1)
    return recv - fall, deposit


def coagulation_chain(x, dose, p: ParticleParams):
    """First-order aggregation chain fine -> ... -> coarse with Monod dose
    response; returns the per-class tendency (mass-conserving)."""
    rate = p.k_coag * dose / (dose + p.K_dose)
    up = align_trailing(rate, x) * x          # flux leaving each class
    # the coarsest class aggregates no further
    up = up * (1.0 - jnp.eye(x.shape[-2], dtype=x.dtype)[-1][..., :, None])
    zeros = jnp.zeros_like(x[..., :1, :])
    recv = jnp.concatenate([zeros, up[..., :-1, :]], axis=-2)
    return recv - up


def turbidity_ntu(tss_cz, p: ParticleParams):
    """Turbidity [NTU] per zone from the class concentrations
    ``[..., C, Z]`` -> ``[..., Z]``."""
    return jnp.sum(p.ntu_per_mgl[..., :, None] * tss_cz, axis=-2)


def turbidity_ntu_tap(tss_c, p: ParticleParams):
    """Turbidity [NTU] at one zone tap: ``[..., C]`` -> ``[...]``."""
    return jnp.sum(p.ntu_per_mgl * tss_c, axis=-1)


def total_solids_mgl(tss_cz):
    """Total suspended solids [mg/L] per zone."""
    return jnp.sum(tss_cz, axis=-2)


# ---------------------------------------------------------------------------
# Validation (literature oracles + structural invariants)
# ---------------------------------------------------------------------------

def validate_particles(verbose: bool = True) -> bool:
    """Validation suite in the reference's ``validate_*`` style
    (e.g. reference thermodynamics.py:386-450)."""
    checks = []

    def check(name, ok):
        checks.append((name, bool(ok)))
        if verbose:
            print(f"  {'PASS' if ok else 'FAIL'}: {name}")

    f64 = np.float64

    # viscosity oracles (CRC): 1.0016 mPa s @ 20 C, 0.890 @ 25 C
    check("water viscosity at 20 C = 1.002 mPa s",
          abs(float(water_viscosity(f64(20.0))) * 1e3 - 1.0016) < 0.01)
    check("water viscosity at 25 C = 0.890 mPa s",
          abs(float(water_viscosity(f64(25.0))) * 1e3 - 0.890) < 0.01)

    # Stokes oracle: 10 um silica (2650 kg/m3) at 20 C ~ 0.090 mm/s
    v10 = float(stokes_velocity(f64(10e-6), f64(2650.0), f64(20.0)))
    check("Stokes velocity, 10 um silica at 20 C ~ 0.090 mm/s",
          abs(v10 * 1e3 - 0.0899) < 0.003)
    # quadratic diameter scaling
    v20 = float(stokes_velocity(f64(20e-6), f64(2650.0), f64(20.0)))
    check("Stokes velocity scales as d^2", abs(v20 / v10 - 4.0) < 1e-9)
    # warmer water -> lower viscosity -> faster settling
    v10w = float(stokes_velocity(f64(10e-6), f64(2650.0), f64(30.0)))
    check("settling faster in warm water", v10w > v10)

    p = make_particle_params(dtype=jnp.float64)

    # settling stencil conserves mass: column loss == bottom deposit
    x = jnp.asarray(np.random.default_rng(0).uniform(
        1.0, 5.0, (N_CLASSES, 6)), jnp.float64)
    rate = settling_rates(p, jnp.float64(20.0),
                          jnp.float64(0.4))[..., None]
    dx, dep = settle(x, rate)
    col = float(jnp.sum(dx))
    # dtype-relative tolerance: the suite also runs without x64 enabled
    tol = 1e-6 * float(jnp.sum(jnp.abs(dx)))
    check("settling conserves mass (column loss = deposit)",
          abs(col + float(jnp.sum(dep))) < tol)
    # top zone only loses
    check("top zone receives nothing from above",
          bool(jnp.all(dx[..., -1] < 0.0)))

    # coagulation chain conserves total mass and moves it coarser
    dxc = coagulation_chain(x, jnp.float64(30.0), p)
    check("coagulation conserves mass across classes",
          abs(float(jnp.sum(dxc))) < 1e-6 * float(jnp.sum(jnp.abs(dxc))))
    check("coagulation drains the finest class",
          bool(jnp.all(dxc[..., 0, :] < 0.0)))
    check("coagulation feeds the coarsest class",
          bool(jnp.all(dxc[..., -1, :] > 0.0)))
    check("no dose, no coagulation",
          float(jnp.max(jnp.abs(
              coagulation_chain(x, jnp.float64(0.0), p)))) == 0.0)

    # turbidity: fines dominate per unit mass
    one = jnp.zeros((N_CLASSES, 1), jnp.float64)
    ntu_fine = float(turbidity_ntu(one.at[0, 0].set(1.0), p)[0])
    ntu_coarse = float(turbidity_ntu(one.at[-1, 0].set(1.0), p)[0])
    check("fines scatter more per mg/L", ntu_fine > 2.0 * ntu_coarse)
    check("turbidity is linear in concentration",
          abs(float(turbidity_ntu(2.0 * one.at[0, 0].set(1.0), p)[0])
              - 2.0 * ntu_fine) < 1e-12)

    ok = all(s for _, s in checks)
    if verbose:
        print(f"Particle dynamics validation: "
              f"{'ALL PASS' if ok else 'FAILURES PRESENT'}")
    return ok


if __name__ == "__main__":
    raise SystemExit(0 if validate_particles() else 1)
