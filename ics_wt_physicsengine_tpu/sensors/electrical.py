"""
Electrical-environment model: EMI, cable capacitance, ground loops.

The reference lists three sensor-model limitations it never implements
(reference README.md:528-531): "No electromagnetic interference (EMI)
modeling", "No cable capacitance effects", "No ground loop simulation".
This module closes all three with an in-graph, scan/vmap-composable
signal-corruption stage.

Physical placement: these effects live on the ANALOG TRANSMISSION PATH —
the cable run between the sensor/transmitter and the DAQ — so the model
is a post-transform on any sensor's reading value (composes uniformly
with every ``*_read`` pipeline without touching the reference-parity
base pipeline; NaN fault paths propagate unchanged):

    ecarry, out_value = electrical_transform(ep, ecarry, out.value, t)

The three effects:

- **Mains EMI pickup**: additive ``A·sin(2π·f_mains·t + φ)`` hum (φ is a
  per-installation random phase) plus Poisson-gated impulse bursts
  (contactor/VFD switching transients): per-read burst probability
  ``rate·dt/3600``, amplitude ``burst_amplitude × N(0,1)``.
- **Cable capacitance**: the cable forms an RC low-pass with the source
  impedance (τ = R_src · C_per_m · length — the classic reason glass pH
  electrodes, R_src ~100 MΩ, cannot drive long unbuffered runs). One
  extra first-order pole with the exact discrete update
  ``y' = y + (1−e^(−dt/τ))·(x−y)``, correct for any step size.
- **Ground loop**: a potential difference between sensor and DAQ grounds
  modeled as an Ornstein-Uhlenbeck random walk (bounded, stationary std
  ``σ·√(τ_g/2)``) plus the classic mains-frequency hum component, both
  scaled by how bad the grounding is (``1 − grounding_quality``).

All parameters default to "effect off", so attaching the stage with
defaults is bit-neutral. No reference counterpart — cites are to the
limitation list the reference publishes about itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp

ELECTRICAL_NORMALS = 2    # burst amplitude, ground-walk innovation
ELECTRICAL_UNIFORMS = 1   # burst gate


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ElectricalParams:
    """Static electrical-environment configuration (per sensor;
    broadcast a leading axis to batch over plants)."""

    # mains EMI pickup
    mains_frequency_hz: jnp.ndarray = None      # 50.0 or 60.0
    emi_pickup_amplitude: jnp.ndarray = None    # [reading units] 0 = off
    emi_phase_rad: jnp.ndarray = None           # per-installation phase
    emi_burst_rate_per_hour: jnp.ndarray = None # Poisson rate, 0 = off
    emi_burst_amplitude: jnp.ndarray = None     # [reading units]

    # cable RC low-pass
    cable_length_m: jnp.ndarray = None
    cable_capacitance_pf_per_m: jnp.ndarray = None   # ~100 pF/m typical
    source_impedance_ohm: jnp.ndarray = None    # glass pH ~1e8, RTD ~1e2

    # ground loop
    grounding_quality: jnp.ndarray = None       # 1.0 = perfect, 0 = floating
    ground_loop_amplitude: jnp.ndarray = None   # [reading units] at q=0
    ground_walk_tau_s: jnp.ndarray = None       # OU relaxation time
    ground_walk_sigma: jnp.ndarray = None       # OU innovation scale


@jax.tree_util.register_dataclass
@dataclass
class ElectricalCarry:
    """Mutable electrical state (pytree; scan-carried)."""

    cable_filtered: jnp.ndarray     # RC pole state
    cable_initialized: jnp.ndarray  # bool: pole seeds on first sample
    ground_potential: jnp.ndarray   # OU state (dimensionless)
    last_t: jnp.ndarray
    key: jnp.ndarray = None         # optional: only if rand not supplied


def make_electrical_params(mains_frequency_hz=50.0,
                           emi_pickup_amplitude=0.0,
                           emi_phase_rad=0.0,
                           emi_burst_rate_per_hour=0.0,
                           emi_burst_amplitude=0.0,
                           cable_length_m=0.0,
                           cable_capacitance_pf_per_m=100.0,
                           source_impedance_ohm=0.0,
                           grounding_quality=1.0,
                           ground_loop_amplitude=0.0,
                           ground_walk_tau_s=60.0,
                           ground_walk_sigma=1.0,
                           dtype=jnp.float32) -> ElectricalParams:
    arr = lambda x: jnp.asarray(x, dtype)  # noqa: E731
    return ElectricalParams(
        mains_frequency_hz=arr(mains_frequency_hz),
        emi_pickup_amplitude=arr(emi_pickup_amplitude),
        emi_phase_rad=arr(emi_phase_rad),
        emi_burst_rate_per_hour=arr(emi_burst_rate_per_hour),
        emi_burst_amplitude=arr(emi_burst_amplitude),
        cable_length_m=arr(cable_length_m),
        cable_capacitance_pf_per_m=arr(cable_capacitance_pf_per_m),
        source_impedance_ohm=arr(source_impedance_ohm),
        grounding_quality=arr(grounding_quality),
        ground_loop_amplitude=arr(ground_loop_amplitude),
        ground_walk_tau_s=arr(ground_walk_tau_s),
        ground_walk_sigma=arr(ground_walk_sigma))


def make_electrical_carry(params: ElectricalParams, key=None, t0=0.0,
                          dtype=jnp.float32) -> ElectricalCarry:
    zero = jnp.zeros_like(jnp.asarray(params.grounding_quality, dtype))
    return ElectricalCarry(
        cable_filtered=zero,
        cable_initialized=jnp.zeros_like(zero, dtype=bool),
        ground_potential=zero,
        last_t=jnp.full_like(zero, t0),
        key=key)


def cable_time_constant(params: ElectricalParams):
    """τ = R_source · C_cable·length (pF/m → F)."""
    c_total = (params.cable_capacitance_pf_per_m * 1e-12
               * params.cable_length_m)
    return params.source_impedance_ohm * c_total


def electrical_transform(params: ElectricalParams, carry: ElectricalCarry,
                         value, t, rand=None):
    """Corrupt one transmitted sample; returns ``(carry', value')``.

    ``rand``: optional ``(normals[..., 2], uniforms[..., 1])`` pre-drawn
    by the caller (to batch with ``base.draw_read_rand`` extras); when
    None, draws from ``carry.key``.
    """
    dtype = jnp.asarray(carry.cable_filtered).dtype
    t = jnp.asarray(t, dtype)
    value = jnp.asarray(value, dtype)
    key = carry.key

    if rand is None:
        if key is None:
            raise ValueError("electrical_transform needs either rand= or "
                             "a carry built with make_electrical_carry("
                             "..., key=...)")
        key, k_n, k_u = jax.random.split(key, 3)
        normals = jax.random.normal(k_n, (ELECTRICAL_NORMALS,), dtype)
        uniforms = jax.random.uniform(k_u, (ELECTRICAL_UNIFORMS,), dtype)
    else:
        normals, uniforms = rand
    n_burst, n_walk = normals[..., 0], normals[..., 1]
    u_burst = uniforms[..., 0]

    dt = jnp.maximum(t - carry.last_t, 0.0)

    # --- cable RC low-pass (exact ZOH discretization) ---
    tau = cable_time_constant(params)
    alpha = 1.0 - jnp.exp(-dt / jnp.maximum(tau, 1e-30))
    seeded = jnp.where(carry.cable_initialized, carry.cable_filtered, value)
    # τ = 0 (no cable modeled) passes the sample through BIT-EXACTLY —
    # seeded + 1·(value−seeded) would round
    filtered = jnp.where(tau > 0.0, seeded + alpha * (value - seeded),
                         value)
    # NaN sample (sensor fault path): propagate NaN out but FREEZE the
    # pole state so recovery doesn't replay the fault
    good = jnp.isfinite(value)
    new_filtered = jnp.where(good, filtered, carry.cable_filtered)
    new_initialized = carry.cable_initialized | good
    out = jnp.where(good, filtered, value)

    # --- mains EMI pickup + impulse bursts ---
    omega_t = 2.0 * jnp.pi * params.mains_frequency_hz * t
    hum = params.emi_pickup_amplitude * jnp.sin(omega_t
                                                + params.emi_phase_rad)
    p_burst = jnp.clip(params.emi_burst_rate_per_hour * dt / 3600.0,
                       0.0, 1.0)
    burst = jnp.where(u_burst < p_burst,
                      params.emi_burst_amplitude * n_burst, 0.0)

    # --- ground loop: OU potential walk + mains hum, scaled by (1-q) ---
    tau_g = jnp.maximum(params.ground_walk_tau_s, 1e-30)
    decay = jnp.exp(-dt / tau_g)
    g = carry.ground_potential * decay \
        + params.ground_walk_sigma * jnp.sqrt(
            jnp.maximum(dt, 0.0)) * n_walk
    badness = jnp.clip(1.0 - params.grounding_quality, 0.0, 1.0)
    ground = params.ground_loop_amplitude * badness * (
        g + jnp.sin(omega_t))

    out = out + hum + burst + ground

    new_carry = replace(carry, cable_filtered=new_filtered,
                        cable_initialized=new_initialized,
                        ground_potential=g, last_t=t, key=key)
    return new_carry, out
