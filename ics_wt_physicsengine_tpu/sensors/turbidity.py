"""
Turbidity sensor (nephelometer) as a pure transform — the instrument for
the particle dynamics (core/particles.py).

No reference counterpart (the reference has no particles to measure);
built in the same idiom as its sensor families (reference
sensors/base_sensor.py pipeline + a principle-specific overlay), riding
the identical scan-carried base pipeline:

- **90-degree nephelometry (ISO 7027)**: measures scattered light, so
  the TRUE value is the class-weighted NTU from core/particles.py
  (fines scatter more per unit mass). The caller supplies that true NTU
  (computed from the state's tss classes) — the instrument itself is
  size-blind, exactly like a real nephelometer.
- **Optical-window fouling**: biofilm/scale on the flow-cell window
  scatters stray light into the detector — a POSITIVE bias that grows
  with immersion time (field turbidimeters read high before cleaning;
  wipe_window() resets, modeling the instrument's mechanical wiper).
- **Stray-light floor**: a fixed additive error dominating near zero
  NTU (the spec sheet's "stray light < 0.02 NTU") — why drinking-water
  turbidimeters cannot read true zero.
- **Bubble spikes**: entrained air scatters strongly — short positive
  spikes at a rate set by the installation's bubble frequency (the base
  pipeline's air-bubble path gives NaN dropouts for immersed probes; a
  flow-cell nephelometer instead reads HIGH, so the overlay converts
  those draws into spikes).
- **Detector shot noise**: scales with sqrt(signal) (photon statistics),
  so high-NTU water reads noisier in absolute terms.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.sensors import base as B


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TurbiditySensorParams:
    zone_index: int = field(metadata=dict(static=True))
    base: B.SensorParams = None
    stray_light_ntu: jnp.ndarray = None      # additive zero floor
    fouling_ntu_per_day: jnp.ndarray = None  # window-fouling bias growth
    max_fouling_ntu: jnp.ndarray = None
    bubble_spike_ntu: jnp.ndarray = None     # magnitude of an air spike
    bubble_rate: jnp.ndarray = None          # spikes per read


@jax.tree_util.register_dataclass
@dataclass
class TurbiditySensorCarry:
    base: B.SensorCarry
    window_fouling_ntu: jnp.ndarray          # accumulated stray-light bias


def make_turbidity_params(zone_index=0, precision=None, response_time=None,
                          drift_rate=0.005 / 24.0,
                          stray_light_ntu=0.02,
                          fouling_ntu_per_day=0.05, max_fouling_ntu=5.0,
                          bubble_spike_ntu=10.0, bubble_rate=0.0,
                          sample_line=None, installation=None,
                          calibration_validity_hours=24.0 * 90,
                          dtype=jnp.float32) -> TurbiditySensorParams:
    import numpy as np
    base = B.make_sensor_params(
        measurement_range=(0.0, 1000.0),
        precision=precision or 0.02,       # NTU (2% of reading added below)
        response_time=response_time or 15.0,
        drift_rate=drift_rate, warmup_time_s=30.0,
        hysteresis_magnitude=0.0, max_rate_of_change=100.0,
        installation=installation, sample_line=sample_line, dtype=dtype)
    arr = lambda x: np.asarray(x, dtype)  # noqa: E731
    if bubble_rate == 0.0 and installation is not None:
        bubble_rate = float(getattr(installation, "air_bubble_frequency",
                                    0.0))
    return TurbiditySensorParams(
        zone_index=zone_index, base=base,
        stray_light_ntu=arr(stray_light_ntu),
        fouling_ntu_per_day=arr(fouling_ntu_per_day),
        max_fouling_ntu=arr(max_fouling_ntu),
        bubble_spike_ntu=arr(bubble_spike_ntu),
        bubble_rate=arr(bubble_rate))


def make_turbidity_carry(params: TurbiditySensorParams, key, t0=0.0,
                         dtype=jnp.float32) -> TurbiditySensorCarry:
    import numpy as np
    base = B.make_sensor_carry(params.base, key, t0=t0, initial_value=1.0,
                               dtype=dtype)
    return TurbiditySensorCarry(base=base,
                                window_fouling_ntu=np.asarray(0.0, dtype))


N_NORMALS = B.BASE_NORMALS + 1     # + shot noise
N_UNIFORMS = B.BASE_UNIFORMS + 1   # + bubble-spike draw


def turbidity_read(params: TurbiditySensorParams,
                   carry: TurbiditySensorCarry,
                   true_ntu, t, rand=None):
    """One turbidity reading [NTU]: base pipeline + nephelometer overlay.
    ``true_ntu`` is the class-weighted turbidity at the sensor's zone
    (``particles.turbidity_ntu``). Returns ``(carry', SensorOutput)``."""
    dtype = jnp.asarray(carry.base.current_value).dtype
    prev_ts = carry.base.last_timestamp
    had_prev = carry.base.has_history

    ntu = jnp.asarray(true_ntu, dtype)

    if rand is None:
        key, normals, uniforms = B.draw_read_rand(
            carry.base.key, dtype, extra_normals=1, extra_uniforms=1)
    else:
        key = carry.base.key
        normals, uniforms = rand
    base_carry, out = B.base_read(
        params.base, replace(carry.base, key=key), ntu, t,
        rand=(normals[..., :B.BASE_NORMALS],
              uniforms[..., :B.BASE_UNIFORMS]))
    finite = jnp.isfinite(out.value)
    n1 = normals[..., B.BASE_NORMALS]
    u1 = uniforms[..., B.BASE_UNIFORMS]

    dt = jnp.maximum(out.timestamp - prev_ts, 0.0)
    update = had_prev & finite
    fouling = jnp.where(
        update,
        jnp.minimum(carry.window_fouling_ntu
                    + params.fouling_ntu_per_day * dt / 86400.0,
                    params.max_fouling_ntu),
        carry.window_fouling_ntu)

    measured = out.value
    # positive biases: window fouling + stray-light floor
    measured = measured + fouling + params.stray_light_ntu
    # detector shot noise ~ sqrt(signal), plus 2% of reading
    measured = measured + n1 * (params.base.precision
                                * jnp.sqrt(jnp.maximum(measured, 0.0))
                                + 0.02 * jnp.maximum(measured, 0.0))
    # entrained-air spike (positive, unlike the immersed probes' NaN)
    measured = measured + jnp.where(u1 < params.bubble_rate,
                                    params.bubble_spike_ntu, 0.0)

    final = jnp.clip(measured, params.base.min_value, params.base.max_value)
    value = jnp.where(finite, final, out.value)

    output = B.SensorOutput(
        timestamp=out.timestamp, value=value, raw_value=out.raw_value,
        noise=out.noise, drift=out.drift, status=out.status,
        uncertainty=jnp.where(finite,
                              params.base.precision * 2.0 + fouling,
                              out.uncertainty),
        fault=out.fault)

    base_carry = replace(
        base_carry,
        current_value=jnp.where(finite, value, base_carry.current_value),
        last_value=value)
    return TurbiditySensorCarry(base=base_carry,
                                window_fouling_ntu=fouling), output


def wipe_window(carry: TurbiditySensorCarry) -> TurbiditySensorCarry:
    """Run the mechanical wiper: clears the window-fouling bias."""
    return replace(carry,
                   window_fouling_ntu=jnp.zeros_like(
                       carry.window_fouling_ntu))


def validate_turbidity_sensor(verbose: bool = True) -> bool:
    """Validation in the reference's ``validate_*`` style."""
    checks = []

    def check(name, ok):
        checks.append((name, bool(ok)))
        if verbose:
            print(f"  {'PASS' if ok else 'FAIL'}: {name}")

    def read_once(ntu, fouling=0.0, bubble=False):
        key = jax.random.key(0)
        p = make_turbidity_params(bubble_rate=1.0 if bubble else 0.0,
                                  dtype=jnp.float64)
        c = make_turbidity_carry(p, key, dtype=jnp.float64)
        c = replace(c, base=replace(
            c.base, power_on_time=jnp.float64(-4000.0),
            last_calibration_time=jnp.float64(0.0),
            has_calibration=jnp.asarray(True),
            current_value=jnp.float64(ntu)),
            window_fouling_ntu=jnp.float64(fouling))
        n = jnp.zeros((N_NORMALS,), jnp.float64)
        u = jnp.full((N_UNIFORMS,), 0.5, jnp.float64)
        if bubble:
            u = u.at[-1].set(0.0)      # force the spike draw
        _, out = turbidity_read(p, c, jnp.float64(ntu), jnp.float64(10.0),
                                rand=(n, u))
        return float(out.value)

    # clean instrument reads true + the stray-light floor
    v = read_once(5.0)
    check("clean read = true + stray-light floor (0.02 NTU)",
          abs(v - 5.02) < 1e-3)

    # cannot read zero: the stray-light floor dominates at 0 NTU
    check("stray light sets a nonzero floor at 0 NTU",
          read_once(0.0) >= 0.02 - 1e-9)

    # window fouling biases HIGH
    check("window fouling reads high (+2 NTU)",
          abs(read_once(5.0, fouling=2.0) - 7.02) < 1e-3)

    # bubbles spike positive (not NaN)
    check("air bubble spikes +10 NTU",
          abs(read_once(5.0, bubble=True) - 15.02) < 1e-3)

    # wiper resets fouling
    key = jax.random.key(0)
    p = make_turbidity_params(dtype=jnp.float64)
    c = make_turbidity_carry(p, key, dtype=jnp.float64)
    c = replace(c, window_fouling_ntu=jnp.float64(3.0))
    check("wipe_window clears the fouling bias",
          float(wipe_window(c).window_fouling_ntu) == 0.0)

    ok = all(s for _, s in checks)
    if verbose:
        print(f"Turbidity sensor validation: "
              f"{'ALL PASS' if ok else 'FAILURES PRESENT'}")
    return ok
