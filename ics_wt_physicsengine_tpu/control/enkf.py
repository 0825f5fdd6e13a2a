"""
Ensemble Kalman filter over the full plant state, in-graph.

The EKF (control/ekf.py) linearizes the plant with ``jax.jacfwd`` and
carries an explicit [n, n] covariance — exact to the discretization,
but its per-step cost is n+1 plant evaluations (the Jacobian columns)
plus O(n²) covariance algebra, and a hard nonlinearity (the pH Newton
solve near a buffer-exhaustion corner, phase-front pinning) is only as
good as its tangent. The EnKF replaces both with a MONTE-CARLO
ensemble: N copies of the plant state propagate through the full
nonlinear ``core.reactor.step`` as ONE ``jax.vmap`` batch — exactly
the shape this framework is fastest at (50M+ batched plant-steps/s,
bench.py) — and the covariance is never formed; the update works on
ensemble anomalies. Memory is O(N·n) instead of O(n²), so the same
filter scales to high-resolution zone counts and full-chemistry state
vectors where an explicit covariance would dominate.

No reference counterpart (the reference has no estimator); with
``estimator`` (scalar channels) and ``ekf`` (explicit-covariance
full state) this completes the estimation ladder of the reference's
"advanced control methods" roadmap direction (reference
README.md:432-439).

Design notes (TPU):
- The ensemble axis is a plain leading batch axis: the predict is
  ``vmap(plant_step)`` — MXU/VPU-dense, and it shards over a device
  mesh with ``jax.sharding`` like any Monte-Carlo plant batch (the
  anomaly reductions become ICI collectives under jit, no shard_map
  needed).
- Measurement updates run sequentially per channel in scalar ensemble
  form (exact for diagonal R, same convention as ``ekf``/``estimator``),
  which keeps NaN masking trivial: a dropped sample zeroes that
  channel's innovations and the ensemble simply keeps its spread.
- Perturbed observations (stochastic EnKF, Burgers/van Leeuwen/Evensen
  1998) with CENTERED perturbations: the per-member observation noise
  is drawn once per channel per step and its ensemble mean subtracted,
  removing the O(1/√N) bias in the posterior mean. Note on variance
  conventions: every anomaly statistic in this filter divides by N-1,
  and under THAT convention centered draws are already unbiased
  (E[Σ(w-w̄)²/(N-1)] = σ² exactly) — no sqrt(N/(N-1)) rescale is
  applied, because the (N-1)/N "deflation" only exists under the
  divisor-N convention this filter does not use.
- Multiplicative inflation and Gaspari-Cohn zone localization are
  built in — the standard small-ensemble rank/spurious-correlation
  fixes, both elementwise (cheap) on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.control.ekf import (
    _flat_bounds, _tap_row, field_diag, flatten_state, state_fields,
    unflatten_state)


@jax.tree_util.register_dataclass
@dataclass
class EnKFCarry:
    ensemble: jnp.ndarray   # [N, n] member states
    key: jnp.ndarray        # PRNG key driving noise draws


def make_enkf_carry(state0: R.ReactorState, p0: Sequence[float] | float,
                    n_zones: int, n_ensemble: int,
                    key: jnp.ndarray) -> EnKFCarry:
    """Initial ensemble from a (possibly wrong) state guess.

    Members are drawn ~ N(flatten(state0), diag(p0)) — ``p0`` follows
    :func:`ekf.make_ekf_carry`'s convention (scalar variance, or one
    per field broadcast across its zones) — then clipped to the
    physical bounds so no member starts outside the plant's domain."""
    if n_ensemble < 2:
        raise ValueError(f"n_ensemble must be >= 2 (anomaly statistics "
                         f"divide by N-1), got {n_ensemble}")
    nitrogen = state0.ammonia is not None
    gas = state0.oxygen is not None
    biofilm = state0.bacteria is not None
    tss = getattr(state0, "tss", None)
    n_cls = 0 if tss is None else tss.shape[-2]
    x0 = flatten_state(state0)
    n = x0.shape[-1]
    diag = field_diag(p0, n_zones, nitrogen, gas, biofilm, n_cls,
                      x0.dtype)
    key, sub = jax.random.split(key)
    pert = jax.random.normal(sub, (n_ensemble, n), x0.dtype)
    pert = pert - jnp.mean(pert, axis=0)        # centered: mean == x0
    lo, hi = _flat_bounds(n_zones, nitrogen, gas, biofilm, n_cls,
                          x0.dtype)
    ens = jnp.clip(x0[None, :] + pert * jnp.sqrt(diag)[None, :], lo, hi)
    # Clipping a bound-adjacent guess with wide p0 shifts the ensemble
    # mean away from x0 one-sidedly. Pull the mean back and re-clip; a
    # few fixed passes converge the mean onto x0 whenever that is
    # feasible (it is not when x0 sits ON a bound — any spread then
    # forces the mean strictly inside, and the loop settles on the
    # closest feasible mean instead).
    for _ in range(4):
        ens = jnp.clip(ens + (x0 - jnp.mean(ens, axis=0))[None, :],
                       lo, hi)
    return EnKFCarry(ensemble=ens, key=key)


def _gaspari_cohn(d: np.ndarray, c: float) -> np.ndarray:
    """Gaspari-Cohn (1999) 5th-order compact taper: 1 at distance 0,
    0 beyond 2c — the standard covariance localization function."""
    r = np.asarray(d, np.float64) / float(c)
    near = (-0.25 * r**5 + 0.5 * r**4 + 0.625 * r**3
            - (5.0 / 3.0) * r**2 + 1.0)
    rs = np.maximum(r, 1e-12)                  # guard the 1/r branch
    far = (r**5 / 12.0 - 0.5 * r**4 + 0.625 * r**3
           + (5.0 / 3.0) * r**2 - 5.0 * r + 4.0 - 2.0 / (3.0 * rs))
    out = np.where(r <= 1.0, near, np.where(r <= 2.0, far, 0.0))
    return np.maximum(out, 0.0)


def _entry_zones(n_zones: int, n_fields: int, n_cls: int) -> np.ndarray:
    """Zone index of every flat-state entry (-1 = not zone-local: the
    per-class sludge inventories, which integrate settling from every
    zone and are left un-localized)."""
    z = np.tile(np.arange(n_zones), n_fields)
    if n_cls:
        z = np.concatenate([z, np.tile(np.arange(n_zones), n_cls),
                            np.full(n_cls, -1)])
    return z


def make_enkf(params: R.ReactorParams, n_zones: int,
              taps: Sequence[Tuple[str, int]], dt: float, substeps: int,
              process_noise: Sequence[float] = (1e-6, 1e-5, 1e-5),
              measurement_noise: Sequence[float] | float = 0.01,
              particle_noise: Tuple[float, float] = (1e-4, 1e-8),
              inflation: float = 1.0,
              localization_radius: float | None = None,
              stages=None, diagnostics: bool = False):
    """Build the stochastic-EnKF step for a plant and a set of taps.

    Same conventions as :func:`ekf.make_ekf` — ``taps`` are ``(field,
    zone)`` pairs including extension-species instruments (``ammonia``,
    ``oxygen``, ``turbidity``, ``hpc``, ...), ``process_noise`` is the
    per-field PSD (unit²/s; a 3-entry core value extends with 1e-6 per
    extension species), ``measurement_noise`` the per-channel variance,
    NaN measurements skip their channel exactly. EnKF-specific knobs:

    - ``inflation``: multiplicative anomaly inflation applied after
      each analysis (1.0 = off; 1.01-1.05 typical). Counteracts the
      spread collapse a finite ensemble suffers.
    - ``localization_radius``: Gaspari-Cohn half-width c IN ZONES;
      each tap's gain is tapered to zero beyond 2c zones from the tap,
      killing the spurious long-range correlations a small ensemble
      invents. ``None`` = no localization (correct as N → ∞).

    Returns ``enkf_step(carry, z, boundary) -> (carry', x_hat)`` where
    ``x_hat`` is the posterior ensemble MEAN (flat layout, identical to
    the EKF's — ``tap_index`` / ``unflatten_state`` apply). With
    ``diagnostics=True`` a third element matches the EKF's dict
    (``innovation``/``innovation_variance``/``nis`` per channel, NIS
    computed at the pre-update mean) so :func:`ekf.nis_fault_monitor`
    works unchanged. Build the carry with :func:`make_enkf_carry`; the
    PRNG key rides the carry, so the step is scan-compatible as is."""
    nitrogen = params.nitrogen is not None
    gas = params.gas is not None
    biofilm = params.biofilm is not None
    n_cls = (0 if params.particles is None
             else params.particles.ntu_per_mgl.shape[-1])
    n_fields = len(state_fields(nitrogen, gas, biofilm))
    n = n_fields * n_zones + n_cls * n_zones + n_cls
    idxs = tuple(
        _tap_row(f, z, n_zones, nitrogen, gas, n_cls, n,
                 params.particles, biofilm=biofilm) for f, z in taps)
    q_field = jnp.asarray(process_noise, jnp.float32)
    if q_field.shape == (3,) and n_fields > 3:
        q_field = jnp.concatenate(
            [q_field, jnp.full(n_fields - 3, 1e-6, jnp.float32)])
    if q_field.shape != (n_fields,):
        raise ValueError(f"process_noise is one PSD per field "
                         f"{state_fields(nitrogen, gas, biofilm)}")
    q_diag = jnp.repeat(q_field, n_zones)
    if n_cls:
        q_tss, q_sl = particle_noise
        q_diag = jnp.concatenate([
            q_diag, jnp.full(n_cls * n_zones, q_tss, jnp.float32),
            jnp.full(n_cls, q_sl, jnp.float32)])
    q_std = jnp.sqrt(q_diag * dt)
    r = jnp.broadcast_to(jnp.asarray(measurement_noise, jnp.float32),
                         (len(idxs),))

    if localization_radius is not None:
        zone_of = _entry_zones(n_zones, n_fields, n_cls)
        tapers = []
        for field, zone in taps:
            d = np.abs(zone_of - (zone % n_zones)).astype(np.float64)
            rho = _gaspari_cohn(d, float(localization_radius))
            rho[zone_of < 0] = 1.0      # sludge: never localized
            tapers.append(rho)
        taper = jnp.asarray(np.stack(tapers), jnp.float32)  # [m, n]
    else:
        taper = None

    lo, hi = _flat_bounds(n_zones, nitrogen, gas, biofilm, n_cls,
                          jnp.float32)

    def f_member(x, boundary):
        # Plain clip (not ste_clip): the EnKF never differentiates the
        # model, so the EKF's zero-gradient-absorption hazard (see
        # make_ekf's f_flat) does not apply — but an out-of-bounds
        # member must be pulled back before stepping, or step()'s own
        # hard clamps would bias the forecast anomalies one-sidedly.
        x = jnp.clip(x, lo.astype(x.dtype), hi.astype(x.dtype))
        st = unflatten_state(x, n_zones, nitrogen=nitrogen, gas=gas,
                             biofilm=biofilm, n_classes=n_cls)
        st2 = R.step(params, st, boundary, dt, substeps, stages=stages)
        return flatten_state(st2)

    f_ens = jax.vmap(f_member, in_axes=(0, None))

    def enkf_step(carry: EnKFCarry, z, boundary):
        ens, key = carry.ensemble, carry.key
        n_ens = ens.shape[0]
        key, k_q, k_r = jax.random.split(key, 3)
        # -- forecast: full nonlinear plant on every member, plus
        #    additive model-error noise matching the EKF's Q
        ens = f_ens(ens, boundary)
        # Centered draws leave the mean untouched; under the filter's
        # N-1 anomaly convention their sample covariance is already an
        # unbiased estimate of Q (no rescale — a sqrt(N/(N-1)) factor
        # would inflate it to N/(N-1)·Q under this convention).
        w = jax.random.normal(k_q, ens.shape, ens.dtype)
        w = w - jnp.mean(w, axis=0)            # centered: mean untouched
        ens = ens + w * q_std[None, :].astype(ens.dtype)
        # -- analysis: sequential scalar updates, perturbed observations
        z = jnp.asarray(z)
        eps_all = jax.random.normal(k_r, (len(idxs), n_ens), ens.dtype)
        innovations, variances = [], []
        for k, idx in enumerate(idxs):
            if isinstance(idx, jnp.ndarray):
                hx = ens @ idx.astype(ens.dtype)       # [N] row tap
            else:
                hx = ens[:, idx]                       # [N] state tap
            hx_m = jnp.mean(hx)
            a = hx - hx_m                              # obs anomalies
            s = jnp.sum(a * a) / (n_ens - 1) + r[k]    # innovation var
            A = ens - jnp.mean(ens, axis=0)            # state anomalies
            gain = (A.T @ a) / ((n_ens - 1) * s)       # [n]
            if taper is not None:
                gain = gain * taper[k].astype(ens.dtype)
            zk = z[..., k]
            finite = jnp.isfinite(zk)
            zs = jnp.where(finite, zk, 0.0)
            eps = eps_all[k] * jnp.sqrt(r[k])
            eps = eps - jnp.mean(eps)                  # centered
            innov = jnp.where(finite, (zs + eps) - hx, 0.0)   # [N]
            ens = ens + innov[:, None] * gain[None, :]
            innovations.append(jnp.where(finite, zs - hx_m, jnp.nan))
            variances.append(s)
        if inflation != 1.0:
            mean = jnp.mean(ens, axis=0)
            ens = mean[None, :] + inflation * (ens - mean[None, :])
        ens = jnp.clip(ens, lo, hi)
        new = EnKFCarry(ensemble=ens, key=key)
        x_hat = jnp.mean(ens, axis=0)
        if diagnostics:
            nu = jnp.stack(innovations, axis=-1)
            s_all = jnp.stack(variances, axis=-1)
            return new, x_hat, {"innovation": nu,
                                "innovation_variance": s_all,
                                "nis": nu * nu / s_all}
        return new, x_hat

    return enkf_step


def ensemble_spread(carry: EnKFCarry) -> jnp.ndarray:
    """Per-entry posterior standard deviation (the EnKF's sqrt(diag P))
    — the calibration diagnostic: healthy spread ≈ actual RMSE."""
    ens = carry.ensemble
    return jnp.std(ens, axis=0, ddof=1)
