"""
Extended Kalman filter over the FULL plant state, in-graph.

The scalar filters in :mod:`.estimator` smooth individual measurement
channels; this module reconstructs the whole reactor state — every
zone's pH, chlorine and temperature, including the zones no instrument
touches — from the handful of noisy boundary-zone measurements a real
plant has. The physics model doubles as the process model: the
transition Jacobian is ``jax.jacfwd`` of the same
``core.reactor.step`` the simulator integrates, so the filter is exact
to the discretization (no hand-linearized model to drift out of sync
with the plant), and the whole predict/update is jit/vmap-compatible —
a Monte-Carlo ensemble of filters runs as one batched program.

No reference counterpart (the reference has no estimator); this is the
state-estimation leg of its "advanced control methods" roadmap
direction (reference README.md:432-439).

Design notes (TPU):
- State dimension is 3*n_zones (15 for the default plant): the [n,n]
  covariance algebra is negligible next to the plant step itself.
- Measurement updates run sequentially per channel in scalar form
  (exactly equivalent to the joint update for diagonal R), which makes
  per-channel NaN masking trivial: a dropped-out instrument skips its
  update and the covariance simply stays wider — same convention as
  ``estimator.kalman_step``.
- The covariance is re-symmetrized after each predict/update to keep
  float32 round-off from accumulating asymmetry over long scans.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.control.pid import ste_clip

# Measurable fields, in state-vector order; nitrogen species follow the
# core when the plant runs the nitrogen chemistry (core/nitrogen.py)
_FIELDS = ("pH", "chlorine", "temperature")
_N_FIELDS = ("ammonia", "nitrite", "nitrate", "chloramine")
_G_FIELDS = ("oxygen", "carbonate")
_B_FIELDS = ("bacteria", "bdoc", "biofilm")


def state_fields(nitrogen: bool = False, gas: bool = False,
                 biofilm: bool = False) -> tuple:
    return _FIELDS + (_N_FIELDS if nitrogen else ()) \
        + (_G_FIELDS if gas else ()) + (_B_FIELDS if biofilm else ())


def _flat_bounds(n_zones: int, nitrogen: bool, gas: bool, biofilm: bool,
                 n_classes: int, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-entry physical bounds of the flat state vector, matching
    step()'s own clamps (pH [0,14], T [0,100], every concentration-like
    species >= 0) — used for the filter's leaky straight-through
    pre-clip (see make_ekf's f_flat)."""
    fields = state_fields(nitrogen, gas, biofilm)
    lo_f = {f: 0.0 for f in fields}
    hi_f = {f: jnp.inf for f in fields}
    hi_f["pH"] = 14.0
    hi_f["temperature"] = 100.0
    lo = [jnp.full(n_zones, lo_f[f], dtype) for f in fields]
    hi = [jnp.full(n_zones, hi_f[f], dtype) for f in fields]
    if n_classes:
        lo.append(jnp.zeros(n_classes * n_zones + n_classes, dtype))
        hi.append(jnp.full(n_classes * n_zones + n_classes, jnp.inf,
                           dtype))
    return jnp.concatenate(lo), jnp.concatenate(hi)


def _n_classes(state_or_none) -> int:
    """Particle class count carried by a state (0 when particles off)."""
    tss = getattr(state_or_none, "tss", None)
    return 0 if tss is None else tss.shape[-2]


@jax.tree_util.register_dataclass
@dataclass
class EKFCarry:
    x: jnp.ndarray   # [..., n_fields*n_zones] state estimate
    P: jnp.ndarray   # [..., n, n] covariance


def flatten_state(state: R.ReactorState) -> jnp.ndarray:
    """ReactorState -> flat vector (pH | Cl | T [| NH3 | NO2 | NO3 |
    NH2Cl] [| O2 | C_T] [| TSS classes x zones | sludge classes] —
    species included when the state carries them)."""
    arrs = [state.pH, state.chlorine, state.temperature]
    if state.ammonia is not None:
        arrs += [state.ammonia, state.nitrite, state.nitrate,
                 state.chloramine]
    if state.oxygen is not None:
        arrs += [state.oxygen, state.carbonate]
    if state.bacteria is not None:
        arrs += [state.bacteria, state.bdoc, state.biofilm]
    if state.tss is not None:
        c, z = state.tss.shape[-2:]
        arrs += [state.tss.reshape(state.tss.shape[:-2] + (c * z,)),
                 state.sludge]
    return jnp.concatenate(arrs, axis=-1)


def unflatten_state(x: jnp.ndarray, n_zones: int,
                    time=0.0, flow_rate=0.0,
                    nitrogen: bool = False,
                    gas: bool = False,
                    biofilm: bool = False,
                    n_classes: int = 0) -> R.ReactorState:
    """Flat vector -> ReactorState (derived fields recomputed).

    ``n_classes > 0`` declares a particle plant: the trailing
    ``n_classes * n_zones + n_classes`` entries are the TSS class
    concentrations ([..., C, Z]) and the settled sludge inventory."""
    fields = state_fields(nitrogen, gas, biofilm)
    p_kw = {}
    if n_classes:
        n_p = n_classes * n_zones + n_classes
        xp, x = x[..., -n_p:], x[..., :-n_p]
        p_kw = dict(
            tss=xp[..., :n_classes * n_zones].reshape(
                xp.shape[:-1] + (n_classes, n_zones)),
            sludge=xp[..., n_classes * n_zones:])
    parts = {f: x[..., i * n_zones:(i + 1) * n_zones]
             for i, f in enumerate(fields)}
    st = R.ReactorState(
        time=jnp.asarray(time, x.dtype),
        pH=parts["pH"], chlorine=parts["chlorine"],
        temperature=parts["temperature"],
        flow_rate=jnp.asarray(flow_rate, x.dtype),
        **({k: parts[k] for k in _N_FIELDS} if nitrogen else {}),
        **({k: parts[k] for k in _G_FIELDS} if gas else {}),
        **({k: parts[k] for k in _B_FIELDS} if biofilm else {}),
        **p_kw)
    return st.update_derived()


def tap_index(field: str, zone: int, n_zones: int,
              nitrogen: bool = False, gas: bool = False,
              biofilm: bool = False) -> int:
    """State-vector index of ``field`` at ``zone`` (negative zones ok)."""
    fields = state_fields(nitrogen, gas, biofilm)
    if field not in fields:
        raise ValueError(f"field must be one of {fields}, got {field!r}")
    if not -n_zones <= zone < n_zones:
        raise ValueError(f"zone {zone} outside [{-n_zones}, {n_zones})")
    return fields.index(field) * n_zones + (zone % n_zones)


def tss_index(cls: int, zone: int, n_zones: int, n_classes: int,
              nitrogen: bool = False, gas: bool = False,
              biofilm: bool = False) -> int:
    """State-vector index of TSS class ``cls`` at ``zone`` on a
    particle plant (the particle block trails the zone fields)."""
    if not -n_classes <= cls < n_classes:
        raise ValueError(f"class {cls} outside [{-n_classes}, "
                         f"{n_classes})")
    if not -n_zones <= zone < n_zones:
        raise ValueError(f"zone {zone} outside [{-n_zones}, {n_zones})")
    base = len(state_fields(nitrogen, gas, biofilm)) * n_zones
    return base + (cls % n_classes) * n_zones + (zone % n_zones)


def field_diag(values: Sequence[float] | float, n_zones: int,
               nitrogen: bool, gas: bool, biofilm: bool, n_cls: int,
               dtype, what: str = "p0") -> jnp.ndarray:
    """Per-field values -> flat-state diagonal (the shared p0/prior
    convention of make_ekf_carry / make_enkf_carry / make_mhe): a
    scalar broadcasts everywhere; a per-field vector (core fields +
    enabled species[, + (tss, sludge) when particles are on]) repeats
    across each field's zones, the tss entry across every class x zone
    and the sludge entry across the per-class inventory."""
    n_fields = len(state_fields(nitrogen, gas, biofilm))
    n = n_fields * n_zones + n_cls * n_zones + n_cls
    arr = jnp.asarray(values, dtype)
    if arr.ndim == 0:
        return jnp.full(n, arr, dtype)
    want = n_fields + (2 if n_cls else 0)
    if arr.shape != (want,):
        raise ValueError(f"{what} needs {want} per-field entries "
                         f"(or a scalar), got {arr.shape}")
    diag = jnp.repeat(arr[:n_fields].astype(dtype), n_zones)
    if n_cls:
        diag = jnp.concatenate([
            diag,
            jnp.full(n_cls * n_zones, arr[n_fields], dtype),
            jnp.full(n_cls, arr[n_fields + 1], dtype)])
    return diag


def make_ekf_carry(state0: R.ReactorState, p0: Sequence[float] | float,
                   n_zones: int) -> EKFCarry:
    """Initial carry from a (possibly wrong) state guess.

    ``p0`` is the initial variance — a scalar, or one value per field
    (pH, chlorine, temperature[, ammonia, nitrite, nitrate,
    chloramine][, oxygen, carbonate][, tss, sludge]) broadcast across
    that field's zones (the tss entry covers every class x zone; the
    sludge entry the per-class inventory)."""
    nitrogen = state0.ammonia is not None
    gas = state0.oxygen is not None
    biofilm = state0.bacteria is not None
    n_cls = _n_classes(state0)
    x0 = flatten_state(state0)
    n = x0.shape[-1]
    diag = field_diag(p0, n_zones, nitrogen, gas, biofilm, n_cls,
                      x0.dtype)
    P0 = jnp.zeros(x0.shape + (n,), x0.dtype) + jnp.diag(diag)
    return EKFCarry(x=x0, P=P0)


def make_ekf(params: R.ReactorParams, n_zones: int,
             taps: Sequence[Tuple[str, int]], dt: float, substeps: int,
             process_noise: Sequence[float] = (1e-6, 1e-5, 1e-5),
             measurement_noise: Sequence[float] | float = 0.01,
             particle_noise: Tuple[float, float] = (1e-4, 1e-8),
             stages=None, diagnostics: bool = False):
    """Build the EKF step function for a plant and a set of instrument
    taps.

    ``taps`` lists the measured channels as ``(field, zone)`` pairs,
    e.g. ``[("pH", 0), ("pH", -1), ("chlorine", -1),
    ("temperature", -1)]`` — the canonical suite's boundary-zone
    instruments. ``process_noise`` is the per-field PSD
    (unit²/s, broadcast over zones); ``measurement_noise`` the
    per-channel variance (scalar or one per tap — instrument
    ``precision²`` is the natural value).

    Returns ``ekf_step(carry, z, boundary) -> (carry', x_hat)`` where
    ``z`` is the ``[..., len(taps)]`` measurement vector (NaN = dropped
    sample; that channel's update is skipped) and ``x_hat`` the
    posterior flat state. With ``diagnostics=True`` the step returns a
    third element: ``{"innovation", "innovation_variance", "nis"}`` per
    channel — the NIS (normalized innovation squared) is ~chi-square(1)
    for a healthy channel, the basis for instrument fault detection
    (:func:`nis_fault_monitor`). Wrap in ``jax.vmap`` for filter
    ensembles.

    Nitrogen plants (``params.nitrogen`` set) extend the state to 7
    fields per zone (pH, Cl, T, NH3, NO2, NO3, NH2Cl); gas plants
    (``params.gas``) append O2 and C_T after any nitrogen species. Taps
    may then include the species (e.g. ``("ammonia", -1)`` — the ISE
    instrument — or ``("oxygen", -1)`` — the DO probe), and
    ``process_noise`` takes one PSD per field (a 3-entry core value is
    extended with 1e-6 for each extension species).

    Particle plants (``params.particles``) append the TSS class
    concentrations and the sludge inventory after every zone field.
    The nephelometer's measurand is the class-WEIGHTED sum
    ``sum_c ntu_per_mgl[c] * tss[c, z]`` — a linear combination, not a
    single state entry — so ``("turbidity", zone)`` taps build a full
    measurement row and the update runs in general scalar form
    (y = h.x); the filter apportions the innovation across classes by
    their covariances (soft-sensing the size distribution from one
    NTU channel). ``particle_noise`` is the (tss, sludge) PSD pair."""
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
    q_diag = q_diag * dt
    r = jnp.broadcast_to(jnp.asarray(measurement_noise, jnp.float32),
                         (len(idxs),))

    lo, hi = _flat_bounds(n_zones, nitrogen, gas, biofilm, n_cls,
                          jnp.float32)

    def f_flat(x, boundary):
        # Full straight-through clip to the physical bounds BEFORE the
        # plant model: step() hard-clamps out-of-range species
        # (reactor.py _enforce_bounds + the per-axis jnp.maximum guards),
        # and a hard clamp's zero gradient is an ABSORBING region for the
        # filter — one noisy update pushing an unmeasured soft-sensed
        # field (e.g. the wall film) below zero zeroes its Jacobian row,
        # collapses its covariance to the process-noise floor, and the
        # filter permanently reads "clean tank". Backward must be FULL
        # identity (ste_clip), not st_clip's leak: any tangent discount
        # scales the self-transition F(i,i) below 1 and the predict then
        # shrinks P(i,i) by its square every step — the same collapse by
        # another road (see ste_clip's docstring).
        # bounds cast to x's dtype: a weakly-typed f64 state (e.g. built
        # from jnp.full(..., 7.0) leaves) would otherwise be silently
        # demoted to f32 by JAX's weak+strong promotion rule here
        x = ste_clip(x, lo.astype(x.dtype), hi.astype(x.dtype))
        st = unflatten_state(x, n_zones, nitrogen=nitrogen, gas=gas,
                             biofilm=biofilm, n_classes=n_cls)
        st2 = R.step(params, st, boundary, dt, substeps, stages=stages)
        return flatten_state(st2)

    ekf_step = _build_ekf_step(f_flat, idxs, q_diag, r,
                               diagnostics=diagnostics)
    return ekf_step


def _tap_row(field: str, zone: int, n_zones: int, nitrogen: bool,
             gas: bool, n_classes: int, n: int, pp,
             biofilm: bool = False):
    """A tap -> either a state index (direct state measurements) or a
    measurement row h (linear-combination measurands)."""
    if field == "hpc":
        # lab plate count [CFU/mL]: a SCALED read of the bacteria state
        # (core/biofilm.py CELLS_PER_MG_C) — soft-sensing the biomass
        # field (and, through the wall-demand coupling in the process
        # model, the unmeasurable wall film) from grab samples
        if not biofilm:
            raise ValueError("hpc taps need a biofilm plant "
                             "(params.biofilm)")
        from ics_wt_physicsengine_tpu.core.biofilm import CELLS_PER_MG_C
        h = jnp.zeros((n,), jnp.float32)
        i = tap_index("bacteria", zone, n_zones, nitrogen, gas, biofilm)
        return h.at[i].set(jnp.float32(CELLS_PER_MG_C / 1000.0))
    if field == "turbidity":
        if not n_classes:
            raise ValueError("turbidity taps need a particle plant "
                             "(params.particles)")
        if not -n_zones <= zone < n_zones:
            raise ValueError(f"zone {zone} outside "
                             f"[{-n_zones}, {n_zones})")
        h = jnp.zeros((n,), jnp.float32)
        base = len(state_fields(nitrogen, gas, biofilm)) * n_zones
        for c in range(n_classes):
            h = h.at[base + c * n_zones + (zone % n_zones)].set(
                pp.ntu_per_mgl[c].astype(jnp.float32))
        return h
    if field == "tss" and n_classes:
        # total-solids tap (unweighted class sum) at one zone
        h = jnp.zeros((n,), jnp.float32)
        base = len(state_fields(nitrogen, gas, biofilm)) * n_zones
        for c in range(n_classes):
            h = h.at[base + c * n_zones + (zone % n_zones)].set(1.0)
        return h
    return tap_index(field, zone, n_zones, nitrogen, gas, biofilm)


def _build_ekf_step(f_flat, idxs, q_diag, r, diagnostics: bool = False):
    def ekf_step(carry: EKFCarry, z, boundary) -> Tuple[EKFCarry,
                                                        jnp.ndarray]:
        # -- predict: nonlinear step + Jacobian at the prior mean
        x_pred = f_flat(carry.x, boundary)
        F = jax.jacfwd(lambda x: f_flat(x, boundary))(carry.x)
        P = F @ carry.P @ F.T + jnp.diag(q_diag).astype(carry.P.dtype)
        P = 0.5 * (P + P.T)
        # -- update: sequential scalar updates (diagonal R), NaN-masked
        x, Pu = x_pred, P
        z = jnp.asarray(z)
        innovations, variances = [], []
        for k, idx in enumerate(idxs):
            zk = z[..., k]
            finite = jnp.isfinite(zk)
            zs = jnp.where(finite, zk, 0.0)
            if isinstance(idx, jnp.ndarray):
                # general measurement row: y = h.x (e.g. turbidity —
                # a class-weighted sum of TSS states)
                h = idx.astype(Pu.dtype)
                p_row = jnp.einsum("...ij,j->...i", Pu, h)   # P h
                s = jnp.einsum("...i,i->...", p_row, h) + r[k]
                gain = p_row / s[..., None]
                innov = zs - jnp.einsum("...i,i->...", x, h)
            else:
                p_row = Pu[..., idx, :]           # P @ h (h = e_idx)
                s = p_row[..., idx] + r[k]        # innovation variance
                gain = p_row / s[..., None]       # K = P h / s
                innov = zs - x[..., idx]
            innovations.append(jnp.where(finite, innov, jnp.nan))
            variances.append(s)
            x_upd = x + gain * innov[..., None]
            Pu_upd = Pu - gain[..., :, None] * p_row[..., None, :]
            Pu_upd = 0.5 * (Pu_upd + Pu_upd.T)
            x = jnp.where(finite[..., None], x_upd, x)
            Pu = jnp.where(finite[..., None, None], Pu_upd, Pu)
        new = EKFCarry(x=x, P=Pu)
        if diagnostics:
            nu = jnp.stack(innovations, axis=-1)
            s_all = jnp.stack(variances, axis=-1)
            # per-channel normalized innovation squared — ~chi²(1) when
            # the channel is healthy and the filter consistent
            return new, x, {"innovation": nu,
                            "innovation_variance": s_all,
                            "nis": nu * nu / s_all}
        return new, x

    return ekf_step


def nis_fault_monitor(n_channels: int, alpha: float = 0.1,
                      threshold: float = 4.0, dtype=jnp.float32):
    """Innovation-based instrument fault detection on top of an EKF
    built with ``diagnostics=True``.

    A healthy channel's NIS averages ~1 (chi-square(1)); a biased,
    stuck, or drifting instrument pushes its innovations outside the
    filter's predicted variance and the NIS average rises. This keeps
    an exponential moving average per channel and flags it once the
    average exceeds ``threshold`` (4.0 ~= sustained 2-sigma
    inconsistency — far beyond noise for an EMA with
    ``alpha=0.1``). NaN NIS entries (dropouts) leave the average
    untouched: a dropout is detected by the sensor's own fault bits,
    not by innovation statistics.

    Returns ``(ema0, update)`` where
    ``update(ema, diag) -> (ema', flags)`` consumes the diagnostics
    dict from the EKF step; pure and scan/vmap-compatible."""
    ema0 = jnp.ones((n_channels,), dtype)   # start at the healthy mean

    def update(ema, diag):
        nis = diag["nis"]
        fresh = jnp.isfinite(nis)
        ema = jnp.where(fresh, (1.0 - alpha) * ema + alpha * nis, ema)
        return ema, ema > threshold

    return ema0, update


def make_augmented_ekf(params: R.ReactorParams, n_zones: int,
                       taps: Sequence[Tuple[str, int]], dt: float,
                       substeps: int,
                       augment: Sequence[str] = ("inlet_chlorine",),
                       augment_noise: Sequence[float] | float = 1e-6,
                       process_noise: Sequence[float] = (1e-6, 1e-5,
                                                         1e-5),
                       measurement_noise: Sequence[float] | float = 0.01,
                       stages=None, diagnostics: bool = False):
    """EKF with ONLINE PARAMETER ESTIMATION: unknown boundary fields
    ride the state vector as random-walk states.

    ``augment`` names ``BoundaryConditions`` fields the filter treats
    as unknown (e.g. ``inlet_chlorine`` — an upstream disturbance no
    instrument measures); the corresponding entries of the provided
    boundary are IGNORED and replaced by the estimates, which evolve as
    random walks with PSD ``augment_noise`` (unit²/s each; size it to
    how fast the disturbance genuinely drifts). The state vector is
    ``[3*n_zones core | len(augment) parameters]`` — use
    ``3*n_zones + i`` to read parameter ``i`` from the posterior.

    Returns ``ekf_step(carry, z, boundary) -> (carry', x_hat)`` with
    the same conventions as :func:`make_ekf`. Build the carry with
    :func:`make_augmented_carry`. Identifiability is the caller's
    responsibility: an augmented parameter must actually move the
    measured channels (inlet_chlorine moves every zone's chlorine, so
    the outlet tap identifies it)."""
    import dataclasses

    nitrogen = params.nitrogen is not None
    gas = params.gas is not None
    biofilm = params.biofilm is not None
    n_cls = (0 if params.particles is None
             else params.particles.ntu_per_mgl.shape[-1])
    n_fields = len(state_fields(nitrogen, gas, biofilm))
    bc_fields = {f.name for f in
                 dataclasses.fields(R.BoundaryConditions)}
    for name in augment:
        if name not in bc_fields:
            raise ValueError(f"{name!r} is not a BoundaryConditions "
                             f"field")
    n_aug = len(augment)
    n_core = n_fields * n_zones + n_cls * n_zones + n_cls
    idxs = tuple(
        _tap_row(f, z, n_zones, nitrogen, gas, n_cls,
                 n_core + n_aug, params.particles, biofilm=biofilm)
        for f, z in taps)
    q_field = jnp.asarray(process_noise, jnp.float32)
    if q_field.shape == (3,) and n_fields > 3:
        q_field = jnp.concatenate(
            [q_field, jnp.full(n_fields - 3, 1e-6, jnp.float32)])
    if q_field.shape != (n_fields,):
        raise ValueError(f"process_noise is one PSD per field "
                         f"{state_fields(nitrogen, gas, biofilm)}")
    q_aug = jnp.broadcast_to(
        jnp.asarray(augment_noise, jnp.float32), (n_aug,))
    q_core = jnp.repeat(q_field, n_zones)
    if n_cls:
        q_core = jnp.concatenate([
            q_core, jnp.full(n_cls * n_zones, 1e-4, jnp.float32),
            jnp.full(n_cls, 1e-8, jnp.float32)])
    q_diag = jnp.concatenate([q_core, q_aug]) * dt
    r = jnp.broadcast_to(jnp.asarray(measurement_noise, jnp.float32),
                         (len(idxs),))

    lo, hi = _flat_bounds(n_zones, nitrogen, gas, biofilm, n_cls,
                          jnp.float32)

    def f_flat(x, boundary):
        theta = x[..., n_core:]
        bc = dataclasses.replace(
            boundary, **{name: theta[..., i]
                         for i, name in enumerate(augment)})
        # same straight-through bound pre-clip as make_ekf (see comment
        # there); theta stays unclipped — parameters have no physical
        # clamp in the plant model
        st = unflatten_state(ste_clip(x[..., :n_core],
                                      lo.astype(x.dtype),
                                      hi.astype(x.dtype)), n_zones,
                             nitrogen=nitrogen, gas=gas, biofilm=biofilm,
                             n_classes=n_cls)
        st2 = R.step(params, st, bc, dt, substeps, stages=stages)
        return jnp.concatenate([flatten_state(st2), theta], axis=-1)

    return _build_ekf_step(f_flat, idxs, q_diag, r,
                           diagnostics=diagnostics)


def make_augmented_carry(state0: R.ReactorState,
                         theta0: Sequence[float],
                         p0: Sequence[float] | float,
                         p0_theta: Sequence[float] | float,
                         n_zones: int) -> EKFCarry:
    """Carry for :func:`make_augmented_ekf`: core guess + parameter
    guesses ``theta0`` with their initial variances ``p0_theta``."""
    core = make_ekf_carry(state0, p0, n_zones)
    theta0 = jnp.asarray(theta0, core.x.dtype)
    n_aug = theta0.shape[-1]
    n_core = core.x.shape[-1]
    p0_t = jnp.broadcast_to(
        jnp.asarray(p0_theta, core.x.dtype), (n_aug,))
    n = n_core + n_aug
    P = jnp.zeros((n, n), core.x.dtype)
    P = P.at[:n_core, :n_core].set(core.P)
    P = P.at[jnp.arange(n_core, n),
             jnp.arange(n_core, n)].set(p0_t)
    return EKFCarry(x=jnp.concatenate([core.x, theta0]), P=P)


def ekf_observer(controller, ekf_step, n_zones: int,
                 measured: Sequence[str],
                 estimates: dict,
                 batched: bool = False,
                 nitrogen: bool = False, gas: bool = False,
                 biofilm: bool = False):
    """Wrap a controller so it acts on EKF state ESTIMATES instead of
    raw instrument readings — observer-based output feedback, in-graph.

    ``ekf_step`` comes from :func:`make_ekf` built with taps matching
    ``measured``: the observation names (e.g. ``"pH_inlet"``,
    ``"chlorine_outlet"``) whose readings form the measurement vector,
    in tap order. ``estimates`` maps observation names to ``(field,
    zone)`` — each is written into the controller's observation dict
    from the EKF posterior, REPLACING the raw reading (so the PID acts
    on the filtered state) or ADDING channels no instrument measures
    (e.g. ``{"chlorine_middle": ("chlorine", 2)}``).

    The wrapped carry is ``(ctrl_carry, EKFCarry)``. The wrapper
    declares ``wants_boundary`` so ``rollout_closed_loop`` passes the
    boundary that drove the tick — the EKF's predict must see the same
    forcing the plant integrated. The EKF's dt is baked into
    ``ekf_step`` (from ``make_ekf``); it must equal the rollout's dt.
    ``batched=True`` vmaps the filter over a leading lane axis (use
    with ``rollout_closed_loop(batched=True)``)."""
    idx_of = {name: tap_index(f, z, n_zones, nitrogen, gas, biofilm)
              for name, (f, z) in estimates.items()}
    step_fn = (jax.vmap(ekf_step, in_axes=(0, 0, 0)) if batched
               else ekf_step)

    def step(gains, carry, obs, dt, boundary):
        ctrl_carry, ekf_carry = carry
        z = jnp.stack([obs[name] for name in measured], axis=-1)
        ekf_carry, x = step_fn(ekf_carry, z, boundary)
        est_obs = dict(obs)
        for name, idx in idx_of.items():
            est_obs[name] = x[..., idx]
        ctrl_carry, commands = controller(gains, ctrl_carry, est_obs, dt)
        return (ctrl_carry, ekf_carry), commands

    step.wants_boundary = True
    return step
