"""
Moving-horizon estimation: optimization-based state reconstruction,
in-graph.

The estimation ladder so far is recursive — scalar Kalman channels
(:mod:`.estimator`), the full-state EKF (:mod:`.ekf`, exact to the
linearization), the Monte-Carlo EnKF (:mod:`.enkf`, exact as N→∞).
MHE is the OPTIMIZATION member: at every tick it re-solves for the
state at the start of an N-step window by gradient descent on the
measurement misfit of the full NONLINEAR plant rolled across the
window, plus an arrival cost anchoring the window start to the prior.
What that buys over the recursive filters:

- **Hard bounds, handled exactly.** The EKF clips its estimate to the
  physical domain after the fact (a projection the covariance never
  hears about); MHE optimizes WITHIN bounds via the same leaky
  straight-through clip the MPC uses, so a chlorine estimate pinned at
  0 is the constrained optimum, not a truncation artifact.
- **No linearization anywhere.** A window of measurements pulls the
  estimate through the full nonlinear dynamics (the pH Newton solve,
  phase-front pinning) — where the EKF's tangent is only as good as
  one step's Jacobian.
- **Re-interpretation of the past.** Each new measurement re-solves
  the WHOLE window, so a reading at tick k improves the estimate of
  where the plant was at k-N+1 (smoothing), which then propagates
  forward — the recursive filters can never revisit.

No reference counterpart (the reference has no estimator); this
completes the "advanced control methods" roadmap direction of the
reference (reference README.md:432-439) on the estimation side.

Design notes (TPU):
- The decision variable is the window-start state x0 only (perfect
  model within the window — the standard "full-information" form for
  short windows); the solve is ``iters`` Adam steps on
  ``jax.value_and_grad`` THROUGH the N-step ``lax.scan`` rollout, all
  inside one jitted step — the same AD-through-rollout machinery as
  the shooting MPC (control/mpc.py).
- Measurement and boundary-condition windows ride the carry as fixed
  ring buffers (roll + insert), so ``mhe_step`` is scan- and
  vmap-compatible like every other estimator here; NaN measurements
  weight their residual to zero exactly (dropout semantics identical
  to the EKF/EnKF).
- Warm start: the previous solution propagated one step is both the
  initial iterate and the arrival-cost anchor — each tick refines,
  never restarts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.control.ekf import (_flat_bounds, _tap_row,
                                                  field_diag,
                                                  flatten_state,
                                                  state_fields,
                                                  unflatten_state)
from ics_wt_physicsengine_tpu.control.pid import st_clip


@jax.tree_util.register_dataclass
@dataclass
class MHECarry:
    z_buf: jnp.ndarray      # [N, m] measurement window (NaN = missing)
    bc_buf: R.BoundaryConditions   # pytree of [N] arrays
    x0: jnp.ndarray         # estimate of the state at window START


def make_mhe_carry(state0: R.ReactorState, horizon: int, n_taps: int,
                   boundary: R.BoundaryConditions) -> MHECarry:
    """Initial carry from a (possibly wrong) state guess; the window
    pre-fills with NaN measurements (all-masked) and ``boundary``."""
    x0 = flatten_state(state0)
    z_buf = jnp.full((horizon, n_taps), jnp.nan, x0.dtype)
    bc_buf = jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(jnp.asarray(v, x0.dtype),
                                   (horizon,)).copy(), boundary)
    return MHECarry(z_buf=z_buf, bc_buf=bc_buf, x0=x0)


def make_mhe(params: R.ReactorParams, n_zones: int,
             taps: Sequence[Tuple[str, int]], dt: float, substeps: int,
             horizon: int = 10,
             prior_variance: Sequence[float] | float = 0.25,
             measurement_noise: Sequence[float] | float = 0.01,
             iters: int = 20, learning_rate: float = 0.05,
             stages=None):
    """Build the MHE step for a plant and a set of instrument taps.

    Same conventions as :func:`ekf.make_ekf`: ``taps`` are ``(field,
    zone)`` channels (extension-species instruments included),
    ``measurement_noise`` the per-channel variance, NaN measurements
    drop their channel exactly. MHE-specific knobs:

    - ``horizon``: window length N in steps — each tick re-solves the
      state N steps ago from the N buffered measurements.
    - ``prior_variance``: arrival-cost variance (scalar or per-field,
      EKF ``p0`` convention) — how far the window-start may move from
      the propagated previous solution per tick. Larger = trust the
      window's data more; smaller = heavier smoothing.
    - ``iters`` / ``learning_rate``: Adam budget of the per-tick
      solve (warm-started, so ~10-30 suffice).

    Returns ``mhe_step(carry, z, boundary) -> (carry', x_hat)`` with
    ``x_hat`` the estimate at the CURRENT tick (window end), flat
    layout identical to the EKF's. Build the carry with
    :func:`make_mhe_carry`. The cost per tick is
    ``iters x horizon x substeps`` plant-step gradient evaluations —
    the price of the optimization form; vmap for estimator banks."""
    import optax

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
    m = len(idxs)
    r = jnp.broadcast_to(jnp.asarray(measurement_noise, jnp.float32),
                         (m,))
    p_diag = field_diag(prior_variance, n_zones, nitrogen, gas, biofilm,
                        n_cls, jnp.float32, what="prior_variance")
    lo, hi = _flat_bounds(n_zones, nitrogen, gas, biofilm, n_cls,
                          jnp.float32)

    def step_flat(x, bc):
        # Leaky straight-through bounds (the MPC's st_clip — MHE
        # differentiates the same multi-step recurrent rollout shape,
        # where a full-STE tangent can grow unstably): the plant always
        # steps an in-domain state, an out-of-bounds iterate keeps a
        # leak-scaled escape gradient instead of a dead zone, and the
        # arrival cost supplies the restoring pull.
        # bounds cast to x's dtype: a weakly-typed f64 state would
        # otherwise be demoted to f32 by weak+strong promotion, and the
        # integrator scan's carry dtype would flip mid-trace
        x = st_clip(x, lo.astype(x.dtype), hi.astype(x.dtype))
        st = unflatten_state(x, n_zones, nitrogen=nitrogen, gas=gas,
                             biofilm=biofilm, n_classes=n_cls)
        st2 = R.step(params, st, bc, dt, substeps, stages=stages)
        return flatten_state(st2)

    def measure(x):
        cols = []
        for idx in idxs:
            if isinstance(idx, jnp.ndarray):
                cols.append(x @ idx.astype(x.dtype))
            else:
                cols.append(x[idx])
        return jnp.stack(cols, axis=-1)               # [m]

    def window_rollout(x0, bc_buf):
        def body(x, bc):
            x = step_flat(x, bc)
            return x, x
        return jax.lax.scan(body, x0, bc_buf)         # (x_end, xs [N, n])

    def cost(x0, x_prior, z_buf, bc_buf):
        _, xs = window_rollout(x0, bc_buf)
        z_hat = jax.vmap(measure)(xs)                 # [N, m]
        finite = jnp.isfinite(z_buf)
        resid = jnp.where(finite, z_hat - jnp.nan_to_num(z_buf), 0.0)
        meas = jnp.sum(resid * resid / r)
        arrival = jnp.sum((x0 - x_prior) ** 2 / p_diag)
        return meas + arrival

    opt = optax.adam(learning_rate)

    @jax.jit
    def mhe_step(carry: MHECarry, z, boundary):
        # -- slide the window: drop the oldest (z, bc), append current
        bc_old = jax.tree_util.tree_map(lambda b: b[0], carry.bc_buf)
        z_buf = jnp.concatenate([carry.z_buf[1:],
                                 jnp.asarray(z, carry.z_buf.dtype)[None]])
        bc_buf = jax.tree_util.tree_map(
            lambda buf, v: jnp.concatenate(
                [buf[1:], jnp.asarray(v, buf.dtype)[None]]),
            carry.bc_buf, boundary)
        # -- warm start + arrival anchor: previous window-start
        #    propagated one step with the boundary that just left
        x_prior = jnp.clip(step_flat(carry.x0, bc_old), lo, hi)

        def adam_body(c, _):
            x0, opt_state = c
            val, g = jax.value_and_grad(cost)(x0, x_prior, z_buf, bc_buf)
            g = jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)
            upd, opt_state = opt.update(g, opt_state, x0)
            return (optax.apply_updates(x0, upd), opt_state), val

        (x0, _), _ = jax.lax.scan(adam_body, (x_prior, opt.init(x_prior)),
                                  None, length=iters)
        x0 = jnp.clip(x0, lo, hi)
        x_end, _ = window_rollout(x0, bc_buf)
        x_hat = jnp.clip(x_end, lo, hi)
        return MHECarry(z_buf=z_buf, bc_buf=bc_buf, x0=x0), x_hat

    return mhe_step
