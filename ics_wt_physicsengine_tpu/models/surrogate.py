"""
Learned plant surrogate: an MXU-dense neural one-step model of the
reactor, trained against the physics engine it replaces.

Why this exists: every other hot path in this framework is VPU-bound —
the physics is elementwise stencil math with no matmuls, so MXU
utilization is structurally ~0 (docs/PERFORMANCE.md). A learned
surrogate inverts that: the plant transition becomes two dense layers
(pure MXU work, bfloat16-friendly), which buys three production
capabilities the exact model cannot offer at scale:

- **Cheap re-planning**: shooting MPC whose inner rollouts cost matmul
  flops instead of `substeps` physics sweeps per step — the surrogate
  plans, the exact plant (or the real one, over Modbus/OPC UA) applies
  (``run_mpc_surrogate``).
- **Massive scenario screening**: batched surrogate rollouts screen
  10^5+ dosing programs for the exact engine (or the real plant) to
  verify the shortlist.
- **A differentiable model where none exists**: the same training
  harness fits plant-response data that did NOT come from this physics
  (field histories via utils/history), giving gradient-based control
  on plants the engine does not model.

No reference counterpart (the reference has no learned components and
no "model family" beyond the one hand-derived ODE system); this
extends its "advanced control methods" roadmap direction (reference
README.md:432-439) in the direction only a compiled-AD framework can.

Design notes (TPU):
- **Residual parameterization**: ``x' = clip(x + denorm(MLP(norm(x),
  norm(u))))`` with a zero-initialized output layer, so the untrained
  surrogate is exactly the identity and training only has to learn the
  (small, well-conditioned) one-step increment. Normalization
  statistics are computed from the training set and travel inside
  ``SurrogateParams`` — a checkpointed surrogate is self-contained.
- **State layout** is the control stack's flat vector
  (``control.ekf.flatten_state``: pH | Cl | T | enabled extension
  species), so taps, EKF estimates, and checkpoints interoperate with
  the surrogate unchanged, whatever axes the plant enables.
- **Everything is in-graph**: dataset generation (vmapped physics
  rollouts under piecewise-constant random forcing), Adam training
  (one ``lax.scan`` over minibatch steps, minibatches drawn by PRNG
  fold-in), multi-step fine-tuning (scan-of-scan), and inference. The
  training batch axis shards over a device mesh with a plain
  NamedSharding — data-parallel training is the same program.
- **Precision**: parameters live in float32; ``compute_dtype=bfloat16``
  runs the matmuls on the MXU's native input type with float32
  accumulation (``preferred_element_type``), the standard TPU recipe.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.control.ekf import (_flat_bounds,
                                                  flatten_state,
                                                  state_fields,
                                                  tap_index)
from ics_wt_physicsengine_tpu.control.closed_loop import _COMMAND_LIMITS
from ics_wt_physicsengine_tpu.control.pid import st_clip

_DEFAULT_CONTROLS = ("chlorine_flow_rate",)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SurrogateParams:
    """MLP weights + the normalization statistics that make them
    portable. All leaves are arrays; the pytree checkpoints with
    ``utils.checkpoint.save_pytree`` as-is."""
    weights: Tuple[jnp.ndarray, ...]   # ((W, b), ...) alternating, flat
    x_mean: jnp.ndarray                # [n] state normalization
    x_std: jnp.ndarray                 # [n]
    u_scale: jnp.ndarray               # [m] control normalization (0-max)
    r_mean: jnp.ndarray                # [n] residual normalization
    r_std: jnp.ndarray                 # [n]
    lo: jnp.ndarray                    # [n] physical bounds (step clamps)
    hi: jnp.ndarray                    # [n]


def _init_mlp(key, sizes: Sequence[int], dtype=jnp.float32):
    """LeCun-normal hidden layers; ZERO-initialized output layer so the
    fresh surrogate predicts residual 0 (identity dynamics)."""
    ws = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, k in enumerate(keys):
        fan_in = sizes[i]
        w = jax.random.normal(k, (sizes[i], sizes[i + 1]), dtype) \
            / jnp.sqrt(jnp.asarray(fan_in, dtype))
        if i == len(keys) - 1:
            w = jnp.zeros_like(w)
        ws.append(w)
        ws.append(jnp.zeros((sizes[i + 1],), dtype))
    return tuple(ws)


def _mlp_apply(weights, z, compute_dtype):
    """Forward pass; matmuls in ``compute_dtype`` with f32 accumulation."""
    n_layers = len(weights) // 2
    for i in range(n_layers):
        w, b = weights[2 * i], weights[2 * i + 1]
        z = jnp.dot(z.astype(compute_dtype), w.astype(compute_dtype),
                    preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            z = jax.nn.gelu(z)
    return z


# ---------------------------------------------------------------------------
# Dataset: physics rollouts under random piecewise-constant forcing
# ---------------------------------------------------------------------------

def make_surrogate_dataset(params: R.ReactorParams, n_zones: int,
                           boundary: R.BoundaryConditions, key,
                           n_traj: int, n_steps: int, dt: float,
                           substeps: int,
                           controls: Sequence[str] = _DEFAULT_CONTROLS,
                           hold: int = 8, stages=None,
                           init_ranges: Optional[Dict] = None,
                           dtype=jnp.float32):
    """Roll ``n_traj`` physics trajectories of ``n_steps`` under random
    piecewise-constant actuation (each control resampled uniformly in
    [0, limit] every ``hold`` steps) from randomized initial states.

    Returns ``(X, U)`` with ``X: [n_traj, n_steps+1, n]`` flat states
    and ``U: [n_traj, n_steps, m]`` applied controls — the supervised
    pairs are ``(X[:, k], U[:, k]) -> X[:, k+1]``. Fully jitted; the
    trajectory axis shards like any Monte-Carlo plant batch.

    ``init_ranges`` overrides the per-field uniform initial-condition
    envelope, e.g. ``{"pH": (6.0, 8.5)}``; defaults cover the core
    operating range and leave extension species at their initial
    values."""
    controls = tuple(controls)
    if params.disinfection is not None:
        raise NotImplementedError(
            "surrogate state layout follows control.ekf.flatten_state, "
            "which does not carry the disinfection axis (pathogens/CT/"
            "THM) — train on a plant without enable_disinfection")
    nitrogen = params.nitrogen is not None
    gas = params.gas is not None
    biofilm = params.biofilm is not None

    base = _template_state(params, n_zones, dtype)
    x_base = flatten_state(base)
    n = x_base.shape[0]
    lo, hi = _flat_bounds(n_zones, nitrogen, gas, biofilm,
                          _n_classes(params), dtype)
    ranges = {"pH": (6.0, 8.5), "chlorine": (0.0, 4.0),
              "temperature": (5.0, 30.0)}
    if init_ranges:
        ranges.update(init_ranges)
    fields = state_fields(nitrogen, gas, biofilm)
    limits = jnp.asarray([_COMMAND_LIMITS[f] for f in controls], dtype)

    k_init, k_u = jax.random.split(jax.random.fold_in(key, 17))

    # randomized initial states: per-trajectory base value + per-zone
    # jitter within each field's envelope, flat layout
    def sample_x0(k):
        x0 = x_base
        for i, f in enumerate(fields):
            if f not in ranges:
                continue
            a, b = ranges[f]
            kf = jax.random.fold_in(k, i)
            kb, kz = jax.random.split(kf)
            mid = jax.random.uniform(kb, (), dtype, a, b)
            jit_w = (b - a) * 0.1
            z = jax.random.uniform(kz, (n_zones,), dtype, -jit_w, jit_w)
            vals = jnp.clip(mid + z, a, b)
            s = i * n_zones
            x0 = x0.at[s:s + n_zones].set(vals)
        return jnp.clip(x0, lo, hi)

    x0s = jax.vmap(sample_x0)(jax.random.split(k_init, n_traj))

    n_holds = -(-n_steps // hold)
    u_draw = jax.random.uniform(
        k_u, (n_traj, n_holds, len(controls)), dtype) * limits
    u_seq = jnp.repeat(u_draw, hold, axis=1)[:, :n_steps]   # [T, S, m]

    def rollout_one(x0, us):
        st0 = _unflatten(params, x0, n_zones, base)

        def body(st, u_t):
            bc = dataclasses.replace(
                boundary, **{f: u_t[i] for i, f in enumerate(controls)})
            st = R.step(params, st, bc, dt=dt, substeps=substeps,
                        stages=stages)
            return st, flatten_state(st)

        _, xs = jax.lax.scan(body, st0, us)
        return jnp.concatenate([x0[None], xs], axis=0)

    X = jax.jit(jax.vmap(rollout_one))(x0s, u_seq)
    return X, u_seq


def _n_classes(params: R.ReactorParams) -> int:
    return (0 if params.particles is None
            else params.particles.ntu_per_mgl.shape[-1])


def _template_state(params: R.ReactorParams, n_zones: int,
                    dtype) -> R.ReactorState:
    """A structural template ReactorState matching the params' enabled
    axes (values irrelevant beyond being in-domain)."""
    cfg = R.ReactorConfiguration(
        n_zones=n_zones,
        enable_nitrogen=params.nitrogen is not None,
        enable_gas=params.gas is not None,
        enable_particles=params.particles is not None,
        enable_disinfection=params.disinfection is not None,
        enable_biofilm=params.biofilm is not None,
        enable_phase=params.phase is not None)
    return R.make_initial_state(cfg, dtype=dtype)


def _unflatten(params, x, n_zones, template: R.ReactorState):
    from ics_wt_physicsengine_tpu.control.ekf import unflatten_state
    return unflatten_state(
        x, n_zones,
        time=template.time, flow_rate=template.flow_rate,
        nitrogen=params.nitrogen is not None,
        gas=params.gas is not None,
        biofilm=params.biofilm is not None,
        n_classes=_n_classes(params))


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------

def surrogate_step(sp: SurrogateParams, x: jnp.ndarray, u: jnp.ndarray,
                   compute_dtype=jnp.float32) -> jnp.ndarray:
    """One surrogate transition ``x' = clip(x + residual(x, u))``.
    Broadcasts over any leading batch axes of ``x``/``u``."""
    xn = (x - sp.x_mean) / sp.x_std
    un = jnp.broadcast_to(u / sp.u_scale, xn.shape[:-1] + u.shape[-1:])
    z = jnp.concatenate([xn, un], axis=-1)
    r = _mlp_apply(sp.weights, z, compute_dtype)
    x_next = x + r * sp.r_std + sp.r_mean
    return jnp.clip(x_next, sp.lo, sp.hi)


def surrogate_rollout(sp: SurrogateParams, x0: jnp.ndarray,
                      us: jnp.ndarray,
                      compute_dtype=jnp.float32) -> jnp.ndarray:
    """Scan the surrogate over a ``[n_steps, m]`` control sequence;
    returns the ``[n_steps, n]`` predicted states."""
    def body(x, u_t):
        x = surrogate_step(sp, x, u_t, compute_dtype)
        return x, x
    _, xs = jax.lax.scan(body, x0, us)
    return xs


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

def train_surrogate(X: jnp.ndarray, U: jnp.ndarray, n_zones: int,
                    key, hidden: Sequence[int] = (128, 128),
                    controls: Sequence[str] = _DEFAULT_CONTROLS,
                    n_steps: int = 6000, batch_size: int = 2048,
                    learning_rate: float = 3e-3,
                    rollout_steps: int = 0, rollout_horizon: int = 8,
                    nitrogen: bool = False, gas: bool = False,
                    biofilm: bool = False, n_classes: int = 0,
                    compute_dtype=jnp.float32,
                    ) -> Tuple[SurrogateParams, Dict]:
    """Fit the surrogate to physics data by Adam, fully in-graph.

    ``X: [T, S+1, n]``, ``U: [T, S, m]`` as returned by
    :func:`make_surrogate_dataset` (or assembled from real plant
    history). Two phases, each one jitted ``lax.scan``:

    1. ``n_steps`` one-step minibatch MSE steps on the normalized
       residual (minibatches drawn per-step by PRNG fold-in);
    2. optional ``rollout_steps`` fine-tuning steps on
       ``rollout_horizon``-step open-loop rollouts (scan-of-scan),
       which suppresses the compounding drift one-step training
       ignores.

    Returns ``(params, info)`` with per-phase loss curves in ``info``."""
    import optax

    controls = tuple(controls)
    T, S1, n = X.shape
    S = S1 - 1
    if S < 1:
        raise ValueError(f"X needs >= 2 ticks per trajectory for "
                         f"transition pairs, got shape {X.shape}")
    if U.ndim != 3 or U.shape[:2] != (T, S):
        raise ValueError(f"U must be [{T}, {S}, m] to pair with X "
                         f"{X.shape} (X[:, k] + U[:, k] -> X[:, k+1]); "
                         f"got {U.shape}")
    m = U.shape[-1]
    dtype = X.dtype

    x_k = X[:, :-1].reshape(-1, n)
    u_k = U.reshape(-1, m)
    x_k1 = X[:, 1:].reshape(-1, n)
    res = x_k1 - x_k
    x_mean = jnp.mean(x_k, axis=0)
    x_std = jnp.maximum(jnp.std(x_k, axis=0), 1e-6)
    r_mean = jnp.mean(res, axis=0)
    r_std = jnp.maximum(jnp.std(res, axis=0), 1e-8)
    u_scale = jnp.asarray([_COMMAND_LIMITS[f] for f in controls], dtype)
    lo, hi = _flat_bounds(n_zones, nitrogen, gas, biofilm, n_classes,
                          dtype)

    key, k_w = jax.random.split(key)
    weights = _init_mlp(k_w, (n + m, *hidden, n), jnp.float32)
    sp = SurrogateParams(weights=weights, x_mean=x_mean, x_std=x_std,
                         u_scale=u_scale, r_mean=r_mean, r_std=r_std,
                         lo=lo, hi=hi)

    n_pairs = x_k.shape[0]
    opt = optax.adam(learning_rate)

    def one_step_loss(ws, xb, ub, rb):
        spw = dataclasses.replace(sp, weights=ws)
        pred = surrogate_step(spw, xb, ub, compute_dtype)
        return jnp.mean((((pred - xb) - rb) / sp.r_std) ** 2)

    @jax.jit
    def phase1(ws, key):
        opt_state = opt.init(ws)

        def body(carry, i):
            ws, opt_state = carry
            idx = jax.random.randint(jax.random.fold_in(key, i), (batch_size,),
                                     0, n_pairs)
            loss, g = jax.value_and_grad(one_step_loss)(
                ws, x_k[idx], u_k[idx], res[idx])
            upd, opt_state = opt.update(g, opt_state, ws)
            return (optax.apply_updates(ws, upd), opt_state), loss

        (ws, _), losses = jax.lax.scan(body, (ws, opt_state),
                                       jnp.arange(n_steps))
        return ws, losses

    weights, loss1 = phase1(weights, jax.random.fold_in(key, 1))
    info = {"one_step_loss": loss1}

    if rollout_steps > 0:
        H = rollout_horizon
        rb = max(1, batch_size // H)

        def rollout_loss(ws, x0b, usb, xsb):
            spw = dataclasses.replace(sp, weights=ws)
            pred = jax.vmap(lambda x0, us: surrogate_rollout(
                spw, x0, us, compute_dtype))(x0b, usb)
            return jnp.mean(((pred - xsb) / sp.x_std) ** 2)

        @jax.jit
        def phase2(ws, key):
            opt2 = optax.adam(learning_rate * 0.3)
            opt_state = opt2.init(ws)

            def body(carry, i):
                ws, opt_state = carry
                k = jax.random.fold_in(key, i)
                ti = jax.random.randint(jax.random.fold_in(k, 0), (rb,),
                                        0, T)
                si = jax.random.randint(jax.random.fold_in(k, 1), (rb,),
                                        0, S - H + 1)
                x0b = X[ti, si]
                usb = jax.vmap(lambda t, s: jax.lax.dynamic_slice(
                    U[t], (s, 0), (H, m)))(ti, si)
                xsb = jax.vmap(lambda t, s: jax.lax.dynamic_slice(
                    X[t], (s + 1, 0), (H, n)))(ti, si)
                loss, g = jax.value_and_grad(rollout_loss)(
                    ws, x0b, usb, xsb)
                upd, opt_state = opt2.update(g, opt_state, ws)
                return (optax.apply_updates(ws, upd), opt_state), loss

            (ws, _), losses = jax.lax.scan(body, (ws, opt_state),
                                           jnp.arange(rollout_steps))
            return ws, losses

        weights, loss2 = phase2(weights, jax.random.fold_in(key, 2))
        info["rollout_loss"] = loss2

    return dataclasses.replace(sp, weights=weights), info


def fit_plant_surrogate(config: R.ReactorConfiguration, dt: float,
                        boundary: Optional[R.BoundaryConditions] = None,
                        controls: Sequence[str] = _DEFAULT_CONTROLS,
                        n_traj: int = 512, n_steps: int = 48,
                        hidden: Sequence[int] = (128, 128),
                        train_steps: int = 6000,
                        rollout_steps: int = 600,
                        substeps: Optional[int] = None, stages=None,
                        seed: int = 0, compute_dtype=jnp.float32,
                        dtype=jnp.float32,
                        ) -> Tuple[SurrogateParams, Dict]:
    """Convenience end-to-end: generate a physics dataset for ``config``
    and train a surrogate on it. Returns ``(params, info)``; ``info``
    carries the loss curves plus a held-out one-step RMSE per field."""
    if substeps is None:
        substeps = R.default_substeps(config, dt)
    if boundary is None:
        boundary = R.BoundaryConditions()
    controls = tuple(controls)
    params = R.make_params(config, dtype=dtype)
    key = jax.random.PRNGKey(seed)
    k_data, k_val, k_train = jax.random.split(key, 3)
    X, U = make_surrogate_dataset(params, config.n_zones, boundary,
                                  k_data, n_traj, n_steps, dt, substeps,
                                  controls=controls, stages=stages,
                                  dtype=dtype)
    sp, info = train_surrogate(
        X, U, config.n_zones, k_train, hidden=hidden, controls=controls,
        n_steps=train_steps, rollout_steps=rollout_steps,
        nitrogen=params.nitrogen is not None,
        gas=params.gas is not None,
        biofilm=params.biofilm is not None,
        n_classes=_n_classes(params), compute_dtype=compute_dtype)

    # held-out validation: fresh trajectories, per-field one-step RMSE
    Xv, Uv = make_surrogate_dataset(params, config.n_zones, boundary,
                                    k_val, max(8, n_traj // 8), n_steps,
                                    dt, substeps, controls=controls,
                                    stages=stages, dtype=dtype)
    pred = surrogate_step(sp, Xv[:, :-1], Uv, compute_dtype)
    err = pred - Xv[:, 1:]
    fields = state_fields(params.nitrogen is not None,
                          params.gas is not None,
                          params.biofilm is not None)
    Z = config.n_zones
    info["val_rmse"] = {
        f: jnp.sqrt(jnp.mean(err[..., i * Z:(i + 1) * Z] ** 2))
        for i, f in enumerate(fields)}
    return sp, info


# ---------------------------------------------------------------------------
# Surrogate-planned MPC against the exact plant
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("steps_per_move", "iters", "controls",
                                   "tap_idx", "compute_dtype_name"))
def _surrogate_mpc_plan_impl(sp, x0, programs, moves0, dt, steps_per_move,
                             iters, learning_rate, move_weight, controls,
                             weights, tap_idx, compute_dtype_name):
    import optax
    compute_dtype = jnp.dtype(compute_dtype_name)

    def cost(moves):
        cols = [st_clip(moves[..., i], 0.0, _COMMAND_LIMITS[f])
                for i, f in enumerate(controls)]
        u = jnp.repeat(jnp.stack(cols, axis=-1), steps_per_move, axis=0)

        def body(x, inp):
            u_t, sp_t = inp
            x = surrogate_step(sp, x, u_t, compute_dtype)
            sq = sum(w * (x[..., idx] - sp_t[j]) ** 2
                     for j, (idx, w) in enumerate(zip(tap_idx, weights)))
            return x, sq

        _, sq = jax.lax.scan(body, x0, (u, programs))
        smooth = jnp.sum((moves[1:] - moves[:-1]) ** 2) \
            if moves.shape[0] > 1 else 0.0
        return jnp.sum(sq) * dt + move_weight * smooth

    opt = optax.chain(optax.clip_by_global_norm(10.0),
                      optax.adam(learning_rate))

    def body(carry, _):
        moves, opt_state = carry
        c, g = jax.value_and_grad(cost)(moves)
        g = jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)
        upd, opt_state = opt.update(g, opt_state, moves)
        return (optax.apply_updates(moves, upd), opt_state), c

    (moves, _), costs = jax.lax.scan(body, (moves0, opt.init(moves0)),
                                     None, length=iters)
    lims = jnp.asarray([_COMMAND_LIMITS[f] for f in controls],
                       moves.dtype)
    return jnp.clip(moves, 0.0, lims), costs


def surrogate_mpc_plan(sp: SurrogateParams, x0: jnp.ndarray,
                       setpoints: Dict, moves0: jnp.ndarray, dt: float,
                       n_zones: int, steps_per_move: int,
                       iters: int = 30, learning_rate: float = 0.08,
                       move_weight: float = 0.05,
                       controls: Sequence[str] = _DEFAULT_CONTROLS,
                       weights: Optional[Dict] = None,
                       nitrogen: bool = False, gas: bool = False,
                       biofilm: bool = False,
                       compute_dtype=jnp.float32):
    """Optimize a move sequence through the SURROGATE (same shooting
    shape as ``control.mpc.mpc_plan``, ~substeps× cheaper per Adam
    iteration). ``setpoints`` maps ``(field, zone)`` taps to
    ``[horizon]`` programs. Returns ``(moves [n_moves, m], costs)``."""
    controls = tuple(controls)
    taps = tuple(setpoints.keys())
    tap_idx = tuple(int(tap_index(f, z, n_zones, nitrogen, gas,
                                  biofilm=biofilm)) for f, z in taps)
    progs = jnp.stack([jnp.asarray(setpoints[t]) for t in taps], axis=-1)
    w = tuple(float((weights or {}).get(t, 1.0)) for t in taps)
    moves0 = jnp.atleast_2d(moves0.T).T if jnp.ndim(moves0) == 1 \
        else moves0
    return _surrogate_mpc_plan_impl(
        sp, x0, progs, moves0, dt, int(steps_per_move), int(iters),
        learning_rate, move_weight, controls, w, tap_idx,
        jnp.dtype(compute_dtype).name)


def run_mpc_surrogate(config: R.ReactorConfiguration, sp: SurrogateParams,
                      setpoint_program, dt: float,
                      horizon_moves: int = 8, steps_per_move: int = 15,
                      replan_every: Optional[int] = None, iters: int = 30,
                      learning_rate: float = 0.08,
                      move_weight: float = 0.05,
                      boundary: Optional[R.BoundaryConditions] = None,
                      substeps: Optional[int] = None, stages=None,
                      controls: Sequence[str] = _DEFAULT_CONTROLS,
                      weights: Optional[Dict] = None,
                      compute_dtype=jnp.float32,
                      dtype=jnp.float32) -> Dict:
    """Receding-horizon control of the TRUE plant with SURROGATE
    planning: every re-plan shoots through the learned model, the exact
    physics applies the moves and produces the state the next plan
    starts from (so surrogate model error cannot accumulate beyond one
    horizon). Mirrors ``control.mpc.run_mpc``'s interface; the default
    program tracks ``("chlorine", -1)``.

    Returns applied commands, realized tracked trajectories (TRUE
    values), and the weighted tracking score — directly comparable to
    ``run_mpc``'s on the same program.

    NOTE: the receding-horizon scaffolding deliberately mirrors
    ``control.mpc.run_mpc`` statement for statement (padding, warm-start
    shift, score definition) so the two scores stay comparable — a
    behavioral change there should be mirrored here."""
    controls = tuple(controls)
    if not isinstance(setpoint_program, dict):
        setpoint_program = {("chlorine", -1):
                            jnp.asarray(setpoint_program, dtype)}
    programs = {k: jnp.asarray(v, dtype)
                for k, v in setpoint_program.items()}
    lengths = {int(v.shape[0]) for v in programs.values()}
    if len(lengths) != 1:
        raise ValueError(f"programs disagree on n_steps: {lengths}")
    n_steps = lengths.pop()
    if replan_every is None:
        replan_every = steps_per_move
    if n_steps % replan_every:
        raise ValueError(f"n_steps={n_steps} must be a multiple of "
                         f"replan_every={replan_every}")
    if substeps is None:
        substeps = R.default_substeps(config, dt)
    if boundary is None:
        boundary = R.BoundaryConditions()
    params = R.make_params(config, dtype=dtype)
    state = R.make_initial_state(config, dtype=dtype)
    Z = config.n_zones
    nitrogen = params.nitrogen is not None
    gas = params.gas is not None
    biofilm = params.biofilm is not None
    taps = tuple(programs.keys())
    tap_idx = {t: int(tap_index(t[0], t[1], Z, nitrogen, gas,
                                biofilm=biofilm)) for t in taps}

    horizon = horizon_moves * steps_per_move
    padded = {k: jnp.concatenate([v, jnp.full((horizon,), v[-1], dtype)])
              for k, v in programs.items()}
    n_outer = n_steps // replan_every
    m = len(controls)

    @jax.jit
    def outer(state):
        def body(carry, k):
            st, moves_prev = carry
            sp_h = {name: jax.lax.dynamic_slice(p, (k * replan_every,),
                                                (horizon,))
                    for name, p in padded.items()}
            moves, _ = surrogate_mpc_plan(
                sp, flatten_state(st), sp_h, moves_prev, dt=float(dt),
                n_zones=Z, steps_per_move=int(steps_per_move),
                iters=int(iters), learning_rate=learning_rate,
                move_weight=move_weight, controls=controls,
                weights=weights, nitrogen=nitrogen, gas=gas,
                biofilm=biofilm, compute_dtype=compute_dtype)
            u_applied = jnp.repeat(moves, steps_per_move,
                                   axis=0)[:replan_every]

            def inner(st, u_t):
                bc = dataclasses.replace(
                    boundary,
                    **{f: u_t[i] for i, f in enumerate(controls)})
                st = R.step(params, st, bc, dt=float(dt),
                            substeps=int(substeps), stages=stages)
                x = flatten_state(st)
                return st, {t: x[idx] for t, idx in tap_idx.items()}

            st, tracked = jax.lax.scan(inner, st, u_applied)
            shifted = jnp.concatenate([moves[1:], moves[-1:]]) \
                if replan_every == steps_per_move else moves
            return (st, shifted), (u_applied, tracked)

        moves0 = jnp.full((horizon_moves, m), 0.2, dtype)
        (st, _), (u, tracked) = jax.lax.scan(body, (state, moves0),
                                             jnp.arange(n_outer))
        return st, u.reshape(-1, m), \
            {k: v.reshape(-1) for k, v in tracked.items()}

    state, u, tracked = outer(state)
    wts = weights or {}
    score = sum(float(wts.get(k, 1.0))
                * float(jnp.sum((tracked[k] - programs[k]) ** 2) * dt)
                for k in programs)
    out = {"commands_by_control": {f: u[:, i]
                                   for i, f in enumerate(controls)},
           "tracked": tracked, "score": score, "final_state": state}
    if controls == _DEFAULT_CONTROLS:
        out["commands"] = u[:, 0]
    if ("chlorine", -1) in tracked:
        out["chlorine_outlet"] = tracked[("chlorine", -1)]
    return out
