"""
Closed-loop rollout: controller + physics (+ instruments) in ONE jit.

The framework's headline throughput (120M integrated plant-steps/s,
BENCH_r02) was previously unusable for controller work because control
existed only over the Modbus socket at host tick rates (~1 plant-step per
host loop iteration). ``rollout_closed_loop`` closes the loop *inside the
scan*: each tick steps the reactor, observes it (true state or the full
seven-instrument pipeline), runs a pure controller transform, validates
the commands exactly like the orchestrator's zero-trust boundary
(``__main__.py::apply_boundary_conditions`` clamps), and applies them to
the next tick's BoundaryConditions — the reference HIL loop shape
(reference __main__.py:398-457) at device speed.

The loop ordering matches the HIL serving loop tick for tick: physics
advances under the PREVIOUS tick's commands, then sensors read, then the
controller acts — so trajectories match an external socket controller with
the same gains against noise-free sensors (tests/test_control.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.control.pid import (PIDCarry, PIDGains,
                                                  make_pid_carry, pid_step)
from ics_wt_physicsengine_tpu.core import reactor as R

# Orchestrator zero-trust limits (``__main__.py::read_modbus_commands``):
# commands beyond these are clamped, non-finite commands become 0.
_COMMAND_LIMITS = {
    "acid_flow_rate": 2.0,
    "chlorine_flow_rate": 1.0,
    "inlet_flow_rate": 20.0,
    # extension-species actuators; limits mirror the orchestrator's
    # zero-trust register clamps (__main__.py read_modbus_commands)
    "aeration_kla": 0.1,
    "coagulant_dose": 100.0,
    "filter_flow_rate": 60.0,
    "sludge_blowdown": 0.01,
    "uv_intensity": 50.0,
    "inlet_toc": 20.0,
    "inlet_bdoc": 10.0,
    "inlet_bacteria": 2.0e-3,   # mg C/L (~1e7 CFU/mL, the register cap)
}


def validate_commands(commands: Dict[str, jnp.ndarray]
                      ) -> Dict[str, jnp.ndarray]:
    """In-graph equivalent of the orchestrator's ``validate_flow_rate``
    (reference __main__.py:57-81): non-finite -> 0, clip to [0, max]."""
    out = {}
    for name, value in commands.items():
        if name not in _COMMAND_LIMITS:
            raise ValueError(
                f"unknown actuator command {name!r}; controllers may set "
                f"{sorted(_COMMAND_LIMITS)}")
        value = jnp.asarray(value)
        value = jnp.where(jnp.isfinite(value), value, 0.0)
        out[name] = jnp.clip(value, 0.0, _COMMAND_LIMITS[name])
    return out


def apply_commands(boundary: R.BoundaryConditions,
                   commands: Dict[str, jnp.ndarray],
                   dt: float, actuator_tau: float = 0.0
                   ) -> R.BoundaryConditions:
    """Validated commands -> new BoundaryConditions; ``actuator_tau`` > 0
    applies the first-order pump/valve lag in-graph
    (``__main__.py::apply_actuator_dynamics``)."""
    commands = validate_commands(commands)
    if actuator_tau > 0.0:
        alpha = 1.0 - math.exp(-dt / actuator_tau)
        commands = {f: getattr(boundary, f)
                    + alpha * (v - getattr(boundary, f))
                    for f, v in commands.items()}
    return replace(boundary, **commands)


# ---------------------------------------------------------------------------
# The canonical two-loop controller (examples/pid_controller.py in-graph)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DualPIDGains:
    """The canonical plant's two loops: chlorine residual
    (chlorine_outlet -> chlorine_flow_rate) and pH
    (pH_inlet -> acid_flow_rate)."""

    chlorine: PIDGains
    ph: PIDGains


@jax.tree_util.register_dataclass
@dataclass
class DualPIDCarry:
    chlorine: PIDCarry
    ph: PIDCarry


def make_dual_pid_carry(batch_shape=(), dtype=jnp.float32) -> DualPIDCarry:
    return DualPIDCarry(chlorine=make_pid_carry(batch_shape, dtype),
                        ph=make_pid_carry(batch_shape, dtype))


def dual_pid_controller(gains: DualPIDGains, carry: DualPIDCarry,
                        obs: Dict[str, jnp.ndarray], dt: float,
                        feedforward: bool = False,
                        chlorine_stock_mg_L: float = 50.0,
                        clip_mode: str = "hard",
                        warmup_gate: bool = True):
    """One controller tick, semantics matching
    ``examples/pid_controller.py::control_loop``: warm-up gating
    (``reading > 0`` ticks the loop, else hold zero and freeze the PID),
    optional mass-balance feedforward on the chlorine loop, and the final
    [0, 1] chlorine-command clip. Returns ``(carry, commands)``.
    ``clip_mode="straight-through"`` keeps forward values identical but
    lets gradients pass saturation (see pid.st_clip; used by the tuners).

    ``warmup_gate=False`` replaces the ``> 0`` gate with a finiteness
    gate. The ``> 0`` convention exists because the HIL path publishes
    warm-up readings as exactly 0.0; against NOISE-FREE true-state
    observations (``observe="true"``) a plant commissioned from zero
    residual reads exactly 0.0 forever, so the PID would freeze
    permanently and never start dosing — the tuners pass False.
    """
    from ics_wt_physicsengine_tpu.control.pid import st_clip

    clip = jnp.clip if clip_mode == "hard" else st_clip
    cl_meas = obs["chlorine_outlet"]
    ph_meas = obs["pH_inlet"]
    gate = (lambda m: m > 0.0) if warmup_gate else jnp.isfinite

    cl_carry, cl_cmd = pid_step(gains.chlorine, carry.chlorine, cl_meas, dt,
                                active=gate(cl_meas), clip_mode=clip_mode)
    if feedforward:
        flow = obs["flow_main"]
        ff = jnp.where(flow > 0.0,
                       gains.chlorine.setpoint * flow / chlorine_stock_mg_L,
                       0.0)
        cl_cmd = cl_cmd + jnp.where(gate(cl_meas), ff, 0.0)
    cl_cmd = clip(cl_cmd, 0.0, 1.0)

    ph_carry, acid_cmd = pid_step(gains.ph, carry.ph, ph_meas, dt,
                                  active=gate(ph_meas), clip_mode=clip_mode)

    return DualPIDCarry(chlorine=cl_carry, ph=ph_carry), {
        "chlorine_flow_rate": cl_cmd,
        "acid_flow_rate": acid_cmd,
    }


# ---------------------------------------------------------------------------
# Observation
# ---------------------------------------------------------------------------

def observe_true(state: R.ReactorState) -> Dict[str, jnp.ndarray]:
    """Noise-free observations named like the sensor-suite readings: the
    true zone values at the canonical instrument locations
    (sensors/__init__.py — pH/Cl/temp at inlet zone 0 and outlet zone -1,
    one flow sensor). Controllers written against the instrumented plant
    run unchanged against the ideal one."""
    obs = {
        "pH_inlet": state.pH[..., 0],
        "pH_outlet": state.pH[..., -1],
        "chlorine_inlet": state.chlorine[..., 0],
        "chlorine_outlet": state.chlorine[..., -1],
        "temp_inlet": state.temperature[..., 0],
        "temp_outlet": state.temperature[..., -1],
        "flow_main": state.flow_rate,
    }
    if state.chloramine is not None:   # nitrogen chemistry observables
        obs["ammonia_outlet"] = state.ammonia[..., -1]
        obs["chloramine_outlet"] = state.chloramine[..., -1]
        obs["total_chlorine_outlet"] = state.chlorine[..., -1] \
            + state.chloramine[..., -1]
    if state.oxygen is not None:       # gas-exchange observables
        obs["oxygen_outlet"] = state.oxygen[..., -1]
        obs["carbonate_outlet"] = state.carbonate[..., -1]
    if state.tss is not None:          # particle observables (params-free
        #                                TSS; NTU = instrument weighting)
        obs["tss_outlet"] = jnp.sum(state.tss[..., -1], axis=-1)
        obs["sludge_total"] = jnp.sum(state.sludge, axis=-1)
    if state.pathogens is not None:    # disinfection observables: the
        #                                regulatory channels the UV/CT
        #                                control problem tracks
        n0 = jnp.maximum(state.pathogens[..., 0], 1e-30)
        n1 = jnp.clip(state.pathogens[..., -1], 1e-30 * n0, None)
        obs["giardia_log_removal"] = jnp.log10(n0 / n1)[..., 1]
        obs["crypto_log_removal"] = jnp.log10(n0 / n1)[..., 2]
        obs["ct_outlet"] = state.ct[..., -1]
        obs["thm_outlet"] = state.thm[..., -1]
        obs["toc_outlet"] = state.toc[..., -1]
    if state.bacteria is not None:     # biofilm/regrowth observables:
        #                                the plate count the booster-
        #                                chlorination problem tracks
        from ics_wt_physicsengine_tpu.core import biofilm as _bf
        obs["hpc_outlet"] = _bf.hpc_cfu_per_ml(state.bacteria[..., -1])
        obs["bdoc_outlet"] = state.bdoc[..., -1]
        obs["biofilm_peak"] = jnp.max(state.biofilm, axis=-1)
    return obs


# ---------------------------------------------------------------------------
# The closed-loop rollout
# ---------------------------------------------------------------------------

def rollout_closed_loop(params, state, boundary: R.BoundaryConditions,
                        controller: Callable, gains, ctrl_carry,
                        dt: float, substeps: int, n_steps: int,
                        stages=None, observe: str = "true",
                        actuator_tau: float = 0.0, batched: bool = False,
                        record: bool = True, record_obs=None,
                        gains_schedule=None, disturbance=None,
                        controller_owned=("acid_flow_rate",
                                          "chlorine_flow_rate"),
                        remat: bool = False):
    """Scan {physics -> observe -> controller -> validated commands} for
    ``n_steps`` inside one jit.

    ``controller(gains, carry, obs, dt) -> (carry, commands)`` is any pure
    transform (``dual_pid_controller`` is the canonical one; shooting MPC
    in control/mpc.py is another); ``commands`` maps actuator field names
    (``acid_flow_rate``/``chlorine_flow_rate``/``inlet_flow_rate``) to
    values, which pass through the orchestrator-parity zero-trust clamps
    before reaching the plant.

    ``observe``:
      - ``"true"``: params/state are ``ReactorParams``/``ReactorState``;
        the controller sees noise-free zone values (``observe_true``) —
        the fast path for gain sweeps (physics-only, natively batched:
        give every pytree + ``gains`` a leading ``[n]`` axis and the whole
        sweep is one scan of batched arithmetic, no vmap).
      - ``"sensors"``: params/state are ``PlantParams``/``PlantState``;
        the controller sees the seven instruments' measured values
        (delays, drift, noise, faults) — controller robustness evaluation
        against realistic instrumentation. Set ``batched=True`` when the
        plant pytrees carry a leading batch axis (per-lane PRNG keys need
        the vmapped step).

    ``gains_schedule``: optional pytree with the SAME structure as
    ``gains`` but a leading ``[n_steps]`` axis on every leaf — per-step
    controller parameters (e.g. a setpoint program: a dosing schedule the
    operator is commissioning). When given, it overrides ``gains``.

    ``disturbance``: optional BoundaryConditions pytree with ``[n_steps]``
    leaves (scalars broadcast) — scripted forcing (inlet swings,
    temperature ramps) applied each step. Fields listed in
    ``controller_owned`` (default: the dual-PID's two dosing pumps) stay
    under controller authority; every OTHER field is REPLACED from the
    disturbance per step (scalars broadcast over time), so set your
    steady operating values on fields you are not scripting. The
    in-graph analogue of the HIL loop against a disturbance program.

    Returns ``(final_state, final_ctrl_carry, final_boundary, traj)`` where
    ``traj`` (if ``record``) holds per-step ``obs`` (under their reading
    names), the applied ``commands``, and nothing else — select fewer obs
    via ``record_obs=[names]`` to shrink rollout memory.
    """
    if observe not in ("true", "sensors"):
        raise ValueError(f"unknown observe mode: {observe!r}")

    # The carried BoundaryConditions must be shape-stable across scan
    # iterations: with batched gains the commands carry the batch axis, so
    # the initial boundary's leaves are broadcast up front (no-op when
    # everything is scalar).
    ref_pH = state.pH if observe == "true" else state.reactor.pH
    batch_shape = jnp.shape(ref_pH)[:-1]
    dtype = ref_pH.dtype
    boundary = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x, dtype), batch_shape),
        boundary)

    if observe == "true":
        def advance(st, bc):
            new = R.step(params, st, bc, dt=dt, substeps=substeps,
                         stages=stages)
            return new, observe_true(new)
    else:
        from ics_wt_physicsengine_tpu.models.plant import (plant_step,
                                                           plant_step_batched)

        def advance(st, bc):
            if batched:
                new, readings = plant_step_batched(params, st, bc, dt,
                                                   substeps, stages=stages,
                                                   boundary_axes=0)
            else:
                new, readings = plant_step(params, st, bc, dt, substeps,
                                           stages=stages)
            return new, {k: v.value for k, v in readings.items()}

    if gains_schedule is not None:
        gains_schedule = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x), gains_schedule)
        for leaf in jax.tree_util.tree_leaves(gains_schedule):
            if jnp.shape(leaf)[:1] != (n_steps,):
                raise ValueError(
                    f"gains_schedule leaves need a leading [{n_steps}] "
                    f"axis; got shape {jnp.shape(leaf)}")
    if disturbance is not None:
        disturbance = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                jnp.asarray(x, dtype),
                (n_steps,) if jnp.ndim(x) == 0
                else (n_steps,) + jnp.shape(x)[1:]), disturbance)
        _owned = set(controller_owned)
        unknown = _owned - set(_COMMAND_LIMITS)
        if unknown:
            raise ValueError(f"controller_owned contains non-actuator "
                             f"fields: {sorted(unknown)}")

    def body(carry, j):
        st, cc, bc = carry
        if disturbance is not None:
            # scripted forcing; controller-owned fields keep their
            # carried (command-driven) values
            import dataclasses
            dist_t = jax.tree_util.tree_map(lambda x: x[j], disturbance)
            updates = {f: jnp.broadcast_to(getattr(dist_t, f), batch_shape)
                       for f in dist_t.__dataclass_fields__
                       if f not in _owned
                       and getattr(dist_t, f) is not None}
            bc = dataclasses.replace(bc, **updates)
        g = gains if gains_schedule is None else \
            jax.tree_util.tree_map(lambda x: x[j], gains_schedule)
        st, obs = advance(st, bc)
        if getattr(controller, "wants_boundary", False):
            # observer-based controllers (control/ekf.ekf_observer) need
            # the boundary that drove this transition for their predict
            cc, commands = controller(g, cc, obs, dt, bc)
        else:
            cc, commands = controller(g, cc, obs, dt)
        # shared scalar gains over a batched plant still yield per-lane
        # command leaves (shape-stable carry)
        commands = {k: jnp.broadcast_to(v, batch_shape)
                    for k, v in commands.items()}
        bc = apply_commands(bc, commands, dt, actuator_tau)
        out = None
        if record:
            kept = obs if record_obs is None \
                else {k: obs[k] for k in record_obs}
            out = {**kept, **{f"cmd:{k}": v for k, v in commands.items()}}
        return (st, cc, bc), out

    if remat:
        # Long-horizon gradient tuning (core.reactor.rollout docstring):
        # store only the carried (state, ctrl_carry, boundary) per step and
        # recompute the physics/controller residuals on the backward pass.
        body = jax.checkpoint(body)
    (state, ctrl_carry, boundary), traj = jax.lax.scan(
        body, (state, ctrl_carry, boundary), jnp.arange(n_steps))
    return state, ctrl_carry, boundary, traj
