"""
Connected multi-reactor networks — treatment trains and distribution loops.

The reference roadmap's "Multi-reactor networks (distributed systems)" row
(reference README.md:447). The reference has no implementation to mirror;
this is designed TPU-first:

- **Plants are a batch axis, routing is a matmul.** All P plants advance in
  one compiled program as a stacked ``[P, Z]`` reactor batch (the physics in
  ``core/reactor.py`` is natively batched); the inter-plant coupling is a
  tiny dense ``[P, P]`` routing contraction per step — no host round trips,
  no per-plant Python, and sharding the P axis over a device mesh makes XLA
  insert the (small) collectives automatically.
- **Pipe transport delays are a ring buffer**, exactly like the sensor
  sample lines (sensors/base.py): a ``[D, P, S]`` VMEM-resident history of
  every plant's outlet composition, gathered per edge with a static modular
  index — compiler-friendly, O(1) per step, arbitrary per-edge delays.
- **Hydraulics solve at trace time.** Steady incompressible routing gives
  ``q_out = ext + dose + W q_out``; since the topology ``W`` is static the
  resolvent ``(I - W)^-1`` is precomputed on host and each step's flows are
  one ``[P, P] @ [P]`` matvec (supports recirculation loops, spectral radius
  of W < 1 enforced at validation).

Coupling semantics: an edge ``i -> j`` with delay ``d`` (>= 1 step) means
plant j's inlet at step k blends plant i's *outlet zone* composition as it
was after step ``k - d``. Blending is flow-weighted and linear in the
conserved variables — chlorine, temperature, the nitrogen species, the
dissolved gases (O2, total carbonate), and the per-class suspended solids
mix linearly; pH mixes in H+ concentration space (the same approximation
the in-reactor mixing term uses through the buffering chain rule,
core/reactor.py derivatives; reference reactor.py:339-376).

Particle classes ride the pipes CLASS-RESOLVED: the downstream plant's
inlet receives the upstream effluent's actual class split via
``BoundaryConditions.inlet_tss_classes`` (a clarifier's effluent is
fines-enriched — the downstream filter sees that split, not the static
source-water fractions). This is what makes a coagulation basin ->
clarifier -> filter -> contact tank treatment train emerge from the same
physics that runs each unit.

External sources: each plant's ``BoundaryConditions`` (leaves ``[P]`` or
scalars) provides its external inlet (flow + composition) and its own
dosing pumps; routed inflow is added on top. External nitrite / nitrate /
chloramine inflows are taken as zero (``BoundaryConditions`` carries only
``inlet_ammonia``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import reactor as R

__all__ = [
    "NetworkTopology", "NetworkState", "make_network", "network_step",
    "rollout_network", "rollout_network_scheduled",
]


# ---------------------------------------------------------------------------
# Topology (host-side, static)
# ---------------------------------------------------------------------------


@dataclass
class NetworkTopology:
    """Static plant-interconnection graph.

    ``routing[j, i]`` is the fraction of plant i's outflow piped into plant
    j's inlet (0 = no edge). Fractions out of one plant may sum to < 1 —
    the remainder leaves the network (finished water). ``delay_steps[j, i]``
    is that pipe's transport delay in whole steps (>= 1; ignored where
    ``routing`` is 0). Loops (recirculation) are allowed as long as the
    routing spectral radius stays < 1 so the steady hydraulics are solvable.
    """

    routing: np.ndarray
    delay_steps: Union[int, np.ndarray] = 1

    def __post_init__(self):
        W = np.asarray(self.routing, np.float64)
        if W.ndim != 2 or W.shape[0] != W.shape[1]:
            raise ValueError(f"routing must be [P, P], got {W.shape}")
        if np.any(W < 0.0) or np.any(W > 1.0):
            raise ValueError("routing fractions must be in [0, 1]")
        out_frac = W.sum(axis=0)  # total fraction leaving each plant
        if np.any(out_frac > 1.0 + 1e-9):
            raise ValueError(
                f"plant(s) {np.nonzero(out_frac > 1.0 + 1e-9)[0].tolist()} "
                f"route more than 100% of their outflow")
        rho = np.max(np.abs(np.linalg.eigvals(W))) if W.size else 0.0
        if rho >= 1.0 - 1e-9:
            raise ValueError(
                f"routing spectral radius {rho:.3f} >= 1: the recirculation "
                f"loop feeds back its full flow and steady hydraulics have "
                f"no solution")
        D = np.broadcast_to(np.asarray(self.delay_steps, np.int64), W.shape)
        if np.any((W > 0.0) & (D < 1)):
            raise ValueError("edge delays must be >= 1 step")
        self.routing = W
        self.delay_steps = np.where(W > 0.0, D, 1).astype(np.int64)

    @property
    def n_plants(self) -> int:
        return self.routing.shape[0]

    @property
    def max_delay(self) -> int:
        """Ring length: the longest delay on any live edge."""
        live = self.delay_steps[self.routing > 0.0]
        return int(live.max()) if live.size else 1

    def resolvent(self) -> np.ndarray:
        """(I - W)^-1 — one host-side solve; flows per step are a matvec."""
        return np.linalg.inv(np.eye(self.n_plants) - self.routing)


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class NetworkState:
    """Stacked plant states + the pipe-delay ring.

    ``reactor`` leaves are ``[P, Z]``; ``ring`` is ``[D, P, S]`` where the
    species columns are [H+, Cl, T] (+4 nitrogen) (+2 gas: O2, C_T)
    (+C particle classes); ``ring_index`` counts pushes (slot
    ``ring_index % D`` is written after each step).
    """

    reactor: R.ReactorState
    ring: jnp.ndarray
    ring_index: jnp.ndarray


def _n_species(state: R.ReactorState) -> int:
    n = 7 if state.ammonia is not None else 3
    if state.oxygen is not None:
        n += 2
    if state.tss is not None:
        n += state.tss.shape[-2]
    if state.pathogens is not None:
        # class-resolved survivors + the advected ct/age/toc/thm scalars
        # (a multi-barrier train's credit and byproducts flow downstream)
        n += state.pathogens.shape[-2] + 4
    if state.bacteria is not None:
        # planktonic biomass + BDOC substrate ride the pipes (regrowth
        # propagates down a treatment train); the wall film is attached
        # to each plant's own surfaces and is NOT routed
        n += 2
    return n


def _outlet_sample(state: R.ReactorState) -> jnp.ndarray:
    """[..., P, S] outlet-zone composition, pH already in H+ space."""
    cols = [10.0 ** (-state.pH[..., -1]),
            state.chlorine[..., -1],
            state.temperature[..., -1]]
    if state.ammonia is not None:
        cols += [state.ammonia[..., -1], state.nitrite[..., -1],
                 state.nitrate[..., -1], state.chloramine[..., -1]]
    if state.oxygen is not None:
        cols += [state.oxygen[..., -1], state.carbonate[..., -1]]
    sample = jnp.stack(cols, axis=-1)
    if state.tss is not None:
        # per-class outlet solids [..., P, C] — piped class-resolved
        sample = jnp.concatenate([sample, state.tss[..., -1]], axis=-1)
    if state.pathogens is not None:
        tail = jnp.stack([state.ct[..., -1], state.age[..., -1],
                          state.toc[..., -1], state.thm[..., -1]], axis=-1)
        sample = jnp.concatenate([sample, state.pathogens[..., -1], tail],
                                 axis=-1)
    if state.bacteria is not None:
        tail = jnp.stack([state.bacteria[..., -1], state.bdoc[..., -1]],
                         axis=-1)
        sample = jnp.concatenate([sample, tail], axis=-1)
    return sample


def make_network(configs: Union[R.ReactorConfiguration,
                                Sequence[R.ReactorConfiguration]],
                 topology: NetworkTopology,
                 dtype=jnp.float32):
    """Build stacked params + initial network state.

    ``configs``: one configuration shared by every plant, or a sequence of
    ``topology.n_plants`` configurations (heterogeneous volumes / chemistry
    per stage — a contact tank feeding a clearwell, say). All must share
    ``n_zones`` and agree on ``enable_nitrogen``.
    """
    P = topology.n_plants
    if isinstance(configs, R.ReactorConfiguration):
        configs = [configs] * P
    configs = list(configs)
    if len(configs) != P:
        raise ValueError(f"{len(configs)} configs for {P} plants")
    zs = {c.n_zones for c in configs}
    if len(zs) != 1:
        raise ValueError(f"all plants must share n_zones, got {sorted(zs)}")
    for flag in ("enable_nitrogen", "enable_gas", "enable_particles",
                 "enable_disinfection", "enable_biofilm"):
        if len({bool(getattr(c, flag, False)) for c in configs}) != 1:
            raise ValueError(f"{flag} must match across plants")

    p_list = [R.make_params(c, dtype=dtype) for c in configs]
    s_list = [R.make_initial_state(c, dtype=dtype) for c in configs]

    def stack(*leaves):
        if isinstance(leaves[0], int):
            return leaves[0]
        return np.stack([np.asarray(x) for x in leaves], axis=0)

    params = jax.tree_util.tree_map(stack, *p_list)
    reactor = jax.tree_util.tree_map(stack, *s_list)

    sample = _outlet_sample(reactor)                    # [P, S]
    ring = jnp.broadcast_to(jnp.asarray(sample, dtype),
                            (topology.max_delay,) + sample.shape)
    return params, NetworkState(
        reactor=reactor,
        ring=jnp.array(ring),
        ring_index=jnp.asarray(0, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Step
# ---------------------------------------------------------------------------


def _blended_boundary(topo_W, topo_Minv, topo_delay, nstate: NetworkState,
                      boundary: R.BoundaryConditions, has_nitrogen: bool,
                      particle_fractions=None):
    """Per-plant effective BoundaryConditions after routing + blending.

    ``particle_fractions`` ([P, C] or [C]) splits the external
    ``inlet_tss`` into classes on particle-carrying networks (ignored when
    ``boundary.inlet_tss_classes`` already gives the external split)."""
    ring, idx = nstate.ring, nstate.ring_index
    D = ring.shape[0]
    Pn = ring.shape[-2]
    dtype = ring.dtype
    has_gas = nstate.reactor.oxygen is not None
    has_p = nstate.reactor.tss is not None
    has_d = nstate.reactor.pathogens is not None
    has_b = nstate.reactor.bacteria is not None
    g_off = 7 if has_nitrogen else 3
    p_off = g_off + (2 if has_gas else 0)
    n_classes = nstate.reactor.tss.shape[-2] if has_p else 0
    d_off = p_off + n_classes
    n_path = nstate.reactor.pathogens.shape[-2] if has_d else 0
    b_off = d_off + (n_path + 4 if has_d else 0)

    def v(x):  # [P] view of a possibly-scalar boundary leaf
        return jnp.broadcast_to(jnp.asarray(x, dtype), (Pn,))

    ext_q = v(boundary.inlet_flow_rate)
    dose_q = v(boundary.acid_flow_rate) + v(boundary.chlorine_flow_rate)

    # Steady hydraulics: q_out = (I - W)^-1 (ext + dose); routed flow on
    # edge i->j is W[j, i] * q_out[i].
    q_out = topo_Minv @ (ext_q + dose_q)                       # [P]
    routed_q = topo_W * q_out[None, :]                         # [P, P]
    q_in = ext_q + routed_q.sum(axis=-1)                       # [P]

    # Delayed outlet composition per edge: ring slot (idx - d) mod D of
    # source plant i (ring slot k%D holds the post-step-k sample).
    rows = jnp.mod(idx - topo_delay, D)                        # [P, P]
    delayed = ring[rows, jnp.arange(Pn)[None, :], :]           # [P, P, S]

    ext_cols = [10.0 ** (-v(boundary.inlet_pH)),
                v(boundary.inlet_chlorine),
                v(boundary.inlet_temperature)]
    if has_nitrogen:
        zero = jnp.zeros((Pn,), dtype)
        ext_cols += [v(boundary.inlet_ammonia), zero, zero, zero]
    if has_gas:
        ext_cols += [v(boundary.inlet_oxygen), v(boundary.inlet_carbonate)]
    ext_c = jnp.stack(ext_cols, axis=-1)                       # [P, S0]
    if has_p:
        if boundary.inlet_tss_classes is not None:
            ext_tss = jnp.broadcast_to(
                jnp.asarray(boundary.inlet_tss_classes, dtype),
                (Pn, n_classes))
        elif particle_fractions is not None:
            fr = jnp.asarray(particle_fractions, dtype)
            ext_tss = v(boundary.inlet_tss)[:, None] \
                * jnp.broadcast_to(fr, (Pn, fr.shape[-1]))
        else:
            raise ValueError(
                "particle-carrying network needs particle_fractions (or "
                "boundary.inlet_tss_classes) to split the external "
                "inlet_tss into classes")
        ext_c = jnp.concatenate([ext_c, ext_tss], axis=-1)     # [P, S]
    if has_d:
        if boundary.inlet_pathogen_classes is not None:
            ext_path = jnp.broadcast_to(
                jnp.asarray(boundary.inlet_pathogen_classes, dtype),
                (Pn, n_path))
        else:
            ext_path = jnp.broadcast_to(
                v(boundary.inlet_pathogens)[:, None], (Pn, n_path))
        ext_tail = jnp.stack([v(boundary.inlet_ct), v(boundary.inlet_age),
                              v(boundary.inlet_toc), v(boundary.inlet_thm)],
                             axis=-1)
        ext_c = jnp.concatenate([ext_c, ext_path, ext_tail], axis=-1)
    if has_b:
        ext_b = jnp.stack([v(boundary.inlet_bacteria),
                           v(boundary.inlet_bdoc)], axis=-1)
        ext_c = jnp.concatenate([ext_c, ext_b], axis=-1)

    num = ext_q[:, None] * ext_c \
        + jnp.einsum("ji,jis->js", routed_q, delayed)          # [P, S]
    c_in = jnp.where(q_in[:, None] > 0.0, num / jnp.maximum(
        q_in[:, None], jnp.asarray(1e-30, dtype)), ext_c)

    tiny = jnp.asarray(1e-30, dtype)
    kw = dict(
        inlet_flow_rate=q_in,
        inlet_pH=jnp.clip(-jnp.log10(jnp.maximum(c_in[:, 0], tiny)),
                          0.0, 14.0),
        inlet_chlorine=c_in[:, 1],
        inlet_temperature=c_in[:, 2],
    )
    if has_nitrogen:
        kw["inlet_ammonia"] = c_in[:, 3]
    if has_gas:
        kw["inlet_oxygen"] = c_in[:, g_off]
        kw["inlet_carbonate"] = c_in[:, g_off + 1]
    if has_p:
        kw["inlet_tss_classes"] = c_in[:, p_off:d_off]
        kw["inlet_tss"] = jnp.sum(c_in[:, p_off:d_off], axis=-1)
    if has_d:
        kw["inlet_pathogen_classes"] = c_in[:, d_off:d_off + n_path]
        kw["inlet_ct"] = c_in[:, d_off + n_path]
        kw["inlet_age"] = c_in[:, d_off + n_path + 1]
        kw["inlet_toc"] = c_in[:, d_off + n_path + 2]
        kw["inlet_thm"] = c_in[:, d_off + n_path + 3]
    if has_b:
        kw["inlet_bacteria"] = c_in[:, b_off]
        kw["inlet_bdoc"] = c_in[:, b_off + 1]
    return replace(boundary, **kw), q_out


def network_step(params: R.ReactorParams, topo_arrays,
                 nstate: NetworkState, boundary: R.BoundaryConditions,
                 dt: float, substeps: int,
                 stages: Optional[int] = None) -> NetworkState:
    """Advance every plant by ``dt`` with routed, delayed inter-plant flow.

    ``topo_arrays`` is ``topology_arrays(topo, dtype)`` (static topology as
    device constants). ``boundary`` leaves are ``[P]`` per-plant or scalars
    (external inlet + dosing). Batched ensembles (Monte-Carlo over network
    realizations) wrap this in ``jax.vmap``.
    """
    W, Minv, delay = topo_arrays
    has_n = nstate.reactor.ammonia is not None
    pf = (params.particles.inlet_fractions
          if nstate.reactor.tss is not None else None)
    eff_bc, _ = _blended_boundary(W, Minv, delay, nstate, boundary, has_n,
                                  particle_fractions=pf)
    reactor = R.step(params, nstate.reactor, eff_bc, dt, substeps,
                     stages=stages)
    sample = _outlet_sample(reactor).astype(nstate.ring.dtype)
    D = nstate.ring.shape[0]
    ring = jax.lax.dynamic_update_index_in_dim(
        nstate.ring, sample, jnp.mod(nstate.ring_index, D), axis=0)
    return NetworkState(reactor=reactor, ring=ring,
                        ring_index=nstate.ring_index + 1)


def topology_arrays(topology: NetworkTopology, dtype=jnp.float32):
    """Device constants for the step functions: (W, (I-W)^-1, delays)."""
    return (jnp.asarray(topology.routing, dtype),
            jnp.asarray(topology.resolvent(), dtype),
            jnp.asarray(topology.delay_steps, jnp.int32))


def rollout_network(params, topo_arrays, nstate: NetworkState,
                    boundary: R.BoundaryConditions, dt: float,
                    substeps: int, n_steps: int, record: bool = True,
                    stages: Optional[int] = None):
    """Scan ``network_step`` over ``n_steps`` in one jit. The recorded
    trajectory stacks the primary variables ``[n_steps, P, Z]``."""

    def body(s, _):
        s = network_step(params, topo_arrays, s, boundary, dt, substeps,
                         stages=stages)
        out = {"pH": s.reactor.pH, "chlorine": s.reactor.chlorine,
               "temperature": s.reactor.temperature} if record else None
        return s, out

    return jax.lax.scan(body, nstate, None, length=n_steps)


def rollout_network_scheduled(params, topo_arrays, nstate: NetworkState,
                              schedule: R.BoundaryConditions, dt: float,
                              substeps: int, record: bool = True,
                              stages: Optional[int] = None):
    """Per-step boundary schedule (leaves ``[n_steps, P]`` or ``[n_steps]``
    or scalar — scalars broadcast), mirroring ``reactor.rollout_scheduled``
    for the network (dosing programs over a treatment train)."""
    lengths = {np.shape(x)[0] for x in jax.tree_util.tree_leaves(schedule)
               if np.ndim(x) >= 1 and np.shape(x)[0] > 1}
    if len(lengths) > 1:
        raise ValueError(f"inconsistent schedule lengths: {sorted(lengths)}")
    n_steps = lengths.pop() if lengths else 1

    def bcast(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n_steps:
            return x
        return jnp.broadcast_to(x, (n_steps,) + x.shape)

    xs = jax.tree_util.tree_map(bcast, schedule)

    def body(s, bc):
        s = network_step(params, topo_arrays, s, bc, dt, substeps,
                         stages=stages)
        out = {"pH": s.reactor.pH, "chlorine": s.reactor.chlorine,
               "temperature": s.reactor.temperature} if record else None
        return s, out

    return jax.lax.scan(body, nstate, xs)
