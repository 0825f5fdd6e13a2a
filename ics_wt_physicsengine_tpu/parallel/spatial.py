"""
Zone-axis model parallelism (spatial decomposition over devices).

The plant axis (parallel/mesh.py) is the natural scaling axis, but a single
very-high-resolution plant (hundreds-to-thousands of zones — e.g. a plug-flow
contactor resolved at cm scale) can exceed one core's useful VPU occupancy.
This module splits the *zone* axis across a mesh: each device owns a
contiguous block of zones and exchanges one ghost zone per side per RK4 stage
via ``lax.ppermute`` (nearest-neighbour ICI traffic — no all-to-all).

Design:
- ``shard_map`` over a 1-D ``("zone",)`` mesh; state arrays are sharded on
  their trailing zone axis, params/boundary replicated.
- Each derivative evaluation halo-pads the local block with the neighbours'
  edge zones (mirror ghosts at the true domain ends, which makes the ghost
  flux exactly zero — the same one-sided exchange the unsharded stencil
  applies at array ends, transport.py:164-188).
- The inlet/dosing source terms and the outlet sink are relocated onto the
  owning shard with one-hot masks (core/reactor.py::derivatives
  ``inlet_mask``/``outlet_mask``).

No reference counterpart (the reference is single-process, SURVEY.md 5.7);
designed JAX-idiomatically per the task spec. Correctness is pinned by
tests/test_spatial_parallel.py: zone-sharded trajectories match the
single-device engine to float tolerance on a virtual 8-device mesh.
"""

from __future__ import annotations


from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ics_wt_physicsengine_tpu.core import reactor as R

ZONE_AXIS = "zone"


def make_zone_mesh(n_devices: Optional[int] = None,
                   devices: Optional[Sequence] = None,
                   axis_name: str = ZONE_AXIS) -> Mesh:
    """1-D mesh over the zone axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _zone_spec(ndim: int, axis_name: str) -> P:
    """PartitionSpec sharding the trailing (zone) axis; leading batch axes
    stay replicated (combine with a 2-D mesh for plants x zones)."""
    return P(*([None] * (ndim - 1)), axis_name)


def _species_specs(zone, present: bool, gas: bool = False,
                   particles=None, disinfection=None,
                   biofilm: bool = False):
    """Spec kwargs for the optional nitrogen/gas/particle/disinfection/
    biofilm species fields. ``particles`` is None (off) or a ``(tss_spec,
    sludge_spec)`` pair — the TSS leaf carries a class axis AHEAD of the
    sharded zone axis ([..., C, Z]) and the sludge inventory has no zone
    axis at all (it replicates across zone shards; the local deriv fn
    psums its gated tendency so every shard integrates the identical
    global value). ``disinfection`` is None (off) or the pathogen spec
    (class axis ahead of the zone axis, like TSS); the ct/age/toc/thm
    scalars ride the plain zone spec. The biofilm leaves (bacteria/bdoc/
    biofilm) are all plain [..., Z] arrays — the wall film's tendency is
    purely zone-local, so they shard like any bulk scalar."""
    spec = zone if present else None
    gspec = zone if gas else None
    tspec, sspec = particles if particles is not None else (None, None)
    dspec = zone if disinfection is not None else None
    bspec = zone if biofilm else None
    return dict(ammonia=spec, nitrite=spec, nitrate=spec, chloramine=spec,
                oxygen=gspec, carbonate=gspec, tss=tspec, sludge=sspec,
                pathogens=disinfection, ct=dspec, age=dspec, toc=dspec,
                thm=dspec, bacteria=bspec, bdoc=bspec, biofilm=bspec)


def _state_specs(state: R.ReactorState, axis_name: str) -> R.ReactorState:
    ndim = np.ndim(state.pH)
    zone = _zone_spec(ndim, axis_name)
    rep = P()
    part = None
    if state.tss is not None:
        part = (_zone_spec(ndim + 1, axis_name), rep)
    disinfect = _zone_spec(ndim + 1, axis_name) \
        if state.pathogens is not None else None
    return R.ReactorState(
        time=rep, pH=zone, chlorine=zone, temperature=zone,
        flow_rate=rep,
        H_concentration=None if state.H_concentration is None else zone,
        density=None if state.density is None else zone,
        chlorine_decay_rate=(None if state.chlorine_decay_rate is None
                             else zone),
        **_species_specs(zone, state.ammonia is not None,
                         gas=state.oxygen is not None,
                         particles=part, disinfection=disinfect,
                         biofilm=state.bacteria is not None),
    )


def shard_state_zones(state: R.ReactorState, mesh: Mesh,
                      axis_name: str = ZONE_AXIS) -> R.ReactorState:
    """Place a state pytree with the trailing zone axis sharded over the mesh."""
    specs = _state_specs(state, axis_name)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs)


def _halo_pad(x, axis_name: str, n_shards: int):
    """Concatenate [left-neighbour's last zone | local block | right-
    neighbour's first zone]. True domain ends get mirror ghosts (flux = 0)."""
    if n_shards == 1:
        return jnp.concatenate([x[..., :1], x, x[..., -1:]], axis=-1)
    left = jax.lax.ppermute(x[..., -1:], axis_name,
                            [(i, i + 1) for i in range(n_shards - 1)])
    right = jax.lax.ppermute(x[..., :1], axis_name,
                             [(i + 1, i) for i in range(n_shards - 1)])
    idx = jax.lax.axis_index(axis_name)
    left = jnp.where(idx == 0, x[..., :1], left)
    right = jnp.where(idx == n_shards - 1, x[..., -1:], right)
    return jnp.concatenate([left, x, right], axis=-1)


def _local_deriv_fn(params, boundary, dtype, local_zones: int,
                    axis_name: str, n_shards: int):
    """Derivative evaluation for one shard's zone block: halo-exchange, run
    the full physics on the padded block, slice the ghosts back off."""
    zp = local_zones + 2
    idx = jax.lax.axis_index(axis_name)
    pos = jnp.arange(zp)
    inlet_mask = ((idx == 0) & (pos == 1)).astype(dtype)
    outlet_mask = ((idx == n_shards - 1) & (pos == zp - 2)).astype(dtype)

    has_n = params.nitrogen is not None
    has_g = params.gas is not None
    has_p = params.particles is not None
    has_d = params.disinfection is not None
    has_b = params.biofilm is not None
    g_off = 7 if has_n else 3
    p_off = g_off + (2 if has_g else 0)
    d_off = p_off + (2 if has_p else 0)
    b_off = d_off + (5 if has_d else 0)
    sludge_i = p_off + 1 if has_p else -1

    def f(y):
        # sludge (the second particle leaf) has no zone axis: it is
        # neither halo-padded nor trimmed, and its tendency is psum'd so
        # every zone shard integrates the identical global value
        # (derivatives gates it to the bottom-owning shard).
        padded = tuple(
            v if i == sludge_i else _halo_pad(v, axis_name, n_shards)
            for i, v in enumerate(y))
        d = R.derivatives(params, padded[0], padded[1], padded[2],
                          boundary, inlet_mask=inlet_mask,
                          outlet_mask=outlet_mask,
                          nitrogen=padded[3:7] if has_n else None,
                          gas=padded[g_off:g_off + 2] if has_g else None,
                          particles=((padded[p_off], y[sludge_i])
                                     if has_p else None),
                          disinfection=(padded[d_off:d_off + 5]
                                        if has_d else None),
                          biofilm=(padded[b_off:b_off + 3]
                                   if has_b else None))
        return tuple(
            jax.lax.psum(v, axis_name) if i == sludge_i else v[..., 1:-1]
            for i, v in enumerate(d))

    return f


def _local_uv_mask(params, dtype, local_zones: int, axis_name: str,
                   n_shards: int):
    """Outlet-owning one-hot over the LOCAL (unpadded) zone block for the
    step-level UV operator split (core/reactor.py::step ``uv_mask``);
    None when the disinfection axis is off."""
    if params.disinfection is None:
        return None
    idx = jax.lax.axis_index(axis_name)
    pos = jnp.arange(local_zones)
    return ((idx == n_shards - 1) & (pos == local_zones - 1)).astype(dtype)


def zone_sharded_step(mesh: Mesh, n_zones: int, dt: float, substeps: int,
                      state_ndim: int = 1, axis_name: str = ZONE_AXIS,
                      stages=None, nitrogen: bool = False,
                      gas: bool = False, particles: bool = False,
                      disinfection: bool = False, biofilm: bool = False):
    """Jitted single-dt step with the zone axis sharded over ``mesh``.

    ``n_zones`` must be divisible by the mesh size. ``state_ndim`` is the
    rank of the primary state arrays (1 = single plant, 2 = [plants, zones]).
    """
    n_shards = mesh.shape[axis_name]
    if n_zones % n_shards:
        raise ValueError(f"n_zones={n_zones} not divisible by "
                         f"mesh size {n_shards}")
    local_zones = n_zones // n_shards
    zone = _zone_spec(state_ndim, axis_name)
    part = ((_zone_spec(state_ndim + 1, axis_name), P())
            if particles else None)
    disinfect = _zone_spec(state_ndim + 1, axis_name) \
        if disinfection else None
    state_spec = R.ReactorState(time=P(), pH=zone, chlorine=zone,
                                temperature=zone, flow_rate=P(),
                                H_concentration=zone, density=zone,
                                chlorine_decay_rate=zone,
                                **_species_specs(zone, nitrogen, gas=gas,
                                                 particles=part,
                                                 disinfection=disinfect,
                                                 biofilm=biofilm))

    def local_step(params, state, boundary):
        f = _local_deriv_fn(params, boundary, state.pH.dtype, local_zones,
                            axis_name, n_shards)
        return R.step(params, state, boundary, dt=dt, substeps=substeps,
                      deriv_fn=f, stages=stages,
                      deriv_fn_nitrogen=nitrogen, deriv_fn_gas=gas,
                      deriv_fn_particles=particles,
                      deriv_fn_disinfection=disinfection,
                      deriv_fn_biofilm=biofilm,
                      uv_mask=_local_uv_mask(params, state.pH.dtype,
                                             local_zones, axis_name,
                                             n_shards))

    fn = jax.shard_map(local_step, mesh=mesh,
                       in_specs=(P(), state_spec, P()),
                       out_specs=state_spec, check_vma=False)
    return jax.jit(fn)


def make_plant_zone_mesh(n_plant_shards: int, n_zone_shards: int,
                         devices: Optional[Sequence] = None,
                         plants_axis: str = "plants",
                         zone_axis: str = ZONE_AXIS) -> Mesh:
    """2-D mesh: data-parallel plants x spatially-decomposed zones.

    The zone axis should map to the mesh's minor (fastest-wire) dimension on
    real hardware so halo ppermutes ride nearest-neighbour ICI links while
    the plant axis needs no steady-state traffic at all.
    """
    if devices is None:
        devices = jax.devices()
    n = n_plant_shards * n_zone_shards
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_plant_shards, n_zone_shards)
    return Mesh(grid, (plants_axis, zone_axis))


def plant_zone_sharded_step(mesh: Mesh, n_zones: int, dt: float,
                            substeps: int, params_example,
                            plants_axis: str = "plants",
                            zone_axis: str = ZONE_AXIS, stages=None,
                            nitrogen: bool = False,
                            gas: bool = False, particles: bool = False,
                            disinfection: bool = False,
                            biofilm: bool = False):
    """Jitted batched step over a 2-D (plants x zones) mesh: the leading
    plant axis of every ``[n_plants]``-batched params/state leaf is sharded
    over ``plants_axis``, the trailing zone axis over ``zone_axis``.

    ``params_example`` supplies the params pytree structure (per-plant
    leaves are rank >= 1; scalars replicate). Halo ppermutes run along the
    zone axis only — each plant-row of the mesh exchanges ghosts
    independently; the plant axis stays collective-free.
    """
    n_shards = mesh.shape[zone_axis]
    if n_zones % n_shards:
        raise ValueError(f"n_zones={n_zones} not divisible by "
                         f"zone mesh size {n_shards}")
    local_zones = n_zones // n_shards

    param_specs = jax.tree_util.tree_map(
        lambda x: P() if np.ndim(x) == 0 else P(plants_axis),
        params_example)
    zone = P(plants_axis, zone_axis)
    part = ((P(plants_axis, None, zone_axis), P(plants_axis))
            if particles else None)
    disinfect = P(plants_axis, None, zone_axis) if disinfection else None
    state_spec = R.ReactorState(time=P(), pH=zone, chlorine=zone,
                                temperature=zone, flow_rate=P(),
                                H_concentration=zone, density=zone,
                                chlorine_decay_rate=zone,
                                **_species_specs(zone, nitrogen, gas=gas,
                                                 particles=part,
                                                 disinfection=disinfect,
                                                 biofilm=biofilm))

    def local_step(params, state, boundary):
        f = _local_deriv_fn(params, boundary, state.pH.dtype, local_zones,
                            zone_axis, n_shards)
        return R.step(params, state, boundary, dt=dt, substeps=substeps,
                      deriv_fn=f, stages=stages,
                      deriv_fn_nitrogen=nitrogen, deriv_fn_gas=gas,
                      deriv_fn_particles=particles,
                      deriv_fn_disinfection=disinfection,
                      deriv_fn_biofilm=biofilm,
                      uv_mask=_local_uv_mask(params, state.pH.dtype,
                                             local_zones, zone_axis,
                                             n_shards))

    fn = jax.shard_map(local_step, mesh=mesh,
                       in_specs=(param_specs, state_spec, P()),
                       out_specs=state_spec, check_vma=False)
    return jax.jit(fn)


def shard_batch_zones(tree, mesh: Mesh, plants_axis: str = "plants",
                      zone_axis: str = ZONE_AXIS):
    """Place a plant-batched pytree on a 2-D mesh: rank-0 leaves replicate,
    rank-1 leaves (per-plant params) shard over plants, rank-2+ leaves
    ([plants, ..., zones] state) shard plants x zones.

    Particle leaves are the exception to the rank rule — their trailing
    class axis is NOT a zone axis: ``ReactorState.sludge`` ([plants, C])
    and every ``ReactorParams.particles`` leaf ([plants] or [plants, C])
    shard over plants only."""
    plants_only = set()
    if isinstance(tree, R.ReactorState) and tree.sludge is not None:
        plants_only.add(id(tree.sludge))
    if isinstance(tree, R.ReactorParams) and tree.particles is not None:
        plants_only.update(
            id(leaf) for leaf in jax.tree_util.tree_leaves(tree.particles))
    if isinstance(tree, R.ReactorParams) and tree.disinfection is not None:
        # per-pathogen-class leaves ([plants, P]): the trailing axis is
        # classes, not zones
        plants_only.update(
            id(leaf)
            for leaf in jax.tree_util.tree_leaves(tree.disinfection))

    def place(x):
        nd = np.ndim(x)
        if nd == 0:
            spec = P()
        elif nd == 1 or id(x) in plants_only:
            spec = P(plants_axis)
        else:
            spec = P(plants_axis, *([None] * (nd - 2)), zone_axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def zone_sharded_rollout(mesh: Mesh, n_zones: int, dt: float, substeps: int,
                         n_steps: int, state_ndim: int = 1,
                         axis_name: str = ZONE_AXIS, stages=None,
                         nitrogen: bool = False,
                         gas: bool = False, particles: bool = False,
                         disinfection: bool = False,
                         biofilm: bool = False):
    """Jitted n-step rollout (scan inside the shard_map, so the halo
    exchanges stay on-device for the whole trajectory)."""
    n_shards = mesh.shape[axis_name]
    if n_zones % n_shards:
        raise ValueError(f"n_zones={n_zones} not divisible by "
                         f"mesh size {n_shards}")
    local_zones = n_zones // n_shards
    zone = _zone_spec(state_ndim, axis_name)
    part = ((_zone_spec(state_ndim + 1, axis_name), P())
            if particles else None)
    disinfect = _zone_spec(state_ndim + 1, axis_name) \
        if disinfection else None
    state_spec = R.ReactorState(time=P(), pH=zone, chlorine=zone,
                                temperature=zone, flow_rate=P(),
                                H_concentration=zone, density=zone,
                                chlorine_decay_rate=zone,
                                **_species_specs(zone, nitrogen, gas=gas,
                                                 particles=part,
                                                 disinfection=disinfect,
                                                 biofilm=biofilm))

    def local_rollout(params, state, boundary):
        f = _local_deriv_fn(params, boundary, state.pH.dtype, local_zones,
                            axis_name, n_shards)
        uv = _local_uv_mask(params, state.pH.dtype, local_zones,
                            axis_name, n_shards)

        def body(s, _):
            return R.step(params, s, boundary, dt=dt, substeps=substeps,
                          deriv_fn=f, stages=stages,
                          deriv_fn_nitrogen=nitrogen,
                          deriv_fn_gas=gas,
                          deriv_fn_particles=particles,
                          deriv_fn_disinfection=disinfection,
                          deriv_fn_biofilm=biofilm,
                          uv_mask=uv), None

        final, _ = jax.lax.scan(body, state, None, length=n_steps)
        return final

    fn = jax.shard_map(local_rollout, mesh=mesh,
                       in_specs=(P(), state_spec, P()),
                       out_specs=state_spec, check_vma=False)
    return jax.jit(fn)
