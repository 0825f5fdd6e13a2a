"""
Plant-batch sharding over a device mesh.

The workload's parallel axis is the *plant batch*: thousands of
parameter-randomized plants advance in lockstep, embarrassingly parallel
(SURVEY.md section 5.7 — the reference has no distributed capability; this is
new, mandated by BASELINE config 4). The natural mapping is pure data
parallelism: shard the leading ``[n_plants]`` axis of every state/params leaf
across the mesh with ``jax.sharding.NamedSharding``; XLA compiles the jitted
step SPMD with zero collectives in steady state (nearest-neighbour zone
coupling lives entirely on the trailing axis, which stays local). Reductions
over plants (Monte-Carlo statistics) lower to ``psum`` over ICI.

No reference counterpart — designed JAX-idiomatically per the task spec.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ics_wt_physicsengine_tpu.core import reactor as R

PLANTS_AXIS = "plants"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = PLANTS_AXIS) -> Mesh:
    """1-D mesh over the plant axis. ``n_devices`` defaults to all local
    devices (real chips on TPU; virtual CPU devices under
    --xla_force_host_platform_device_count in tests)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = PLANTS_AXIS):
    """Place a batched pytree so the leading axis of every array leaf is
    sharded over the mesh; scalar/static leaves are replicated."""

    def place(x):
        if isinstance(x, (int, float)) or np.ndim(x) == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(
            x, NamedSharding(mesh, P(axis_name, *([None] * (np.ndim(x) - 1)))))

    return jax.tree_util.tree_map(place, tree)


def sharded_step(mesh: Mesh, dt: float, substeps: int,
                 axis_name: str = PLANTS_AXIS):
    """Jitted batched step with explicit output shardings pinned to the mesh
    (inputs inherit their placement from ``shard_batch``)."""
    batch_sharding = NamedSharding(mesh, P(axis_name))

    @partial(jax.jit, out_shardings=batch_sharding)
    def fn(params, state, boundary):
        return R.step(params, state, boundary, dt=dt, substeps=substeps)

    return fn


def sharded_rollout(mesh: Mesh, dt: float, substeps: int, n_steps: int,
                    record: bool = False, axis_name: str = PLANTS_AXIS):
    """Jitted batched rollout (scan over steps) over the sharded plant axis.
    Output shardings are pinned to the mesh like ``sharded_step`` (the
    recorded trajectory, when present, keeps its plant axis sharded too —
    it is axis 1 of each ``[n_steps, n_plants, Z]`` leaf)."""
    state_sharding = NamedSharding(mesh, P(axis_name))
    traj_sharding = NamedSharding(mesh, P(None, axis_name))

    @partial(jax.jit,
             out_shardings=(state_sharding,
                            traj_sharding if record else None))
    def fn(params, state, boundary):
        return R.rollout(params, state, boundary, dt=dt, substeps=substeps,
                         n_steps=n_steps, record=record)

    return fn
