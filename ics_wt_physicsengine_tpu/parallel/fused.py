"""
Multi-chip execution of the fused Pallas kernels: shard_map over the plant
axis, one kernel instance per device.

The fused rollout kernels (ops/fused_rollout.py, ops/fused_plant.py) are
single-device programs; scaling them across a pod slice is pure data
parallelism — shard the Monte-Carlo plant batch over the mesh and run each
device's shard through its own kernel launch. There is no cross-plant
coupling inside a rollout, so steady state needs zero collectives; ensemble
statistics afterwards lower to `psum` over ICI
(parallel/statistics.py). The resulting program is SPMD: XLA compiles ONE
executable with the kernel embedded, and each chip runs its rows.

Validated on a virtual 8-device CPU mesh (tests/test_fused_parallel.py):
each sharded result is bit-identical to running the same shard through the
single-device kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from ics_wt_physicsengine_tpu.parallel.mesh import PLANTS_AXIS


def _specs(axis_name):
    """(sharded-leading-axis, replicated) PartitionSpec pair."""
    return P(axis_name), P()


def sharded_rollout_fused(mesh, *, dt: float, substeps: int, n_steps: int,
                          stages=None, record_every=None,
                          axis_name: str = PLANTS_AXIS,
                          interpret: bool | None = None):
    """Jitted SPMD wrapper: each device runs the fused whole-rollout kernel
    (ops/fused_rollout.py) on its local plant shard.

    Returns ``fn(params, state, boundary)`` accepting batched pytrees whose
    leading axis divides the mesh size (shard with ``shard_batch`` or pass
    host arrays — jit will place them per the shard_map specs).
    """
    from ics_wt_physicsengine_tpu.ops.fused_rollout import rollout_fused

    if interpret is None:
        # key off the MESH's backend, not the process default (the mesh may
        # be a CPU fallback while the default backend is a broken TPU)
        interpret = mesh.devices.flat[0].platform != "tpu"
    shard, repl = _specs(axis_name)

    @partial(jax.shard_map, mesh=mesh, in_specs=(shard, shard, repl),
             out_specs=(shard if record_every is None
                        else (shard, P(None, axis_name))),
             check_vma=False)   # pallas_call outputs carry no vma info
    def local(params, state, boundary):
        return rollout_fused(params, state, boundary, dt=dt,
                             substeps=substeps, n_steps=n_steps,
                             stages=stages, record_every=record_every,
                             interpret=interpret)

    return jax.jit(local)


def sharded_plant_rollout_fused(mesh, params, *, dt: float, substeps: int,
                                n_steps: int, stages=None,
                                record_every: int = 1, rng: str = "hw",
                                seed: int = 0, bits=None,
                                axis_name: str = PLANTS_AXIS,
                                layout: str = "zl",
                                scheduled: bool = False):
    """Jitted SPMD wrapper for the fused integrated-plant kernel
    (ops/fused_plant.py): physics + all seven instruments per step, one
    kernel instance per device over the plant shard.

    ``params`` must be the concrete batched PlantParams (sensor statics and
    sample-line delays are extracted host-side — they cannot be read from
    tracers inside shard_map). Each device seeds its PRNG stream with
    ``seed`` plus its mesh position, so shards draw independent noise.
    ``rng="bits"`` (testing) replicates the given word stream to every
    shard. ``scheduled=True`` declares that ``boundary`` will be an
    [n_steps]-leaf BoundaryConditions schedule (replicated to all shards).
    Returns ``fn(params, plant, boundary) -> (new_plant, readings)``.
    """
    from ics_wt_physicsengine_tpu.ops import fused_plant as FP

    if params.reactor.nitrogen is not None:
        raise ValueError("the fused plant kernel does not support the "
                         "nitrogen chemistry extension (sharded path "
                         "included); use the XLA integrated-plant paths")

    # Host-side statics (concrete params required): the SAME derivation
    # plant_rollout_fused uses — shared helper so the shard_map path can
    # never desynchronize from the single-host path.
    statics_t = FP.sensor_statics(params, dt)

    interpret = mesh.devices.flat[0].platform != "tpu"
    if rng == "hw" and interpret:
        raise ValueError("rng='hw' needs the TPU PRNG; pass rng='bits' "
                         "for CPU/interpret runs")
    hw_rng = rng == "hw"
    if hw_rng:
        bits = np.zeros((1,), np.int32)

    shard, repl = _specs(axis_name)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(shard, shard, repl, repl),
             out_specs=(shard, P(None, axis_name)),
             check_vma=False)   # pallas_call outputs carry no vma info
    def local(p, plant, boundary, bits_arr):
        # distinct per-device PRNG stream via the mesh position
        dev_seed = seed if not hw_rng else \
            seed + jax.lax.axis_index(axis_name) * 1_000_003
        new_plant, readings = FP._fused_plant_jit(
            p, plant, boundary, bits_arr, dt=dt, substeps=substeps,
            n_steps=n_steps, stages=stages, record_every=record_every,
            hw_rng=hw_rng, seed=dev_seed, interpret=interpret,
            statics_t=statics_t, consume_line=True,
            scheduled=scheduled, sched_chunk=FP._PLANT_SCHED_CHUNK,
            layout=layout, ablate=FP._ABLATE)
        stacked = jax.numpy.stack(
            [readings[rname] for rname, _, _ in FP.SENSORS], axis=-1)
        return new_plant, stacked

    fn = jax.jit(local)

    def wrapped(p, plant, boundary):
        new_plant, stacked = fn(p, plant, boundary, bits)
        readings = {rname: stacked[..., k]
                    for k, (rname, _, _) in enumerate(FP.SENSORS)}
        return new_plant, readings

    return wrapped
