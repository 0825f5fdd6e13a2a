"""
Multi-host (multi-process) scaling: the DCN axis.

One process per host, each owning its local TPU chips; `jax.distributed`
links them into one global device set, and the existing 1-D plant mesh
(parallel/mesh.py) simply spans all global devices. Because the workload is
pure data parallelism over plants (SURVEY.md section 5.7 — nearest-neighbour
zone coupling never crosses plant boundaries), the steady-state step needs
**zero cross-host communication**; only ensemble reductions
(`parallel.statistics`) reduce over DCN, and those move scalars per zone.

Layout rule (scaling-book recipe): the plant axis is sharded
hosts-major/chips-minor — contiguous plant blocks live on one host's chips,
so any future cross-plant collective rides ICI within a host before
touching DCN.

There is no reference counterpart (the reference is a single process,
SURVEY.md section 2); this follows jax.distributed idioms. Verified on this
machine by tools/multihost_demo.py: two processes x four virtual CPU
devices each form one 8-device global mesh (gloo collectives stand in for
DCN), and the sharded Monte-Carlo step matches the single-process result
bit for bit (tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(coordinator_address: str,
                         num_processes: int,
                         process_id: int,
                         local_device_count: Optional[int] = None) -> None:
    """Join this process into a multi-host run.

    Call once, before any other JAX operation, on every participating host:

        initialize_multihost("10.0.0.1:8476", num_processes=4,
                             process_id=host_rank)

    On TPU pods the runtime discovers local chips; ``local_device_count``
    forces a count of virtual CPU devices instead (testing on one machine).
    After this returns, ``jax.devices()`` is the *global* device list and
    ``parallel.make_mesh()`` spans every host.
    """
    if local_device_count is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(local_device_count))
        # Cross-process CPU collectives (stand-in for DCN on one machine).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_plant_slice(n_plants: int) -> slice:
    """The half-open slice of the global plant axis owned by this process
    under the hosts-major layout (``n_plants`` must divide evenly)."""
    n_proc = jax.process_count()
    if n_plants % n_proc:
        raise ValueError(f"{n_plants} plants do not divide over "
                         f"{n_proc} processes")
    per = n_plants // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_batch_multihost(tree, mesh, axis_name: str = "plants"):
    """Place a *globally identical* host-built batch pytree onto a global
    mesh from per-process addressable shards.

    Every process passes the same full ``[n_plants, ...]`` NumPy pytree
    (cheap to build everywhere — construction is vectorized, and identical
    seeds give identical batches); each contributes only its
    ``local_plant_slice`` to the global arrays, via
    ``jax.make_array_from_process_local_data``.
    """
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(x):
        # Typed PRNG-key leaves (sensor carries) can't round-trip through
        # NumPy: ship their raw uint32 words and re-wrap on device.
        if isinstance(x, jax.Array) and jnp.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            data = place(np.asarray(jax.random.key_data(x)))
            return jax.random.wrap_key_data(data, impl=impl)
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        sharding = NamedSharding(
            mesh, P(axis_name, *([None] * (x.ndim - 1))))
        sl = local_plant_slice(x.shape[0])
        return jax.make_array_from_process_local_data(
            sharding, x[sl], global_shape=x.shape)

    return jax.tree_util.tree_map(place, tree)
