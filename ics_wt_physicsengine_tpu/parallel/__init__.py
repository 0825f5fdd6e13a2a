"""Device-mesh sharding of plant batches (data-parallel over ICI)."""

from ics_wt_physicsengine_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    sharded_rollout,
    sharded_step,
)
