"""Device-mesh sharding of plant batches (data-parallel over ICI) and
cross-plant ensemble statistics."""

from ics_wt_physicsengine_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    sharded_rollout,
    sharded_step,
)
from ics_wt_physicsengine_tpu.parallel.statistics import (  # noqa: F401
    ensemble_statistics,
    exceedance_probability,
)
