"""Device-mesh sharding: plant batches (data-parallel over ICI),
zone-axis spatial decomposition (halo exchange via ppermute), multi-host
(DCN) process linking, and cross-plant ensemble statistics."""

from ics_wt_physicsengine_tpu.parallel.multihost import (  # noqa: F401
    initialize_multihost,
    local_plant_slice,
    shard_batch_multihost,
)

from ics_wt_physicsengine_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    sharded_rollout,
    sharded_step,
)
from ics_wt_physicsengine_tpu.parallel.spatial import (  # noqa: F401
    make_plant_zone_mesh,
    make_zone_mesh,
    plant_zone_sharded_step,
    shard_batch_zones,
    shard_state_zones,
    zone_sharded_rollout,
    zone_sharded_step,
)
from ics_wt_physicsengine_tpu.parallel.statistics import (  # noqa: F401
    ensemble_statistics,
    exceedance_probability,
)
from ics_wt_physicsengine_tpu.parallel.fused import (  # noqa: F401
    sharded_plant_rollout_fused,
    sharded_rollout_fused,
)
