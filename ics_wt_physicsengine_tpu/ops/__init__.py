"""Numerical kernels: fixed-step integrators, the fused whole-rollout
Pallas kernels (constant and scheduled forcing), and the Pallas pH solver."""

from ics_wt_physicsengine_tpu.ops.integrators import rk4_step, integrate_fixed  # noqa: F401
from ics_wt_physicsengine_tpu.ops.fused_rollout import (  # noqa: F401
    rollout_fused,
    rollout_scheduled_fused,
)
from ics_wt_physicsengine_tpu.ops.fused_plant import (  # noqa: F401
    plant_rollout_fused,
)
