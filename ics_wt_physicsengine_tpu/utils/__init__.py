"""Utilities: array-namespace dispatch, checkpoint/resume, history
logging, profiling."""

from ics_wt_physicsengine_tpu.utils.dispatch import (  # noqa: F401
    align_trailing,
    array_namespace,
)
from ics_wt_physicsengine_tpu.utils.checkpoint import (  # noqa: F401
    load_metadata,
    load_pytree,
    load_simulation,
    save_pytree,
    save_simulation,
)
from ics_wt_physicsengine_tpu.utils.history import (  # noqa: F401
    ParquetHistoryLogger,
)
from ics_wt_physicsengine_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    diagnostics,
    trace,
)
