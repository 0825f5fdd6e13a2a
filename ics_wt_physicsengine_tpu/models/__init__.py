"""Assembled plant models: single flagship plant and Monte-Carlo batches."""

from ics_wt_physicsengine_tpu.models.monte_carlo import (  # noqa: F401
    ParameterRanges,
    make_monte_carlo_batch,
)
