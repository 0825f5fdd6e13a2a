"""
Monte-Carlo ensemble statistics over sharded plant batches.

BASELINE config 4's purpose is controller tuning / uncertainty
quantification: run thousands of parameter-randomized plants, then reduce
across the plant axis. These reductions are jitted over the sharded batch,
so under a multi-device mesh XLA lowers them to `psum`-style collectives
over ICI — the host only ever sees the small reduced pytree.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import reactor as R


def ensemble_statistics(state: R.ReactorState,
                        quantiles=(0.05, 0.5, 0.95)) -> Dict:
    """Cross-plant statistics of a batched ``[B, Z]`` state.

    Returns per-zone mean/std and the requested quantiles for each primary
    variable, plus ensemble-level scalars. Jit-safe; under a sharded batch
    the mean/std/min/max reductions run as collectives. ``jnp.quantile``
    sorts along the plant axis, which under a plant-sharded batch gathers
    that axis onto each device — fine at current ensemble sizes (65k plants
    x 20 zones x 4 B = 5 MB); for much larger ensembles, swap in a
    histogram-based quantile estimate.
    """
    q = jnp.asarray(quantiles)

    def stats(x):
        return {
            "mean": jnp.mean(x, axis=0),
            "std": jnp.std(x, axis=0),
            "quantiles": jnp.quantile(x, q, axis=0),
            "min": jnp.min(x, axis=0),
            "max": jnp.max(x, axis=0),
        }

    return {
        "pH": stats(state.pH),
        "chlorine": stats(state.chlorine),
        "temperature": stats(state.temperature),
        "n_plants": state.pH.shape[0],
    }


def exceedance_probability(state: R.ReactorState, *, ph_low=6.5, ph_high=8.5,
                           chlorine_min=0.2) -> Dict:
    """Regulatory-style exceedance probabilities across the ensemble:
    fraction of plants whose *outlet* zone violates drinking-water limits.
    The canonical uncertainty-quantification output for dosing-controller
    tuning."""
    ph_out = state.pH[..., -1]
    cl_out = state.chlorine[..., -1]
    return {
        "p_ph_low": jnp.mean(ph_out < ph_low),
        "p_ph_high": jnp.mean(ph_out > ph_high),
        "p_chlorine_low": jnp.mean(cl_out < chlorine_min),
        "p_any_violation": jnp.mean((ph_out < ph_low) | (ph_out > ph_high)
                                    | (cl_out < chlorine_min)),
    }
