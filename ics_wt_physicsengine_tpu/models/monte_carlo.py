"""
Monte-Carlo plant batches: parameter-randomized plants as batched pytrees.

BASELINE config 4: "4096 parameter-randomized plants vmapped for controller
tuning / uncertainty quantification". Because ``ReactorParams`` is a pytree of
scalars (core/reactor.py), a batch of plants is the *same* structure with
``[n_plants]`` leaves — the natively-batched physics (trailing-zone-axis
stencils) consumes it directly, no vmap wrapper needed, and
``parallel.shard_batch`` spreads the leading axis over the device mesh.

Randomization happens host-side in NumPy float64 (config sampling is not a
hot path), then leaves are cast to the compute dtype.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ics_wt_physicsengine_tpu.core import reactor as R


@dataclass
class ParameterRanges:
    """Uniform sampling ranges for plant-to-plant parameter uncertainty.

    Keys are ``ReactorConfiguration`` field names; values are (low, high).
    Geometry is kept fixed across the batch (same zone count / shapes).
    """

    ranges: Dict[str, Tuple[float, float]] = field(default_factory=lambda: {
        "flow_rate": (2.0, 8.0),            # [L/min]
        "impeller_speed": (40.0, 90.0),     # [rpm]
        "total_carbonate": (1.0, 4.0),      # [mmol/L]
        "temperature": (10.0, 30.0),        # [C]
        "initial_pH": (6.5, 8.0),
        "initial_chlorine": (0.5, 3.5),     # [mg/L]
    })
    # Alkalinity is sampled as a ratio of the carbonate capacity
    # (alk [mg/L CaCO3] = ratio * 50 * C_T [mmol/L]) so every sampled water
    # is chemically consistent: alkalinity beyond what carbonate + OH- can
    # carry has no physical pH root (the charge balance then "balances" at
    # absurd acid pH). ratio ~1 reproduces the reference default
    # (alk=100, C_T=2, chemistry.py:537).
    alkalinity_ratio: Tuple[float, float] = (0.5, 1.3)
    # Nitrogen-chemistry kinetics (applied only when the base config has
    # enable_nitrogen=True): plant-to-plant biological uncertainty —
    # nitrifier activity spans a wide envelope between sites.
    nitrogen_ranges: Dict[str, Tuple[float, float]] = field(
        default_factory=lambda: {
            "k_nitrif": (1.0, 4.0),        # [mg N/L/day] @ 20 C
            "k_nitrat": (1.5, 6.0),        # [mg N/L/day]
            "K_nh": (0.5, 2.0),            # [mg N/L]
            "k_cm_decay": (0.01, 0.05),    # [1/day]
        })


def make_monte_carlo_batch(base_config: R.ReactorConfiguration,
                           n_plants: int,
                           seed: int = 0,
                           ranges: ParameterRanges | None = None,
                           dtype=jnp.float32):
    """Sample ``n_plants`` configurations around ``base_config`` and assemble
    batched (params, state) pytrees with leading ``[n_plants]`` axes.

    Fully vectorized and host-pure: one array-valued configuration flows
    through ``make_params``/``make_initial_state`` once (their float64 NumPy
    math is elementwise, so this is leaf-for-leaf identical to building each
    plant separately and stacking — tests/test_parallel.py asserts it), and
    every returned leaf is a NumPy array. No per-plant Python loop (65,536
    plants assemble in milliseconds on this 1-core host) and no device
    commit — callers choose placement (``parallel.shard_batch`` puts leaves
    onto the mesh; jit arguments land on the default device).
    """
    if n_plants < 1:
        raise ValueError(f"n_plants must be >= 1, got {n_plants}")
    if ranges is None:
        ranges = ParameterRanges()
    rng = np.random.default_rng(seed)

    samples = {name: rng.uniform(lo, hi, n_plants)
               for name, (lo, hi) in ranges.ranges.items()}
    if "alkalinity" not in samples:
        ratio = rng.uniform(*ranges.alkalinity_ratio, n_plants)
        samples["alkalinity"] = ratio * 50.0 * samples["total_carbonate"]

    # One configuration whose numeric fields are all [n_plants] float64
    # arrays (sampled where ranged, broadcast base values elsewhere) —
    # derived parameter/state leaves then come out batched automatically.
    fields = dict(base_config.__dict__)
    for name, value in fields.items():
        if name in samples:
            fields[name] = samples[name]
        elif isinstance(value, float):
            fields[name] = np.full(n_plants, value, np.float64)
    if getattr(base_config, "enable_nitrogen", False):
        # sample biological kinetics per plant; explicit user overrides in
        # nitrogen_kinetics stay fixed across the batch
        n_kw = dict(base_config.nitrogen_kinetics or {})
        for name, (lo, hi) in ranges.nitrogen_ranges.items():
            if name not in n_kw:
                n_kw[name] = rng.uniform(lo, hi, n_plants)
        fields["nitrogen_kinetics"] = n_kw
    config = R.ReactorConfiguration(**fields)

    params = R.make_params(config, dtype=dtype)
    state = R.make_initial_state(config, dtype=dtype)

    # Leaves that depend only on constants are still scalars — broadcast so
    # every non-static leaf carries the [n_plants] axis (shard_batch shards
    # the leading axis of every array leaf).
    def batched(x):
        if isinstance(x, int):              # static n_zones
            return x
        x = np.asarray(x)
        if x.ndim == 0:
            return np.broadcast_to(x, (n_plants,)).copy()
        return x

    # particle leaves are [C] class vectors (not scalars), so the generic
    # 0-dim broadcast below misses them — batch the pristine subtree
    # explicitly (scalar -> [n], [C] -> [n, C]) BEFORE the generic map can
    # touch it: shape-based "already batched?" heuristics are ambiguous
    # exactly when n_plants == n_classes
    def pbatch(x):
        x = np.asarray(x)
        return np.broadcast_to(x, (n_plants,) + x.shape).copy()

    import dataclasses as _dc
    particles = params.particles
    if particles is not None:
        particles = jax.tree_util.tree_map(pbatch, particles)
        params = _dc.replace(params, particles=None)
    # disinfection leaves are likewise [P] pathogen-class vectors (k_cl,
    # k_uv) mixed with scalars — same explicit pre-batching
    disinfection = params.disinfection
    if disinfection is not None:
        disinfection = jax.tree_util.tree_map(pbatch, disinfection)
        params = _dc.replace(params, disinfection=None)

    params = jax.tree_util.tree_map(batched, params)
    state = jax.tree_util.tree_map(batched, state)
    if particles is not None:
        params = _dc.replace(params, particles=particles)
    if disinfection is not None:
        params = _dc.replace(params, disinfection=disinfection)
    return params, state
