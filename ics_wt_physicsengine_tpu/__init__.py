"""
ICS-WT-PhysicsEngine-TPU
========================

A TPU-native (JAX/XLA/Pallas) re-design of the Guivernoir/ICS-WT-PhysicsEngine
water-treatment plant simulator.

Architecture (TPU-first, not a translation):

- ``core/``     pure-functional physics: the multi-zone CSTR step is a jittable
                state transition over dense ``[n_zones]`` (or ``[batch, n_zones]``)
                arrays, rolled over time with ``lax.scan``.
- ``ops/``      numerical kernels: fixed-step integrators and a fixed-iteration
                Newton-Raphson pH solver (Pallas TPU kernel + jnp fallback).
- ``models/``   assembled plant models (physics + sensors) and Monte-Carlo
                parameter-randomized plant batches.
- ``sensors/``  the instrument suite re-expressed as PRNG-threaded, scan-carried
                stateful transforms.
- ``parallel/`` device-mesh sharding of plant batches (``jax.sharding`` +
                ``shard_map``; collectives ride ICI).
- ``modbus/``   Modbus/TCP server (from-scratch asyncio implementation — the
                reference's pymodbus dependency is replaced) exposing
                device-resident state to external SCADA/PID controllers.
- ``utils/``    checkpoint/resume (pytree serialization), profiling hooks.

The public API mirrors the reference package ``wt_simulator`` (same class and
field names — ``ReactorConfiguration``, ``IntegratedCSTR``, ``BoundaryConditions``,
sensor suite factory, register map) so reference users can switch directly,
while the compute path is pure JAX.

Reference: /root/reference/src/wt_simulator (structure documented in SURVEY.md).
"""

__version__ = "0.1.0"

from ics_wt_physicsengine_tpu.core import (  # noqa: F401
    ReactorConfiguration,
    ReactorState,
    BoundaryConditions,
    IntegratedCSTR,
    TemperatureDependentKinetics,
    AqueousChemistry,
    BufferSystem,
    TransportModel,
    GeometryParameters,
    FlowParameters,
    SpatialModel,
    StratificationParameters,
    rollout_scheduled,
    stack_boundary_schedule,
    NetworkTopology,
    NetworkState,
    make_network,
    network_step,
    rollout_network,
    rollout_network_scheduled,
    topology_arrays,
)
from ics_wt_physicsengine_tpu import control  # noqa: F401  (in-graph control)
