"""Numerical kernels: fixed-step integrators and the Pallas pH solver."""

from ics_wt_physicsengine_tpu.ops.integrators import rk4_step, integrate_fixed  # noqa: F401
