"""
Dual-backend dispatch for the physics formulas.

The pure physics functions are plain arithmetic plus a handful of
``exp/log/where`` calls. Inside jitted TPU graphs they must use ``jax.numpy``;
on the host (constructors, API-parity scalar methods, test oracles) eager JAX
dispatch costs an XLA compile per distinct op — prohibitive on small hosts —
so the same formulas run on NumPy. ``array_namespace(*args)`` picks the
backend from the argument types: any ``jax.Array`` (including tracers, which
subclass it) selects ``jax.numpy``; otherwise NumPy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def array_namespace(*args):
    """Return ``jax.numpy`` if any argument is a JAX array/tracer, else ``numpy``."""
    for a in args:
        if isinstance(a, jax.Array):
            return jnp
    return np


def align_trailing(c, like):
    """Right-pad ``c`` with singleton axes until it broadcasts against
    ``like`` by *leading* (batch) axes.

    Per-plant scalars are ``[B]`` while zone arrays are ``[B, Z]``; NumPy
    broadcasting aligns trailing axes, so a bare ``[B] op [B, Z]`` is an
    error. This helper turns ``[B]`` into ``[B, 1]`` (and scalars/equal-rank
    arrays pass through unchanged)."""
    xp = array_namespace(c, like)
    c = xp.asarray(c)
    like_ndim = getattr(like, "ndim", 0)
    while c.ndim and c.ndim < like_ndim:
        c = c[..., None]
    return c
