"""Run the five physics validation suites:
``python -m ics_wt_physicsengine_tpu.core``
(reference parity: core/__init__.py:297-299).

The suites are host-side oracle checks (literature values, structural
invariants); they run on the CPU backend regardless of the session default —
on the tunneled-TPU backend each eager check would pay a remote compile.
Set WT_VALIDATE_BACKEND to override (e.g. ``tpu`` to exercise the device).
"""

import os

import jax

jax.config.update("jax_platforms",
                  os.environ.get("WT_VALIDATE_BACKEND", "cpu"))

from ics_wt_physicsengine_tpu.core import run_all_validations  # noqa: E402

if __name__ == "__main__":
    run_all_validations()
