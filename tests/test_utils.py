"""Profiling utilities and dispatch helpers."""

import time

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.utils import StepTimer, diagnostics
from ics_wt_physicsengine_tpu.utils.dispatch import align_trailing, array_namespace


def test_step_timer_rates():
    timer = StepTimer(window=16)
    assert timer.steps_per_second == 0.0
    for i in range(5):
        timer.tick(sim_time=i * 2.0)
        time.sleep(0.01)
    assert timer.steps_per_second > 0
    # 2 sim-seconds per ~0.01 wall-seconds -> RTF >> 1
    assert timer.real_time_factor > 10


def test_diagnostics_pytree():
    import jax
    import jax.numpy as jnp
    from ics_wt_physicsengine_tpu.core import reactor as R

    config = R.ReactorConfiguration()
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)
    d = jax.jit(diagnostics)(params, state)
    assert float(d["total_chlorine_mg"]) == pytest.approx(2000.0)
    assert float(d["pH_cv"]) == pytest.approx(0.0, abs=1e-12)
    assert np.isfinite(float(d["thermal_energy_kJ"]))


def test_array_namespace_dispatch():
    import jax.numpy as jnp
    import numpy as _np

    assert array_namespace(_np.ones(3)) is _np
    assert array_namespace(1.0, 2) is _np
    assert array_namespace(_np.ones(3), jnp.ones(3)) is jnp


def test_align_trailing():
    import numpy as _np

    c = _np.ones(4)
    like = _np.ones((4, 7))
    assert align_trailing(c, like).shape == (4, 1)
    assert align_trailing(2.5, like) == 2.5
    assert align_trailing(_np.ones((4, 7)), like).shape == (4, 7)
