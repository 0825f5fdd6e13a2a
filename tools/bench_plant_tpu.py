"""Driver-runnable benchmark: integrated plant (physics + 7 instruments).

Measures BASELINE configs 3+4 combined: batched plant_step scanned on-device.
Prints one JSON line per configuration. Timing follows the axon rules:
chained inputs, device->host barrier.
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.models.plant import (
    make_plant, make_plant_batch, plant_rollout, plant_rollout_batched)

BC = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.2,
                          inlet_chlorine=0.5, inlet_temperature=26.0,
                          acid_flow_rate=0.1, ambient_temperature=15.0,
                          heat_loss_coefficient=50.0)


def bench(tag, n_plants, n_steps, stages=None, zones=20):
    config = R.ReactorConfiguration(volume=1000, height=2.0, diameter=0.798,
                                    n_zones=zones)
    substeps = R.default_substeps(config, 1.0)
    if stages is not None:
        substeps, stages = R.default_rkc_plan(config, 1.0, mode="fast")
    if n_plants == 1:
        params, plant = make_plant(config, seed=1, dtype=jnp.float32)
        fn = jax.jit(lambda p: plant_rollout(
            params, p, BC, 1.0, substeps, n_steps, record=False,
            stages=stages)[0])
    else:
        params, plant = make_plant_batch(config, n_plants, seed=1,
                                         dtype=jnp.float32)
        fn = jax.jit(lambda p: plant_rollout_batched(
            params, p, BC, 1.0, substeps, n_steps, record=False,
            stages=stages)[0])
    t0 = time.perf_counter()
    out = fn(plant)
    np.asarray(out.reactor.pH)
    compile_s = time.perf_counter() - t0
    # chained timing
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out)
    np.asarray(out.reactor.pH)
    dt = (time.perf_counter() - t0) / iters
    rate = n_plants * n_steps / dt
    print(json.dumps({"bench": tag, "n_plants": n_plants,
                      "n_steps": n_steps,
                      "plant_steps_per_s": round(rate),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return rate


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    bench("plant_single_rk4", 1, 2048)
    bench("plant_single_rkc", 1, 2048, stages="fast")
    bench("plant_batch1024_rk4", 1024, 256)
    bench("plant_batch4096_rk4", 4096, 128)
    bench("plant_batch4096_rkc", 4096, 128, stages="fast")
    bench("plant_batch16384_rkc", 16384, 64, stages="fast")
