"""Calibration harness: our fixed-step RK4 vs the reference's adaptive Radau.

Runs matched trajectories on CPU/x64 and prints max abs deviations per
variable for a sweep of substep policies. Not a test — a tuning tool.
"""

import os
import sys
import time

import jax

# env vars are overridden by this container's sitecustomize — configure
# through jax.config (see tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))

sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run_reference(config_kwargs, boundary_schedule, dt, n_steps):
    from wt_simulator.core.reactor import (
        BoundaryConditions as RefBC,
        IntegratedCSTR as RefCSTR,
        ReactorConfiguration as RefConfig,
    )

    reactor = RefCSTR(RefConfig(**config_kwargs))
    traj = []
    for i in range(n_steps):
        bc = RefBC(**boundary_schedule(i))
        state = reactor.step(dt, bc)
        traj.append(np.concatenate([state.pH, state.chlorine,
                                    state.temperature]))
    return np.array(traj)


def run_ours(config_kwargs, boundary_schedule, dt, n_steps, substeps):
    from ics_wt_physicsengine_tpu.core import reactor as R

    config = R.ReactorConfiguration(**config_kwargs)
    reactor = R.IntegratedCSTR(config, substeps=substeps)
    traj = []
    for i in range(n_steps):
        bc = R.BoundaryConditions(**boundary_schedule(i))
        state = reactor.step(dt, bc)
        traj.append(np.concatenate([np.asarray(state.pH),
                                    np.asarray(state.chlorine),
                                    np.asarray(state.temperature)]))
    return np.array(traj)


def compare(name, config_kwargs, boundary_schedule, dt, n_steps, substep_list):
    print(f"\n=== {name} (dt={dt}, steps={n_steps}) ===")
    t0 = time.time()
    ref = run_reference(config_kwargs, boundary_schedule, dt, n_steps)
    print(f"reference Radau: {time.time() - t0:.1f}s")
    n = config_kwargs.get("n_zones", 5)
    for substeps in substep_list:
        t0 = time.time()
        ours = run_ours(config_kwargs, boundary_schedule, dt, n_steps, substeps)
        err = np.abs(ours - ref)
        print(f"substeps={substeps:3d}: max|dpH|={err[:, :n].max():.2e} "
              f"max|dCl|={err[:, n:2*n].max():.2e} "
              f"max|dT|={err[:, 2*n:].max():.2e}  ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    # Config 1-like: 5-zone default, dosing transient + flow
    def schedule_a(i):
        t = i * 1.0
        base = dict(inlet_flow_rate=5.0, inlet_pH=8.0, inlet_chlorine=0.0,
                    inlet_temperature=22.0)
        if t < 60:
            base.update(acid_flow_rate=0.5, acid_concentration=0.1,
                        chlorine_flow_rate=0.2, chlorine_concentration=50.0)
        return base

    compare("5-zone default, dosing transient",
            dict(volume=1000, height=2.0, diameter=0.798, n_zones=5,
                 flow_rate=5.0, initial_pH=7.5, initial_chlorine=2.0,
                 temperature=20.0),
            schedule_a, dt=1.0, n_steps=120, substep_list=[1, 2, 4, 8])

    # Config 2-like: 20-zone stratified, warm inlet + heat loss
    def schedule_b(i):
        return dict(inlet_flow_rate=5.0, inlet_pH=7.2, inlet_chlorine=0.5,
                    inlet_temperature=26.0, acid_flow_rate=0.1,
                    acid_concentration=0.1, ambient_temperature=15.0,
                    heat_loss_coefficient=50.0)

    compare("20-zone stratified, warm inlet + heat loss",
            dict(volume=1000, height=2.0, diameter=0.798, n_zones=20,
                 flow_rate=5.0, initial_pH=7.0, initial_chlorine=2.0,
                 temperature=20.0),
            schedule_b, dt=1.0, n_steps=120, substep_list=[2, 4, 8])
