"""
Multi-host (DCN-axis) demo: a Monte-Carlo plant batch sharded across TWO
PROCESSES forming one global mesh, verified against the single-process
engine.

On a real TPU pod each process is one host with its local chips and the
inter-host transport is DCN; here the stand-in is two local processes with
four virtual CPU devices each, linked by jax.distributed + gloo — the same
program structure, meshes, and shardings either way.

Run (self-spawning):   python tools/multihost_demo.py
Run (one rank):        python tools/multihost_demo.py --rank R --nprocs N

Prints, from rank 0: per-process device counts, the globally sharded step's
ensemble-mean pH (a cross-DCN psum), and the max |difference| vs a
single-process reference rollout of the same batch (expected: 0).
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PLANTS = 16
N_ZONES = 4
N_STEPS = 5
LOCAL_DEVICES = 4


def worker(rank: int, nprocs: int, coord: str) -> None:
    from ics_wt_physicsengine_tpu.parallel.multihost import (
        initialize_multihost, shard_batch_multihost)
    initialize_multihost(coord, num_processes=nprocs, process_id=rank,
                         local_device_count=LOCAL_DEVICES)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ics_wt_physicsengine_tpu.core import reactor as R
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)
    from ics_wt_physicsengine_tpu.parallel import make_mesh, sharded_rollout

    print(f"[rank {rank}] {len(jax.local_devices())} local / "
          f"{len(jax.devices())} global devices", flush=True)

    base = R.ReactorConfiguration(n_zones=N_ZONES)
    # Host-pure construction: identical on every process (same seed).
    params, state = make_monte_carlo_batch(base, N_PLANTS, seed=3,
                                           dtype=jnp.float32)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.3,
                              inlet_chlorine=0.4, acid_flow_rate=0.05)

    mesh = make_mesh()                      # spans ALL global devices
    g_params = shard_batch_multihost(params, mesh)
    g_state = shard_batch_multihost(state, mesh)

    fn = sharded_rollout(mesh, dt=1.0, substeps=4, n_steps=N_STEPS)
    out = fn(g_params, g_state, bc)[0]

    # Ensemble reduction -> cross-host collective; result replicated.
    mean_ph = float(jnp.mean(out.pH))

    # Compare the locally addressable shard against a single-process oracle
    # rollout of the full batch (pure function of the same inputs).
    oracle = R.rollout(params, state, bc, dt=1.0, substeps=4,
                       n_steps=N_STEPS, record=False)[0]
    worst = 0.0
    for shard in out.pH.addressable_shards:
        ref = np.asarray(oracle.pH)[shard.index]
        worst = max(worst, float(np.max(np.abs(
            np.asarray(shard.data) - ref))))

    if rank == 0:
        print(f"[rank 0] ensemble mean pH after {N_STEPS} steps: "
              f"{mean_ph:.6f}", flush=True)
        print(f"[rank 0] max |sharded - single-process| on local shards: "
              f"{worst:.3g}", flush=True)
        assert np.isfinite(mean_ph)
    assert worst == 0.0, worst

    # Integrated plant batch: carries typed PRNG-key leaves, which
    # shard_batch_multihost ships as raw key words and re-wraps (a plain
    # np.asarray would raise on PRNGKey-dtype arrays).
    from ics_wt_physicsengine_tpu.models.plant import (
        make_plant_batch, plant_step_batched)
    p_params, p_state = make_plant_batch(base, N_PLANTS, seed=3,
                                         dtype=jnp.float32)
    gp = shard_batch_multihost(p_params, mesh)
    gs = shard_batch_multihost(p_state, mesh)
    step = jax.jit(lambda pp, ss: plant_step_batched(pp, ss, bc, 1.0, 4))
    _, readings = step(gp, gs)
    oracle_r = jax.jit(
        lambda pp, ss: plant_step_batched(pp, ss, bc, 1.0, 4))(
            p_params, p_state)[1]
    worst_r = 0.0
    for shard in readings["pH_outlet"].value.addressable_shards:
        ref = np.asarray(oracle_r["pH_outlet"].value)[shard.index]
        worst_r = max(worst_r, float(np.max(np.abs(
            np.asarray(shard.data) - ref))))
    if rank == 0:
        print(f"[rank 0] plant batch (PRNG-key leaves): max local-shard "
              f"|diff| vs single-process = {worst_r:.3g}", flush=True)
    assert worst_r == 0.0, worst_r
    print(f"[rank {rank}] OK", flush=True)


def _free_port() -> int:
    """Bind-then-release an ephemeral port: a fixed port collides with
    concurrent test sessions or a stale worker from an aborted run."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--coord", type=str, default=None,
                    help="coordinator address (chosen automatically when "
                         "self-spawning)")
    args = ap.parse_args()

    if args.rank is not None:
        worker(args.rank, args.nprocs, args.coord)
        return

    coord = f"localhost:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--rank", str(r), "--nprocs", str(args.nprocs),
         "--coord", coord],
        cwd=REPO) for r in range(args.nprocs)]
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes: {rc}")
    print("multihost demo: all ranks OK")


if __name__ == "__main__":
    main()
