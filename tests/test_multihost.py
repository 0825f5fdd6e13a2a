"""
Multi-host (multi-process) plant-batch sharding — the DCN axis.

Runs tools/multihost_demo.py in subprocesses: two jax.distributed processes
with four virtual CPU devices each form one 8-device global mesh (gloo
collectives stand in for DCN), shard a Monte-Carlo batch hosts-major, run a
sharded rollout, and assert bit-equality of every locally addressable shard
against a single-process rollout of the same batch. Subprocesses are
required — jax.distributed cannot be initialized twice in one process — so
this is an integration test by construction.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_mesh_matches_single_process():
    env = dict(os.environ)
    # The workers pick their own backend/devices via jax.config; scrub any
    # test-session forcing so children start clean.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_demo.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "all ranks OK" in out.stdout
    assert "max |sharded - single-process| on local shards: 0" in out.stdout
