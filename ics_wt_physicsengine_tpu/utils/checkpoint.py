"""
Checkpoint / resume: pytree serialization for simulation state.

The reference has no persistence at all — a stopped simulation loses
everything (reference README.md:151,441-447; SURVEY.md 5.4). Because every
piece of state in this framework is a pytree (ReactorState/ReactorParams,
sensor carries incl. PRNG keys and delay buffers, Monte-Carlo batches),
checkpointing is a flat leaf dump to a single ``.npz`` plus structure-guided
restore. Typed PRNG key arrays round-trip via key_data/wrap_key_data.
"""

from __future__ import annotations

import contextlib
import json
import os
import tempfile
from typing import Any, Dict, Optional

import jax
import numpy as np

_KEY_MARK = "__prng_key__:"


def _is_key(leaf) -> bool:
    try:
        return jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)
    except (AttributeError, TypeError):
        return False


def save_pytree(path: str, tree: Any, metadata: Optional[Dict] = None):
    """Serialize a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {}
    kinds = []
    for i, leaf in enumerate(leaves):
        if _is_key(leaf):
            impl = str(jax.random.key_impl(leaf))
            arrays[f"leaf_{i}"] = np.asarray(jax.random.key_data(leaf))
            kinds.append(_KEY_MARK + impl)
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
            kinds.append("array")
    arrays["__meta__"] = np.frombuffer(
        json.dumps({
            "n_leaves": len(leaves),
            "kinds": kinds,
            "metadata": metadata or {},
        }).encode(), dtype=np.uint8)
    # Atomic write: serialize to a sibling temp file, then rename over the
    # target — a crash/SIGKILL mid-write can never leave a truncated
    # checkpoint where a good one used to be (covers every checkpoint path:
    # orchestrator, fleet, soak, examples).
    directory = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(suffix=".npz.tmp", dir=directory)
    try:
        # mkstemp creates 0600; restore umask-governed permissions so
        # other-user readers of checkpoints keep working.
        umask = os.umask(0)
        os.umask(umask)
        os.chmod(tmp, 0o666 & ~umask)
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
            f.flush()
            os.fsync(f.fileno())   # data hits disk before the rename does
        os.replace(tmp, path)
    except BaseException:
        with contextlib.suppress(OSError):
            os.unlink(tmp)
        raise


def load_pytree(path: str, template: Any):
    """Restore a pytree saved by ``save_pytree``.

    ``template`` supplies the tree structure (and static fields); its array
    leaves are replaced by the stored values.
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves_t, treedef = jax.tree_util.tree_flatten(template)
        if len(leaves_t) != meta["n_leaves"]:
            raise ValueError(
                f"Checkpoint has {meta['n_leaves']} leaves; template has "
                f"{len(leaves_t)} — structure mismatch")
        leaves = []
        for i, kind in enumerate(meta["kinds"]):
            arr = data[f"leaf_{i}"]
            if kind.startswith(_KEY_MARK):
                leaves.append(jax.random.wrap_key_data(
                    np.asarray(arr), impl=kind[len(_KEY_MARK):]))
            else:
                # Shape/dtype must match the template leaf: a checkpoint
                # written under a different configuration (e.g. another
                # --zones) must fail fast, not silently install state that
                # disagrees with the reactor's static config.
                t = leaves_t[i]
                t_shape = tuple(np.shape(t))
                if arr.shape != t_shape:
                    raise ValueError(
                        f"Checkpoint leaf {i} has shape {arr.shape}; "
                        f"template expects {t_shape} — configuration "
                        f"mismatch (was this saved with a different "
                        f"n_zones / batch size?)")
                t_dtype = getattr(t, "dtype", None)
                if t_dtype is not None and arr.dtype != t_dtype:
                    raise ValueError(
                        f"Checkpoint leaf {i} has dtype {arr.dtype}; "
                        f"template expects {t_dtype} — precision mismatch")
                leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)


def load_metadata(path: str) -> Dict:
    with np.load(path) as data:
        return json.loads(bytes(data["__meta__"]).decode())["metadata"]


def merge_lanes(restored: Any, fresh: Any) -> Any:
    """Lane-resize a restored batched pytree into a differently sized one.

    ``restored`` carries ``[n_old, ...]`` lane-major leaves (a loaded fleet
    checkpoint); ``fresh`` carries ``[n_new, ...]`` leaves (a freshly built
    ensemble of the target size). The first ``min(n_old, n_new)`` lanes of
    every leaf come from the checkpoint; any extra lanes keep their fresh
    state (new units start as brand-new plants — NOT copies of existing
    lanes, which would duplicate PRNG streams). Leaves whose shapes already
    agree pass through from the checkpoint; leaves with no lane axis (rank
    mismatch) keep the fresh value.

    Used for explicit fleet-size resharding (``--checkpoint-resize``);
    without it a size mismatch fails fast in ``load_pytree``.
    """
    import jax.numpy as jnp

    def m(r, f):
        r_shape, f_shape = tuple(np.shape(r)), tuple(np.shape(f))
        if r_shape == f_shape:
            return r
        if (len(r_shape) == len(f_shape) and len(r_shape) >= 1
                and r_shape[1:] == f_shape[1:]):
            k = min(r_shape[0], f_shape[0])
            if k == r_shape[0] and k < f_shape[0]:      # grow
                return jnp.concatenate([jnp.asarray(r),
                                        jnp.asarray(f)[k:]], axis=0)
            return jnp.asarray(r)[:f_shape[0]]          # shrink
        return f

    return jax.tree_util.tree_map(m, restored, fresh)


# ---------------------------------------------------------------------------
# Whole-simulation checkpoints
# ---------------------------------------------------------------------------

def save_simulation(path: str, reactor, sensors: Optional[Dict] = None,
                    metadata: Optional[Dict] = None):
    """Checkpoint an IntegratedCSTR (params + state) and optional sensor
    wrapper dict (their carries)."""
    bundle = {
        "params": reactor.params,
        "state": reactor.state,
    }
    if sensors:
        bundle["sensor_carries"] = {name: s.carry
                                    for name, s in sensors.items()}
    meta = dict(metadata or {})
    meta["has_sensors"] = bool(sensors)
    save_pytree(path, bundle, metadata=meta)


def load_simulation(path: str, reactor, sensors: Optional[Dict] = None):
    """Restore a checkpoint in place into ``reactor`` (and ``sensors``)."""
    template = {
        "params": reactor.params,
        "state": reactor.state,
    }
    if sensors:
        template["sensor_carries"] = {name: s.carry
                                      for name, s in sensors.items()}
    bundle = load_pytree(path, template)
    reactor.params = bundle["params"]
    reactor.state = bundle["state"]
    if sensors:
        for name, s in sensors.items():
            s.carry = bundle["sensor_carries"][name]
    return reactor
