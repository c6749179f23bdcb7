"""Checkpointing: params + batch_stats + optimizer state + step.

Improves on the reference's ``torch.save({'state_dict', 'epoch'})``
(code/Logger.py:105-125), which silently dropped optimizer state; here the
full training state round-trips.  Uses orbax when available and flax
msgpack serialization as the portable single-file format.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from flax import serialization


def save_variables(path: str, variables: Dict[str, Any]) -> str:
    """Serialize a flax variables dict (params/batch_stats/...) to msgpack."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    return path


def restore_variables(path: str, target: Optional[Dict[str, Any]] = None):
    """Load a msgpack checkpoint.  With ``target`` the pytree structure is
    validated; without, the raw state dict is returned."""
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def save_train_state(path: str, state) -> str:
    """Serialize a full TrainState (params, batch_stats, opt_state, step)."""
    return save_variables(path, serialization.to_state_dict(state))


def restore_train_state(path: str, state):
    """Restore a TrainState saved by :func:`save_train_state`."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(state, data)


# ---------------------------------------------------------------------------
# orbax backend: sharded/multi-host-safe directory checkpoints
# ---------------------------------------------------------------------------


def save_orbax(directory: str, state) -> str:
    """Save a TrainState as an orbax directory checkpoint (multi-host safe:
    every process participates; sharded arrays save their own shards)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, serialization.to_state_dict(state), force=True)
    return path


def restore_orbax(directory: str, state):
    """Restore a TrainState from an orbax directory checkpoint."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, serialization.to_state_dict(state))
    return serialization.from_state_dict(state, restored)
