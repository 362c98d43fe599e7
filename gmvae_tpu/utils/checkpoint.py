"""Checkpoint/resume: atomic msgpack snapshots of the full training state.

SURVEY.md §5.3-5.4: steps are deterministic given ``(params, seed, step)``,
so failure recovery == restart from the last snapshot. Snapshots are written
write-tmp-then-rename for atomicity; multi-host pods write from process 0
only and restore everywhere.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_ckpt(path: str, state_tree: Dict[str, Any]) -> None:
    """Atomically serialize a pytree snapshot to ``path`` (process 0 only)."""
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # state-dict first: msgpack can't pack tuples/NamedTuples (optax states)
    payload = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(state_tree)))
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(payload)
    os.replace(tmp, path)  # atomic on POSIX


def restore_ckpt(path: str, like: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a snapshot into the structure of ``like`` (shape/dtype donor)."""
    with open(path, 'rb') as f:
        payload = f.read()
    return serialization.from_state_dict(
        _to_host(like), serialization.msgpack_restore(payload))


def _list_ckpts(run_dir: str) -> list:
    """Canonical ``ckpt_<step>.msgpack`` filenames in step order (oldest
    first). ONLY exact canonical names count: a user's copy like
    ``ckpt_5000_best.msgpack`` is their data — it must neither consume the
    retention budget in :func:`prune_ckpts` (which could delete real
    snapshots while the copy survives) nor shadow the canonical snapshot
    in :func:`latest_ckpt`."""
    if not os.path.isdir(run_dir):
        return []
    cands = []
    for f in os.listdir(run_dir):
        m = re.fullmatch(r'ckpt_(\d+)\.msgpack', f)
        if m:
            cands.append((int(m.group(1)), f))
    return [f for _, f in sorted(cands)]


def latest_ckpt(run_dir: str) -> str | None:
    """Newest ``ckpt_*.msgpack`` in a run directory, or None."""
    cands = _list_ckpts(run_dir)
    return os.path.join(run_dir, cands[-1]) if cands else None


def prune_ckpts(run_dir: str, keep: int) -> None:
    """Delete all but the newest ``keep`` snapshots (0/negative keeps all).

    Long runs would otherwise accumulate unbounded snapshots (celeba_dp16's
    conv state is ~100 MB each). Process 0 only — it is the only writer.
    """
    if keep <= 0 or jax.process_index() != 0:
        return
    for fname in _list_ckpts(run_dir)[:-keep]:
        try:
            os.remove(os.path.join(run_dir, fname))
        except OSError:
            pass  # best-effort; a vanished file is already pruned
