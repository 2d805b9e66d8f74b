"""Checkpoint / resume: full training state to disk, process-0 writes.

reference: geotransformer/engine/base_trainer.py:112-177 (save_snapshot /
load_snapshot with 'epoch-N.pth.tar' + rolling 'snapshot.pth.tar',
missing/unexpected-key logging). Here: flax msgpack serialization of the
param/opt pytrees plus a small JSON sidecar; key diffs are logged on load.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger("gaussreg")


def _flatten_keys(tree, prefix=""):
    keys = set()
    if isinstance(tree, dict):
        for k, v in tree.items():
            keys |= _flatten_keys(v, f"{prefix}/{k}")
    else:
        keys.add(prefix)
    return keys


def save_checkpoint(
    directory: str,
    name: str,
    params: Any,
    opt_state: Any = None,
    metadata: Optional[Dict] = None,
) -> Optional[str]:
    """Write `<directory>/<name>.msgpack` (+ .json sidecar). Only process 0
    writes (reference base_trainer.py:112-119); all processes return the
    path."""
    path = os.path.join(directory, f"{name}.msgpack")
    if jax.process_index() != 0:
        return path
    os.makedirs(directory, exist_ok=True)
    payload = {"params": jax.device_get(params)}
    if opt_state is not None:
        payload["opt_state"] = jax.device_get(opt_state)
    with open(path + ".tmp", "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(path + ".tmp", path)
    meta = dict(metadata or {})
    with open(os.path.join(directory, f"{name}.json"), "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(
    path: str, params_template: Any, opt_state_template: Any = None
):
    """Restore a checkpoint onto pytree templates; logs missing/unexpected
    keys instead of failing silently (reference base_trainer.py:139-165)."""
    with open(path, "rb") as f:
        raw = f.read()
    target = {"params": params_template}
    if opt_state_template is not None:
        target["opt_state"] = opt_state_template
    state_dict = serialization.msgpack_restore(raw)

    want = _flatten_keys(serialization.to_state_dict(target))
    have = _flatten_keys(state_dict)
    missing = want - have
    unexpected = have - want
    if missing:
        logger.warning("checkpoint missing keys: %s", sorted(missing)[:20])
    if unexpected:
        logger.warning("checkpoint unexpected keys: %s", sorted(unexpected)[:20])

    restored = serialization.from_state_dict(target, state_dict)
    if opt_state_template is not None:
        return restored["params"], restored["opt_state"]
    return restored["params"]


def load_metadata(directory: str, name: str) -> Dict:
    p = os.path.join(directory, f"{name}.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)
