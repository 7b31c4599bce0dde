"""Native checkpoint format: a single .npz of path-flattened pytree leaves.

Replaces the reference's torch.save zip-pickle checkpoints
(src/runner/runner_udf.py:265-285) with a torch-free, pickle-free format.
Scalars (ints/floats) are stored as 0-d arrays; the nested dict structure is
encoded in the '/'-joined key paths, so load reconstructs the tree without a
separate treedef blob.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        tag = "__list__" if isinstance(tree, list) else "__tuple__"
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{tag}{i}/"))
    else:
        key = prefix[:-1] if prefix.endswith("/") else prefix
        out[key] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.startswith("__list__") for k in keys):
            items = sorted(keys, key=lambda k: int(k[len("__list__"):]))
            return [rebuild(node[k]) for k in items]
        if keys and all(k.startswith("__tuple__") for k in keys):
            items = sorted(keys, key=lambda k: int(k[len("__tuple__"):]))
            return tuple(rebuild(node[k]) for k in items)
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_tree = jax.tree.map(np.asarray, tree)
    flat = _flatten(host_tree)
    tmp = path + ".tmp"
    np.savez(tmp, **flat)
    # np.savez appends .npz to the temp name
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_pytree(path: str) -> Any:
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten(flat)
