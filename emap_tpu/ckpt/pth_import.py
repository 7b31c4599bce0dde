"""Importer for released reference checkpoints (`ckpt_best.pth`).

The reference saves torch zip-pickle dicts of three state_dicts + optimizer +
iter_step (src/runner/runner_udf.py:265-285). We map them onto our pytrees:

* `udf_network_fine.linN.parametrizations.weight.original0` -> g (out,)
  and `...original1` -> v (out, in): our field keeps the same (g, v)
  weight-norm parameterization (emap_tpu/fields/udf.py), so the mapping is
  lossless and training can resume with identical dynamics.
* non-weight-norm checkpoints (`linN.weight`) map to {'w': ...}.
* variance/beta networks map 1:1 to scalar params.

Reading the file: torch is available CPU-only in this image, so we use
torch.load when present, with a pure zipfile+pickle fallback for torch-free
deployments.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np


def _torch_free_load(path: str) -> Dict[str, Any]:
    """Minimal reader for torch zip-format checkpoints without torch.

    Supports the storage types the reference saves (float32/int64 tensors).
    """
    _DTYPES = {
        "FloatStorage": np.float32,
        "DoubleStorage": np.float64,
        "HalfStorage": np.float16,
        "LongStorage": np.int64,
        "IntStorage": np.int32,
        "BoolStorage": np.bool_,
    }

    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        prefix = names[0].split("/")[0]
        data_pkl = zf.read(f"{prefix}/data.pkl")

        storages: Dict[str, tuple] = {}

        class _Unpickler(pickle.Unpickler):
            def find_class(self, module, name):
                if module == "torch._utils" and name in (
                    "_rebuild_tensor_v2",
                    "_rebuild_tensor",
                ):
                    def rebuild(storage, offset, size, stride, *args):
                        key, dtype = storage
                        raw = zf.read(f"{prefix}/data/{key}")
                        arr = np.frombuffer(raw, dtype=dtype)
                        # build strided view; reference tensors are contiguous
                        itemsize = arr.itemsize
                        return np.lib.stride_tricks.as_strided(
                            arr[offset:],
                            shape=size,
                            strides=[s * itemsize for s in stride],
                        ).copy()

                    return rebuild
                if module == "collections" and name == "OrderedDict":
                    return dict
                if module == "torch" and name.endswith("Storage"):
                    return ("storage_type", name)
                if module == "torch.serialization":
                    return lambda *a, **k: None
                raise pickle.UnpicklingError(
                    f"refusing to unpickle {module}.{name}"
                )

            def persistent_load(self, pid):
                # ('storage', storage_type, key, location, numel)
                _, storage_type, key, _, _ = pid
                name = (
                    storage_type[1]
                    if isinstance(storage_type, tuple)
                    else storage_type.__name__
                )
                return (key, _DTYPES[name])

        return _Unpickler(io.BytesIO(data_pkl)).load()


def _load_raw(path: str) -> Dict[str, Any]:
    try:
        import torch  # noqa: PLC0415

        raw = torch.load(path, map_location="cpu", weights_only=False)
        return _to_numpy(raw)
    except ImportError:
        return _torch_free_load(path)


def _to_numpy(obj):
    import torch  # noqa: PLC0415

    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: _to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy(v) for v in obj)
    return obj


def _convert_udf_state(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    layers = sorted(
        {k.split(".")[0] for k in sd if k.startswith("lin")},
        key=lambda s: int(s[3:]),
    )
    for lin in layers:
        layer: Dict[str, np.ndarray] = {}
        bias = sd.get(f"{lin}.bias")
        if bias is not None:
            layer["b"] = np.asarray(bias, dtype=np.float32)
        g = sd.get(f"{lin}.parametrizations.weight.original0")
        v = sd.get(f"{lin}.parametrizations.weight.original1")
        if g is None:
            # older torch weight_norm naming
            g = sd.get(f"{lin}.weight_g")
            v = sd.get(f"{lin}.weight_v")
        if g is not None:
            layer["g"] = np.asarray(g, dtype=np.float32).reshape(-1)
            layer["v"] = np.asarray(v, dtype=np.float32)
        else:
            layer["w"] = np.asarray(sd[f"{lin}.weight"], dtype=np.float32)
        params[lin] = layer
    return params


def _param_index_order(udf_sd: Dict[str, np.ndarray]):
    """Torch's global param-index order for the reference's Adam state.

    torch.optim state_dicts key Adam moments by a global parameter index that
    enumerates `named_parameters()` across the three param groups
    (runner_base.py:110-117): group 0 = udf_network_fine, group 1 = variance +
    beta nets, group 2 = empty (nerf). Within a weight-norm layer the order is
    (bias, g, v) -- `parametrizations.weight.original{0,1}` are registered on
    a submodule so the immediate `bias` parameter iterates first; a plain
    Linear iterates (weight, bias). Verified empirically against the installed
    torch on the reference UDFNetwork.

    Returns a list of (our-pytree path tuple) in global-index order.
    """
    layers = sorted(
        {k.split(".")[0] for k in udf_sd if k.startswith("lin")},
        key=lambda s: int(s[3:]),
    )
    order = []
    for lin in layers:
        weight_norm = (
            f"{lin}.parametrizations.weight.original0" in udf_sd
            or f"{lin}.weight_g" in udf_sd
        )
        if weight_norm:
            order += [("udf", lin, "b"), ("udf", lin, "g"), ("udf", lin, "v")]
        else:
            order += [("udf", lin, "w"), ("udf", lin, "b")]
    order += [("variance", "variance"), ("variance", "second_variance")]
    order += [("beta", "beta"), ("beta", "gamma"), ("beta", "zeta")]
    return order


def _convert_optimizer_state(opt_sd, params: Dict[str, Any], udf_sd):
    """Map torch Adam state onto our (mu, nu, count) pytrees.

    Shapes follow our params (g is (out,), scalars are (1,)); torch params a
    group never stepped (requires_grad=False from init, e.g. beta/gamma before
    their gates fire) simply have no state entry -> zero moments, count 0,
    which is exactly the state a torch resume reproduces for them.
    """
    order = _param_index_order(udf_sd)

    def zeros_like_tree(tree):
        return {
            k: zeros_like_tree(v) if isinstance(v, dict) else np.zeros_like(v)
            for k, v in tree.items()
        }

    def zero_counts(tree):
        return {
            k: zero_counts(v) if isinstance(v, dict)
            else np.zeros((), np.float32)
            for k, v in tree.items()
        }

    mu = zeros_like_tree(params)
    nu = zeros_like_tree(params)
    count = zero_counts(params)

    state = opt_sd.get("state", {})
    for idx, path in enumerate(order):
        entry = state.get(idx, state.get(str(idx)))
        if entry is None:
            continue
        target = params
        for p in path[:-1]:
            target = target[p]
        leaf = path[-1]
        shape = target[leaf].shape
        m = np.asarray(entry["exp_avg"], np.float32).reshape(shape)
        v = np.asarray(entry["exp_avg_sq"], np.float32).reshape(shape)
        step = np.asarray(entry["step"], np.float32).reshape(())
        node_mu, node_nu, node_c = mu, nu, count
        for p in path[:-1]:
            node_mu, node_nu, node_c = node_mu[p], node_nu[p], node_c[p]
        node_mu[leaf] = m
        node_nu[leaf] = v
        node_c[leaf] = step
    return {"mu": mu, "nu": nu, "count": count}


def import_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Read a reference `ckpt_best.pth` into our parameter pytrees.

    Returns {'params': {'udf','variance','beta'}, 'iter_step': int, 'opt':
    {'mu','nu','count'} or None}. The Adam moments come from torch's
    param-index-keyed state (save format runner_udf.py:265-285), remapped via
    the named_parameters enumeration order, so `--is_continue` from a released
    checkpoint resumes with identical optimizer dynamics.
    """
    raw = _load_raw(path)
    udf_sd = raw["udf_network_fine"]
    var_sd = raw["variance_network_fine"]
    beta_sd = raw["beta_network"]

    params = {
        "udf": _convert_udf_state(udf_sd),
        "variance": {
            "variance": np.asarray(var_sd["variance"], np.float32).reshape(1),
            "second_variance": np.asarray(
                var_sd["second_variance"], np.float32
            ).reshape(1),
        },
        "beta": {
            "beta": np.asarray(beta_sd["beta"], np.float32).reshape(1),
            "gamma": np.asarray(beta_sd["gamma"], np.float32).reshape(1),
            "zeta": np.asarray(beta_sd["zeta"], np.float32).reshape(1),
        },
    }
    opt = None
    if isinstance(raw.get("optimizer"), dict):
        opt = _convert_optimizer_state(raw["optimizer"], params, udf_sd)
    return {
        "params": params,
        "iter_step": int(raw.get("iter_step", 0)),
        "opt": opt,
    }
