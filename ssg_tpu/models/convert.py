"""Torch -> Flax weight conversion for SSGResNet.

Fidelity here is what makes the mAP-parity requirement reachable
(SURVEY.md §7 hard part e): BN running stats, conv kernel layout
(OIHW -> HWIO), linear transpose (OI -> IO), and downsample placement all
must map exactly. Accepts either:

  * a ``TorchSSGResNet`` state_dict (keys ``backbone.conv1.weight``, ...), or
  * a plain torchvision ``resnet50`` state_dict (keys ``conv1.weight``, ...;
    ``fc.*`` ignored) — the ImageNet init the reference starts from.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def torch_to_flax(state_dict: Mapping[str, Any]) -> dict:
    """Convert a torch state_dict to flax ``{'params':…, 'batch_stats':…}``.

    Tensor name mapping:
      conv ``weight`` (O,I,kh,kw) -> ``kernel`` (kh,kw,I,O)
      bn   ``weight``/``bias`` -> ``scale``/``bias`` (params)
           ``running_mean``/``running_var`` -> ``mean``/``var`` (batch_stats)
      linear ``weight`` (O,I) -> ``kernel`` (I,O)
    """
    params: dict = {}
    stats: dict = {}

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    items = dict(state_dict)
    # Plain torchvision checkpoint? Prefix backbone keys.
    if "conv1.weight" in items and "backbone.conv1.weight" not in items:
        items = {
            (f"backbone.{k}" if not k.startswith(("fc.",)) else k): v
            for k, v in items.items()
        }

    for key, value in items.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        value = to_np(value)

        # torch "layer1.0.conv2" -> flax "layer1_0/conv2";
        # "layer1.0.downsample.{0,1}" -> "layer1_0/downsample_{conv,bn}".
        path: list[str] = []
        i = 0
        while i < len(parts) - 1:
            p = parts[i]
            if p.startswith("layer") and i + 1 < len(parts) and parts[i + 1].isdigit():
                path.append(f"{p}_{parts[i + 1]}")
                i += 2
            elif p == "downsample":
                path.append("downsample_conv" if parts[i + 1] == "0" else "downsample_bn")
                i += 2
            else:
                path.append(p)
                i += 1
        leaf = parts[-1]

        if leaf == "weight":
            if value.ndim == 4:  # conv OIHW -> HWIO
                _set(params, path + ["kernel"], value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:  # linear OI -> IO
                _set(params, path + ["kernel"], value.T)
            else:  # batchnorm scale
                _set(params, path + ["scale"], value)
        elif leaf == "bias":
            _set(params, path + ["bias"], value)
        elif leaf == "running_mean":
            _set(stats, path + ["mean"], value)
        elif leaf == "running_var":
            _set(stats, path + ["var"], value)
        else:
            raise KeyError(f"Unhandled torch key: {key}")

    return {"params": params, "batch_stats": stats}


def flax_to_torch(variables: Mapping[str, Any]) -> dict:
    """Inverse of torch_to_flax: flax variables -> a torch-style state_dict
    (numpy tensors), so models trained here export back to the reference's
    ecosystem (``backbone.conv1.weight`` naming, OIHW/OI layouts)."""

    out: dict[str, np.ndarray] = {}

    def emit(prefix: str, leaf: str, value: np.ndarray):
        # flax "layer1_0" path segments -> torch "layer1.0";
        # "downsample_conv"/"downsample_bn" -> "downsample.0"/"downsample.1".
        key = f"{prefix}.{leaf}" if prefix else leaf
        key = key.replace("downsample_conv", "downsample.0")
        key = key.replace("downsample_bn", "downsample.1")
        import re

        key = re.sub(r"layer(\d+)_(\d+)", r"layer\1.\2", key)
        out[key] = value

    def walk(node, prefix, is_stats):
        for name, value in node.items():
            sub = f"{prefix}.{name}" if prefix else name
            if isinstance(value, Mapping):
                walk(value, sub, is_stats)
                continue
            arr = np.asarray(value)
            parent = prefix
            if name == "kernel":
                if arr.ndim == 4:  # HWIO -> OIHW
                    emit(parent, "weight", arr.transpose(3, 2, 0, 1))
                else:  # IO -> OI
                    emit(parent, "weight", arr.T)
            elif name == "scale":
                emit(parent, "weight", arr)
            elif name == "bias":
                emit(parent, "bias", arr)
            elif name == "mean":
                emit(parent, "running_mean", arr)
            elif name == "var":
                emit(parent, "running_var", arr)
            else:
                raise KeyError(f"Unhandled flax leaf: {sub}")

    walk(variables.get("params", {}), "", False)
    walk(variables.get("batch_stats", {}), "", True)
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth(.tar) checkpoint file and convert. Handles the
    reference's ``save_checkpoint`` format ({'state_dict': …, 'epoch': …},
    SURVEY.md §2 #13) as well as bare state_dicts."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    # Strip DataParallel's "module." prefix if present.
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return torch_to_flax(sd)
