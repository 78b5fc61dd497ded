"""Checkpoint/resume + json helpers.

Mirrors the reference's [reid/utils/serialization.py] surface (SURVEY.md §2
#13, §5 checkpoint row): ``save_checkpoint(state, is_best, fpath)`` writing a
per-iteration checkpoint plus a best copy, ``load_checkpoint``,
``read_json/write_json``. Storage is Orbax (the TPU-native checkpoint
format); torch ``.pth(.tar)`` checkpoints are importable via
ssg_tpu.models.convert.load_torch_checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


def mkdir_if_missing(path: str):
    os.makedirs(path, exist_ok=True)


def read_json(fpath: str):
    with open(fpath) as f:
        return json.load(f)


def write_json(obj, fpath: str):
    mkdir_if_missing(os.path.dirname(fpath) or ".")
    with open(fpath, "w") as f:
        json.dump(obj, f, indent=2)


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: dict, is_best: bool, fpath: str = "checkpoint"):
    """Save a pytree checkpoint; keep a ``model_best`` copy when is_best.

    ``state`` is any pytree (variables, opt_state, counters). ``fpath`` is a
    directory (Orbax layout), reference-equivalent of checkpoint.pth.tar.

    Multi-process runtimes: every process calls into Orbax (its sync save
    carries internal cross-process barriers, so all must participate), but
    only process 0 mutates the filesystem — Orbax itself writes on the
    primary only, and the rmtree/copytree bookkeeping follows the same
    torch rank-0 convention. An explicit pre-save barrier orders the
    primary's rmtree before any process enters the save.
    """
    multiproc = jax.process_count() > 1
    primary = jax.process_index() == 0
    fpath = os.path.abspath(fpath)
    if primary:
        if os.path.exists(fpath):
            shutil.rmtree(fpath)
        mkdir_if_missing(os.path.dirname(fpath) or ".")
    if multiproc:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ssg:ckpt:pre")
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(fpath, _to_host(state))
    if is_best and primary:
        best = os.path.join(os.path.dirname(fpath), "model_best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(fpath, best)
    if multiproc:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ssg:ckpt:post")


def load_checkpoint(fpath: str) -> dict:
    fpath = os.path.abspath(fpath)
    if not os.path.isdir(fpath):
        raise FileNotFoundError(fpath)
    return ocp.PyTreeCheckpointer().restore(fpath)


def copy_state_dict(src: dict, dst: dict, strip: str = "") -> dict:
    """Copy matching entries of ``src`` over ``dst`` (reference's
    ``copy_state_dict``: partial restore that skips missing keys and
    shape-mismatched heads — e.g. source-sized classifiers when adapting to
    a target with a different identity count).

    Operates on one level of module keys (flax param dicts); returns a new
    dict. ``strip`` removes a prefix from source keys first.
    """

    def shapes_match(a, b):
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        return len(la) == len(lb) and all(
            getattr(x, "shape", None) == getattr(y, "shape", None)
            for x, y in zip(la, lb)
        )

    out = dict(dst)
    copied = 0
    for key, value in src.items():
        k = key[len(strip):] if strip and key.startswith(strip) else key
        if k not in out or not shapes_match(out[k], value):
            # Skip keys the target model doesn't have (e.g. feat_* heads
            # when num_features=0) and shape-mismatched heads (classifiers
            # sized to another id count) — injecting them would make
            # model.apply fail on unexpected params.
            continue
        out[k] = value
        copied += 1
    if copied == 0:
        raise KeyError("copy_state_dict matched no entries")
    return out
