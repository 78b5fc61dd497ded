#!/usr/bin/env python
"""One FULL SSG iteration at the single-chip ceiling on the real TPU.

VERDICT r2 next #5: extract -> streaming 3-group clustering -> join rule ->
one P x K fine-tune epoch, with a per-stage wall-clock split, grounding
BASELINE config 5's per-iteration projection. Every stage ends in a host
readback (the only reliable completion barrier through this environment's
device transport — ROADMAP measurement discipline).

Usage: perf_iteration.py [N] [extract_batch] [train_batch] [fused]

fused (default 1): cluster the 3 groups through ONE fused
streaming_cluster_groups dispatch (what run_ssg does); 0 = three separate
streaming_cluster calls (the round-3 shape, kept as the A/B partner for
the dispatch-amortization claim — VERDICT r4 task #2).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu import models
from ssg_tpu.data import datasets
from ssg_tpu.data.synthetic_device import DeviceRenderer
from ssg_tpu.parallel import make_mesh
from ssg_tpu.parallel.streaming import (streaming_cluster,
                                        streaming_cluster_groups)
from ssg_tpu.train.ssg_loop import join_rule
from ssg_tpu.train.trainer import create_train_state, make_train_step
from ssg_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ebatch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    tbatch = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    fused = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True

    model = models.create("resnet50", num_features=0, num_parts=3,
                          dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 256, 128, 3), jnp.float32),
        train=False,
    )

    # Stage 0: render N synthetic target-train images on device (host
    # bandwidth is tunnel-limited; real deployments stream via the native
    # loader). Not part of the iteration metric.
    scale = n / 6008 * 1.05 + 0.02  # synthetic train ~= 6008 * scale items
    ds = datasets.create("market1501", scale=scale, seed=0)
    items = ds.train[:n]
    assert len(items) == n, f"synthetic train too small: {len(items)}"
    renderer = DeviceRenderer(ds)
    batches = [im for im, _, _, _ in renderer.batches(items, ebatch)]
    images = jnp.concatenate(batches, axis=0)[:n]
    jax.block_until_ready(images)
    print(f"N={n}: images staged ({images.nbytes / 2**30:.2f} GiB in HBM)",
          flush=True)

    from ssg_tpu.api import _forward_eval

    def extract():
        chunks = [
            _forward_eval(model.apply, variables,
                          jax.lax.dynamic_slice_in_dim(images, s, ebatch))
            for s in range(0, n - ebatch + 1, ebatch)
        ]
        tail = n - (n // ebatch) * ebatch
        if tail:
            pad = _forward_eval(
                model.apply, variables,
                jax.lax.dynamic_slice_in_dim(images, n - ebatch, ebatch))
            chunks.append(pad[:, ebatch - tail:])
        f = jnp.concatenate(chunks, axis=1)
        np.asarray(f[0, 0, :1])  # readback barrier
        return f

    mesh = make_mesh(1)
    ckw = dict(k1=20, k2=6, rho=1.6e-3, min_samples=4, chunk=1024)

    def cluster_groups_streaming(feats, verbose=False):
        if fused:
            diag = {}
            labels, counts, epss = streaming_cluster_groups(
                feats, mesh, diag=diag, **ckw)
            labels = np.asarray(labels)
            if verbose:
                print(f"    fused x3: fb_code={diag['fallback_code']}",
                      flush=True)
            return [(labels[g], counts[g], epss[g]) for g in range(3)]
        out = []
        for g in range(3):
            diag = {}
            t0 = time.perf_counter()
            labels, nc, eps = streaming_cluster(feats[g], mesh, diag=diag,
                                                **ckw)
            labels = np.asarray(labels)
            if verbose:
                print(f"    group {g}: {time.perf_counter() - t0:.2f}s "
                      f"fallback={diag['band_fallback']}", flush=True)
            out.append((labels, int(nc), float(eps)))
        return out

    # Copy: the train step donates state buffers (donate_argnums), and the
    # extract passes keep reading `variables` — without the copy the
    # donated params alias them and the post-train extract reads deleted
    # buffers (INVALID_ARGUMENT).
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        variables=jax.tree.map(jnp.copy, variables))
    step = make_train_step(model, num_parts=3)

    def train_epoch(state, kept_idx, kept_labels, seed):
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(kept_idx))
        steps = 0
        key = jax.random.PRNGKey(seed)
        for s in range(0, len(order) - tbatch + 1, tbatch):
            sel = order[s:s + tbatch]
            imgs = images[jnp.asarray(kept_idx[sel])]
            labels = jnp.asarray(kept_labels[:, sel])
            key, k = jax.random.split(key)
            state, metrics = step(state, imgs, labels, k)
            steps += 1
        loss = float(metrics["loss"])  # readback barrier
        return state, steps, loss

    # ---- warmup: compile/load every graph once ---------------------------
    t0 = time.perf_counter()
    feats = extract()
    print(f"extract warm+compile {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    groups = cluster_groups_streaming(feats)
    print(f"cluster warm+compile {time.perf_counter() - t0:.1f}s", flush=True)
    labels = np.stack([g[0] for g in groups])
    keep, kept_idx, kept_labels = join_rule(labels)
    t0 = time.perf_counter()
    state, nsteps, loss = train_epoch(state, kept_idx, kept_labels, 0)
    print(f"train warm+compile {time.perf_counter() - t0:.1f}s "
          f"({nsteps} steps)", flush=True)

    # ---- the measured iteration -----------------------------------------
    t0 = time.perf_counter()
    feats = extract()
    t_extract = time.perf_counter() - t0

    t0 = time.perf_counter()
    groups = cluster_groups_streaming(feats, verbose=True)
    t_cluster = time.perf_counter() - t0

    labels = np.stack([g[0] for g in groups])
    t0 = time.perf_counter()
    keep, kept_idx, kept_labels = join_rule(labels)
    t_join = time.perf_counter() - t0

    t0 = time.perf_counter()
    state, nsteps, loss = train_epoch(state, kept_idx, kept_labels, 1)
    t_train = time.perf_counter() - t0

    total = t_extract + t_cluster + t_join + t_train
    print(f"--- one SSG iteration at N={n} (single chip) ---")
    print(f"extract      {t_extract:7.2f} s  ({n / t_extract:,.0f} imgs/s)")
    for g, (_, nc, eps) in enumerate(groups):
        print(f"  group {g}: {nc} clusters, eps={eps:.4f}")
    print(f"cluster x3   {t_cluster:7.2f} s")
    print(f"join (host)  {t_join:7.2f} s  (kept {keep.sum()}/{n})")
    print(f"train epoch  {t_train:7.2f} s  ({nsteps} steps x {tbatch} = "
          f"{nsteps * tbatch / t_train:,.0f} imgs/s, loss {loss:.3f})")
    print(f"TOTAL        {total:7.2f} s")


if __name__ == "__main__":
    main()
