#!/usr/bin/env python
"""A/B: forward throughput on renderer-produced batches vs jax.random batches."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu import models
from ssg_tpu.api import _forward_eval
from ssg_tpu.data import datasets
from ssg_tpu.data.synthetic_device import DeviceRenderer
from ssg_tpu.utils.cache import enable_compilation_cache

N, BATCH = 3328, 128


def timeit(tag, batches, apply_fn, variables):
    _forward_eval(apply_fn, variables, batches[0]).block_until_ready()
    for rep in range(3):
        t0 = time.perf_counter()
        outs = [_forward_eval(apply_fn, variables, b) for b in batches]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        print(f"{tag} rep{rep}: {N / dt:8.1f} img/s ({dt:.3f}s)", flush=True)


def main():
    enable_compilation_cache()
    model = models.create("resnet50", num_features=0, num_parts=3,
                          dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 256, 128, 3), jnp.float32),
        train=False,
    )
    print("model ready", flush=True)

    keys = jax.random.split(jax.random.PRNGKey(1), N // BATCH)
    make = jax.jit(lambda k: jax.random.randint(
        k, (BATCH, 256, 128, 3), 0, 256, jnp.uint8))
    rand_batches = [make(k) for k in keys]
    jax.block_until_ready(rand_batches)
    timeit("random ", rand_batches, model.apply, variables)

    ds = datasets.create("market1501", scale=0.45, seed=0)
    items = (ds.train + ds.query + ds.gallery)[:N]
    renderer = DeviceRenderer(ds)
    t0 = time.perf_counter()
    rend_batches = [im for im, _, _, _ in renderer.batches(items, BATCH)]
    jax.block_until_ready(rend_batches)
    print(f"render staging {time.perf_counter() - t0:.1f}s", flush=True)
    timeit("render ", rend_batches, model.apply, variables)

    copied = [jnp.copy(b) for b in rend_batches]
    jax.block_until_ready(copied)
    timeit("rendcpy", copied, model.apply, variables)


if __name__ == "__main__":
    main()
