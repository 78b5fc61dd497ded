#!/usr/bin/env python
"""Extraction-throughput experiment on the real TPU.

Measures the SSG ResNet-50 eval forward (bf16) at several batch sizes.
Inputs are synthesized ON DEVICE (jax.random) — host->device bandwidth in
this environment is tunnel-limited and must stay out of compute experiments.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu import models
from ssg_tpu.api import _forward_eval
from ssg_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    model = models.create("resnet50", num_features=0, num_parts=3,
                          dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 256, 128, 3), jnp.float32),
        train=False,
    )
    print("model ready", flush=True)
    n_total = 3328

    sizes = [int(s) for s in sys.argv[1:]] or [128, 256, 512]
    for batch in sizes:
        nb = n_total // batch
        keys = jax.random.split(jax.random.PRNGKey(1), nb)
        make = jax.jit(lambda k: jax.random.randint(
            k, (batch, 256, 128, 3), 0, 256, jnp.uint8))
        dev_batches = [make(k) for k in keys]
        jax.block_until_ready(dev_batches)

        t0 = time.perf_counter()
        _forward_eval(model.apply, variables, dev_batches[0]).block_until_ready()
        print(f"batch={batch}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)

        t0 = time.perf_counter()
        outs = [_forward_eval(model.apply, variables, b) for b in dev_batches]
        jax.block_until_ready(outs)
        dev_s = time.perf_counter() - t0
        n = batch * nb
        print(f"batch={batch:4d}  device-only {n / dev_s:8.1f} img/s"
              f" ({dev_s:.3f}s for {n})", flush=True)


if __name__ == "__main__":
    main()
