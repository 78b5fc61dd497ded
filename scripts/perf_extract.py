#!/usr/bin/env python
"""Extraction-throughput experiment on the real TPU.

Measures the SSG ResNet-50 eval forward (bf16) at several batch sizes,
separating pure device compute (pre-staged device batches) from the
host->device streaming path, to locate the extract bottleneck.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from ssg_tpu import models
from ssg_tpu.api import _forward_eval


def main():
    model = models.create("resnet50", num_features=0, num_parts=3,
                          dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 256, 128, 3), jnp.float32),
        train=False,
    )
    rng = np.random.default_rng(0)
    n_total = 3328

    import sys

    sizes = [int(s) for s in sys.argv[1:]] or [128, 256, 512]
    for batch in sizes:
        print(f"batch={batch}: staging...", flush=True)
        host_batches = [
            rng.integers(0, 256, (batch, 256, 128, 3), dtype=np.uint8)
            for _ in range(n_total // batch)
        ]
        dev_batches = [jnp.asarray(b) for b in host_batches]
        jax.block_until_ready(dev_batches)

        # compile
        t0 = time.perf_counter()
        _forward_eval(model.apply, variables, dev_batches[0]).block_until_ready()
        print(f"  compiled in {time.perf_counter() - t0:.1f}s", flush=True)

        # pure device compute (batches already in HBM)
        t0 = time.perf_counter()
        outs = [_forward_eval(model.apply, variables, b) for b in dev_batches]
        jax.block_until_ready(outs)
        dev_s = time.perf_counter() - t0

        # streaming: H2D + forward per batch (what bench/extract does)
        t0 = time.perf_counter()
        outs = [
            _forward_eval(model.apply, variables, jnp.asarray(b))
            for b in host_batches
        ]
        jax.block_until_ready(outs)
        stream_s = time.perf_counter() - t0

        n = batch * len(host_batches)
        print(
            f"batch={batch:4d}  device-only {n / dev_s:8.1f} img/s ({dev_s:.3f}s)"
            f"   streaming {n / stream_s:8.1f} img/s ({stream_s:.3f}s)"
        )


if __name__ == "__main__":
    main()
