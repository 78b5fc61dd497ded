#!/usr/bin/env python
"""Train-step throughput on the real TPU: SSG ResNet-50 bf16, P x K batch,
full step (on-device augment -> 3-branch fwd -> per-branch batch-hard
triplet -> backward -> AdamW)."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu import models
from ssg_tpu.train.trainer import create_train_state, make_train_step
from ssg_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    remat = len(sys.argv) > 2 and sys.argv[2] == "remat"
    model = models.create("resnet50", num_features=0, num_parts=3,
                          dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, num_parts=3, remat=remat)

    k = jax.random.PRNGKey(1)
    images = jax.random.randint(k, (batch, 256, 128, 3), 0, 256, jnp.uint8)
    labels = jnp.tile(
        jnp.repeat(jnp.arange(batch // 4), 4)[None, :], (3, 1)
    )
    images.block_until_ready()

    t0 = time.perf_counter()
    state, metrics = step(state, images, labels, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    print(f"batch={batch}: compiled+first step {time.perf_counter() - t0:.1f}s",
          flush=True)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, images, labels, jax.random.fold_in(k, i))
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    print(f"batch={batch}: {batch * iters / dt:8.1f} img/s "
          f"({dt / iters * 1e3:.1f} ms/step, loss={float(metrics['loss']):.3f})",
          flush=True)


if __name__ == "__main__":
    main()
