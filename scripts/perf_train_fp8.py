#!/usr/bin/env python
"""The last train-step lever (VERDICT r4 #7): fp8 activation storage / remat.

docs/train_profile.md establishes the step is HBM-bandwidth-bound (49.7
GiB/step at 99% of the v5e roofline, activations dominating), so the only
real levers move fewer bytes per image. Two guarded experiments:

  * ``fp8``: store each Bottleneck block-boundary activation as
    float8_e4m3fn (models/resnet.py ``act_store``) — compute stays bf16,
    only the residual-trunk tensors XLA materializes (and saves for the
    backward) narrow from 2 bytes to 1.
  * ``remat``: jax.checkpoint over the whole apply (make_train_step flag)
    — saves only block inputs, recomputes the forward in the backward
    (less fwd->bwd traffic, ~33% more conv FLOPs; plausible win at 31%
    MFU).

Measures steady-state imgs/s for base/remat/fp8 at the given batch, then
a fixed-data loss-trajectory A/B (base vs fp8) over ``steps`` steps —
identical synthetic P x K batches and PRNG keys, so any divergence is the
storage quantization alone.

Usage: perf_train_fp8.py [batch=256] [steps=30]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ssg_tpu import models
from ssg_tpu.train.trainer import create_train_state, make_train_step
from ssg_tpu.utils.cache import enable_compilation_cache


def throughput(model, batch, remat, iters=20):
    state = create_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, num_parts=3, remat=remat)
    k = jax.random.PRNGKey(1)
    images = jax.random.randint(k, (batch, 256, 128, 3), 0, 256, jnp.uint8)
    labels = jnp.tile(jnp.repeat(jnp.arange(batch // 4), 4)[None, :], (3, 1))
    images.block_until_ready()
    t0 = time.perf_counter()
    state, metrics = step(state, images, labels, jax.random.PRNGKey(2))
    float(metrics["loss"])  # readback barrier (ROADMAP discipline)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, images, labels, jax.random.fold_in(k, i))
    loss = float(metrics["loss"])  # readback barrier
    dt = time.perf_counter() - t0
    return batch * iters / dt, dt / iters * 1e3, loss, compile_s


def trajectory(model, batch, steps):
    state = create_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, num_parts=3)
    k = jax.random.PRNGKey(7)
    losses = []
    for i in range(steps):
        ki = jax.random.fold_in(k, i)
        images = jax.random.randint(
            jax.random.fold_in(ki, 0), (batch, 256, 128, 3), 0, 256,
            jnp.uint8)
        labels = jnp.tile(
            jnp.repeat(jnp.arange(batch // 4), 4)[None, :], (3, 1))
        state, metrics = step(state, images, labels,
                              jax.random.fold_in(ki, 1))
        losses.append(float(metrics["loss"]))
    return np.asarray(losses)


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    mk = dict(num_features=0, num_parts=3, dtype=jnp.bfloat16)
    base = models.create("resnet50", **mk)
    fp8 = models.create("resnet50", act_store=jnp.float8_e4m3fn, **mk)

    for tag, model, remat in (("base", base, False), ("remat", base, True),
                              ("fp8-act", fp8, False)):
        ips, ms, loss, cs = throughput(model, batch, remat)
        print(f"{tag:8s} batch={batch}: {ips:8.1f} img/s  {ms:6.2f} ms/step"
              f"  loss={loss:.3f}  (compile {cs:.1f}s)", flush=True)

    lb = trajectory(base, batch, steps)
    lf = trajectory(fp8, batch, steps)
    rel = np.abs(lb - lf) / np.maximum(np.abs(lb), 1e-9)
    print(f"trajectory over {steps} steps (same data/keys):")
    print("  base tail:", " ".join(f"{v:.3f}" for v in lb[-6:]))
    print("  fp8  tail:", " ".join(f"{v:.3f}" for v in lf[-6:]))
    print(f"  max|rel delta|={rel.max():.4f}  mean={rel.mean():.4f}  "
          f"final base={lb[-1]:.4f} fp8={lf[-1]:.4f}", flush=True)


if __name__ == "__main__":
    main()
