"""A/B probe: does padding HRNet's narrow branch widths to the 128-lane
boundary remove config-5's layout-transpose tax?

Background (BASELINE.md round-3 analysis): the config-5 sync-op trace shows
branch-0/1 convs (C=48/96) at ~18% MXU — the MXU computes on 128 padded
lanes regardless — plus ~100-150 ms/step of transpose copies ping-ponging
activations between the conv's C-minor padded layout and the compact
elementwise layout.  Hypothesis: with C an exact lane multiple the compact
and padded layouts coincide, XLA stops relaying out, and the convs' wall
time barely moves (the padded lanes were already being computed).

This times encoder+head fwd+bwd only (where the branches live), batch 8 at
1024^2, remat plan = blocks (the config-5 setting).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_width_pad.py
"""

import os as _os, sys as _sys

# repo root on sys.path AFTER interpreter start: PYTHONPATH-based
# injection breaks the axon PJRT plugin registration on this image.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_semantic_segmentation_tpu.models.hrnet import (
    HRNet,
    HRNetV2Head,
)
from flax import linen as nn


class EncHead(nn.Module):
    branch_widths: tuple = ()

    @nn.compact
    def __call__(self, x, train=True):
        taps = HRNet(
            width=48,
            branch_widths=self.branch_widths,
            remat_stages=(1, 2, 3, 4),
            name="encoder",
        )(x, train)
        return HRNetV2Head(num_classes=19, name="decoder")(
            taps, (x.shape[1], x.shape[2]), train
        )


def run(widths, batch=8, size=1024, iters=10):
    model = EncHead(branch_widths=widths)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32) * 2 - 1,
                    jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, 19, (batch, size, size)).astype(np.int32))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x[:1], True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    nparam = sum(p.size for p in jax.tree.leaves(params))

    def loss_fn(params, x, y):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, True,
            mutable=["batch_stats"])
        logits = logits.astype(jnp.float32)
        onehot = jax.nn.one_hot(y, 19, dtype=jnp.float32)
        return -jnp.mean(
            jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    step = jax.jit(jax.value_and_grad(loss_fn))
    loss, grads = step(params, x, y)
    print(f"widths={widths or '(48,96,192,384)'}  params={nparam/1e6:.1f}M  "
          f"loss={float(loss):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = step(params, x, y)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"  fwd+bwd: {dt*1e3:.1f} ms/iter  ({batch/dt:.2f} img/s)",
          flush=True)
    return dt


def main():
    base = run(())
    padded = run((128, 128, 192, 384))
    print(f"\npadded/base = {padded/base:.3f}x  "
          f"({'WIN' if padded < base else 'LOSS'}: "
          f"{base/padded:.2f}x speedup)" , flush=True)


if __name__ == "__main__":
    main()
