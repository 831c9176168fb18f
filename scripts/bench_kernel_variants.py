"""Scan production pallas branch-conv kernel variants on the chip.

Times the actual ops/pallas_conv.py forward impl (and the dW kernel) at the
two config-5 branch shapes with scan-amortized dispatch (24 convs chained
per program — single dispatches floor at ~1.3-1.8 ms wall on the relay).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_kernel_variants.py
"""

import os as _os, sys as _sys

# repo root on sys.path AFTER interpreter start: PYTHONPATH-based
# injection breaks the axon PJRT plugin registration on this image.
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from semi_supervised_semantic_segmentation_tpu.ops import pallas_conv as pc

REPEAT = 24
SHAPES = [(8, 48, 256, 256), (8, 96, 128, 128)]


def bench(label, fn, x, iters=8):
    def body(c, _):
        return fn(c).astype(c.dtype), ()

    f = jax.jit(lambda x0: lax.scan(body, x0, None, length=REPEAT)[0])
    float(jnp.sum(f(x).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / (iters * REPEAT)
    n, c, h, w = x.shape
    flops = 2 * n * h * w * c * c * 9
    print(f"  {label:24s} {dt*1e3:7.3f} ms  ({100*flops/dt/197e12:4.1f}% MXU)",
          flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    for shape in SHAPES:
        n, c, h, w = shape
        print(f"shape {shape}:", flush=True)
        x = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32)) * 0.05
        ref = None
        for label, kw in [
            ("sub8 (prod)", dict(sub=8)),
            ("sub8 s_inner", dict(sub=8, s_inner=True)),
            ("sub16", dict(sub=16)),
            ("sub32", dict(sub=32)),
            ("kstack sub8", dict(sub=8, variant="kstack")),
            ("kstack sub16", dict(sub=16, variant="kstack")),
            ("kstack sub32", dict(sub=32, variant="kstack")),
        ]:
            pack = pc._pack_kstack if kw.get("variant") == "kstack" else pc._pack
            a = pack(k, x.dtype)
            fn = lambda xx, kw=kw, a=a: pc._conv3x3_nchw_impl(xx, a, **kw)
            y = jax.jit(fn)(x)
            if ref is None:
                ref = y
            else:
                err = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - ref.astype(jnp.float32))))
                if err > 0.1:
                    print(f"  {label}: MISMATCH {err}")
                    continue
            bench(label, fn, x)
        # dW kernel (chained: dk has wrong shape to feed back; time via
        # fori over the same operands inside one jit instead).
        dy = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)

        for label, kw in [
            ("dw (prod)", dict()),
            ("dw dyroll sub8", dict(variant="dyroll", sub=8)),
            ("dw dyroll sub16", dict(variant="dyroll", sub=16)),
            ("dw dyroll sub32", dict(variant="dyroll", sub=32)),
        ]:
            def dw_many(x0, dy0, kw=kw):
                # roll the dy carry so the call isn't loop-invariant (XLA
                # would hoist a pure custom call with unchanging operands).
                def body(cdy, _):
                    dk = pc._conv3x3_dw_impl(x0, cdy, **kw)
                    return jnp.roll(cdy, 1, axis=0), dk[0, 0, 0, 0]
                return jnp.sum(lax.scan(body, dy0, None, length=REPEAT)[1])

            f = jax.jit(dw_many)
            float(f(x, dy))
            t0 = time.perf_counter()
            for _ in range(4):
                out = f(x, dy)
            float(out)
            dt = (time.perf_counter() - t0) / (4 * REPEAT)
            flops = 2 * n * h * w * c * c * 9
            print(f"  {label:24s} {dt*1e3:7.3f} ms  "
                  f"({100*flops/dt/197e12:4.1f}% MXU)", flush=True)


if __name__ == "__main__":
    main()
