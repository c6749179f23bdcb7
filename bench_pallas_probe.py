"""Probe: does Mosaic's tpu.dynamic_gather (via jnp.take_along_axis inside
Pallas) compile and run fast at the extents the bilinear warp needs?

Tests, per (M, L) shape:
  axis=0 gather: out[i, j] = x[idx[i, j], j]   (sublane gather, extent M)
  axis=1 gather: out[i, j] = x[i, idx[i, j]]   (lane gather, extent L)

Slope-timed like bench.py.  Not part of the test suite - a development
probe for the forward-gather kernel (docs/PERF.md round-3 headroom).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _setup_cache():
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_gather(axis, M, L, reps):
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        idx = idx_ref[:]
        acc = jnp.take_along_axis(x, idx, axis=axis)
        # chain a few dependent gathers so the op cost dominates launch
        for _ in range(reps - 1):
            acc = jnp.take_along_axis(x + acc * 0.0, idx, axis=axis)
        o_ref[:] = acc

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    return run


def slope_time(fn, args, lo=10, hi=30):
    out = fn(*args)
    jax.block_until_ready(out)

    def timed(iters):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    t_lo = timed(lo)
    t_hi = timed(hi)
    return (t_hi - t_lo) / (hi - lo)


def main():
    _setup_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    REPS = 8
    for axis, M, L in [
        (0, 512, 128),
        (0, 3200, 128),
        (0, 19200, 128),
        (1, 256, 128),
        (1, 8, 256),
    ]:
        x = rng.rand(M, L).astype(np.float32)
        idx = rng.randint(0, M if axis == 0 else L, size=(M, L)).astype(np.int32)
        try:
            fn = make_gather(axis, M, L, REPS)
            xd, idxd = jax.device_put(x), jax.device_put(idx)
            out = np.asarray(fn(xd, idxd))
            ref = np.take_along_axis(x, idx, axis=axis)
            ok = np.array_equal(out, ref)
            dt = slope_time(fn, (xd, idxd))
            per_gather = dt / REPS
            elems = M * L
            print(
                f"axis={axis} M={M:6d} L={L}: ok={ok} "
                f"{per_gather*1e6:9.2f} us/gather "
                f"({elems/per_gather/1e9:8.2f} Gelem/s)",
                flush=True,
            )
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"axis={axis} M={M:6d} L={L}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()  # fail fast instead of hanging on a dead relay
    main()
