"""Tile-kernel compile bisect, round 2: config-factor sweep at VGA.

bisect_tiles.py narrowed the Mosaic failure to VGA-scale configs (the
small interpret-test config compiles and the failure already appears at
the DMA+one-dot stage) — so the guilty factor is a SIZE, not a
construct.  Sweep one factor at a time from the shipping default
(16,16,64,64,8,32) and find which flips compilation.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)

    from deep_prob_feature_track_tpu.ops.pallas import gather_tiles as GT

    def report(**kw):
        print(json.dumps(kw), flush=True)

    rng = np.random.RandomState(0)

    def try_compile(tag, cfg, B, H, W, C, grads=False):
        operand = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        u = np.clip(xx[None] + 2.0, 0, W - 1).astype(np.float32)
        v = np.clip(yy[None] + 2.0, 0, H - 1).astype(np.float32)
        u0 = jnp.asarray(np.tile(np.minimum(np.floor(u), W - 2), (B, 1, 1)).astype(np.int32))
        v0 = jnp.asarray(np.tile(np.minimum(np.floor(v), H - 2), (B, 1, 1)).astype(np.int32))
        du = jnp.asarray(np.tile(u - np.minimum(np.floor(u), W - 2), (B, 1, 1)).astype(np.float32))
        dv = jnp.asarray(np.tile(v - np.minimum(np.floor(v), H - 2), (B, 1, 1)).astype(np.float32))
        f = GT.gather_tiles_grads if grads else GT.gather_tiles
        try:
            jax.jit(functools.partial(f, cfg=cfg)).lower(
                operand, v0, dv, u0, du).compile()
            report(case=tag, ok=True)
        except Exception as e:
            report(case=tag, ok=False, err=str(e).splitlines()[0][:160])

    TC = GT.TileConfig
    # factor sweep at 480x640 C=17 (Cp=32)
    cases = [
        ("default", TC(16, 16, 64, 64, 8, 32), 480, 640, 17),
        ("blk128", TC(8, 16, 64, 64, 8, 32), 480, 640, 17),
        ("band_u32", TC(16, 16, 64, 32, 8, 32), 480, 640, 17),
        ("band_v32", TC(16, 16, 32, 64, 8, 32), 480, 640, 17),
        ("inner2", TC(16, 16, 64, 64, 2, 32), 480, 640, 17),
        ("inner1", TC(16, 16, 64, 64, 1, 32), 480, 640, 17),
        # channel/lane width factor: C=5 -> Cp=8 -> 512 lanes
        ("c5_cp8", TC(16, 16, 64, 64, 8, 8), 480, 640, 5),
        # same config, smaller image plane (isolates H/W from cfg)
        ("img128_c17", TC(16, 16, 64, 64, 8, 32), 128, 128, 17),
        ("img256_c17", TC(16, 16, 64, 64, 8, 32), 256, 256, 17),
        # small cfg on the VGA plane (isolates plane size from cfg)
        ("smallcfg_vga_c5", TC(8, 8, 32, 32, 2, 8), 480, 640, 5),
        ("smallcfg_vga_c17", TC(8, 8, 32, 32, 2, 32), 480, 640, 17),
    ]
    for tag, cfg, H, W, C in cases:
        try_compile(tag, cfg, 2, H, W, C)

    # the winner config (if any) also needs grads
    try_compile("blk128_grads", TC(8, 16, 64, 64, 8, 32), 2, 480, 640, 17,
                grads=True)
    try_compile("band_u32_grads", TC(16, 16, 64, 32, 8, 32), 2, 480, 640, 17,
                grads=True)


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()
    main()
