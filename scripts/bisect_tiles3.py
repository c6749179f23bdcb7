"""Tile-kernel compile bisect, round 3: memory space + H/W factor.

bisect_tiles2.py isolated the failure to the feature-plane SIZE
(128x128/256x256 C=17 compile, 480x640 fails at any config, 480x640 C=5
fails with fewer lanes than the passing 256x256 C=17) — pointing at the
``pl.ANY`` plane placement (the compiler may try VMEM) or an H-dim
limit.  This round compiles the REAL kernel via GT._launch-equivalent
pallas_calls with (a) the plane pinned to HBM, (b) an H/W factor grid.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)

    from deep_prob_feature_track_tpu.ops.pallas import gather_tiles as GT

    def report(**kw):
        print(json.dumps(kw), flush=True)

    def compile_kernel(tag, H, W, C, mem, grads=False):
        cfg = GT.TileConfig(16, 16, 64, 64, 8, max(8, GT._next_pow2(C)))
        B = 2
        blk, inner = cfg.blk, cfg.inner
        Kt = (-(-H // cfg.th)) * (-(-W // cfg.tw))
        Kout = -(-Kt // inner)
        Kpad = Kout * inner
        starts = jnp.zeros((B, Kpad, 2), jnp.int32)
        aux = jnp.zeros((B, Kout, inner, blk, 4), jnp.float32)
        F_pad = jnp.zeros((B, H, W * cfg.Cp), jnp.float32)
        n_out = 3 if grads else 1
        out_shape = [jax.ShapeDtypeStruct((B, C, Kpad * blk), jnp.float32)] * n_out
        out_spec = pl.BlockSpec((1, C, inner * blk), lambda b, k, s: (b, 0, k))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Kout),
            in_specs=[
                pl.BlockSpec((1, 1, inner, blk, 4),
                             lambda b, k, s: (b, k, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=mem),
            ],
            out_specs=[out_spec] * n_out,
            scratch_shapes=[
                pltpu.VMEM((2, cfg.band_v, cfg.band_u * cfg.Cp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        fn = pl.pallas_call(
            functools.partial(
                GT._kernel, grads=grads, band_v=cfg.band_v, band_u=cfg.band_u,
                Cp=cfg.Cp, blk=blk, inner=inner,
            ),
            out_shape=out_shape,
            grid_spec=grid_spec,
        )
        try:
            jax.jit(lambda s, a, f: fn(s, a, f)).lower(
                starts, aux, F_pad).compile()
            report(case=tag, ok=True)
        except Exception as e:
            report(case=tag, ok=False, err=str(e).splitlines()[0][:160])

    ANY = pl.ANY
    HBM = pltpu.MemorySpace.HBM
    cases = [
        ("vga17_any", 480, 640, 17, ANY),
        ("vga17_hbm", 480, 640, 17, HBM),
        ("h256_w640_any", 256, 640, 17, ANY),
        ("h480_w256_any", 480, 256, 17, ANY),
        ("h384_any", 384, 384, 17, ANY),
        ("h512_any", 512, 512, 17, ANY),
        ("h512_w640_any", 512, 640, 17, ANY),
    ]
    for tag, H, W, C, mem in cases:
        compile_kernel(tag, H, W, C, mem)
    compile_kernel("vga17_hbm_grads", 480, 640, 17, HBM, grads=True)


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()
    main()
