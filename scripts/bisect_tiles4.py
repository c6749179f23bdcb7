"""Tile-kernel compile bisect, round 4: SMEM scalar-prefetch size.

Round 3 showed the pass/fail boundary tracks the TILE COUNT, not the
plane size: pass at Kt<=640 tiles, fail at Kt>=1024 — i.e. the
scalar-prefetched ``starts`` array ([B, Kpad, 2] i32, whole-array in
SMEM) crossing ~16 KB.  Confirm by scaling B (which scales starts and
aux but nothing structural) at a passing spatial shape, and by B=1 at
VGA (9.6 KB, should pass if SMEM is the constraint).
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    def compile_kernel(tag, B, H, W, C):
        cfg = GT.TileConfig(16, 16, 64, 64, 8, max(8, GT._next_pow2(C)))
        blk, inner = cfg.blk, cfg.inner
        Kt = (-(-H // cfg.th)) * (-(-W // cfg.tw))
        Kout = -(-Kt // inner)
        Kpad = Kout * inner
        starts = jnp.zeros((B, Kpad, 2), jnp.int32)
        aux = jnp.zeros((B, Kout, inner, blk, 4), jnp.float32)
        F_pad = jnp.zeros((B, H, W * cfg.Cp), jnp.float32)
        out_shape = [jax.ShapeDtypeStruct((B, C, Kpad * blk), jnp.float32)]
        out_spec = pl.BlockSpec((1, C, inner * blk), lambda b, k, s: (b, 0, k))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Kout),
            in_specs=[
                pl.BlockSpec((1, 1, inner, blk, 4),
                             lambda b, k, s: (b, k, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[out_spec],
            scratch_shapes=[
                pltpu.VMEM((2, cfg.band_v, cfg.band_u * cfg.Cp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        fn = pl.pallas_call(
            functools.partial(
                GT._kernel, grads=False, band_v=cfg.band_v, band_u=cfg.band_u,
                Cp=cfg.Cp, blk=blk, inner=inner,
            ),
            out_shape=out_shape,
            grid_spec=grid_spec,
        )
        smem_kb = B * Kpad * 2 * 4 / 1024.0
        try:
            jax.jit(lambda s, a, f: fn(s, a, f)).lower(
                starts, aux, F_pad).compile()
            report(case=tag, smem_kb=round(smem_kb, 1), ok=True)
        except Exception as e:
            report(case=tag, smem_kb=round(smem_kb, 1), ok=False,
                   err=str(e).splitlines()[0][:120])

    # starts KB: b1_vga = 9.6, b2_vga = 19.2 (known fail),
    # b2_h256w640 = 10.2 (known pass), b4_h256w640 = 20.5, b3_h256w640 = 15.4
    compile_kernel("b1_vga17", 1, 480, 640, 17)
    compile_kernel("b3_h256_w640", 3, 256, 640, 17)
    compile_kernel("b4_h256_w640", 4, 256, 640, 17)
    compile_kernel("b2_h240_w640", 2, 240, 640, 17)   # Kt=600, 9.6 KB
    compile_kernel("b2_h272_w640", 2, 272, 640, 17)   # Kt=680, 10.9 KB
    compile_kernel("b2_h320_w640", 2, 320, 640, 17)   # Kt=800, 12.8 KB
    compile_kernel("b2_h400_w640", 2, 400, 640, 17)   # Kt=1000, 16.0 KB
    compile_kernel("b2_h416_w640", 2, 416, 640, 17)   # Kt=1040, 16.6 KB


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()
    main()
