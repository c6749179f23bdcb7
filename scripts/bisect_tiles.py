"""Bisect the tile-slab kernel's Mosaic compile failure (round 4).

probe_tiles.py showed every gather_tiles compile dying with the opaque
"tpu_compile_helper subprocess exit code 1" HTTP 500 (which hides
ordinary Mosaic type errors — CLAUDE.md round-3 note).  This script
compiles a staged sequence of mini-kernels sharing the real kernel's
structures, so the first failing stage names the guilty construct:

  k1_dma        scalar-prefetched dynamic slab DMA + direct store
  k2_vdot       + aux VMEM block read, iota, two-hot V, one bf16 MXU dot
  k3_reduce     + the log-halving lane-strided band reduction
  k4_transpose  + the [blk, Cp] -> [Cp, blk] in-kernel transpose store
  full          gather_tiles / gather_tiles_grads as shipped

Each stage compiles at (a) the interpret-test config on a small shape
and (b) the shipping default config at VGA C=17.  Compile-only
(jit.lower().compile()); one TPU process, fail-fast prints.
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

    def make_stage(stage, cfg, B, H, W, C):
        band_v, band_u, Cp = cfg.band_v, cfg.band_u, cfg.Cp
        blk, inner = cfg.blk, cfg.inner

        def kern(starts_ref, aux_ref, f_ref, o_ref, slab, sem):
            b = pl.program_id(0)
            k = pl.program_id(1)
            dma = functools.partial(
                GT._mk_dma, starts_ref, f_ref, slab, sem, b,
                band_v=band_v, band_u=band_u, Cp=Cp,
            )
            wl = jax.lax.broadcasted_iota(
                jnp.int32, (blk, band_u * Cp), 1) // Cp
            ih = jax.lax.broadcasted_iota(jnp.int32, (blk, band_v), 1)
            dn = (((1,), (0,)), ((), ()))
            dma(k * inner, 0).start()
            for j in range(inner):
                slot = j % 2
                if j + 1 < inner:
                    dma(k * inner + j + 1, (j + 1) % 2).start()
                dma(k * inner + j, slot).wait()
                F = slab[slot]
                sl = slice(j * blk, (j + 1) * blk)
                if stage == "k1_dma":
                    o_ref[0, sl, :] = F[:blk, :Cp]
                    continue
                aux = aux_ref[0, 0, j]
                v0 = aux[:, 0:1].astype(jnp.int32)
                dv = aux[:, 1:2]
                u0 = aux[:, 2:3].astype(jnp.int32)
                du = aux[:, 3:4]
                Fh = F.astype(jnp.bfloat16)
                V = (jnp.where(ih == v0, 1.0 - dv, 0.0)
                     + jnp.where(ih == v0 + 1, dv, 0.0))
                Vh = V.astype(jnp.bfloat16)
                P = jax.lax.dot_general(
                    Vh, Fh, dn, preferred_element_type=jnp.float32)
                if stage == "k2_vdot":
                    o_ref[0, sl, :] = P[:, :Cp]
                    continue
                U = (jnp.where(wl == u0, 1.0 - du, 0.0)
                     + jnp.where(wl == u0 + 1, du, 0.0))
                Z = GT._reduce_band(P * U, band_u=band_u, Cp=Cp, blk=blk)
                if stage == "k3_reduce":
                    o_ref[0, sl, :] = Z
                    continue
                o_ref[0, :, sl] = Z.T[:o_ref.shape[1]]  # k4_transpose

        return kern

    def compile_stage(stage, cfg, B, H, W, C):
        blk, inner = cfg.blk, cfg.inner
        Hs = Ws = None
        # sample grid = image grid
        Kt_h = -(-H // cfg.th)
        Kt_w = -(-W // cfg.tw)
        Kt = Kt_h * Kt_w
        Kout = -(-Kt // inner)
        Kpad = Kout * inner
        starts = jnp.zeros((B, Kpad, 2), jnp.int32)
        aux = jnp.zeros((B, Kout, inner, blk, 4), jnp.float32)
        F_pad = jnp.zeros((B, H, W * cfg.Cp), jnp.float32)

        if stage == "k4_transpose":
            out_shape = jax.ShapeDtypeStruct((B, C, Kpad * blk), jnp.float32)
            out_spec = pl.BlockSpec((1, C, inner * blk),
                                    lambda b, k, s: (b, 0, k))
        else:
            out_shape = jax.ShapeDtypeStruct((B, Kpad * blk, cfg.Cp),
                                             jnp.float32)
            out_spec = pl.BlockSpec((1, inner * blk, cfg.Cp),
                                    lambda b, k, s: (b, k, 0))
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
            make_stage(stage, cfg, B, H, W, C),
            out_shape=[out_shape],
            grid_spec=grid_spec,
        )

        jax.jit(lambda s, a, f: fn(s, a, f)).lower(starts, aux, F_pad).compile()

    small = (GT.TileConfig(8, 8, 32, 32, 2, 8), 2, 48, 64, 5)
    vga17 = (GT.default_tile_config("eval", 480, 640, 17, 480, 640),
             2, 480, 640, 17)
    for name, (cfg, B, H, W, C) in (("small", small), ("vga17", vga17)):
        for stage in ("k1_dma", "k2_vdot", "k3_reduce", "k4_transpose"):
            try:
                compile_stage(stage, cfg, B, H, W, C)
                report(case=name, stage=stage, ok=True)
            except Exception as e:
                report(case=name, stage=stage, ok=False,
                       err=str(e).splitlines()[0][:200])

    # full shipped kernels
    rng = np.random.RandomState(0)
    for name, (cfg, B, H, W, C) in (("small", small), ("vga17", vga17)):
        operand = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        u = np.clip(xx[None] + 2.0, 0, W - 1).astype(np.float32)
        v = np.clip(yy[None] + 2.0, 0, H - 1).astype(np.float32)
        u0 = jnp.asarray(np.tile(np.minimum(np.floor(u), W - 2), (B, 1, 1)).astype(np.int32))
        v0 = jnp.asarray(np.tile(np.minimum(np.floor(v), H - 2), (B, 1, 1)).astype(np.int32))
        du = jnp.asarray(np.tile(u - np.minimum(np.floor(u), W - 2), (B, 1, 1)).astype(np.float32))
        dv = jnp.asarray(np.tile(v - np.minimum(np.floor(v), H - 2), (B, 1, 1)).astype(np.float32))
        for tag, f in (("eval", GT.gather_tiles), ("grads", GT.gather_tiles_grads)):
            try:
                jax.jit(
                    functools.partial(f, cfg=cfg)
                ).lower(operand, v0, dv, u0, du).compile()
                report(case=name, stage=f"full_{tag}", ok=True)
            except Exception as e:
                report(case=name, stage=f"full_{tag}", ok=False,
                       err=str(e).splitlines()[0][:200])


if __name__ == "__main__":
    from bench import preflight_tpu

    preflight_tpu()
    main()
