"""Pallas TPU kernel: tile-slab two-hot bilinear warp (VGA-scale shapes).

The full-plane two-hot kernels (ops/pallas/gather.py) lose at VGA *by
construction*: their MXU contraction is [blk, H] x [H, W*C] and their
x-interpolation does W*C lanes of VPU work per sample, so the per-sample
cost is ~H*W*C — linear in the image area — while the XLA gather's
~24 ns/index is constant.  At 480x640 (W*C = 8160+) the crossover is
unreachable (docs/PERF.md round-2 null result).

This kernel exploits the *spatial locality* of warp coordinates instead:
consecutive output pixels sample nearby input pixels (coordinates are a
smooth function of pose and depth; the spread within a small output tile
is bounded by the inter-frame motion plus parallax).  Samples are
reordered into th x tw output tiles, and each tile contracts against
only a [band_v, band_u*Cp] slab of the feature plane, DMA'd from HBM at
a per-tile dynamic offset (read from a per-step SMEM block).  Per-sample
cost drops
from H*W*C to band_v*band_u*Cp — independent of resolution — which is
what makes the two-hot MXU formulation win at VGA.

Correctness never depends on the locality assumption: the host wrapper
computes each tile's coordinate spread, and if ANY tile exceeds its
band, the whole call falls back to the XLA gather via ``lax.cond``
(both branches are compiled; the check is a cheap reduction).  Large
motions or violent parallax just lose the speedup, not accuracy.

Alignment scheme: Mosaic DMAs want lane offsets that are multiples of
128, so channels are padded to Cp = next_pow2(C) and column starts are
quantized to q = 128/Cp columns (then u_start*Cp % 128 == 0 exactly).
Row starts are quantized to the 8-row f32 sublane tile.  The Cp padding
costs one cheap re-pad of the operand plane and proportionally wider
VPU rows; it is what makes every C (including the solver's stacked
C=17 warp operand) DMA-clean.

Reference sampling semantics: code/models/geometry.py:353-365
(grid_sample align_corners=True, padding_mode='border'), same contract
as ops/pallas/gather.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class TileConfig(NamedTuple):
    th: int  # tile height (output rows per tile)
    tw: int  # tile width
    band_v: int  # slab rows (multiple of 8)
    band_u: int  # slab columns (multiple of q)
    inner: int  # tiles per grid step (double-buffered DMA)
    Cp: int  # channel padding (pow2, q = 128 // Cp)

    @property
    def blk(self):
        return self.th * self.tw

    @property
    def q(self):
        return 128 // self.Cp


def _next_pow2(x):
    return 1 << max(0, (x - 1).bit_length())


def default_tile_config(kind, H, W, C, Hs, Ws):
    """Config for this shape, or None = unsupported.

    Margins: the v band leaves band_v - th - 8 rows of vertical motion
    headroom (the 8 is the row-quantization slack), the u band
    band_u - tw - q columns.  With the 16x16/64x64 default that is
    +-20 rows and +-20..28 columns of inter-frame displacement plus
    within-tile parallax — generous for a tracking workload near
    convergence; bigger motions hit the lax.cond fallback (correct,
    just unaccelerated).  blk sizing keeps the [blk, band_u*Cp]
    temporaries + the double-buffered slab well inside the 16 MB
    scoped-VMEM budget (compile-probed on TPU, scripts/probe_tiles.py).
    """
    if C < 1 or C > 128:
        return None
    Cp = max(8, _next_pow2(C))
    # measured gate (TILES_r04.json, v5e): the 5-matmul grads body pays
    # ~linear in band_u*Cp lanes while the XLA gather is C-agnostic, so
    # Cp=32 grads LOSE at every shape (C=17: 89.9 vs 67.2 ms VGA, 38.1 vs
    # 32.5 level-0) where Cp<=16 wins (C=10: 49.8 vs 65.4, 23.6 vs 31.2);
    # eval's 3-matmul body still wins at Cp=32 (48.2 vs 71.2 VGA)
    if kind in ("grads", "train") and Cp > 16:
        return None
    # uniform default, re-confirmed round 5 (TILES_r05.json): beats every
    # th=8 / band_v in {48,56,64} candidate at BOTH resolutions, both
    # kinds, C in {10,17} within one session; band_v=64 is also the only
    # band measured 100% in-band on real keyframe motion at kf<=4
    # (INBAND_r05.json — band_v=48 overflows at kf=4 level-0)
    cfg = TileConfig(th=16, tw=16, band_v=64, band_u=64, inner=8, Cp=Cp)
    # tiny sample grids are not worth a tiled launch (and the full-plane
    # kernel covers them); require at least a few tiles of samples
    if Hs < cfg.th or Ws < cfg.tw:
        return None
    if H < cfg.band_v or W < cfg.band_u:
        return None
    # the quantized start grid must let the band COVER the last row/column
    # index (start + band >= size, so local corner v0+1 <= band_v-1 fits),
    # or edge tiles permanently trip the fallback
    if ((H - cfg.band_v) // 8) * 8 + cfg.band_v < H:
        return None
    if ((W - cfg.band_u) // cfg.q) * cfg.q + cfg.band_u < W:
        return None
    # VMEM gate on the blk*lanes product, mirroring gather.py's probe
    # calibration of the same matmul bodies (524k elements safe for the
    # 5-matmul grads body, 696k for the 3-matmul eval body); the extra
    # double-buffered slab is ~1 MB at the default config.  The VGA
    # C=17 grads config sits exactly AT 524k — confirmed compile-safe
    # on TPU by scripts/probe_tiles.py before auto-enabling.
    product = cfg.blk * cfg.band_u * Cp
    if product > (524_288 if kind in ("grads", "train") else 696_320):
        return None
    return cfg


def supported(operand_shape, sample_shape, dtype, kind="eval") -> bool:
    """Whether the tile-slab kernel applies (f32, big-enough shapes)."""
    B, H, W, C = operand_shape
    _, Hs, Ws = sample_shape
    if dtype != jnp.float32:
        return False
    if H < 2 or W < 2:
        return False
    return default_tile_config(kind, H, W, C, Hs, Ws) is not None


def _reduce_band(Z, *, band_u, Cp, blk):
    """Sum a [blk, band_u*Cp] lane-expanded block over the column band
    (lane stride Cp) by log-halving; band padded to a power of two."""
    Up = _next_pow2(band_u)
    if Up > band_u:
        Z = jnp.concatenate(
            [Z, jnp.zeros((blk, (Up - band_u) * Cp), jnp.float32)], axis=1
        )
    m = Up
    while m > 1:
        half = m // 2
        Z = Z[:, : half * Cp] + Z[:, half * Cp : m * Cp]
        m = half
    return Z[:, 0:Cp]


def _mk_dma(starts_ref, f_ref, slab, sem, b, j, slot, *, band_v, band_u, Cp):
    # starts are stored PRE-QUANTIZED (v_start/8, u_start/q) and multiplied
    # back here: Mosaic requires dynamic DMA offsets to be PROVABLY
    # aligned — a raw scalar (even one whose runtime value is aligned)
    # crashes the TPU compiler, while `s * 8` / `s * 128` carry the proof
    # (bisected on v5e, docs/PERF.md round 3; q * Cp == 128 exactly).
    #
    # starts_ref is a BLOCKED SMEM operand holding only this grid step's
    # ``inner`` tile starts ([1, 1, inner, 2] i32, ~64 B; the trailing
    # (inner, 2) block dims equal the array dims, satisfying the TPU
    # block-shape rule), NOT a scalar-prefetched whole array: the
    # prefetch form keeps [B, Kt, 2] resident in SMEM, and the TPU
    # compiler dies (opaque exit code 1) once that crosses ~16 KB —
    # every VGA-scale shape (round-4 bisect, scripts/bisect_tiles4.py:
    # pass at 15.6 KB, fail at 16.2 KB).
    vs = starts_ref[0, 0, j, 0] * 8
    ls = starts_ref[0, 0, j, 1] * 128
    return pltpu.make_async_copy(
        f_ref.at[b, pl.ds(vs, band_v), pl.ds(ls, band_u * Cp)],
        slab.at[slot],
        sem.at[slot],
    )


def _kernel(starts_ref, aux_ref, f_ref, *rest, grads, band_v, band_u, Cp,
            blk, inner):
    """Grid (B, Kout); ``inner`` tiles per step, double-buffered slab DMA.

    aux carries LOCAL corner starts (v0 - v_start, u0 - u_start) so the
    kernel math never needs the global offsets; the per-step SMEM starts
    block feeds only the DMA engine.
    """
    if grads:
        o_ref, gx_ref, gy_ref, slab, sem = rest
    else:
        o_ref, slab, sem = rest
        gx_ref = gy_ref = None
    b = pl.program_id(0)
    dma = functools.partial(
        _mk_dma, starts_ref, f_ref, slab, sem, b,
        band_v=band_v, band_u=band_u, Cp=Cp,
    )

    wl = jax.lax.broadcasted_iota(jnp.int32, (blk, band_u * Cp), 1) // Cp
    ih = jax.lax.broadcasted_iota(jnp.int32, (blk, band_v), 1)
    dn = (((1,), (0,)), ((), ()))

    dma(0, 0).start()
    for j in range(inner):
        slot = j % 2
        if j + 1 < inner:
            dma(j + 1, (j + 1) % 2).start()
        dma(j, slot).wait()

        F = slab[slot]  # [band_v, band_u*Cp] f32
        # hi/lo bf16 split (in-kernel on purpose: the XLA TPU pipeline
        # folds F - f32(bf16(F)) to zero outside, see gather.py)
        Fh = F.astype(jnp.bfloat16)
        Fl = (F - Fh.astype(jnp.float32)).astype(jnp.bfloat16)

        aux = aux_ref[0, 0, j]  # [blk, 4] f32 = (v0l, dv, u0l, du)
        v0 = aux[:, 0:1].astype(jnp.int32)
        dv = aux[:, 1:2]
        u0 = aux[:, 2:3].astype(jnp.int32)
        du = aux[:, 3:4]

        V = jnp.where(ih == v0, 1.0 - dv, 0.0) + jnp.where(ih == v0 + 1, dv, 0.0)
        Vh = V.astype(jnp.bfloat16)
        Vl = (V - Vh.astype(jnp.float32)).astype(jnp.bfloat16)
        P = (
            jax.lax.dot_general(Vh, Fh, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(Vh, Fl, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(Vl, Fh, dn, preferred_element_type=jnp.float32)
        )  # [blk, band_u*Cp]

        U = jnp.where(wl == u0, 1.0 - du, 0.0) + jnp.where(wl == u0 + 1, du, 0.0)
        sl = slice(j * blk, (j + 1) * blk)
        Z = _reduce_band(P * U, band_u=band_u, Cp=Cp, blk=blk)
        o_ref[0, :, sl] = Z.T[:o_ref.shape[1]]
        if grads:
            Ud = jnp.where(wl == u0 + 1, 1.0, 0.0) - jnp.where(wl == u0, 1.0, 0.0)
            Vd = (
                jnp.where(ih == v0 + 1, 1.0, 0.0) - jnp.where(ih == v0, 1.0, 0.0)
            ).astype(jnp.bfloat16)
            Pd = jax.lax.dot_general(
                Vd, Fh, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(Vd, Fl, dn, preferred_element_type=jnp.float32)
            gx = _reduce_band(P * Ud, band_u=band_u, Cp=Cp, blk=blk)
            gy = _reduce_band(Pd * U, band_u=band_u, Cp=Cp, blk=blk)
            gx_ref[0, :, sl] = gx.T[:gx_ref.shape[1]]
            gy_ref[0, :, sl] = gy.T[:gy_ref.shape[1]]


def _tile_reorder(x, th, tw):
    """[B, Hp, Wp] -> [B, K, th*tw] in (tile row, tile col) order."""
    B, Hp, Wp = x.shape
    x = x.reshape(B, Hp // th, th, Wp // tw, tw)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(B, (Hp // th) * (Wp // tw), th * tw)


def _tile_unorder(y, Hp, Wp, th, tw):
    """[B, C, K*blk] -> [B, C, Hp, Wp] inverting :func:`_tile_reorder`."""
    B, C, _ = y.shape
    y = y.reshape(B, C, Hp // th, Wp // tw, th, tw)
    y = y.transpose(0, 1, 2, 4, 3, 5)
    return y.reshape(B, C, Hp, Wp)


def _edge_pad(x, ph, pw):
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw)), mode="edge")


def _launch(F_pad, aux, starts, cfg, *, B, H, W, C, Hs, Ws, Kt,
            grads, interpret):
    """Launch the pallas_call on tile-ordered inputs; returns tile-major
    [B, C_out, Kt*blk] outputs (un-reordering happens in the caller)."""
    blk, inner = cfg.blk, cfg.inner
    Kout = -(-Kt // inner)
    Kpad = Kout * inner
    if Kpad > Kt:
        aux = jnp.pad(aux, ((0, 0), (0, Kpad - Kt), (0, 0), (0, 0)))
        starts = jnp.pad(starts, ((0, 0), (0, Kpad - Kt), (0, 0)))
    aux = aux.reshape(B, Kout, inner, blk, 4)
    # per-step SMEM block of this step's `inner` tile starts: a
    # scalar-prefetched whole array dies past ~16 KB of SMEM (round-4
    # bisect, see _mk_dma) — blocking keeps it at inner*2 i32 per step
    # and removes the tile-count ceiling entirely
    starts = starts.reshape(B, Kout, inner, 2)

    n_out = 3 if grads else 1
    out_shape = [jax.ShapeDtypeStruct((B, C, Kpad * blk), jnp.float32)] * n_out
    out_spec = pl.BlockSpec((1, C, inner * blk), lambda b, k: (b, 0, k))
    outs = pl.pallas_call(
        functools.partial(
            _kernel, grads=grads, band_v=cfg.band_v, band_u=cfg.band_u,
            Cp=cfg.Cp, blk=blk, inner=inner,
        ),
        grid=(B, Kout),
        in_specs=[
            pl.BlockSpec((1, 1, inner, 2), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, inner, blk, 4), lambda b, k: (b, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=out_shape,
        out_specs=[out_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((2, cfg.band_v, cfg.band_u * cfg.Cp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(starts, aux, F_pad)
    return [o[:, :, : Kt * blk] for o in outs]


def _prepare(operand, v0, dv, u0, du, cfg):
    """Tile-reorder the sample maps and compute per-tile slab starts.

    Returns (F_pad [B,H,W*Cp], aux [B,Kt,blk,4] with band-local corner
    starts, starts [B,Kt,2] i32, ok scalar bool, geometry ints).
    """
    B, H, W, C = operand.shape
    _, Hs, Ws = v0.shape
    th, tw, q = cfg.th, cfg.tw, cfg.q
    Hp = -(-Hs // th) * th
    Wp = -(-Ws // tw) * tw

    # edge-pad keeps padded samples inside their donor tile's band
    pads = (Hp - Hs, Wp - Ws)
    v0p = _edge_pad(v0, *pads)
    u0p = _edge_pad(u0, *pads)
    dvp = _edge_pad(dv, *pads)
    dup = _edge_pad(du, *pads)
    v0t = _tile_reorder(v0p, th, tw)  # [B, Kt, blk] i32
    u0t = _tile_reorder(u0p, th, tw)
    dvt = _tile_reorder(dvp, th, tw)
    dut = _tile_reorder(dup, th, tw)

    vmin = jnp.min(v0t, axis=-1)
    vmax = jnp.max(v0t, axis=-1)
    umin = jnp.min(u0t, axis=-1)
    umax = jnp.max(u0t, axis=-1)
    v_start = jnp.clip((vmin // 8) * 8, 0, ((H - cfg.band_v) // 8) * 8)
    u_start = jnp.clip((umin // q) * q, 0, ((W - cfg.band_u) // q) * q)
    # corner v0+1 must live at local row <= band_v-1 (same for u)
    ok = jnp.all(vmax <= v_start + (cfg.band_v - 2)) & jnp.all(
        umax <= u_start + (cfg.band_u - 2)
    )

    aux = jnp.stack(
        [
            (v0t - v_start[..., None]).astype(jnp.float32),
            dvt,
            (u0t - u_start[..., None]).astype(jnp.float32),
            dut,
        ],
        axis=-1,
    )  # [B, Kt, blk, 4]
    # pre-quantized units (see _mk_dma: the kernel multiplies back so the
    # DMA offsets are provably aligned)
    starts = jnp.stack([v_start // 8, u_start // q], axis=-1).astype(jnp.int32)

    if cfg.Cp > C:
        operand = jnp.pad(operand, ((0, 0), (0, 0), (0, 0), (0, cfg.Cp - C)))
    F_pad = operand.reshape(B, H, W * cfg.Cp)
    return F_pad, aux, starts, ok, (Hp, Wp, v0t.shape[1])


_FALLBACK_BLK = 32768  # samples per fallback scan block (memory bound)


def _xla_fallback(operand, v0, dv, u0, du, grads):
    """The plain fused-gather path on the original raster-ordered samples
    (geometry/warp.py semantics), used when a tile exceeds its band.

    Blocked over samples with ``lax.scan`` above ``_FALLBACK_BLK``: both
    branches of the in-band ``lax.cond`` are compiled and XLA reserves
    peak memory = max over branches, so a one-shot fallback would keep
    the full corner tensor alive in the budget — at VGA train shapes the
    remat body re-materializes it tile-padded 7.5x (f32[B*N,2,2,17] with
    C on lanes), the diagnosed cause of the round-3 B=8 OOM
    (BENCH_VGA_r03.json).  Blocking caps the corner temp at
    ``[B,2,2,C,blk]`` (~71 MB at B=8 C=17) with identical per-sample
    math; the fallback only ever *executes* on out-of-band calls, where
    the serialization is an acceptable price."""
    from ...geometry import warp as W_

    B, H, W, C = operand.shape
    N = v0.shape[1] * v0.shape[2]
    starts = jnp.stack(
        [v0.reshape(B, N), u0.reshape(B, N)], axis=-1
    )
    duB = du.reshape(B, 1, N)
    dvB = dv.reshape(B, 1, N)

    if grads:
        # the training-path helper is sample-blocked (same math, shared
        # source of truth) — but clamp its block size to _FALLBACK_BLK
        # here regardless of DPFT_GRADS_BLK: XLA budgets peak memory as
        # the max over BOTH lax.cond branches, so even a never-executed
        # one-shot fallback (DPFT_GRADS_BLK=0 "disables blocking") would
        # reinstate the 7.5x-padded corner temporary at VGA
        return list(
            W_._corner_grads(
                operand, starts, duB, dvB,
                blk=min(W_._grads_blk(), _FALLBACK_BLK),
            )
        )

    def block(starts_b, du_b, dv_b):
        corners = W_._gather_corners(operand, starts_b)
        return (W_._blend(corners, du_b, dv_b),)

    blk = _FALLBACK_BLK
    if N <= blk:
        return list(block(starts, duB, dvB))
    nblk = -(-N // blk)
    pad = nblk * blk - N
    if pad:
        starts = jnp.pad(starts, ((0, 0), (0, pad), (0, 0)))
        duB = jnp.pad(duB, ((0, 0), (0, 0), (0, pad)))
        dvB = jnp.pad(dvB, ((0, 0), (0, 0), (0, pad)))
    xs = (
        jnp.moveaxis(starts.reshape(B, nblk, blk, 2), 1, 0),
        jnp.moveaxis(duB.reshape(B, 1, nblk, blk), 2, 0),
        jnp.moveaxis(dvB.reshape(B, 1, nblk, blk), 2, 0),
    )

    def body(_, x):
        return None, block(*x)

    _, ys = jax.lax.scan(body, None, xs)  # each [nblk, B, C, blk]
    return [
        jnp.moveaxis(y, 0, 2).reshape(B, C, nblk * blk)[:, :, :N] for y in ys
    ]


def _gather_tiles_impl(operand, v0, dv, u0, du, *, grads, interpret, cfg):
    B, H, W, C = operand.shape
    _, Hs, Ws = v0.shape
    F_pad, aux, starts, ok, (Hp, Wp, Kt) = _prepare(operand, v0, dv, u0, du, cfg)

    def kernel_branch(F_pad, aux, starts, operand, v0, dv, u0, du):
        outs = _launch(
            F_pad, aux, starts, cfg, B=B, H=H, W=W, C=C, Hs=Hs, Ws=Ws,
            Kt=Kt, grads=grads, interpret=interpret,
        )
        outs = [
            _tile_unorder(o, Hp, Wp, cfg.th, cfg.tw)[:, :, :Hs, :Ws].reshape(
                B, C, Hs * Ws
            )
            for o in outs
        ]
        return tuple(outs)

    def xla_branch(F_pad, aux, starts, operand, v0, dv, u0, du):
        return tuple(_xla_fallback(operand, v0, dv, u0, du, grads))

    outs = jax.lax.cond(
        ok, kernel_branch, xla_branch, F_pad, aux, starts, operand, v0, dv,
        u0, du,
    )
    return outs if grads else outs[0]


@functools.lru_cache(maxsize=None)
def _tiles_partitioned(grads, interpret, cfg):
    """Batch-partitionable wrapper (mesh data-parallel), reusing
    gather.py's custom_partitioning scheme.  The in-band check runs
    per-shard inside the partitioned impl, so one shard can take the
    kernel branch while another falls back — each is locally correct."""
    from .gather import _batch_partitioned

    def impl(operand, v0, dv, u0, du):
        return _gather_tiles_impl(
            operand, v0, dv, u0, du, grads=grads, interpret=interpret, cfg=cfg
        )

    n_out = 3 if grads else 1
    rule = "b h w c, b i j, b i j, b i j, b i j -> " + ", ".join(
        ["b c n"] * n_out
    )
    return _batch_partitioned(impl, rule, ("h", "w", "c", "i", "j", "n"))


@functools.partial(jax.jit, static_argnames=("interpret", "cfg"))
def gather_tiles(operand, v0, dv, u0, du, *, interpret=False, cfg=None):
    """Bilinear sample via band-limited two-hot MXU contractions.

    :param operand: [B, H, W, C] f32 channels-last feature image
    :param v0, u0: [B, Hs, Ws] int32 corner starts, pre-clamped to
        [0, H-2] / [0, W-2] (``_corner_weights`` contract)
    :param dv, du: [B, Hs, Ws] f32 fractional weights in [0, 1]
    :param cfg: optional :class:`TileConfig` override
    :return: [B, C, Hs*Ws] f32, raster sample order (bit-compatible
        layout with the XLA gather path)
    """
    if cfg is None:
        B, H, W, C = operand.shape
        cfg = default_tile_config("eval", H, W, C, v0.shape[1], v0.shape[2])
        if cfg is None:
            raise ValueError(
                f"no tile config for operand {operand.shape} samples"
                f" {v0.shape}; pass cfg explicitly to force"
            )
    return _tiles_partitioned(False, interpret, cfg)(operand, v0, dv, u0, du)


@functools.partial(jax.jit, static_argnames=("interpret", "cfg"))
def gather_tiles_grads(operand, v0, dv, u0, du, *, interpret=False, cfg=None):
    """Training forward: blend + within-cell derivative maps (gx, gy),
    each [B, C, Hs*Ws] — same contract as gather.py::gather_twohot_grads
    but band-limited (see module docstring)."""
    if cfg is None:
        B, H, W, C = operand.shape
        cfg = default_tile_config("grads", H, W, C, v0.shape[1], v0.shape[2])
        if cfg is None:
            raise ValueError(
                f"no tile config for operand {operand.shape} samples"
                f" {v0.shape}; pass cfg explicitly to force"
            )
    return _tiles_partitioned(True, interpret, cfg)(operand, v0, dv, u0, du)
