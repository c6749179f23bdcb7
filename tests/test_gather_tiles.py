"""Tile-slab gather kernel (ops/pallas/gather_tiles.py) parity tests.

Run in pallas interpret mode on the CPU backend; the TPU microbench lives
in scripts/probe_tiles.py.  Parity target is the XLA fused-gather path
(geometry/warp.py::_gather_corners + _blend), which is itself bit-parity
tested against torch grid_sample.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_prob_feature_track_tpu.ops.pallas.gather_tiles import (
    TileConfig,
    _prepare,
    _xla_fallback,
    default_tile_config,
    gather_tiles,
    gather_tiles_grads,
)

# Cp=8 -> q=16: the u-start quantization slack is up to 15 columns, so
# the band must absorb tile span (8) + 2*disp + 15
CFG = TileConfig(th=8, tw=8, band_v=32, band_u=32, inner=2, Cp=8)


def make_coords(rng, B, H, W, Hs, Ws, disp=3.0):
    """Smooth small-displacement sample coordinates (tracking-like)."""
    yy, xx = np.meshgrid(np.arange(Hs), np.arange(Ws), indexing="ij")
    sy = H / Hs
    sx = W / Ws
    u = xx[None] * sx + disp * np.sin(yy[None] / 7.0 + rng.rand(B, 1, 1) * 3)
    v = yy[None] * sy + disp * np.cos(xx[None] / 9.0 + rng.rand(B, 1, 1) * 3)
    uf = np.clip(u, 0.0, W - 1.0)
    vf = np.clip(v, 0.0, H - 1.0)
    u0 = np.minimum(np.floor(uf), W - 2).astype(np.int32)
    v0 = np.minimum(np.floor(vf), H - 2).astype(np.int32)
    du = (uf - u0).astype(np.float32)
    dv = (vf - v0).astype(np.float32)
    return (
        jnp.asarray(v0),
        jnp.asarray(dv),
        jnp.asarray(u0),
        jnp.asarray(du),
    )


@pytest.fixture
def data(rng):
    B, H, W, C = 2, 40, 48, 5
    operand = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    coords = make_coords(rng, B, H, W, H, W)
    return operand, coords


def test_inband_check_true_on_smooth_coords(data):
    operand, (v0, dv, u0, du) = data
    *_, ok, _ = _prepare(operand, v0, dv, u0, du, CFG)
    assert bool(ok)


def test_eval_parity_kernel_branch(data):
    operand, (v0, dv, u0, du) = data
    out = gather_tiles(operand, v0, dv, u0, du, interpret=True, cfg=CFG)
    ref = _xla_fallback(operand, v0, dv, u0, du, False)[0]
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4 * scale
    )


def test_grads_parity_kernel_branch(data):
    operand, (v0, dv, u0, du) = data
    out, gx, gy = gather_tiles_grads(
        operand, v0, dv, u0, du, interpret=True, cfg=CFG
    )
    ref, rgx, rgy = _xla_fallback(operand, v0, dv, u0, du, True)
    scale = float(jnp.max(jnp.abs(ref)))
    for a, b in ((out, ref), (gx, rgx), (gy, rgy)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=4e-4 * scale
        )


def test_wild_coords_fall_back_exactly(rng, data):
    """A single out-of-band tile must flip the whole call to the XLA
    branch — results then match the fallback bitwise."""
    operand, (v0, dv, u0, du) = data
    B, H, W, C = operand.shape
    v0 = v0.at[0, 3, 4].set(H - 2)  # teleport one sample across the image
    *_, ok, _ = _prepare(operand, v0, dv, u0, du, CFG)
    assert not bool(ok)
    out = gather_tiles(operand, v0, dv, u0, du, interpret=True, cfg=CFG)
    ref = _xla_fallback(operand, v0, dv, u0, du, False)[0]
    # same formula, but jit-vs-eager fusion differences legitimately flip
    # last ulps (CLAUDE.md round-3 note) — tight f32 tolerance, far below
    # the kernel branch's ~1e-4 'high'-precision error
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-6
    )


def test_border_clamped_coords(rng):
    """Samples clamped to the image border (the warp's border padding
    semantics) stay in-band and exact."""
    B, H, W, C = 1, 32, 40, 3
    operand = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    v0, dv, u0, du = make_coords(rng, B, H, W, H, W, disp=9.0)
    out = gather_tiles(operand, v0, dv, u0, du, interpret=True, cfg=CFG)
    ref = _xla_fallback(operand, v0, dv, u0, du, False)[0]
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4 * scale
    )


def test_nonsquare_sample_grid(rng):
    """Hs/Ws not multiples of the tile size exercise the edge padding."""
    B, H, W, C = 1, 40, 48, 4
    Hs, Ws = 27, 35
    operand = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    v0, dv, u0, du = make_coords(rng, B, H, W, Hs, Ws)
    out = gather_tiles(operand, v0, dv, u0, du, interpret=True, cfg=CFG)
    assert out.shape == (B, C, Hs * Ws)
    ref = _xla_fallback(operand, v0, dv, u0, du, False)[0]
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4 * scale
    )


def test_vjp_dispatch_through_warp(rng, monkeypatch):
    """With the full-plane kernels off, a big-enough spatial warp routes
    through the tile kernel (interpret mode) for both the eval primal
    and the training forward; values and gradients must match XLA."""
    from deep_prob_feature_track_tpu.geometry import warp

    B, H, W, C = 2, 72, 96, 5
    operand = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    u = jnp.asarray(
        (xx[None, None] + 2.5 * np.sin(yy[None, None] / 9.0)).astype(np.float32)
    ).repeat(B, 0)
    v = jnp.asarray(
        (yy[None, None] + 2.5 * np.cos(xx[None, None] / 7.0)).astype(np.float32)
    ).repeat(B, 0)
    g = jnp.asarray(rng.randn(B, C, H * W).astype(np.float32))

    def loss(op, uu, vv):
        return jnp.sum(warp._bilinear_gather_cl(op, uu, vv) * g)

    def run():
        val = warp._bilinear_gather_cl(operand, u, v)
        grads = jax.grad(loss, argnums=(0, 1, 2))(operand, u, v)
        return [np.asarray(x) for x in (val, *grads)]

    monkeypatch.setenv("DPFT_PALLAS_GATHER", "0")
    monkeypatch.setenv("DPFT_PALLAS_TILES", "0")
    ref = run()
    assert warp._sample_hw(u) == (H, W)
    # TILES=1 (forced): GATHER=0 keeps the full-plane kernel out of the
    # dispatch order, and since round 4 it also gates the tile family in
    # auto mode (see test_gather_kill_switch_gates_tiles)
    monkeypatch.setenv("DPFT_PALLAS_TILES", "1")
    monkeypatch.setenv("DPFT_PALLAS_INTERPRET", "1")
    assert warp._tiles_enabled((B, H, W, C), (H, W), jnp.float32, "eval")
    got = run()
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, atol=6e-4 * max(np.abs(b).max(), 1.0))


def test_tiles_partition_over_batch_mesh(rng, monkeypatch):
    """custom_partitioning: the tile kernel runs under a batch-sharded
    mesh (per-shard launch + per-shard in-band cond) and matches XLA."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from deep_prob_feature_track_tpu.geometry import warp

    B, H, W, C = 4, 72, 96, 5
    operand = rng.randn(B, H, W, C).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    u = np.repeat(
        (xx[None, None] + 2.0 * np.sin(yy[None, None] / 9.0)).astype(np.float32),
        B, 0,
    )
    v = np.repeat(
        (yy[None, None] + 2.0 * np.cos(xx[None, None] / 7.0)).astype(np.float32),
        B, 0,
    )

    def fn(op, uu, vv):
        return warp._bilinear_gather_cl(op, uu, vv)

    monkeypatch.setenv("DPFT_PALLAS_GATHER", "0")
    monkeypatch.setenv("DPFT_PALLAS_TILES", "0")
    ref = np.asarray(jax.jit(fn)(operand, u, v))

    monkeypatch.setenv("DPFT_PALLAS_TILES", "1")
    monkeypatch.setenv("DPFT_PALLAS_INTERPRET", "1")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("dp",))
    batch = lambda x: jax.device_put(
        x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
    )
    got = jax.jit(fn)(batch(operand), batch(u), batch(v))
    assert got.sharding.spec[0] == "dp", got.sharding
    np.testing.assert_allclose(
        np.asarray(got), ref, atol=6e-4 * float(np.abs(ref).max())
    )


def test_default_config_gating():
    # VGA slimmed-sigma train operand (C=10, Cp=16): supported
    assert default_tile_config("grads", 480, 640, 10, 480, 640) is not None
    # Cp=32 grads lose to the XLA gather at every measured shape
    # (TILES_r04.json: C=17 89.9 vs 67.2 ms VGA, 38.1 vs 32.5 level-0)
    assert default_tile_config("grads", 480, 640, 17, 480, 640) is None
    # ...while the 3-matmul eval body still wins at Cp=32 (48.2 vs 71.2)
    assert default_tile_config("eval", 480, 640, 17, 480, 640) is not None
    # tiny pyramid level: not worth a tiled launch
    assert default_tile_config("eval", 15, 20, 17, 15, 20) is None


def test_edge_reach_gate_covers_last_row():
    """Round-3 advisor: the quantized start grid must let the band COVER
    index H-1 / W-1 (start + band >= size), not merely reach H-2 — at
    shapes with (H - band_v) % 8 == 1 every bottom-edge tile would
    otherwise permanently trip the fallback while the kernel stays
    auto-enabled."""
    # (481-64)%8 = 1: max start 416, 416+64 = 480 < 481 -> reject
    assert default_tile_config("eval", 481, 640, 17, 481, 640) is None
    # 480 % 8 == 0: band covers row 479 exactly -> accept
    cfg = default_tile_config("eval", 480, 640, 17, 480, 640)
    assert cfg is not None
    assert ((480 - cfg.band_v) // 8) * 8 + cfg.band_v >= 480


def test_gather_kill_switch_gates_tiles(monkeypatch):
    """DPFT_PALLAS_GATHER=0 (the 'use the XLA paths' switch H-sharded
    spatial runs set) must gate the tile family too in auto mode — its
    batch-only custom_partitioning would re-gather a spatially-sharded
    feature plane (VERDICT round-3 weak #3).  An explicit
    DPFT_PALLAS_TILES=1 still forces the kernel on."""
    from deep_prob_feature_track_tpu.geometry import warp

    shape, hw = (2, 72, 96, 5), (72, 96)
    monkeypatch.setenv("DPFT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DPFT_PALLAS_TILES", "auto")
    monkeypatch.delenv("DPFT_PALLAS_GATHER", raising=False)
    assert warp._tiles_enabled(shape, hw, jnp.float32, "eval")
    monkeypatch.setenv("DPFT_PALLAS_GATHER", "0")
    assert not warp._tiles_enabled(shape, hw, jnp.float32, "eval")
    assert not warp._tiles_enabled(shape, hw, jnp.float32, "grads")
    # per-site variants gate their matching tile site
    monkeypatch.delenv("DPFT_PALLAS_GATHER", raising=False)
    monkeypatch.setenv("DPFT_PALLAS_GATHER_TRAIN", "0")
    assert not warp._tiles_enabled(shape, hw, jnp.float32, "grads")
    assert warp._tiles_enabled(shape, hw, jnp.float32, "eval")
    # explicit force wins over the kill-switch
    monkeypatch.setenv("DPFT_PALLAS_GATHER", "0")
    monkeypatch.setenv("DPFT_PALLAS_TILES", "1")
    assert warp._tiles_enabled(shape, hw, jnp.float32, "grads")


@pytest.fixture
def shipping_data(rng):
    """A fixture sized for the SHIPPING default config (16/16/64/64):
    72x96 satisfies the band-reach quantization for C=5 (Cp=8, q=16)."""
    B, H, W, C = 2, 72, 96, 5
    assert default_tile_config("eval", H, W, C, H, W) == TileConfig(
        16, 16, 64, 64, 8, 8
    )
    operand = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    coords = make_coords(rng, B, H, W, H, W)
    return operand, coords


def test_shipping_config_eval_parity(shipping_data):
    """VERDICT round-3 item 5: the default TileConfig TPU users actually
    get must pass the interpret-mode parity tests, not just the bespoke
    tiny CFG (cfg=None routes through default_tile_config)."""
    operand, (v0, dv, u0, du) = shipping_data
    out = gather_tiles(operand, v0, dv, u0, du, interpret=True, cfg=None)
    ref = _xla_fallback(operand, v0, dv, u0, du, False)[0]
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4 * scale
    )


def test_shipping_config_grads_parity(shipping_data):
    operand, (v0, dv, u0, du) = shipping_data
    out, gx, gy = gather_tiles_grads(
        operand, v0, dv, u0, du, interpret=True, cfg=None
    )
    ref, rgx, rgy = _xla_fallback(operand, v0, dv, u0, du, True)
    scale = float(jnp.max(jnp.abs(ref)))
    for a, b in ((out, ref), (gx, rgx), (gy, rgy)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=4e-4 * scale
        )
