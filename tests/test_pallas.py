"""Pallas kernel tests (interpret mode on CPU; real lowering runs in bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deep_prob_feature_track_tpu.geometry import warp
from deep_prob_feature_track_tpu.ops.pallas.gather import (
    gather_twohot,
    gather_twohot_grads,
    splat_twohot,
    supported,
)
from deep_prob_feature_track_tpu.ops.pallas.jtj import fused_jtj_jtr
from deep_prob_feature_track_tpu.solvers.jacobians import FactoredJtJ, jtj_jtr


@pytest.mark.parametrize("hw,tile", [(64, 32), (100, 32), (48, 64)])
def test_fused_jtj_matches_reference(rng, hw, tile):
    B, C = 2, 8
    alpha = rng.randn(B, C, hw).astype(np.float32)
    beta = rng.randn(B, C, hw).astype(np.float32)
    res = rng.randn(B, C, hw).astype(np.float32)
    u = rng.randn(B, hw, 6).astype(np.float32)
    v = rng.randn(B, hw, 6).astype(np.float32)

    jtj, jtr = fused_jtj_jtr(
        jnp.asarray(alpha), jnp.asarray(beta), jnp.asarray(res),
        jnp.asarray(u), jnp.asarray(v), sign=-1.0, tile=tile, interpret=True,
    )

    H = 1
    fac = FactoredJtJ(
        alpha=jnp.asarray(alpha.reshape(B, C, H, hw)),
        beta=jnp.asarray(beta.reshape(B, C, H, hw)),
        u=jnp.asarray(u),
        v=jnp.asarray(v),
        sign=-1.0,
    )
    jtj_ref, jtr_ref = jtj_jtr(fac, jnp.asarray(res.reshape(B, C, H, hw)))
    np.testing.assert_allclose(np.asarray(jtj), np.asarray(jtj_ref), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jtr), np.asarray(jtr_ref), rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("B,H,W,C,N", [(2, 24, 32, 10, 24 * 32), (1, 16, 20, 1, 77)])
def test_twohot_gather_matches_xla_path(rng, B, H, W, C, N):
    """The two-hot MXU eval kernel must reproduce the exact XLA gather
    blend to 'high'-matmul accuracy (the bf16 hi/lo split drops ~2^-17
    relative; docs/PERF.md measured 4.8e-5 at the level-0 train shape)."""
    operand = rng.randn(B, H, W, C).astype(np.float32)
    # coordinates beyond the borders exercise the clamped corner starts
    u = rng.uniform(-3, W + 2, (B, N)).astype(np.float32)
    v = rng.uniform(-3, H + 2, (B, N)).astype(np.float32)

    starts, du, dv, _, _ = warp._corner_weights(
        operand.shape, jnp.asarray(u), jnp.asarray(v)
    )
    ref = warp._blend(
        warp._gather_corners(jnp.asarray(operand), starts), du, dv
    )
    out = gather_twohot(
        jnp.asarray(operand.reshape(B, H, W * C)),
        starts[..., 0], dv[:, 0, :], starts[..., 1], du[:, 0, :],
        H=H, W=W, C=C, interpret=True,
    )
    scale = np.abs(operand).max()
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4 * scale
    )


@pytest.mark.parametrize("B,H,W,C,N", [(2, 24, 32, 10, 24 * 32), (1, 16, 20, 1, 77)])
def test_twohot_grads_matches_corner_blends(rng, B, H, W, C, N):
    """The training-forward kernel's (out, gx, gy) must match the blend and
    the corner-difference derivative maps of the XLA path."""
    operand = rng.randn(B, H, W, C).astype(np.float32)
    u = rng.uniform(-3, W + 2, (B, N)).astype(np.float32)
    v = rng.uniform(-3, H + 2, (B, N)).astype(np.float32)

    starts, du, dv, _, _ = warp._corner_weights(
        operand.shape, jnp.asarray(u), jnp.asarray(v)
    )
    corners = warp._gather_corners(jnp.asarray(operand), starts)
    ref_out = warp._blend(corners, du, dv)
    ref_gx = (corners[:, 0, 1] - corners[:, 0, 0]) * (1 - dv) + (
        corners[:, 1, 1] - corners[:, 1, 0]
    ) * dv
    ref_gy = (corners[:, 1, 0] - corners[:, 0, 0]) * (1 - du) + (
        corners[:, 1, 1] - corners[:, 0, 1]
    ) * du

    out, gx, gy = gather_twohot_grads(
        jnp.asarray(operand.reshape(B, H, W * C)),
        starts[..., 0], dv[:, 0, :], starts[..., 1], du[:, 0, :],
        H=H, W=W, C=C, interpret=True,
    )
    scale = np.abs(operand).max()
    for got, ref in ((out, ref_out), (gx, ref_gx), (gy, ref_gy)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4 * scale
        )


@pytest.mark.parametrize("B,H,W,C,N", [(2, 24, 32, 10, 24 * 32), (1, 16, 20, 1, 77)])
def test_pallas_splat_matches_xla_splat(rng, B, H, W, C, N):
    """The VMEM-resident splat must match the XLA two-hot splat (the
    operand cotangent of the bilinear gather) to 'high'-matmul accuracy."""
    u = rng.uniform(-3, W + 2, (B, N)).astype(np.float32)
    v = rng.uniform(-3, H + 2, (B, N)).astype(np.float32)
    g = rng.randn(B, C, N).astype(np.float32)

    starts, du, dv, _, _ = warp._corner_weights(
        (B, H, W, C), jnp.asarray(u), jnp.asarray(v)
    )
    ref = warp._splat_twohot((B, H, W, C), starts, du, dv, jnp.asarray(g))
    out = splat_twohot(
        jnp.asarray(np.swapaxes(g, 1, 2)),
        starts[..., 0], dv[:, 0, :], starts[..., 1], du[:, 0, :],
        H=H, W=W, C=C, interpret=True,
    )
    # each output cell accumulates O(N/HW) samples; scale tolerance by that
    scale = np.abs(g).max() * max(1.0, N / (H * W)) * 4
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4 * scale
    )


def test_twohot_gather_dispatch_is_off_on_cpu(monkeypatch):
    """On CPU (tests) the eval primal must keep the exact XLA gather; the
    kernel only engages on TPU backends or under DPFT_PALLAS_GATHER=1."""
    monkeypatch.delenv("DPFT_PALLAS_GATHER", raising=False)
    for kind in ("eval", "train", "splat"):
        assert not warp._twohot_enabled((2, 24, 32, 10), jnp.float32, kind)
    monkeypatch.setenv("DPFT_PALLAS_GATHER", "1")
    assert warp._twohot_enabled((2, 24, 32, 10), jnp.float32, "eval")
    # per-site override beats the master flag
    monkeypatch.setenv("DPFT_PALLAS_GATHER_SPLAT", "0")
    assert not warp._twohot_enabled((2, 24, 32, 10), jnp.float32, "splat")
    assert warp._twohot_enabled((2, 24, 32, 10), jnp.float32, "train")
    # unsupported shapes stay on the XLA path even when forced
    assert not warp._twohot_enabled((2, 1, 32, 10), jnp.float32, "eval")
    assert not warp._twohot_enabled((2, 24, 32, 10), jnp.bfloat16, "eval")


def test_full_vjp_dispatch_through_interpreter(rng, monkeypatch):
    """DPFT_PALLAS_INTERPRET=1 routes all three dispatch sites (eval
    primal, train forward, splat) through the Pallas interpreter on CPU;
    value and gradients must match the pure XLA path."""
    import jax

    B, H, W, C, N = 2, 24, 32, 6, 300
    operand = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    u = jnp.asarray(rng.uniform(-2, W + 1, (B, N)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-2, H + 1, (B, N)).astype(np.float32))
    g = jnp.asarray(rng.randn(B, C, N).astype(np.float32))

    def loss(op, uu, vv):
        return jnp.sum(warp._bilinear_gather_cl(op, uu, vv) * g)

    def run():
        val = warp._bilinear_gather_cl(operand, u, v)
        grads = jax.grad(loss, argnums=(0, 1, 2))(operand, u, v)
        return [np.asarray(x) for x in (val, *grads)]

    monkeypatch.setenv("DPFT_PALLAS_GATHER", "0")
    ref = run()
    monkeypatch.setenv("DPFT_PALLAS_GATHER", "auto")
    monkeypatch.setenv("DPFT_PALLAS_INTERPRET", "1")
    got = run()
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, atol=4e-4 * max(np.abs(b).max(), 1.0))


def test_kernels_partition_over_batch_mesh(rng, monkeypatch):
    """custom_partitioning: all three kernels must run under a jit'ed
    multi-device mesh with batch-sharded operands (per-shard pallas
    launch on the local batch slice), match the pure XLA path, and keep
    the output batch-sharded rather than replicated."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    B, H, W, C, N = 8, 16, 20, 6, 300
    operand = rng.randn(B, H, W, C).astype(np.float32)
    u = rng.uniform(-2, W + 1, (B, N)).astype(np.float32)
    v = rng.uniform(-2, H + 1, (B, N)).astype(np.float32)
    g = jnp.asarray(rng.randn(B, C, N).astype(np.float32))

    def loss(op, uu, vv):
        return jnp.sum(warp._bilinear_gather_cl(op, uu, vv) * g)

    def value_and_grads(op, uu, vv):
        val = warp._bilinear_gather_cl(op, uu, vv)
        grads = jax.grad(loss, argnums=(0, 1, 2))(op, uu, vv)
        return (val, *grads)

    monkeypatch.setenv("DPFT_PALLAS_GATHER", "0")
    ref = [np.asarray(x) for x in jax.jit(value_and_grads)(operand, u, v)]

    # interpret mode forces the dispatch on (CPU); the mesh exercises the
    # custom_partitioning rules exactly as a real TPU mesh would
    monkeypatch.setenv("DPFT_PALLAS_GATHER", "auto")
    monkeypatch.setenv("DPFT_PALLAS_INTERPRET", "1")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("dp",))
    batch = lambda x: jax.device_put(
        x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
    )
    got = jax.jit(value_and_grads)(batch(operand), batch(u), batch(v))
    assert got[0].sharding.spec[0] == "dp", got[0].sharding
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), b, atol=4e-4 * max(np.abs(b).max(), 1.0)
        )


def test_twohot_supported_guards():
    assert supported((4, 120, 160, 10), jnp.float32)
    assert not supported((4, 480, 640, 10), jnp.float32)  # VMEM plane cap
    assert not supported((4, 120, 160, 10), jnp.float64)
