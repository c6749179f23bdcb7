"""Pallas kernel tests (interpret mode on CPU; real lowering runs in bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deep_prob_feature_track_tpu.geometry import warp
from deep_prob_feature_track_tpu.ops.pallas.gather import gather_twohot, supported
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


def test_twohot_gather_dispatch_is_off_on_cpu(monkeypatch):
    """On CPU (tests) the eval primal must keep the exact XLA gather; the
    kernel only engages on TPU backends or under DPFT_PALLAS_GATHER=1."""
    monkeypatch.delenv("DPFT_PALLAS_GATHER", raising=False)
    assert not warp._twohot_eval_enabled((2, 24, 32, 10), jnp.float32)
    monkeypatch.setenv("DPFT_PALLAS_GATHER", "1")
    assert warp._twohot_eval_enabled((2, 24, 32, 10), jnp.float32)
    # unsupported shapes stay on the XLA path even when forced
    assert not warp._twohot_eval_enabled((2, 1, 32, 10), jnp.float32)
    assert not warp._twohot_eval_enabled((2, 24, 32, 10), jnp.bfloat16)


def test_twohot_supported_guards():
    assert supported((4, 120, 160, 10), jnp.float32)
    assert not supported((4, 480, 640, 10), jnp.float32)  # VMEM plane cap
    assert not supported((4, 120, 160, 10), jnp.float64)
