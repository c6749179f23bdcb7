"""Pallas kernel tests (interpret mode on CPU; real lowering runs in bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

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
