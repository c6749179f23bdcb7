"""Golden-value regression: frozen forward outputs of four presets.

Guards the numerics across refactors (sampler rewrites, solver loop
restructuring, layout changes must stay value-preserving).  Regenerate
``golden_forward.npz`` ONLY for an intentional numerics change, with the
generator block documented in git history (seed 42 inputs / PRNGKey 7
init, B=2, 32x40, CPU f32).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_prob_feature_track_tpu.models.presets import get_preset
from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_forward.npz")


@pytest.fixture(scope="module")
def golden_inputs():
    rng = np.random.RandomState(42)
    B, H, W = 2, 32, 40
    return (
        jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32)),
        jnp.asarray(rng.rand(B, 3, H, W).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32)),
        jnp.asarray(np.tile([[26.0, 26.0, 19.5, 15.5]], (B, 1)).astype(np.float32)),
    )


@pytest.mark.parametrize("preset", ["feature", "RGB", "ICP", "feature_icp"])
def test_forward_matches_golden(golden_inputs, preset):
    golden = np.load(GOLDEN)
    net = LeastSquareTracking(cfg=get_preset(preset))
    v = net.init(jax.random.PRNGKey(7), *golden_inputs, train=False)
    R, t = net.apply(v, *golden_inputs, train=False)
    np.testing.assert_allclose(
        np.asarray(R), golden[f"{preset}_R"], atol=2e-5,
        err_msg=f"{preset}: rotation drifted from golden",
    )
    np.testing.assert_allclose(
        np.asarray(t), golden[f"{preset}_t"], atol=2e-5,
        err_msg=f"{preset}: translation drifted from golden",
    )
