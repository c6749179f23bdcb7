"""Drive recipe: end-to-end check that DPFT_BF16_RESIDUALS=1 leaves the
tracker usable — coarse-to-fine U_IC solve on a synthetic textured-plane
pair, then a full training gradient through the feature preset facade."""

import os

os.environ["DPFT_BF16_RESIDUALS"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import jax.numpy as jnp
import numpy as np

from deep_prob_feature_track_tpu.geometry import lie, warp
from deep_prob_feature_track_tpu.ops.image import image_pyramid
from deep_prob_feature_track_tpu.solvers import trust_region as tr

rng = np.random.RandomState(0)
B, H, W = 1, 120, 160
yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
tex = (
    np.sin(xx * 0.31) * np.cos(yy * 0.23)
    + 0.5 * np.sin(xx * 0.071 + yy * 0.113)
    + 0.1 * rng.randn(H, W)
).astype(np.float32)
img0 = jnp.asarray(tex)[None, None]
invD = jnp.full((B, 1, H, W), 0.5, jnp.float32)
K = jnp.asarray([[160.0, 120.0, 80.0, 60.0]])

ang = np.deg2rad(0.5)
R = jnp.asarray(
    [
        [
            [np.cos(ang), -np.sin(ang), 0.0],
            [np.sin(ang), np.cos(ang), 0.0],
            [0.0, 0.0, 1.0],
        ]
    ],
    jnp.float32,
)
t = jnp.asarray([[0.02, 0.01, 0.015]], jnp.float32)
u, v, _ = warp.batch_warp_inverse_depth(
    *warp.generate_xy_grid(B, H, W, K), invD, (R, t), K
)
# img1(x) = img0(W(x)) means the scene CONTENT moved by W^-1, so the
# solver's template->live estimate is inverse(R, t).
img1 = warp.warp_features(img0, u, v)
R, t = lie.inverse(R, t)

pyr0 = image_pyramid(img0)
pyr1 = image_pyramid(img1)
pyrD = image_pyramid(invD)

pose = (jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), jnp.zeros((B, 3)))
for lv in (3, 2, 1, 0):
    Kl = K / (2.0**lv)
    pose = tr.tr_uic_level(
        pose,
        pyr0[lv],
        pyr1[lv],
        pyrD[lv],
        pyrD[lv],
        Kl,
        jnp.ones_like(pyr0[lv]),
        jnp.ones_like(pyr1[lv]),
        max_iter=30,
    )[0]

R_e, t_e = pose
dR = np.asarray(R_e[0] @ R[0].T)
ang_err = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
t_err = float(np.linalg.norm(np.asarray(t_e[0] - t[0])))
print(f"solve: ang_err={ang_err:.4f} deg  t_err={t_err * 1000:.3f} mm")
assert ang_err < 0.05 and t_err < 1e-3, "two-view solve diverged under bf16 flag"

# Full training step through the facade (feature preset) with the flag on.
from deep_prob_feature_track_tpu.models.presets import get_preset
from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking
from deep_prob_feature_track_tpu.training.train import (
    TrainConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
)

rngb = np.random.RandomState(1)
Bt, Ht, Wt = 2, 32, 40
Kt = np.tile([[0.6 * Wt, 0.6 * Wt, (Wt - 1) / 2.0, (Ht - 1) / 2.0]], (Bt, 1))
T = np.tile(np.eye(4, dtype=np.float32), (Bt, 1, 1))
T[:, :3, 3] = rngb.randn(Bt, 3) * 0.01
batch = {
    "color0": rngb.rand(Bt, 3, Ht, Wt).astype(np.float32),
    "color1": rngb.rand(Bt, 3, Ht, Wt).astype(np.float32),
    "depth0": rngb.uniform(0.5, 3.0, (Bt, 1, Ht, Wt)).astype(np.float32),
    "depth1": rngb.uniform(0.5, 3.0, (Bt, 1, Ht, Wt)).astype(np.float32),
    "calib": Kt.astype(np.float32),
    "transform": T,
    "pad_mask": np.ones((Bt,), bool),
}
net = LeastSquareTracking(cfg=get_preset("feature"))
tcfg = TrainConfig(lr=3e-4)
opt = make_optimizer(tcfg, steps_per_epoch=10)
state = create_train_state(net, opt, batch)
step = make_train_step(net, tcfg, opt)
state, metrics = step(state, batch)
loss = float(metrics["loss"])
gnorm = float(metrics["grad_norm"])
print(f"train step under bf16 flag: loss={loss:.5f} grad_norm={gnorm:.4f}")
assert np.isfinite(loss) and np.isfinite(gnorm) and gnorm > 0
print("OK")
