"""TPU gradient-parity: loss+grads of one train step, kernels on vs off.

The Pallas kernels are 'high'- rather than f32-exact (~5e-5 per op), and
the train forward backprops through 12 GN solves at an untrained init —
a measurably chaotic regime (see CLAUDE.md round-3 notes and the
trajectory test's tolerance design, tests/test_torch_parity.py:605).  A
fixed tolerance is therefore meaningless here; instead the script
calibrates the chaos envelope by re-running the XLA arm with a 1e-6
relative parameter perturbation and requires the kernel arm to deviate
by no more than 4x that self-divergence (plus a small floor for the
kernels' own rounding).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from deep_prob_feature_track_tpu.models.presets import get_preset
from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking

B, H, W = 8, 120, 160
rng = np.random.RandomState(0)
img0 = rng.rand(B,3,H,W).astype(np.float32); img1 = rng.rand(B,3,H,W).astype(np.float32)
d0 = rng.uniform(0.5,3.0,(B,1,H,W)).astype(np.float32); d1 = rng.uniform(0.5,3.0,(B,1,H,W)).astype(np.float32)
K = np.tile([[525.0*W/640,525.0*H/480,(W-0.5)/2,(H-0.5)/2]],(B,1)).astype(np.float32)
Rg = np.tile(np.eye(3, dtype=np.float32), (B,1,1)); tg = np.zeros((B,3), np.float32)

net = LeastSquareTracking(cfg=get_preset("feature"))
args = (img0, img1, d0, d1, K)
variables = net.init(jax.random.PRNGKey(0), *map(np.asarray, args), train=True)
params = variables["params"]
rest = {k: v for k, v in variables.items() if k != "params"}

def loss_fn(p):
    (R, t), _ = net.apply(
        {"params": p, **rest}, *args, train=True, mutable=["batch_stats"]
    )
    # train mode stacks per-level poses: R [B,L,3,3], t [B,L,3]
    return jnp.abs(R - Rg[:, None]).mean() + jnp.abs(t - tg[:, None]).mean()

def run(flag, p):
    os.environ["DPFT_PALLAS_GATHER"] = flag
    f = jax.jit(jax.value_and_grad(loss_fn))
    l, g = f(p)
    return float(l), np.concatenate(
        [np.asarray(a).ravel() for a in jax.tree_util.tree_leaves(g)]
    )

params_pert = jax.tree_util.tree_map(lambda a: a * (1.0 + 1e-6), params)

l0, g0 = run("0", params)
lp, gp = run("0", params_pert)  # self-divergence envelope (same program)
l1, g1 = run("auto", params)
env_l = abs(l0 - lp)
env_g = float(np.abs(g0 - gp).max())
d_l = abs(l0 - l1)
d_g = float(np.abs(g0 - g1).max())
print(f"loss: xla={l0} pallas={l1} d={d_l:.3e} envelope={env_l:.3e}", flush=True)
print(f"grad maxdiff: {d_g:.3e} envelope={env_g:.3e} scale={np.abs(g0).max():.3e}", flush=True)
assert d_l < max(4 * env_l, 1e-3 * abs(l0)), (d_l, env_l)
assert d_g < max(4 * env_g, 1e-2 * np.abs(g0).max()), (d_g, env_g)
print("PARITY OK (within self-calibrated chaos envelope)", flush=True)
