"""TPU gradient-parity: loss+grads of one train step, kernels on vs off."""
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

def run(flag):
    os.environ["DPFT_PALLAS_GATHER"] = flag
    f = jax.jit(jax.value_and_grad(loss_fn))
    l, g = f(params)
    return float(l), jax.tree_util.tree_map(np.asarray, g)

l0, g0 = run("0")
l1, g1 = run("auto")
print("loss:", l0, l1, "d:", abs(l0-l1), flush=True)
leaves0 = jax.tree_util.tree_leaves(g0); leaves1 = jax.tree_util.tree_leaves(g1)
rel = max(float(np.abs(a-b).max() / (np.abs(a).max() + 1e-12)) for a, b in zip(leaves0, leaves1))
print("max rel grad diff:", rel, flush=True)
assert abs(l0-l1) < 1e-4 * max(abs(l0), 1e-3), (l0, l1)
assert rel < 5e-3, rel
print("PARITY OK", flush=True)
