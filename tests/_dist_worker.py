"""Worker process for tests/test_distributed.py.

Run as ``python tests/_dist_worker.py <pid> <nproc> <port>``.  Each process
owns 4 virtual CPU devices; jax.distributed assembles the 8-device global
mesh.  The worker feeds ONLY its local half of the deterministic global
batch through ``shard_batch`` (the multi-process
``make_array_from_process_local_data`` path) and prints the per-step
losses, which tests/test_distributed.py compares against a single-process
run of the identical global batch.
"""

import json
import os
import sys


def synth_batch(B=8, H=32, W=40):
    """Deterministic synthetic global batch (same in worker and test)."""
    import numpy as np

    rng = np.random.RandomState(0)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, :3, 3] = rng.randn(B, 3).astype(np.float32) * 0.01
    return {
        "color0": rng.rand(B, 3, H, W).astype(np.float32),
        "color1": rng.rand(B, 3, H, W).astype(np.float32),
        "depth0": rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
        "depth1": rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32),
        "calib": np.tile([[35.0, 35.0, 19.875, 15.875]], (B, 1)).astype(np.float32),
        "transform": T,
        "pad_mask": np.ones((B,), bool),
    }


def run_steps(mesh, batch, n_steps=2, B=8):
    """Shared model/step construction (identical in worker and test)."""
    from deep_prob_feature_track_tpu.models.presets import get_preset
    from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking
    from deep_prob_feature_track_tpu.parallel.mesh import shard_batch
    from deep_prob_feature_track_tpu.training.train import (
        TrainConfig,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    import jax

    net = LeastSquareTracking(cfg=get_preset("feature"))
    tcfg = TrainConfig(batch_size=B)
    opt = make_optimizer(tcfg, steps_per_epoch=10)
    state = create_train_state(net, opt, batch, seed=1)
    # host numpy leaves: multi-host jit can replicate numpy inputs, but NOT
    # reshard arrays committed to one process's local device
    state = jax.device_get(state)
    step = make_train_step(net, tcfg, opt, mesh=mesh, donate=False)
    sb = shard_batch(mesh, batch)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, sb)
        losses.append(float(metrics["loss"]))
    return losses


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import numpy as np

    from deep_prob_feature_track_tpu.parallel.mesh import make_mesh

    B = 8
    batch = synth_batch(B=B)
    lb = B // nproc
    local = {
        k: v[pid * lb : (pid + 1) * lb]
        if isinstance(v, np.ndarray) and v.ndim >= 1
        else v
        for k, v in batch.items()
    }
    mesh = make_mesh()  # all 8 global devices
    losses = run_steps(mesh, local, B=B)
    print("DIST_RESULT " + json.dumps({"pid": pid, "losses": losses}), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
