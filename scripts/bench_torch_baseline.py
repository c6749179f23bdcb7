"""Re-measure the reference PyTorch baselines on this host's CPU.

VERDICT round-3 weak #7: the committed 2.99 fps train baseline predates
the round-3 loss-semantics alignment, so ``vs_baseline`` in the train
artifacts compared numbers with different loss definitions.  This script
re-measures BOTH baselines with the reference's own full semantics:

- eval: no_grad forward, B=8 120x160, feature-preset config
  (scripts/eval_tum_rgbd.sh flags);
- train: forward + EPE3D*1e2 loss with the global depth-min/max invalid
  mask (ref train.py:129-168) + backward + clip(5.0) + Adam(wd=4e-4)
  (ref train.py:189-192, train_utils.py:52-55), B=8 120x160.

Same methodology as BENCH_BASELINE.json: torch.set_num_threads(8), slope
timing between two iteration counts.  Appends a re-measure block to
BENCH_BASELINE.json.  CPU-only (torch); run with nothing else active.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np
import torch

from torch_ref import install_reference, reference_options


def main():
    torch.set_num_threads(8)
    install_reference()
    import models.LeastSquareTracking as ref_track
    import models.criterions as ref_crit

    B, H, W = 8, 120, 160
    rng = np.random.RandomState(0)
    c0 = torch.from_numpy(rng.rand(B, 3, H, W).astype(np.float32))
    c1 = torch.from_numpy(rng.rand(B, 3, H, W).astype(np.float32))
    d0 = torch.from_numpy(rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32))
    d1 = torch.from_numpy(rng.uniform(0.5, 3.0, (B, 1, H, W)).astype(np.float32))
    K = torch.from_numpy(
        np.tile(
            [[525.0 * W / 640, 525.0 * H / 480, (W - 0.5) / 2, (H - 0.5) / 2]],
            (B, 1),
        ).astype(np.float32)
    )
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, :3, 3] = rng.randn(B, 3).astype(np.float32) * 0.01
    Tt = torch.from_numpy(T)

    torch.manual_seed(11)
    net = ref_track.LeastSquareTracking(
        encoder_name="ConvRGBD2", uncertainty_type="laplacian",
        mEst_type="None", solver_type="Direct-Nodamping",
        max_iter_per_pyr=3, direction="inverse",
        options=reference_options(init_pose="sfm_net"),
    )

    def slope(fn, lo, hi):
        fn()  # warmup
        t0 = time.perf_counter()
        for _ in range(lo):
            fn()
        t1 = time.perf_counter()
        for _ in range(hi):
            fn()
        t2 = time.perf_counter()
        t_lo, t_hi = t1 - t0, t2 - t1
        assert t_hi > 1.5 * t_lo, (t_lo, t_hi)
        return (t_hi - t_lo) / float(hi - lo)

    net.eval()

    def eval_step():
        with torch.no_grad():
            net(c0, c1, d0, d1, K)

    eval_dt = slope(eval_step, 2, 6)

    net.train()
    optim = torch.optim.Adam(net.parameters(), lr=5e-4, weight_decay=4e-4)
    invalid = (d0 == d0.min()) | (d0 == d0.max())

    def train_step():
        optim.zero_grad()
        Rs, ts = net(c0, c1, d0, d1, K)
        loss = (
            ref_crit.compute_RT_EPE_loss(
                Rs, ts, Tt[:, :3, :3], Tt[:, :3, 3], d0, K, invalid=invalid
            ).mean()
            * 1e2
        )
        loss.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), 5.0)
        optim.step()

    train_dt = slope(train_step, 2, 6)

    result = {
        "date": "2026-08-20",
        "eval_frames_per_s": round(B / eval_dt, 3),
        "eval_ms_per_batch": round(eval_dt * 1e3, 1),
        "train_frames_per_s": round(B / train_dt, 3),
        "train_ms_per_batch": round(train_dt * 1e3, 1),
        "notes": "round-4 re-measure with the reference's FULL train-loss "
        "semantics (EPE3D*1e2 + global depth-min/max invalid mask, ref "
        "train.py:129-168) so vs_baseline in BENCH_TRAIN_* artifacts "
        "compares identical loss definitions on both sides",
    }
    print(json.dumps(result), flush=True)

    path = os.path.join(REPO, "BENCH_BASELINE.json")
    with open(path) as f:
        base = json.load(f)
    base["remeasure_r05"] = result
    with open(path, "w") as f:
        json.dump(base, f, indent=2)
    print(f"updated {path}", flush=True)


if __name__ == "__main__":
    main()
