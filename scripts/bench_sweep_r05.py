"""Round-5 resolution/batch sweep -> committed artifact (VERDICT r4 weak #2).

The PERF.md grid was last refreshed in round 2; this re-measures the
full eval+train resolution/batch grid in one session with the current
dispatch (tile-slab kernels, sigma-slim, scan_remat+bf16+accum train
recipe) and writes BENCH_SWEEP_r05.json.  Also retries the VGA B=16
EVAL point that failed to compile in round 3 (never retried since).

VGA train points live in BENCH_VGA_r05.json (scripts/bench_vga.py,
engagement-asserted); this sweep covers the level-0/B axis plus the VGA
eval column so the two artifacts compose into the full grid.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DPFT_TRAIN_LOOP", "scan_remat")  # VGA-capable loop; level-0 unrolled numbers live in BENCH_TRAIN_r05
os.environ.setdefault("DPFT_BF16_RESIDUALS", "1")

ROWS = []
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_SWEEP_r05.json")


def report(**kw):
    ROWS.append(kw)
    print(json.dumps(kw), flush=True)
    with open(OUT, "w") as f:
        json.dump({"rows": ROWS, "date": "2026-08-20",
                   "note": "round-5 within-session sweep refresh "
                   "(supersedes the round-2 grid in docs/PERF.md); VGA "
                   "train points in BENCH_VGA_r05.json"}, f, indent=1)


def main():
    from bench import preflight_tpu

    preflight_tpu()
    from bench import BASELINE_FPS, _setup_cache, measure_eval
    from bench_train import BASELINE_TRAIN_FPS, measure_train

    _setup_cache()

    eval_grid = [
        (8, 120, 160, 10, 30),
        (64, 120, 160, 10, 30),
        (256, 120, 160, 10, 30),
        (8, 480, 640, 4, 12),
        (16, 480, 640, 4, 12),  # round-3 compile-fail, retried here
    ]
    for B, H, W, lo, hi in eval_grid:
        try:
            fps = measure_eval(B, H, W, lo=lo, hi=hi)
            report(metric=f"eval_fps_{H}x{W}_b{B}", value=round(fps, 2),
                   unit="frames/s",
                   vs_baseline=(round(fps / BASELINE_FPS, 2)
                                if (H, W, B) == (120, 160, 8) else None))
        except Exception as e:  # noqa: BLE001
            report(metric=f"eval_fps_{H}x{W}_b{B}", ok=False,
                   err=str(e)[:300])

    train_grid = [
        (64, 120, 160, 2, 6, 1),
        (8, 120, 160, 2, 6, 1),
        (256, 120, 160, 2, 6, 1),
    ]
    for B, H, W, lo, hi, accum in train_grid:
        try:
            fps = measure_train(B, H, W, lo=lo, hi=hi, accum=accum)
            report(metric=f"train_fps_{H}x{W}_b{B}", value=round(fps, 2),
                   unit="frames/s", accum_steps=accum,
                   vs_baseline=(round(fps / BASELINE_TRAIN_FPS, 2)
                                if (H, W, B) == (120, 160, 64) else None))
        except Exception as e:  # noqa: BLE001
            report(metric=f"train_fps_{H}x{W}_b{B}", ok=False,
                   accum_steps=accum, err=str(e)[:300])

    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
