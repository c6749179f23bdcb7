"""VGA B>=8 train throughput with the round-4 recipe that unlocked it:
scan_remat + bf16 residuals + sigma-slim + tile grads + ENCODER REMAT.

Round-2 measured DPFT_REMAT_ENCODER=1 as ~free but useless at VGA (the
level-0 warp/solver buffers dominated); after sigma-slim + the tile
kernel those shrank enough that the encoder activations became the
binding constraint — rematting them is what lets B=8 compile
(scripts/bisect_vga_b8.py).  Appends rows to BENCH_VGA_r04.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DPFT_TRAIN_LOOP", "scan_remat")
os.environ.setdefault("DPFT_BF16_RESIDUALS", "1")
os.environ["DPFT_REMAT_ENCODER"] = "1"


def main():
    from bench import preflight_tpu

    preflight_tpu()
    from bench_train import _setup_cache, measure_train

    _setup_cache()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_VGA_r04.json",
    )
    with open(path) as f:
        doc = json.load(f)

    for B in (8, 16):
        try:
            fps = measure_train(B, 480, 640)
            row = {
                "metric": f"train_step_fps_feature_preset_480x640_b{B}",
                "value": round(fps, 2), "unit": "frames/s", "tiles": "auto",
                "scan_remat": True, "bf16_residuals": True,
                "remat_encoder": True,
            }
        except Exception as e:  # noqa: BLE001
            row = {"metric": f"train_step_480x640_b{B}", "ok": False,
                   "tiles": "auto", "remat_encoder": True,
                   "err": str(e)[:300]}
        doc["rows"].append(row)
        print(json.dumps(row), flush=True)
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
    print(f"updated {path}", flush=True)


if __name__ == "__main__":
    main()
