"""Convert a reference PyTorch checkpoint to this framework's format.

Usage::

    python -m deep_prob_feature_track_tpu.apps.import_checkpoint \
        --torch_checkpoint checkpoint_epoch29.pth.tar \
        --preset feature --output feature_epoch29.msgpack
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Import a reference torch checkpoint")
    p.add_argument("--torch_checkpoint", required=True)
    p.add_argument("--preset", default="feature")
    p.add_argument("--output", required=True)
    p.add_argument(
        "--strict", action="store_true",
        help="fail if any checkpoint key could not be mapped",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models.import_torch import load_torch_checkpoint, merge_into_variables
    from ..models.presets import get_preset
    from ..models.tracker import LeastSquareTracking
    from ..training.checkpoints import save_variables

    converted = load_torch_checkpoint(args.torch_checkpoint)
    if converted["unmapped"]:
        msg = f"[import] {len(converted['unmapped'])} unmapped keys: " + ", ".join(
            sorted(converted["unmapped"])[:10]
        )
        if args.strict:
            raise SystemExit(msg)
        print(msg)

    net = LeastSquareTracking(cfg=get_preset(args.preset))
    rng = np.random.RandomState(0)
    B, H, W = 1, 32, 40
    ex = (
        jnp.asarray(rng.rand(B, 3, H, W), jnp.float32),
        jnp.asarray(rng.rand(B, 3, H, W), jnp.float32),
        jnp.asarray(rng.rand(B, 1, H, W) + 0.5, jnp.float32),
        jnp.asarray(rng.rand(B, 1, H, W) + 0.5, jnp.float32),
        jnp.asarray([[26.0, 26.0, 19.5, 15.5]], jnp.float32),
    )
    variables = net.init(jax.random.PRNGKey(0), *ex, train=False)
    merged = merge_into_variables(variables, converted)
    save_variables(args.output, {k: merged[k] for k in ("params", "batch_stats") if k in merged})
    print(f"[import] wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
