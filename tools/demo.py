#!/usr/bin/env python
"""Register two arbitrary GS models and write the estimated transform.

reference: experiments/geotransformer.gaussian_splatting.indoor/demo.py:21-183.

Usage:
    python tools/demo.py --ref A/point_cloud.ply --src B/point_cloud.ply \
        --weights snapshots/snapshot.msgpack --output_dir demo_outputs [--fine]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref", required=True, help="reference GS .ply")
    parser.add_argument("--src", required=True, help="source GS .ply")
    parser.add_argument("--weights", default=None, help="model checkpoint (.msgpack)")
    parser.add_argument(
        "--torch_snapshot", default=None,
        help="reference .pth.tar checkpoint (released weights), converted "
        "via engine/torch_import",
    )
    parser.add_argument("--output_dir", default="demo_outputs")
    parser.add_argument("--point_limit", type=int, default=30000)
    parser.add_argument("--fine", action="store_true", help="render-and-compare refinement")
    parser.add_argument("--fine_steps", type=int, default=100)
    parser.add_argument(
        "--cameras_json", default=None,
        help="3DGS cameras.json with real viewpoints for --fine "
        "(default: auto-detected next to --ref)",
    )
    args = parser.parse_args()

    import jax

    from gaussreg_tpu.api import register_gs_pair
    from gaussreg_tpu.config import make_cfg
    from gaussreg_tpu.data.pipeline import make_pair_batch
    from gaussreg_tpu.data.synthetic import random_pair
    from gaussreg_tpu.engine.checkpoint import load_checkpoint
    from gaussreg_tpu.models.registration import create_model

    cfg = make_cfg()
    model = create_model(cfg)
    rp, rf, sp, sf, m = random_pair(cfg, 0, num_points=2000)
    example = make_pair_batch(cfg, rp, rf, sp, sf, m)
    init = jax.jit(
        lambda k, b: model.init(
            {"params": k, "sample": k, "ransac": k}, b, train=False,
            with_transform=False,
        )
    )
    params = init(jax.random.PRNGKey(0), example)
    if args.weights:
        params = load_checkpoint(args.weights, params)
    if args.torch_snapshot:
        from gaussreg_tpu.engine.torch_import import load_for_inference

        cfg, model, params, report = load_for_inference(
            args.torch_snapshot, cfg, model, params
        )
        print(
            f"torch import: {report['converted']} tensors, "
            f"per_layer_geometry={report['per_layer_kernel_geometry']}"
        )

    result = register_gs_pair(
        args.ref,
        args.src,
        params,
        cfg,
        point_limit=args.point_limit,
        fine=args.fine,
        fine_steps=args.fine_steps,
        cameras_json=args.cameras_json,
    )

    from gaussreg_tpu.api import write_demo_outputs

    paths = write_demo_outputs(args.output_dir, result)
    print(f"estimated transform (src -> ref):\n{result['transform']}")
    print(f"RANSAC inliers: {result['ransac_inliers']}")
    for p in paths:
        print(f"saved {p}")


if __name__ == "__main__":
    main()
