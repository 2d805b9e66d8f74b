#!/usr/bin/env python
"""Fuse two GS models given an estimated transform (reference gs_fusion.py:264-278).

Usage:
    python tools/fuse.py --root_path scene_dir \
        --transform_path demo_outputs/estimated_transform.npz
    # or explicit paths:
    python tools/fuse.py --input1 A.ply --input2 B.ply \
        --transform_path t.npz --output fused.ply
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Fusion script parameters")
    parser.add_argument("--root_path", type=str, default=None)
    parser.add_argument(
        "--transform_path", type=str, default="demo_outputs/estimated_transform.npz"
    )
    parser.add_argument("--input1", type=str, default=None)
    parser.add_argument("--input2", type=str, default=None)
    parser.add_argument("--output", type=str, default=None)
    args, _ = parser.parse_known_args()

    from gaussreg_tpu.gs.fusion import gaussian_fuse

    if args.root_path:
        root = args.root_path
        input1 = os.path.join(
            root, "A/output/point_cloud/iteration_30000/point_cloud.ply"
        )
        input2 = os.path.join(
            root, "B/output/point_cloud/iteration_30000/point_cloud.ply"
        )
        out_dir = os.path.join(root, "fuse/output/point_cloud/iteration_30000")
        os.makedirs(out_dir, exist_ok=True)
        for name in ("cameras.json", "cfg_args"):
            src = os.path.join(root, "A/output", name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(root, "fuse/output", name))
        output = os.path.join(out_dir, "point_cloud.ply")
    else:
        input1, input2, output = args.input1, args.input2, args.output
        assert input1 and input2 and output, "--input1/--input2/--output required"

    gaussian_fuse(input1, input2, args.transform_path, output)
    print(f"fused model written to {output}")


if __name__ == "__main__":
    main()
