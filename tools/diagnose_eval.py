#!/usr/bin/env python
"""Stage-by-stage diagnosis of the eval path on one pair.

Loads a checkpoint, runs the full forward (proposals -> Sinkhorn -> LGR ->
RANSAC) and prints, per stage, the quantity that must be healthy for the next
stage to work:
  - coarse: proposal PIR (GT-overlapping fraction of proposed node pairs)
  - fine:   GT-inlier ratio of the extracted dense correspondences
  - LGR:    RRE/RTE/RSE of the LGR transform vs GT
  - RANSAC: RRE/RTE/RSE of the final estimated transform, inlier count

This localizes "val RR = 0" to features vs matching vs estimation
(reference's Evaluator reports the same chain: experiments/.../loss.py:94-151).

Usage: python tools/diagnose_eval.py --ckpt output/x/epoch-6.msgpack [--seed N] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--seed", type=int, default=10_000_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gaussreg_tpu.config import make_cfg, make_tiny_cfg
    from gaussreg_tpu.data.pipeline import make_pair_batch
    from gaussreg_tpu.data.synthetic import random_pair
    from gaussreg_tpu.engine.checkpoint import load_checkpoint
    from gaussreg_tpu.models.metrics import (
        isotropic_transform_error,
        relative_scale_error,
    )
    from gaussreg_tpu.models.registration import create_model
    from gaussreg_tpu.ops.transforms import apply_transform

    cfg = make_tiny_cfg() if args.tiny else make_cfg()
    model = create_model(cfg)
    pb = make_pair_batch(cfg, *random_pair(cfg, args.seed))

    init = model.init(
        {
            "params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1),
            "ransac": jax.random.PRNGKey(2),
        },
        pb,
        train=False,
        with_transform=False,
    )
    params = load_checkpoint(args.ckpt, init)

    out = model.apply(
        params,
        pb,
        train=False,
        with_transform=True,
        with_gt_overlaps=True,
        rngs={"ransac": jax.random.PRNGKey(3)},
    )
    out = jax.device_get(out)
    gt = np.asarray(pb.transform)

    # ---- coarse stage ----
    overlaps = out["gt_node_overlaps"]
    gt_map = overlaps > cfg.eval.acceptance_overlap
    ri, si, v = (
        out["ref_node_corr_indices"],
        out["src_node_corr_indices"],
        out["node_corr_valid"],
    )
    pir = (gt_map[ri, si] & v).sum() / max(v.sum(), 1)
    print(f"[coarse] proposals={int(v.sum())} PIR={pir:.3f}")

    # ---- fine stage: dense correspondences from LGR extraction ----
    rc, sc, cv = out["ref_corr_points"], out["src_corr_points"], out["corr_valid"]
    sc_t = np.asarray(apply_transform(jnp.asarray(sc), jnp.asarray(gt)))
    resid = np.linalg.norm(rc - sc_t, axis=-1)
    n = max(int(cv.sum()), 1)
    ir = float(((resid < cfg.eval.acceptance_radius) & cv).sum()) / n
    print(
        f"[fine]   corrs={int(cv.sum())}/{cv.shape[0]} "
        f"IR@{cfg.eval.acceptance_radius}={ir:.3f} "
        f"median_resid={np.median(resid[cv]) if cv.any() else np.nan:.3f}"
    )

    # ---- matching_scores health: dustbin mass ----
    ms = out["matching_scores"]  # (P,K+1,K+1) log plan
    plan = np.exp(ms)
    rmask = out["ref_node_corr_knn_masks"]
    dust = plan[:, :-1, -1]  # ref points -> dustbin
    print(
        f"[sinkhorn] mean P(ref point -> dustbin) over valid = "
        f"{float(dust[rmask].mean()):.3f}"
    )

    def err(name, est):
        rre, rte_rel, rse = (
            float(x)
            for x in isotropic_transform_error(
                jnp.asarray(gt), jnp.asarray(est)
            )
        )
        # absolute translation error too (synthetic t_gt can be ~0)
        import numpy.linalg as la

        sg = float(np.cbrt(abs(np.linalg.det(gt[:3, :3]))))
        se = float(np.cbrt(abs(np.linalg.det(np.asarray(est)[:3, :3]))))
        rte_abs = float(la.norm(gt[:3, 3] - np.asarray(est)[:3, 3]))
        print(
            f"[{name}] RRE={rre:.2f}deg RTEabs={rte_abs:.3f} "
            f"scale gt={sg:.3f} est={se:.3f} RSE={rse:.3f}"
        )

    err("LGR   ", out["lgr_transform"])
    err("RANSAC", out["estimated_transform"])
    print(f"[ransac] inliers={float(out['ransac_inliers']):.0f}")


if __name__ == "__main__":
    main()
