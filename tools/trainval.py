#!/usr/bin/env python
"""Train the coarse registration model on ScanNet-GSReg (or synthetic data).

reference: experiments/geotransformer.gaussian_splatting.indoor/trainval.py:15-64
and the epoch loop at geotransformer/engine/epoch_based_trainer.py:82-181.

Single-host multi-chip data parallelism comes from the device mesh (the
batch axis is sharded); multi-host runs initialize jax.distributed and feed
per-process batch slices.

Usage:
    python tools/trainval.py --data_root /path/to/ScanNet-GSReg \
        --output_dir output [--resume] [--synthetic]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--output_dir", default="output/gaussreg_tpu")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--init_from", default=None,
        help="checkpoint to warm-start params from (fresh optimizer); "
        "ignored when --resume finds a snapshot",
    )
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None, help="global pairs per step (default: one per device)")
    parser.add_argument("--log_steps", type=int, default=10)
    parser.add_argument("--val_pairs", type=int, default=64)
    parser.add_argument(
        "--val_subset", default="test",
        help="dataset split evaluated each epoch when --data_root is given "
        "(ScanNet-GSReg ships train/test; reference validates on test)",
    )
    parser.add_argument(
        "--synthetic", action="store_true",
        help="train on synthetic pairs (no dataset required; smoke/bench)",
    )
    parser.add_argument("--synthetic_pairs", type=int, default=256)
    parser.add_argument("--distributed", action="store_true", help="multi-host: call jax.distributed.initialize()")
    parser.add_argument(
        "--coordinator", default=None,
        help="host:port for jax.distributed when cluster auto-detection is "
        "unavailable (pass with --num_processes/--process_id; the "
        "2-process CPU smoke test drives this path)",
    )
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument(
        "--tiny", action="store_true",
        help="tiny capacities — CPU smoke run of the full CLI path",
    )
    parser.add_argument("--lr", type=float, default=None, help="override cfg.optim.lr")
    parser.add_argument(
        "--capacity_factor", type=float, default=None,
        help="scale pyramid level capacities (full model dims; CPU/mid runs)",
    )
    parser.add_argument(
        "--scheduler", default=None, choices=["step", "cosine"],
        help="override cfg.optim.scheduler",
    )
    parser.add_argument(
        "--hard_fraction", type=float, default=0.0,
        help="fraction of the synthetic training pool drawn from the hard "
        "tier (overlap 0.3-0.65, full scale aug) — round-5 hard-tier "
        "failure diagnosis showed the committed checkpoint's inlier ratio "
        "collapses to ~0.12 there (easy-tier-only training)",
    )
    args = parser.parse_args()

    import jax

    if args.distributed:
        if args.coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            jax.distributed.initialize()

    from gaussreg_tpu.config import make_cfg
    from gaussreg_tpu.data.pipeline import augment_pair_pose, make_pair_batch
    from gaussreg_tpu.data.synthetic import random_pair
    from gaussreg_tpu.engine.checkpoint import (
        load_checkpoint,
        load_metadata,
        save_checkpoint,
    )
    from gaussreg_tpu.engine.summary import (
        ScalarWriter,
        SummaryBoard,
        Timer,
        format_metrics,
        get_logger,
    )
    from gaussreg_tpu.engine.trainer import (
        TrainState,
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )
    from gaussreg_tpu.models.registration import create_model
    from gaussreg_tpu.parallel.mesh import make_mesh, shard_batch_pytree

    cfg = make_cfg()
    if args.tiny:
        from gaussreg_tpu.config import make_tiny_cfg

        cfg = make_tiny_cfg()
    if args.capacity_factor is not None:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            capacity=cfg.capacity.scaled(args.capacity_factor),
            train=dataclasses.replace(
                cfg.train,
                point_limit=max(64, int(cfg.train.point_limit * args.capacity_factor)),
            ),
        )
    if args.lr is not None or args.scheduler is not None:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            optim=dataclasses.replace(
                cfg.optim,
                lr=args.lr if args.lr is not None else cfg.optim.lr,
                scheduler=args.scheduler or cfg.optim.scheduler,
                warmup_steps=(
                    500 if (args.scheduler == "cosine") else cfg.optim.warmup_steps
                ),
            ),
        )
    if args.max_epoch is not None:
        # keep the cosine schedule length in sync with the actual run length
        import dataclasses

        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, max_epoch=args.max_epoch)
        )
    max_epoch = args.max_epoch or cfg.optim.max_epoch
    os.makedirs(args.output_dir, exist_ok=True)
    logger = get_logger(os.path.join(args.output_dir, "train.log") if jax.process_index() == 0 else None)

    devices = jax.devices()
    world = len(devices)
    batch_size = args.batch_size or world
    assert batch_size % world == 0
    logger.info(f"devices={world} global_batch={batch_size}")

    mesh = make_mesh(devices)
    model = create_model(cfg)

    # data source
    val_dataset = None
    if args.synthetic or args.data_root is None:
        logger.info("training on synthetic pairs")

        # FIXED scene pool, shuffled per epoch — matching the reference's
        # epoch semantics (1379 fixed scenes revisited 40x). Fresh scenes
        # every epoch plateaus: an infinite never-repeated stream is a much
        # harder optimization at these step counts (measured: PIR stuck at
        # 0.04 after 1.3k steps fresh vs 1.0 overfitting one pair).
        pool = np.random.default_rng(cfg.seed).integers(
            0, 2**31, size=args.synthetic_pairs
        )

        def pair_iter(epoch):
            rng = np.random.default_rng(cfg.seed + epoch)
            order = rng.permutation(args.synthetic_pairs)
            for i in range(args.synthetic_pairs // batch_size):
                seeds = pool[order[i * batch_size : (i + 1) * batch_size]]
                # yield seeds: build_batch replays the deterministic pair
                # (and its pyramid) from the on-disk batch cache
                yield [int(s) for s in seeds]

        steps_per_epoch = args.synthetic_pairs // batch_size
    else:
        from gaussreg_tpu.data.scannet import ScanNetGSRegDataset

        dataset = ScanNetGSRegDataset(
            args.data_root,
            "train",
            point_limit=cfg.train.point_limit,
            use_augmentation=cfg.train.use_augmentation,
            augmentation_noise=cfg.train.augmentation_noise,
            augmentation_rotation=cfg.train.augmentation_rotation,
            seed=cfg.seed + jax.process_index(),
        )
        steps_per_epoch = len(dataset) // batch_size
        logger.info(f"ScanNet-GSReg train: {len(dataset)} pairs")

        def pair_iter(epoch):
            rng = np.random.default_rng(cfg.seed + epoch)
            order = rng.permutation(len(dataset))
            for i in range(steps_per_epoch):
                items = [dataset[int(j)] for j in order[i * batch_size : (i + 1) * batch_size]]
                yield [
                    (d["ref_points"], d["ref_feats"], d["src_points"], d["src_feats"], d["transform"])
                    for d in items
                ]

        # real held-out split for per-epoch validation (reference
        # epoch_based_trainer.py:134-166 runs the val loader every epoch)
        try:
            val_dataset = ScanNetGSRegDataset(
                args.data_root,
                args.val_subset,
                point_limit=cfg.train.point_limit,
                use_augmentation=False,
                seed=cfg.seed,
            )
            logger.info(
                f"ScanNet-GSReg {args.val_subset} (validation): "
                f"{len(val_dataset)} pairs"
            )
        except FileNotFoundError as e:
            logger.info(f"no {args.val_subset} split found ({e}); "
                        "validating on synthetic pairs")

    tx = make_optimizer(cfg, steps_per_epoch, world_size=world)
    rp, rf, sp, sf, m = random_pair(cfg, 0)
    example = make_pair_batch(cfg, rp, rf, sp, sf, m)
    state = create_train_state(cfg, model, example, jax.random.PRNGKey(cfg.seed), tx)

    start_epoch = 0
    snapshot = os.path.join(args.output_dir, "snapshot.msgpack")
    if args.resume and os.path.exists(snapshot):
        params, opt_state = load_checkpoint(snapshot, state.params, state.opt_state)
        meta = load_metadata(args.output_dir, "snapshot")
        start_epoch = int(meta.get("epoch", 0))
        state = TrainState(
            params, opt_state, np.int32(meta.get("step", 0)), np.int32(0)
        )
        logger.info(f"resumed from {snapshot} at epoch {start_epoch}")
    elif args.init_from:
        # warm start: params only (fresh optimizer/schedule) — e.g. continue
        # a previous campaign's checkpoint on a new DATA_VERSION
        params = load_checkpoint(args.init_from, state.params, None)
        state = state._replace(params=params)
        logger.info(f"initialized params from {args.init_from}")

    train_step = make_train_step(model, cfg, tx, mesh=mesh)
    eval_step = make_eval_step(model, cfg)
    writer = ScalarWriter(os.path.join(args.output_dir, "events"))
    key = jax.random.PRNGKey(cfg.seed + 1)

    # ---- per-seed batch cache (synthetic path) ----
    # The synthetic pool is fixed and random_pair(cfg, seed) is
    # deterministic, so the on-device pyramid build (~3.5 s/pair — 13 grid
    # radius searches) produces the identical PairBatch every epoch. Build
    # each scene once, persist to disk, and replay from the prefetch thread
    # (host IO only — keeps the chip free for the train step).
    from gaussreg_tpu.data.synthetic import DATA_VERSION

    batch_treedef = jax.tree_util.tree_structure(example)
    cache_tag = "-".join(
        map(str, tuple(cfg.capacity.levels) + tuple(cfg.capacity.neighbor_limits))
    ) + (
        f"-{cfg.train.point_limit}-w{cfg.capacity.window_rows0}"
        f"-h{'_'.join(map(str, cfg.capacity.neighbor_limits))}-v{DATA_VERSION}"
    )
    cache_dir = os.path.join(args.output_dir, "batch_cache", cache_tag)

    def _tier_of(seed):
        # deterministic per-seed tier split: low hash bucket -> hard
        return (
            "hard"
            if (int(seed) * 2654435761 % 1000) < args.hard_fraction * 1000
            else "easy"
        )

    def cached_pair_batch(seed):
        tier = _tier_of(seed)
        path = os.path.join(
            cache_dir, f"{seed}h.npz" if tier == "hard" else f"{seed}.npz"
        )
        if os.path.exists(path):
            try:
                with np.load(path) as f:
                    leaves = [f[f"arr_{i}"] for i in range(len(f.files))]
                leaves = [
                    a.astype(np.int32) if a.dtype == np.int16 else a
                    for a in leaves
                ]
                return jax.tree_util.tree_unflatten(batch_treedef, leaves)
            except Exception as e:  # corrupt/partial write: rebuild
                logger.info(f"batch cache read failed ({path}): {e}")
        pb = make_pair_batch(cfg, *random_pair(cfg, int(seed), tier=tier))
        leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(pb)]
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}.npz"
        np.savez(
            tmp,
            *[
                a.astype(np.int16)
                if a.dtype == np.int32 and a.size and 0 <= a.min() and a.max() <= 32767
                else a
                for a in leaves
            ],
        )
        os.replace(tmp, path)
        return pb

    aug_rng = np.random.default_rng(cfg.seed + 17)

    def build_batch(raw_pairs):
        # fresh per-epoch rigid pose augmentation of cached pairs: rigid
        # maps preserve all pyramid neighbor lists (data/pipeline.py:
        # augment_pair_pose) — cached batches would otherwise repeat the
        # same poses all run (the reference re-augments per epoch,
        # dataset.py:170-212)
        batches = [
            augment_pair_pose(cached_pair_batch(p), aug_rng)
            if isinstance(p, (int, np.integer))
            else make_pair_batch(cfg, *p)
            for p in raw_pairs
        ]
        batch = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
        return shard_batch_pytree(batch, mesh)

    def prefetched(gen, depth=2):
        """Host-side pipeline: scene generation + padding costs ~0.27 s per
        pair (measured) — overlap it with the device step via a worker
        thread (the reference gets this from DataLoader worker processes,
        utils/torch.py:48-77)."""
        import queue
        import threading

        q = queue.Queue(maxsize=depth)
        sentinel = object()

        def worker():
            try:
                for item in gen:
                    q.put(build_batch(item))
            finally:
                q.put(sentinel)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is sentinel:
                return
            yield item

    step_count = int(state.step)
    for epoch in range(start_epoch, max_epoch):
        board = SummaryBoard(last_n=args.log_steps)
        timer = Timer()
        timer.tic("prepare")
        for it, batch in enumerate(prefetched(pair_iter(epoch))):
            key, sub = jax.random.split(key)
            keys = shard_batch_pytree(jax.random.split(sub, batch_size), mesh)
            timer.toc("prepare")
            timer.tic("process")
            state, metrics = train_step(state, batch, keys)
            # ONE host round trip for all metrics: per-scalar float() costs
            # ~23 ms RTT each through the tunnel (161 ms/step measured)
            metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            timer.toc("process")
            board.update_from_dict(metrics)
            step_count += 1
            if (it + 1) % args.log_steps == 0:
                logger.info(
                    f"epoch {epoch} it {it + 1}/{steps_per_epoch}: "
                    f"{format_metrics(board.smoothed_summary())}, "
                    f"prep {timer.mean('prepare'):.3f}s proc {timer.mean('process'):.3f}s"
                )
                writer.write("train", board.smoothed_summary(), step_count)
            timer.tic("prepare")

        # validation: the dataset's held-out split when available, else a
        # synthetic holdout
        val_board = SummaryBoard()
        if val_dataset is not None:
            n_val = min(args.val_pairs, len(val_dataset))
            for i in range(n_val):
                d = val_dataset[i]
                vb = make_pair_batch(
                    cfg, d["ref_points"], d["ref_feats"],
                    d["src_points"], d["src_feats"], d["transform"],
                )
                _, vm = eval_step(state.params, vb, jax.random.PRNGKey(i))
                val_board.update_from_dict({k: float(v) for k, v in vm.items()})
        else:
            for i in range(min(args.val_pairs, 16)):
                vb = cached_pair_batch(10_000_000 + i)
                _, vm = eval_step(state.params, vb, jax.random.PRNGKey(i))
                val_board.update_from_dict({k: float(v) for k, v in vm.items()})
        logger.info(f"epoch {epoch} val: {format_metrics(val_board.summary())}")
        writer.write("val", val_board.summary(), step_count)

        save_checkpoint(
            args.output_dir, f"epoch-{epoch}", state.params,
            metadata={"epoch": epoch + 1, "step": step_count},
        )
        save_checkpoint(
            args.output_dir, "snapshot", state.params, state.opt_state,
            metadata={"epoch": epoch + 1, "step": step_count},
        )
        logger.info(f"epoch {epoch} checkpointed")

    writer.close()


if __name__ == "__main__":
    main()
