"""Training engine: optimizer, jitted train/eval steps, data-parallel
sharding.

reference: geotransformer/engine/base_trainer.py:33-255 and
epoch_based_trainer.py:82-181 — rebuilt as a functional JAX engine: one
jitted `train_step(state, batch, keys)` containing forward, loss, backward,
the (XLA-inserted) gradient all-reduce, the NaN/Inf-grad guard and the
optimizer update. The batch's leading axis is sharded over the mesh's data
axis; parameters and optimizer state are replicated.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from gaussreg_tpu.config import Config
from gaussreg_tpu.data.pipeline import PairBatch
from gaussreg_tpu.models.losses import overall_loss
from gaussreg_tpu.models.metrics import evaluate_registration
from gaussreg_tpu.models.registration import GaussRegModel
from gaussreg_tpu.parallel.mesh import DATA_AXIS


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # () int32
    skipped: jnp.ndarray  # () int32 — updates skipped due to non-finite grads


def make_optimizer(cfg: Config, steps_per_epoch: int, world_size: int = 1):
    """Adam + LR schedule + L2 weight decay, lr scaled by world size
    (reference trainval.py:32-35, base_trainer.py:189-194, config.py:67-74).

    Schedules: per-epoch exponential step decay (the experiment default) or
    warmup-cosine (reference utils/torch.py:154-178: linear eta_init -> 1
    over warmup_steps, then cosine 1 -> eta_min over the rest)."""
    peak = cfg.optim.lr * world_size
    if cfg.optim.scheduler == "cosine":
        total = max(1, steps_per_epoch * cfg.optim.max_epoch)
        warmup = min(cfg.optim.warmup_steps, total - 1)

        def schedule(step):
            warm = peak * (
                cfg.optim.eta_init
                + (1.0 - cfg.optim.eta_init) * step / jnp.maximum(warmup, 1)
            )
            t = jnp.clip((step - warmup) / jnp.maximum(total - warmup, 1), 0.0, 1.0)
            cos = peak * (
                cfg.optim.eta_min
                + 0.5 * (1.0 - cfg.optim.eta_min) * (1.0 + jnp.cos(jnp.pi * t))
            )
            return jnp.where(step < warmup, warm, cos)

    else:
        schedule = optax.exponential_decay(
            init_value=peak,
            transition_steps=max(1, steps_per_epoch * cfg.optim.lr_decay_steps),
            decay_rate=cfg.optim.lr_decay,
            staircase=True,
        )
    tx = optax.chain(
        optax.add_decayed_weights(cfg.optim.weight_decay),
        optax.adam(schedule),
    )
    if cfg.optim.grad_acc_steps > 1:
        tx = optax.MultiSteps(tx, cfg.optim.grad_acc_steps)
    return tx


def create_train_state(
    cfg: Config, model: GaussRegModel, example_batch: PairBatch, key, tx
) -> TrainState:
    init = jax.jit(
        lambda k, b: model.init(
            {
                "params": k,
                "sample": jax.random.fold_in(k, 1),
                "ransac": jax.random.fold_in(k, 2),
            },
            b,
            train=False,
            with_transform=False,
        )
    )
    params = init(key, example_batch)
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))


def _coarse_precision(cfg: Config, out) -> jnp.ndarray:
    """Fraction of proposed node correspondences that are GT-overlapping
    (reference loss.py:102-120 evaluate_coarse)."""
    overlaps = out["gt_node_overlaps"]
    gt_map = overlaps > cfg.eval.acceptance_overlap
    ref_idx = out["ref_node_corr_indices"]
    src_idx = out["src_node_corr_indices"]
    valid = out["node_corr_valid"]
    hits = gt_map[ref_idx, src_idx] & valid
    return jnp.sum(hits) / jnp.maximum(jnp.sum(valid), 1)


def _loss_for_pair(model: GaussRegModel, cfg: Config, params, batch: PairBatch, key):
    out = model.apply(
        params,
        batch,
        train=True,
        with_transform=False,
        rngs={"sample": key},
    )
    losses = overall_loss(cfg, out, batch.transform)
    losses = dict(losses)
    losses["PIR"] = _coarse_precision(cfg, out)
    losses["vox_overflow"] = _voxel_overflow(cfg, batch)
    return losses["loss"], losses


def _voxel_overflow(cfg: Config, batch: PairBatch) -> jnp.ndarray:
    """Voxels dropped by the static pyramid capacities (SURVEY.md §7.3 'no
    silent truncation'): > 0 means cfg.capacity.levels is too small for this
    data and the pyramid silently subsampled."""
    over = jnp.zeros((), jnp.int32)
    for nv, cap in zip(batch.pyramid.num_voxels[1:], cfg.capacity.levels[1:]):
        over = over + jnp.sum(jnp.maximum(nv - cap, 0))
    return over + jnp.sum(batch.pyramid.search_overflow)


def make_train_step(model: GaussRegModel, cfg: Config, tx, mesh=None):
    """Build the jitted train step over a batched PairBatch (leading axis =
    pairs). With a mesh, the batch axis is sharded across `data` and params
    are replicated — XLA overlaps the gradient all-reduce with backward."""

    def train_step(
        state: TrainState, batch: PairBatch, keys
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def mean_loss(params):
            losses, aux = jax.vmap(
                lambda b, k: _loss_for_pair(model, cfg, params, b, k),
                in_axes=(0, 0),
            )(batch, keys)
            return jnp.mean(losses), aux

        (loss, aux), grads = jax.value_and_grad(mean_loss, has_aux=True)(state.params)

        # NaN/Inf gradient guard: skip the update instead of crashing
        # (reference base_trainer.py:219-227 drops into a debugger; a jitted
        # TPU step skips and counts)
        finite = jnp.all(
            jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
            )
        )
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params,
            opt_state,
            state.step + 1,
            state.skipped + jnp.where(finite, 0, 1).astype(jnp.int32),
        )
        metrics = {
            "loss": loss,
            "c_loss": jnp.mean(aux["c_loss"]),
            "f_loss": jnp.mean(aux["f_loss"]),
            "PIR": jnp.mean(aux["PIR"]),
            "grad_finite": finite.astype(jnp.float32),
            "vox_overflow": jnp.sum(aux["vox_overflow"]).astype(jnp.float32),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(rep, shd, shd),
        out_shardings=(rep, rep),
    )


def make_eval_step(model: GaussRegModel, cfg: Config):
    """Jitted eval step for one pair: full forward incl. LGR + RANSAC and
    registration metrics in the normalized frame
    (reference trainval.py:48-54 val_step)."""

    @jax.jit
    def eval_step(params, batch: PairBatch, key):
        out = model.apply(
            params,
            batch,
            train=False,
            with_transform=True,
            with_gt_overlaps=True,
            rngs={"ransac": key},
        )
        src_points = batch.pyramid.points[0][1]
        src_mask = batch.pyramid.masks[0][1]
        metrics = evaluate_registration(
            cfg, batch.transform, out["estimated_transform"], src_points, src_mask
        )
        metrics = dict(metrics)
        # coarse-matching precision of the PROPOSED node correspondences
        # (eval never sees GT targets) — localizes failures to features vs
        # LGR/RANSAC (reference loss.py:102-120 evaluate_coarse)
        metrics["PIR"] = _coarse_precision(cfg, out)
        # fine-matching inlier ratio of the extracted dense correspondences
        # (reference loss.py:122-130 evaluate_fine)
        from gaussreg_tpu.models.metrics import inlier_ratio

        metrics["IR"] = inlier_ratio(
            out["ref_corr_points"],
            out["src_corr_points"],
            out["corr_valid"],
            batch.transform,
            cfg.eval.acceptance_radius,
        )
        # capacity overflow accounting (SURVEY.md §7.3): surface, don't hide
        metrics["vox_overflow"] = _voxel_overflow(cfg, batch).astype(jnp.float32)
        metrics["corr_overflow"] = jnp.maximum(
            out["num_correspondences"] - cfg.capacity.max_correspondences, 0
        ).astype(jnp.float32)
        return out["estimated_transform"], metrics

    return eval_step
