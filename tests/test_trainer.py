import numpy as np
import jax
import pytest

from gaussreg_tpu.config import make_tiny_cfg
from gaussreg_tpu.data.synthetic import make_synthetic_batch, random_pair
from gaussreg_tpu.data.pipeline import make_pair_batch
from gaussreg_tpu.engine.trainer import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from gaussreg_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from gaussreg_tpu.models.registration import create_model
from gaussreg_tpu.parallel.mesh import make_mesh, shard_batch_pytree


@pytest.fixture(scope="module")
def _setup():
    cfg = make_tiny_cfg()
    model = create_model(cfg)
    rp, rf, sp, sf, m = random_pair(cfg, 0, num_points=600)
    example = make_pair_batch(cfg, rp, rf, sp, sf, m)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(cfg, model, example, jax.random.PRNGKey(0), tx)
    return cfg, model, tx, state, example


@pytest.fixture()
def setup(_setup):
    # train steps donate the state's buffers; hand every test a fresh copy
    cfg, model, tx, state, example = _setup
    import jax.numpy as jnp

    state = jax.tree_util.tree_map(jnp.copy, state)
    return cfg, model, tx, state, example


def test_single_device_train_step_decreases_loss(setup):
    cfg, model, tx, state, example = setup
    batch = make_synthetic_batch(cfg, [1], num_points=600)
    step = make_train_step(model, cfg, tx)
    keys = jax.random.split(jax.random.PRNGKey(1), 1)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, keys)
        losses.append(float(metrics["loss"]))
        assert metrics["grad_finite"] == 1.0
    assert np.isfinite(losses).all()
    # overfitting a single repeated batch must reduce the loss
    assert losses[-1] < losses[0]


def test_data_parallel_train_step_matches_mesh(setup):
    cfg, model, tx, state, example = setup
    mesh = make_mesh()
    assert len(jax.devices()) == 8
    batch = make_synthetic_batch(cfg, [1, 2, 3, 4, 5, 6, 7, 8], num_points=400)
    batch = shard_batch_pytree(batch, mesh)
    step = make_train_step(model, cfg, tx, mesh=mesh)
    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    keys = shard_batch_pytree(keys, mesh)
    state2, metrics = step(state, batch, keys)
    assert np.isfinite(float(metrics["loss"]))
    # params updated and replicated
    p0 = jax.tree_util.tree_leaves(state2.params)[0]
    assert np.isfinite(np.asarray(p0)).all()


def test_eval_step_runs(setup):
    cfg, model, tx, state, example = setup
    eval_step = make_eval_step(model, cfg)
    est, metrics = eval_step(state.params, example, jax.random.PRNGKey(3))
    assert est.shape == (4, 4)
    for k in ("RRE", "RTE", "RSE", "RMSE", "RR"):
        assert np.isfinite(float(metrics[k])), k


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, model, tx, state, example = setup
    path = save_checkpoint(
        str(tmp_path), "snapshot", state.params, state.opt_state, {"step": 5}
    )
    params2, opt2 = load_checkpoint(path, state.params, state.opt_state)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(params2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_warmup_cosine_schedule():
    """reference utils/torch.py:154-178: linear eta_init -> 1 over warmup,
    cosine 1 -> eta_min afterwards."""
    import dataclasses
    import jax.numpy as jnp

    cfg = make_tiny_cfg()
    opt = dataclasses.replace(
        cfg.optim, scheduler="cosine", warmup_steps=10, max_epoch=10,
        eta_init=0.1, eta_min=0.05,
    )
    cfg = dataclasses.replace(cfg, optim=opt)
    # reach inside make_optimizer by rebuilding its schedule via optax inject
    from gaussreg_tpu.engine.trainer import make_optimizer

    tx = make_optimizer(cfg, steps_per_epoch=10)  # total = 100 steps
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    lrs = []
    g = {"w": jnp.ones(3)}
    for _ in range(101):
        updates, state = tx.update(g, state, params)
        # adam update magnitude == current lr for constant grads after warmup
        lrs.append(float(jnp.abs(updates["w"][0])))
    base = cfg.optim.lr
    # warmup starts near eta_init * lr and rises
    assert lrs[0] < lrs[9] <= base * 1.05
    # peak right after warmup ~ lr, then decays monotonically to eta_min*lr
    assert lrs[10] == pytest.approx(base, rel=0.2)
    assert lrs[100] == pytest.approx(base * 0.05, rel=0.3)
    assert all(a >= b - 1e-9 for a, b in zip(lrs[10:100], lrs[11:101]))


def test_overflow_metrics_surface(setup):
    cfg, model, tx, state, example = setup
    eval_step = make_eval_step(model, cfg)
    _, metrics = eval_step(state.params, example, jax.random.PRNGKey(3))
    assert "vox_overflow" in metrics and "corr_overflow" in metrics
    assert float(metrics["vox_overflow"]) >= 0.0


def test_nan_grad_skip_guard(setup):
    """Non-finite gradients must leave params untouched and be counted
    (reference base_trainer.py:219-227 crash-to-debugger becomes a jitted
    skip-and-count on TPU)."""
    import jax.numpy as jnp

    cfg, model, tx, state, example = setup
    batch = make_synthetic_batch(cfg, [2], num_points=600)
    # poison the features: NaNs propagate to the loss and every gradient
    batch = batch._replace(
        features=jnp.full_like(jnp.asarray(batch.features), jnp.nan)
    )
    step = make_train_step(model, cfg, tx)
    keys = jax.random.split(jax.random.PRNGKey(3), 1)
    before = jax.tree_util.tree_leaves(state.params)
    before = [np.asarray(x).copy() for x in before]
    skipped_before = int(state.skipped)  # read BEFORE donation deletes it
    state2, metrics = step(state, batch, keys)
    assert float(metrics["grad_finite"]) == 0.0
    assert int(state2.skipped) == skipped_before + 1
    after = jax.tree_util.tree_leaves(state2.params)
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b, np.asarray(a))


def test_gradient_accumulation_multisteps(setup):
    """grad_acc_steps > 1 wires optax.MultiSteps: params change only every
    k-th micro-step (reference base_trainer.py:208-211)."""
    import dataclasses

    cfg, model, tx0, state0, example = setup
    cfg2 = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, grad_acc_steps=2)
    )
    tx = make_optimizer(cfg2, steps_per_epoch=10)
    state = create_train_state(
        cfg2, model, example, jax.random.PRNGKey(0), tx
    )
    step = make_train_step(model, cfg2, tx)
    batch = make_synthetic_batch(cfg2, [1], num_points=600)
    keys = jax.random.split(jax.random.PRNGKey(1), 1)

    p0 = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(state.params)]
    state, _ = step(state, batch, keys)
    p1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    for a, b in zip(p0, p1):  # first micro-step only accumulates
        np.testing.assert_array_equal(a, b)
    state, _ = step(state, batch, keys)
    p2 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    assert any(not np.array_equal(a, b) for a, b in zip(p1, p2))


def test_augment_pair_pose_preserves_pyramid_validity():
    import jax.numpy as jnp
    """Rigid pose augmentation keeps every neighbor-list distance identical
    and composes the GT so src' still maps onto ref'."""
    import numpy as np
    from gaussreg_tpu.config import make_tiny_cfg
    from gaussreg_tpu.data.pipeline import augment_pair_pose, make_pair_batch
    from gaussreg_tpu.data.synthetic import random_pair
    from gaussreg_tpu.ops.transforms import apply_transform

    cfg = make_tiny_cfg()
    pb = make_pair_batch(cfg, *random_pair(cfg, 11, num_points=600))
    pb = jax.tree_util.tree_map(np.asarray, pb)
    aug = augment_pair_pose(pb, np.random.default_rng(3))

    # neighbor distances at level 0 are unchanged (rigid invariance)
    for b in range(2):
        p0, p0a = pb.pyramid.points[0][b], aug.pyramid.points[0][b]
        idx = pb.pyramid.neighbors[0][b]
        m = (idx != p0.shape[0]) & pb.pyramid.masks[0][b][:, None]
        cl = np.minimum(idx, p0.shape[0] - 1)
        d_old = np.linalg.norm(p0[cl] - p0[:, None], axis=-1)
        d_new = np.linalg.norm(p0a[cl] - p0a[:, None], axis=-1)
        assert np.abs((d_old - d_new)[m]).max() < 1e-4

    # the composed GT maps augmented src onto augmented ref: check on the
    # overlap region via nearest-neighbor distance percentiles
    sm = aug.pyramid.masks[0][1]
    src_w = np.asarray(
        apply_transform(jnp.asarray(aug.pyramid.points[0][1]), jnp.asarray(aug.transform))
    )
    ref = aug.pyramid.points[0][0][aug.pyramid.masks[0][0]]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(ref).query(src_w[sm])
    # at >= 65% pair overlap, well over half the src points have a true
    # counterpart; the GT must place them on it
    assert np.quantile(d, 0.4) < 0.05
