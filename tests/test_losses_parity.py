import numpy as np
import jax
import jax.numpy as jnp
import optax

from gaussreg_tpu.models.losses import weighted_circle_loss
from gaussreg_tpu.models.kpconv import MaskedGroupNorm
from gaussreg_tpu.ops.pairwise import pairwise_sq_dist


def test_circle_loss_learns_feature_separation():
    """Optimizing the circle loss on learnable features must pull matching
    pairs together and push non-matching apart (validates the loss surface,
    reference circle_loss.py:44-86)."""
    rng = np.random.default_rng(0)
    m, c = 24, 16
    ref = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    pos = jnp.eye(m, dtype=bool)
    neg = ~pos

    def loss_fn(src):
        r = ref / jnp.linalg.norm(ref, axis=1, keepdims=True)
        s = src / jnp.linalg.norm(src, axis=1, keepdims=True)
        d = jnp.sqrt(jnp.maximum(pairwise_sq_dist(r, s, normalized=True), 1e-12))
        return weighted_circle_loss(pos, neg, d, 0.1, 1.4, 0.1, 1.4, 24.0)

    tx = optax.adam(1e-2)
    opt = tx.init(src)

    @jax.jit
    def step(s, o):
        l, g = jax.value_and_grad(loss_fn)(s)
        u, o = tx.update(g, o, s)
        return optax.apply_updates(s, u), o, l

    l0 = float(loss_fn(src))
    for _ in range(300):
        src, opt, l = step(src, opt)
    assert float(l) < 0.5 * l0
    r = np.asarray(ref / jnp.linalg.norm(ref, axis=1, keepdims=True))
    s = np.asarray(src / jnp.linalg.norm(src, axis=1, keepdims=True))
    d = np.sqrt(np.maximum(2 - 2 * r @ s.T, 0))
    eye = np.eye(m, dtype=bool)
    assert d[eye].mean() < 0.6
    assert d[~eye].mean() > 1.2


def test_masked_group_norm_matches_torch_oracle():
    """MaskedGroupNorm on the full (unmasked) batch must equal torch's
    GroupNorm over the stacked cloud (reference modules.py:33-50: input
    (1, C, N) — statistics per group over all points)."""
    import torch

    rng = np.random.default_rng(1)
    b, n, c, g = 2, 50, 8, 4
    x = rng.normal(size=(b, n, c)).astype(np.float32)
    mask = np.ones((b, n), bool)

    gn = MaskedGroupNorm(num_groups=g)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    out = np.asarray(gn.apply(params, jnp.asarray(x), jnp.asarray(mask)))

    # torch oracle: both clouds stacked into one instance (N_total, C)
    tx = torch.from_numpy(x.reshape(1, b * n, c).transpose(0, 2, 1))
    tgn = torch.nn.GroupNorm(g, c)
    with torch.no_grad():
        tout = tgn(tx).numpy().transpose(0, 2, 1).reshape(b, n, c)
    np.testing.assert_allclose(out, tout, atol=1e-4)

    # masked case: padded entries must not affect the statistics
    x2 = np.concatenate([x, rng.normal(size=(b, 10, c)).astype(np.float32) * 100], axis=1)
    mask2 = np.concatenate([mask, np.zeros((b, 10), bool)], axis=1)
    out2 = np.asarray(gn.apply(params, jnp.asarray(x2), jnp.asarray(mask2)))
    np.testing.assert_allclose(out2[:, :n], out, atol=1e-4)
    assert (out2[:, n:] == 0).all()
