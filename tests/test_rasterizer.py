import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from gaussreg_tpu.gs.rasterizer.camera import look_at_camera
from gaussreg_tpu.gs.rasterizer.project import project_gaussians, compute_cov3d
from gaussreg_tpu.gs.rasterizer.binning import bin_gaussians
from gaussreg_tpu.gs.rasterizer.reference import render_reference
from gaussreg_tpu.gs.rasterizer.render import render


def _scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(loc=-2.5, scale=0.4, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.normal(1.0, 1.0, size=n)))).astype(np.float32)
    sh = np.zeros((n, 3, 16), np.float32)
    sh[:, :, 0] = rng.uniform(-1, 1, size=(n, 3))
    sh[:, :, 1:] = rng.normal(scale=0.05, size=(n, 3, 15))
    return (
        jnp.asarray(means),
        jnp.asarray(scales),
        jnp.asarray(quats),
        jnp.asarray(opac),
        jnp.asarray(sh),
    )


def _camera(width=256, height=64):
    return look_at_camera(
        eye=[0, 0, -4.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_deg=60, width=width, height=height,
    )


def test_compute_cov3d_matches_numpy():
    rng = np.random.default_rng(1)
    scales = np.exp(rng.normal(size=(10, 3))).astype(np.float32)
    quats = rng.normal(size=(10, 4)).astype(np.float32)
    cov = np.asarray(compute_cov3d(jnp.asarray(scales), jnp.asarray(quats)))
    for i in range(10):
        q = quats[i] / np.linalg.norm(quats[i])
        r = Rotation.from_quat(q[[1, 2, 3, 0]]).as_matrix()
        want = r @ np.diag(scales[i] ** 2) @ r.T
        np.testing.assert_allclose(cov[i], want, rtol=1e-4, atol=1e-5)


def test_projection_basics():
    means, scales, quats, opac, sh = _scene()
    cam = _camera()
    proj = project_gaussians(means, scales, quats, opac, sh, cam)
    v = np.asarray(proj.valid)
    assert v.sum() > 150  # most gaussians visible
    m2d = np.asarray(proj.means2d)[v]
    # on-screen gaussians project near the viewport
    assert np.isfinite(m2d).all()
    assert np.asarray(proj.depths)[v].min() > 0
    # a gaussian behind the camera is culled
    behind = project_gaussians(
        jnp.asarray([[0.0, 0.0, -10.0]]),
        scales[:1], quats[:1], opac[:1], sh[:1], cam,
    )
    assert not bool(behind.valid[0])


def test_binning_covers_projected_gaussians():
    means, scales, quats, opac, sh = _scene(50)
    cam = _camera(width=256, height=64)
    proj = project_gaussians(means, scales, quats, opac, sh, cam)
    ng = 50
    mt = 8
    b = bin_gaussians(
        proj.means2d, proj.radii, proj.depths, 256, 64,
        tile_w=128, tile_h=16, max_tiles_per_gaussian=mt, chunk=128,
    )
    starts = np.asarray(b.starts)
    counts = np.asarray(b.tile_counts)
    num_pairs = int(np.asarray(b.num_pairs))
    assert counts.sum() == num_pairs
    assert int(b.overflow_cap) == 0
    assert (np.diff(starts) >= 0).all()
    gid = np.asarray(b.sorted_gid)
    m2d = np.asarray(proj.means2d)
    r = np.asarray(proj.radii)
    d = np.asarray(proj.depths)
    ntx = 2
    num_tiles = len(starts) - 1
    # valid prefix holds real ids, the tail is sentinel padding
    assert (gid[:num_pairs] < ng).all()
    assert (gid[num_pairs:] == ng).all()
    for t in range(num_tiles):
        lo, hi = starts[t], starts[t + 1]
        ty, tx = divmod(t, ntx)
        for g in gid[lo:hi]:
            # gaussian bbox must intersect this tile
            assert m2d[g, 0] + r[g] >= tx * 128 and m2d[g, 0] - r[g] <= (tx + 1) * 128
            assert m2d[g, 1] + r[g] >= ty * 16 and m2d[g, 1] - r[g] <= (ty + 1) * 16
        # depth-sorted within each tile
        seg = d[gid[lo:hi]]
        assert (np.diff(seg) >= -1e-6).all()


def test_pallas_matches_reference_forward():
    means, scales, quats, opac, sh = _scene(120)
    cam = _camera(width=256, height=64)
    out_ref = render(means, scales, quats, opac, sh, cam, use_pallas=False)
    out_pal = render(
        means, scales, quats, opac, sh, cam, use_pallas=True,
        max_tiles_per_gaussian=32,
    )
    assert int(out_pal.overflow) == 0
    ref = np.asarray(out_ref.rgb)
    pal = np.asarray(out_pal.rgb)
    np.testing.assert_allclose(pal, ref, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out_pal.transmittance), np.asarray(out_ref.transmittance), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_pal.depth), np.asarray(out_ref.depth), atol=5e-3
    )


def test_pallas_gradients_match_reference():
    means, scales, quats, opac, sh = _scene(40)
    cam = _camera(width=128, height=32)

    def loss(means, scales, quats, opac, sh, use_pallas):
        out = render(
            means, scales, quats, opac, sh, cam, use_pallas=use_pallas,
            max_tiles_per_gaussian=32,
        )
        # weighted sums exercise rgb, depth, and transmittance gradients
        w = jnp.linspace(0.5, 1.5, out.rgb.size).reshape(out.rgb.shape)
        return (
            jnp.sum(out.rgb * w)
            + 0.3 * jnp.sum(out.transmittance)
            + 0.05 * jnp.sum(out.depth)
        )

    args = (means, scales, quats, opac, sh)
    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args, use_pallas=False)
    g_pal = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args, use_pallas=True)
    names = ["means", "scales", "quats", "opacities", "sh"]
    for name, a, b in zip(names, g_ref, g_pal):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3, err_msg=name)  # depth term amplifies roundoff


def test_gradients_match_finite_differences():
    means, scales, quats, opac, sh = _scene(10)
    cam = _camera(width=128, height=32)

    def loss(op):
        out = render(means, scales, quats, op, sh, cam, use_pallas=False)
        return jnp.sum(out.rgb)

    g = np.asarray(jax.grad(loss)(opac))
    eps = 1e-3
    for i in range(3):
        op_p = opac.at[i].add(eps)
        op_m = opac.at[i].add(-eps)
        fd = (float(loss(op_p)) - float(loss(op_m))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-3)


def test_sharded_render_matches_single_device():
    """render_sharded on an 8-device mesh == render on one device (fwd+bwd).

    Anchors BASELINE's rasterizer scaling row: image rows shard over the
    mesh, gaussian-parameter gradients all-reduce via shard_map transpose."""
    from jax.sharding import Mesh
    from gaussreg_tpu.gs.rasterizer.render import render_sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    means, scales, quats, opac, sh = _scene(150, seed=5)
    cam = _camera(width=128, height=128)

    out1 = render(means, scales, quats, opac, sh, cam, use_pallas=True)
    out8 = render_sharded(means, scales, quats, opac, sh, cam, mesh)
    # pair-block boundaries fall differently per slice, so blending
    # accumulates in a different order: roundoff-level tolerance
    np.testing.assert_allclose(
        np.asarray(out8.rgb), np.asarray(out1.rgb), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out8.depth), np.asarray(out1.depth), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out8.transmittance), np.asarray(out1.transmittance),
        atol=5e-4,
    )

    def loss(render_fn, *args):
        out = render_fn(*args)
        w = jnp.linspace(0.5, 1.5, out.rgb.size).reshape(out.rgb.shape)
        return jnp.sum(out.rgb * w) + 0.3 * jnp.sum(out.transmittance)

    args = (means, scales, quats, opac, sh)
    g1 = jax.grad(
        lambda *a: loss(lambda *b: render(*b, cam, use_pallas=True), *a),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    g8 = jax.grad(
        lambda *a: loss(lambda *b: render_sharded(*b, cam, mesh), *a),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    for name, a, b in zip(["means", "scales", "quats", "opac", "sh"], g1, g8):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3, err_msg=name)


def test_bwd_capacity_tight_and_undersized():
    """A bwd cap sized to the reported sat_blocks reproduces the default
    gradients exactly; an undersized cap stays finite (tiles past the cap
    lose gradient, counted by sat_blocks — never NaN/garbage)."""
    means, scales, quats, opac, sh = _scene(80, seed=5)
    cam = _camera(width=128, height=64)

    def loss(cap, *args):
        out = render(*args, cam, use_pallas=True, bwd_capacity_blocks=cap)
        return jnp.sum(out.rgb) + 0.5 * jnp.sum(out.transmittance)

    out = render(means, scales, quats, opac, sh, cam, use_pallas=True)
    sat = int(out.sat_blocks)
    assert sat > 0

    args = (means, scales, quats, opac, sh)
    g_full = jax.grad(lambda *a: loss(None, *a), argnums=(0,))(*args)[0]
    g_tight = jax.grad(lambda *a: loss(sat, *a), argnums=(0,))(*args)[0]
    np.testing.assert_allclose(
        np.asarray(g_tight), np.asarray(g_full), atol=1e-5
    )
    g_small = jax.grad(lambda *a: loss(max(1, sat // 4), *a), argnums=(0,))(
        *args
    )[0]
    assert np.isfinite(np.asarray(g_small)).all()


def test_saturation_culled_render_matches():
    """Saturation-depth culling (sat_depth + live_gaussian_cap) reproduces
    the unculled render: pairs behind every reachable tile's saturation
    depth contribute < T_EPS to pixels and zero gradient, so dropping them
    before the pair sort changes nothing but the cost (VERDICT r2 #4)."""
    # saturation is detected at CHUNK (128-pair) granularity, so tiles must
    # run several chunks deep for the early exit to fire: 4000 gaussians
    # over a 128x64 image (16 tiles) ~ 8+ chunks per tile. Stretch the
    # cloud along the view axis (z in [-1, 8], camera at z=-4) so a real
    # population sits BEHIND the saturation boundary.
    means, scales, quats, opac, sh = _scene(4000, seed=7)
    rng = np.random.default_rng(7)
    z = np.where(
        rng.uniform(size=4000) < 0.75,
        rng.uniform(-1.0, 0.5, size=4000),  # dense saturating front slab
        rng.uniform(2.0, 8.0, size=4000),  # population behind saturation
    )
    means = means.at[:, 2].set(jnp.asarray(z, jnp.float32))
    # push opacity up so tiles actually saturate
    opac = jnp.minimum(opac * 4.0, 0.99)
    cam = _camera(width=128, height=64)
    args = (means, scales, quats, opac, sh)

    probe = render(*args, cam, use_pallas=True)
    assert int(probe.sat_blocks) > 0
    assert np.isfinite(np.asarray(probe.sat_depth)).any(), "no tile saturated"
    # probe 2: cull without compaction — sizes live_cap and pair capacity
    p2 = render(*args, cam, use_pallas=True, sat_depth=probe.sat_depth)
    n_valid = int(probe.num_live)
    n_live = int(p2.num_live)
    assert 0 < n_live < n_valid, "cull never fired; scene not saturating"
    live_cap = n_live + 8
    pair_cap = (int(p2.num_pairs) + 127) // 128 + 2

    def run(**kw):
        return render(*args, cam, use_pallas=True, **kw)

    out = run(
        sat_depth=probe.sat_depth, live_gaussian_cap=live_cap,
        pair_capacity_blocks=pair_cap,
    )
    assert int(out.overflow_cap) == 0
    assert int(out.num_pairs) < int(probe.num_pairs)
    np.testing.assert_allclose(
        np.asarray(out.rgb), np.asarray(probe.rgb), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.transmittance), np.asarray(probe.transmittance),
        atol=2e-3,
    )

    # gradients survive culling: pairs behind saturation carried none
    def loss(culled, *a):
        kw = (
            dict(
                sat_depth=probe.sat_depth, live_gaussian_cap=live_cap,
                pair_capacity_blocks=pair_cap,
            )
            if culled
            else {}
        )
        o = render(*a, cam, use_pallas=True, **kw)
        w = jnp.linspace(0.5, 1.5, o.rgb.size).reshape(o.rgb.shape)
        return jnp.sum(o.rgb * w) + 0.3 * jnp.sum(o.transmittance)

    g_full = jax.grad(lambda *a: loss(False, *a), argnums=(0, 3))(*args)
    g_cull = jax.grad(lambda *a: loss(True, *a), argnums=(0, 3))(*args)
    for name, a, b in zip(["means", "opac"], g_full, g_cull):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=3e-3, err_msg=name)


def test_sharded_render_uneven_height():
    """render_sharded at a height NOT divisible by ndev*tile_h exercises the
    _round_up + rgb[:height] crop path (render.py render_sharded) —
    VERDICT r2 weak #8."""
    from jax.sharding import Mesh
    from gaussreg_tpu.gs.rasterizer.render import render_sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    means, scales, quats, opac, sh = _scene(120, seed=11)
    # 100 % (8 * 16) != 0 and 72 % 32 != 0: both axes pad then crop
    cam = _camera(width=72, height=100)

    out1 = render(means, scales, quats, opac, sh, cam, use_pallas=True)
    out8 = render_sharded(means, scales, quats, opac, sh, cam, mesh)
    assert out8.rgb.shape == (100, 72, 3)
    np.testing.assert_allclose(
        np.asarray(out8.rgb), np.asarray(out1.rgb), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out8.transmittance), np.asarray(out1.transmittance),
        atol=5e-4,
    )

    # backward at uneven shapes stays correct too
    def loss(render_fn, *args):
        out = render_fn(*args)
        return jnp.sum(out.rgb**2)

    args = (means, scales, quats, opac, sh)
    g1 = jax.grad(lambda *a: loss(lambda *b: render(*b, cam, use_pallas=True), *a))(*args)
    g8 = jax.grad(lambda *a: loss(lambda *b: render_sharded(*b, cam, mesh), *a))(*args)
    scale = np.abs(np.asarray(g1)).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(g8) / scale, np.asarray(g1) / scale, atol=2e-3
    )


def test_sharded_culled_render_matches():
    """render_sharded's v5 culled path (sat_depth + live_gaussian_cap +
    bwd_capacity_blocks) == single-device culled render, image AND
    gradients, on 8 virtual devices (VERDICT r3 weak #6). Height divisible
    by ndev*tile_h so both paths pad to the same tile grid and the
    sat_depth arrays correspond tile-for-tile."""
    from jax.sharding import Mesh
    from gaussreg_tpu.gs.rasterizer.render import render_sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    # the saturating scene from test_saturation_culled_render_matches
    means, scales, quats, opac, sh = _scene(4000, seed=7)
    rng = np.random.default_rng(7)
    z = np.where(
        rng.uniform(size=4000) < 0.75,
        rng.uniform(-1.0, 0.5, size=4000),
        rng.uniform(2.0, 8.0, size=4000),
    )
    means = means.at[:, 2].set(jnp.asarray(z, jnp.float32))
    opac = jnp.minimum(opac * 4.0, 0.99)
    # height == ndev * tile_h so both paths pad to the same tile grid
    cam = _camera(width=128, height=256)
    args = (means, scales, quats, opac, sh)

    probe1 = render(*args, cam, use_pallas=True)
    probe8 = render_sharded(*args, cam, mesh)
    # slice-local tile grids stack to the global row-major order. Values
    # differ slightly from the single-device depths (the per-slice mt cap
    # clips bboxes per slice, shifting which pair a tile saturates on) —
    # they are cull thresholds, not exact outputs, so compare loosely.
    sd8 = np.asarray(probe8.sat_depth)
    sd1 = np.asarray(probe1.sat_depth)
    assert (np.isfinite(sd8) == np.isfinite(sd1)).mean() > 0.9
    both = np.isfinite(sd8) & np.isfinite(sd1)
    np.testing.assert_allclose(sd8[both], sd1[both], rtol=0.1)
    assert int(probe8.sat_blocks) > 0  # max over slices

    # probe 2 under the fed-back depths sizes the per-slice caps
    p2 = render_sharded(*args, cam, mesh, sat_depth=probe8.sat_depth)
    n_live = int(p2.num_live)
    assert 0 < n_live < means.shape[0]
    live_cap = -(-int(n_live * 1.1) // 256) * 256
    bwd_cap = int(int(probe8.sat_blocks) * 1.15) + 16

    kw = dict(
        sat_depth=probe8.sat_depth, live_gaussian_cap=live_cap,
        bwd_capacity_blocks=bwd_cap,
    )
    out8 = render_sharded(*args, cam, mesh, **kw)
    assert int(out8.overflow_cap) == 0
    # cull correctness: culled sharded vs UNCULLED sharded (apples to
    # apples — the slice-vs-single difference is tested separately by
    # test_sharded_render_matches_single); culled pairs each contributed
    # < T_EPS, so their summed removal stays in the few-1e-3 range
    np.testing.assert_allclose(
        np.asarray(out8.rgb), np.asarray(probe8.rgb), atol=4e-3
    )
    np.testing.assert_allclose(
        np.asarray(out8.transmittance), np.asarray(probe8.transmittance),
        atol=4e-3,
    )
    # loose sanity against the single-device unculled render (adds the
    # per-slice mt-clip and depth-tie-order differences)
    np.testing.assert_allclose(
        np.asarray(out8.rgb), np.asarray(probe1.rgb), atol=8e-3
    )

    def loss(render_fn, *a):
        o = render_fn(*a)
        w = jnp.linspace(0.5, 1.5, o.rgb.size).reshape(o.rgb.shape)
        return jnp.sum(o.rgb * w) + 0.3 * jnp.sum(o.transmittance)

    g_base = jax.grad(
        lambda *a: loss(lambda *b: render_sharded(*b, cam, mesh), *a),
        argnums=(0, 3),
    )(*args)
    g8 = jax.grad(
        lambda *a: loss(lambda *b: render_sharded(*b, cam, mesh, **kw), *a),
        argnums=(0, 3),
    )(*args)
    for name, a, b in zip(["means", "opac"], g_base, g8):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=4e-3, err_msg=name)
