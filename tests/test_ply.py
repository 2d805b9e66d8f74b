import numpy as np

from gaussreg_tpu.gs.ply import (
    GaussianModel,
    load_gaussians,
    save_gaussians,
    read_ply_vertex,
    write_ply_vertex,
)


def _random_model(n=50, seed=0):
    rng = np.random.default_rng(seed)
    return GaussianModel(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        f_dc=rng.normal(size=(n, 3, 1)).astype(np.float32),
        f_rest=rng.normal(size=(n, 3, 15)).astype(np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
        scales=rng.normal(size=(n, 3)).astype(np.float32),
        rots=rng.normal(size=(n, 4)).astype(np.float32),
    )


def test_gaussian_ply_roundtrip(tmp_path):
    g = _random_model()
    path = str(tmp_path / "pc.ply")
    save_gaussians(path, g)
    g2 = load_gaussians(path)
    np.testing.assert_allclose(g2.xyz, g.xyz, atol=0)
    np.testing.assert_allclose(g2.f_dc, g.f_dc, atol=0)
    np.testing.assert_allclose(g2.f_rest, g.f_rest, atol=0)
    np.testing.assert_allclose(g2.opacity, g.opacity, atol=0)
    np.testing.assert_allclose(g2.scales, g.scales, atol=0)
    np.testing.assert_allclose(g2.rots, g.rots, atol=0)


def test_raw_vertex_roundtrip(tmp_path):
    cols = {"x": np.arange(5.0), "y": np.arange(5.0) * 2, "foo": np.ones(5)}
    path = str(tmp_path / "v.ply")
    write_ply_vertex(path, cols)
    v = read_ply_vertex(path)
    assert set(v) == {"x", "y", "foo"}
    np.testing.assert_allclose(v["y"], cols["y"])
