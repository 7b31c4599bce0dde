import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emap_tpu import config
from emap_tpu.data import (
    RayPool,
    gen_rays_at,
    load_scene,
    make_synthetic_scene,
)
from emap_tpu.data.dataset import importance_cdf, sample_rays


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_scene(str(root), scan="cube000", n_views=6, H=64, W=64)
    return str(root)


@pytest.fixture(scope="module")
def dataset_conf(scene_dir):
    return config.Config(
        {
            "data_dir": scene_dir,
            "scan": "cube000",
            "dataset_name": "NEF",
            "detector": "DexiNed",
            "near": 0.05,
            "far": 4.5,
        }
    )


@pytest.fixture(scope="module")
def scene(dataset_conf):
    return load_scene(dataset_conf)


class TestSceneLoading:
    def test_shapes(self, scene):
        assert scene.n_images == 6
        assert scene.edges.shape == (6, 64, 64)
        assert scene.colors.shape == (6, 64, 64, 3)
        assert scene.intrinsics.shape == (6, 4, 4)
        assert 0.0 <= scene.edges.min() and scene.edges.max() <= 1.0
        # cube wireframe must actually appear in the maps
        assert (scene.edges > 0.5).mean() > 0.001

    def test_masks(self, scene):
        np.testing.assert_array_equal(
            scene.masks, (scene.edges > 0.5).astype(np.float32)
        )

    def test_rings_object(self, tmp_path):
        """The curve-only 'rings' wireframe renders and its GT sampler lies
        on the three orthogonal circles."""
        from emap_tpu.data.synthetic import (
            ring_edges,
            sample_ring_edge_points,
        )

        segs = ring_edges(0.5)
        assert segs.shape == (3 * 96, 2, 3)
        # every segment endpoint is radius 0.5 from origin
        np.testing.assert_allclose(
            np.linalg.norm(segs.reshape(-1, 3), axis=1), 0.5, atol=1e-9
        )
        gt = sample_ring_edge_points(0.5, spacing=0.005)
        np.testing.assert_allclose(
            np.linalg.norm(gt, axis=1), 0.5, atol=1e-6
        )
        # one coordinate is ~0 on each ring (points lie in coordinate planes)
        assert np.all(np.min(np.abs(gt), axis=1) < 1e-6)

        d = make_synthetic_scene(str(tmp_path), scan="rings0", n_views=3,
                                 H=48, W=48, obj="rings")
        import os

        import cv2

        img = cv2.imread(
            os.path.join(d, "edge_DexiNed", "000.png"), 0
        )
        assert (img > 128).mean() > 0.001  # rings appear in the edge map


class TestRayGeneration:
    def test_rays_unit_norm_and_hit_scene(self, scene):
        rays_o, rays_d, depth_scale = gen_rays_at(scene, 0, 1)
        assert rays_o.shape == (64, 64, 3)
        np.testing.assert_allclose(
            np.linalg.norm(rays_d, axis=-1), 1.0, atol=1e-5
        )
        # center ray should roughly point from the camera to the origin
        c = rays_d[32, 32]
        to_origin = -rays_o[32, 32] / np.linalg.norm(rays_o[32, 32])
        assert c @ to_origin > 0.99
        # depth_scale is the camera-z component of the unit ray in (0, 1]
        assert (depth_scale > 0).all() and (depth_scale <= 1.0 + 1e-6).all()

    def test_matches_reference_dataset(self, scene, dataset_conf):
        """Camera math parity against the torch reference Dataset."""
        try:
            import torch  # noqa: F401
        except ImportError:
            pytest.skip("torch unavailable")
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        try:
            from src.dataset.dataset import Dataset as RefDataset
        except Exception as exc:
            pytest.skip(f"reference import failed: {exc}")

        ref = RefDataset(dataset_conf)
        r_o, r_v, _, _, r_ds = ref.gen_rays_at(1, resolution_level=1)
        rays_o, rays_d, depth_scale = gen_rays_at(scene, 1, 1)
        # reference returns (H, W, 3) after transpose; ours is (H, W, 3)
        np.testing.assert_allclose(rays_o, r_o.cpu().numpy(), atol=1e-5)
        np.testing.assert_allclose(rays_d, r_v.cpu().numpy(), atol=1e-5)
        # reference depth_scale stays (W, H, 1) (pre-transpose, dataset.py:152)
        np.testing.assert_allclose(
            depth_scale,
            np.transpose(r_ds.cpu().numpy(), (1, 0, 2)),
            atol=1e-5,
        )


class TestRaySampling:
    def test_sample_rays_shapes_and_values(self, scene):
        pool = RayPool.from_scene(scene)
        out = jax.jit(
            lambda k, i: sample_rays(pool, i, k, 128, importance_sample=True)
        )(jax.random.key(0), jnp.int32(2))
        assert out["rays_o"].shape == (128, 3)
        assert out["rays_d"].shape == (128, 3)
        assert out["edge"].shape == (128, 1)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["rays_d"]), axis=-1), 1.0, atol=1e-5
        )
        edge_vals = np.asarray(out["edge"])
        assert (edge_vals >= 0).all() and (edge_vals <= 1).all()

    def test_importance_oversamples_edges(self, scene):
        pool = RayPool.from_scene(scene)
        img = 0
        base_rate = float((scene.edges[img] > 0.1).mean())
        out = jax.jit(
            lambda k: sample_rays(pool, jnp.int32(img), k, 4096, True)
        )(jax.random.key(1))
        # second half of the batch is the importance half
        imp_edges = np.asarray(out["edge"])[2048:, 0]
        imp_rate = float((imp_edges > 0.1).mean())
        # importance half draws edge pixels with prob ~(1-density) vs their
        # area fraction; on the dense synthetic maps that's ~2x enrichment
        assert imp_rate > 1.8 * base_rate
        assert imp_rate > 0.5

    def test_cdf_matches_reference_distribution(self):
        # hand-built 1x2x2 image: one edge pixel (0.9), three background (0.0)
        edges = np.array([[[0.9, 0.0], [0.0, 0.0]]], dtype=np.float32)
        cdf = importance_cdf(edges)
        density = 0.9 / 4
        probs = np.array([1 - density, density, density, density])
        probs /= probs.sum()
        np.testing.assert_allclose(cdf[0], np.cumsum(probs), rtol=1e-6)
