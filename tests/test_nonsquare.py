"""Non-square-image coverage (VERDICT r4 weak #1).

Everything the project had ever rendered, trained, or oracle-tested was
square with a centered principal point, so a W/H (or cx/cy) swap in ray
generation, validate stitching, visibility projection, or the f2d
reprojection scorer would have been invisible to the whole suite — and
fatal on real data (DTU is 1600x1200 with calibrated principal points).

This file pins every image-coordinate-sensitive path at H != W with an
off-center principal point:

* scene loading + ray generation vs the torch reference Dataset
  (/root/reference/src/dataset/dataset.py:137-167 and :222-307) — full
  image at levels 1 and 2, plus explicit per-pixel rays via the
  reference's gen_one_ray_at (:169-220);
* in-jit sample_rays pixel-index conventions (row-major flat index ==
  the reference's p_valid ordering, dataset.py:245-259);
* compute_visibility vs a literal transcription of the reference's
  per-frame loop (extract_parametric_edge.py:137-188; the reference
  module itself imports open3d, absent here, so the oracle is inlined);
* score_edges_2d sanity (GT wireframe beats a shifted phantom);
* a short train -> validate -> extract -> eval smoke, asserting stitched
  image shapes and finite scores.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emap_tpu import config
from emap_tpu.data import gen_rays_at, load_scene, make_synthetic_scene
from emap_tpu.data.dataset import RayPool, importance_cdf, sample_rays

H, W = 80, 48
PP = (3.5, -2.5)  # principal point offset: cx = W/2 + 3.5, cy = H/2 - 2.5


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("nsq")
    make_synthetic_scene(
        str(root), scan="cube000", n_views=4, H=H, W=W, pp_offset=PP
    )
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


@pytest.fixture(scope="module")
def ref_dataset(dataset_conf):
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch unavailable")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from src.dataset.dataset import Dataset as RefDataset
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference import failed: {exc}")
    return RefDataset(dataset_conf)


class TestSceneNonSquare:
    def test_shapes_and_intrinsics(self, scene):
        assert (scene.H, scene.W) == (H, W)
        assert scene.edges.shape == (4, H, W)
        assert scene.colors.shape == (4, H, W, 3)
        K = scene.intrinsics[0]
        assert abs(K[0, 2] - (W / 2.0 + PP[0])) < 1e-5
        assert abs(K[1, 2] - (H / 2.0 + PP[1])) < 1e-5
        # wireframe renders into the maps at this shape too
        assert (scene.edges > 0.5).mean() > 0.001


class TestRayGenOracleNonSquare:
    @pytest.mark.parametrize("level", [1, 2])
    def test_full_image_rays(self, scene, ref_dataset, level):
        r_o, r_v, _, _, r_ds = ref_dataset.gen_rays_at(
            1, resolution_level=level
        )
        rays_o, rays_d, depth_scale = gen_rays_at(scene, 1, level)
        h, w = H // level, W // level
        assert rays_o.shape == (h, w, 3)
        # reference rays come back (H, W, 3) after its transpose
        np.testing.assert_allclose(rays_o, r_o.cpu().numpy(), atol=1e-5)
        np.testing.assert_allclose(rays_d, r_v.cpu().numpy(), atol=1e-5)
        # reference depth_scale is returned PRE-transpose, (W, H, 1)
        # (dataset.py:152,163-169) — a latent reference bug at H != W
        # (shape-mismatched with its own (H, W, 3) rays); ours is
        # row-major like the rays. Equality after transposing theirs.
        assert tuple(r_ds.shape) == (w, h, 1)
        np.testing.assert_allclose(
            depth_scale,
            np.transpose(r_ds.cpu().numpy(), (1, 0, 2)),
            atol=1e-5,
        )

    def test_explicit_pixel_rays(self, scene, ref_dataset):
        """Corner + interior pixels through the reference's
        gen_one_ray_at (explicit x, y — no RNG), vs our jitted pixel
        path. Catches any x/y or cx/cy swap directly."""
        from emap_tpu.data.dataset import _rays_from_pixels

        pool = RayPool.from_scene(scene)
        pix = [(0, 0), (W - 1, 0), (0, H - 1), (W - 1, H - 1), (13, 57)]
        for x, y in pix:
            ref, _ = ref_dataset.gen_one_ray_at(1, x, y)
            ro, rd, ds, _ = jax.jit(_rays_from_pixels, static_argnums=())(
                pool,
                jnp.int32(1),
                jnp.float32([x]),
                jnp.float32([y]),
            )
            np.testing.assert_allclose(
                np.asarray(ro)[0], ref["rays_o"].cpu().numpy()[0],
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(rd)[0], ref["rays_v"].cpu().numpy()[0],
                atol=1e-5,
            )
            # edge value gathered at (y, x), row-major
            np.testing.assert_allclose(
                scene.edges[1, y, x],
                float(ref["edge"].cpu().numpy().ravel()[0]),
                atol=1e-6,
            )

    def test_sample_rays_flat_convention(self, scene):
        """The in-jit sampler's flat index must decode as the reference's
        p_valid ordering (row-major: i -> (x=i%W, y=i//W), reference
        dataset.py:245-259), and its gathered edge/ray values must agree
        with the host recomputation at the decoded pixels."""
        idx = np.arange(H * W)
        # reference builds p_valid from meshgrid(ys, xs) 'ij' then flattens
        ys, xs = np.meshgrid(
            np.linspace(0, H - 1, H), np.linspace(0, W - 1, W),
            indexing="ij",
        )
        p_valid = np.stack([xs, ys], axis=-1).reshape(-1, 2)
        np.testing.assert_array_equal(p_valid[:, 0], idx % W)
        np.testing.assert_array_equal(p_valid[:, 1], idx // W)

        pool = RayPool.from_scene(scene)
        out = jax.jit(
            lambda k: sample_rays(pool, jnp.int32(2), k, 256, True)
        )(jax.random.key(3))
        rays_o, rays_d = np.asarray(out["rays_o"]), np.asarray(out["rays_d"])
        edge = np.asarray(out["edge"])[:, 0]
        uv = np.asarray(out["rays_ndc_uv"])
        px = np.round((uv[:, 0] + 1.0) * (W - 1) / 2.0).astype(int)
        py = np.round((uv[:, 1] + 1.0) * (H - 1) / 2.0).astype(int)
        assert (px >= 0).all() and (px < W).all()
        assert (py >= 0).all() and (py < H).all()
        np.testing.assert_allclose(edge, scene.edges[2, py, px], atol=1e-6)

        ro, rd, _ = gen_rays_at(scene, 2, 1)
        np.testing.assert_allclose(rays_o, ro[py, px], atol=1e-5)
        np.testing.assert_allclose(rays_d, rd[py, px], atol=2e-5)

    def test_importance_cdf_rowmajor(self, scene):
        """CDF flattening must be row-major over (H, W) — the same order
        the reference's probabilities.reshape(-1) uses
        (dataset.py:237-243)."""
        edges = scene.edges[:1]
        flat = edges.reshape(1, -1).astype(np.float64)
        density = flat.mean()
        probs = np.where(flat[0] > 0.1, 1.0 - density, density)
        probs = probs / probs.sum()
        np.testing.assert_allclose(
            importance_cdf(edges)[0], np.cumsum(probs), rtol=1e-5
        )


def _ref_visibility(per_curve, per_line, edges, Ks, c2ws, h, w, thr, n_min):
    """Literal transcription of the reference's compute_visibility loop
    (extract_parametric_edge.py:137-188): per frame, project each
    primitive's samples; visible iff mean projected edge > thr AND max >
    0.5; survives iff visible in > n_min frames."""
    prims = list(per_curve) + list(per_line)
    vis = np.zeros((len(prims), len(edges)))
    for fi, (edge_map, K, c2w) in enumerate(zip(edges, Ks, c2ws)):
        w2c = np.linalg.inv(c2w)
        for ei, pts in enumerate(prims):
            if len(pts) == 0:
                continue
            cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
            uvz = cam @ K[:3, :3].T
            uv = np.round(uvz[:, :2] / uvz[:, 2:3]).astype(np.int32)
            ok = (
                (uv[:, 0] >= 0) & (uv[:, 0] < w)
                & (uv[:, 1] >= 0) & (uv[:, 1] < h)
            )
            if ok.any():
                v = edge_map[uv[ok, 1], uv[ok, 0]]
                vis[ei, fi] = float(np.mean(v) > thr and np.max(v) > 0.5)
    return vis.sum(axis=1) > n_min


class TestVisibilityNonSquare:
    def test_matches_reference_transcription(self, scene):
        """Our vectorized compute_visibility == the reference loop, on
        the non-square scene with real wireframe primitives plus a
        phantom segment off the wireframe."""
        from emap_tpu.data.synthetic import cube_edges
        from emap_tpu.extract.parametric import compute_visibility

        segs = cube_edges(0.5)
        per_line = []
        for seg in segs[:6]:
            t = np.linspace(0, 1, 40)[:, None]
            per_line.append(seg[0] * (1 - t) + seg[1] * t)
        # phantom: a segment floating inside the cube (no edges project
        # onto it) and one far outside the frustum
        t = np.linspace(0, 1, 40)[:, None]
        per_line.append(
            np.array([0.05, 0.0, 0.0]) * (1 - t)
            + np.array([0.0, 0.05, 0.0]) * t
        )
        per_line.append(
            np.array([30.0, 30.0, 30.0]) * (1 - t)
            + np.array([31.0, 30.0, 30.0]) * t
        )

        # synthetic maps are white-on-black (edge = 1.0); both sides get
        # the same maps so the semantics comparison is convention-free
        edges = scene.edges.astype(np.float64)
        Ks = scene.intrinsics.astype(np.float64)
        c2ws = scene.poses.astype(np.float64)

        ours = compute_visibility(
            per_line, edges, Ks, c2ws, H, W,
            visibility_threshold=0.3,
            min_visible_frames=1,
        )
        ref = _ref_visibility(
            [], per_line, edges, Ks, c2ws, H, W, 0.3, 1
        )
        np.testing.assert_array_equal(ours, ref)
        # real wireframe edges visible, phantoms not
        assert ours[:6].all()
        assert not ours[6] and not ours[7]

    def test_scorer_prefers_true_wireframe(self, scene_dir):
        """score_edges_2d at H != W: the true wireframe out-scores a
        shifted phantom copy."""
        from emap_tpu.data.synthetic import cube_edges
        from emap_tpu.extract.autothresh import score_edges_2d

        segs = cube_edges(0.5)
        true_dict = {
            "curves_ctl_pts": [],
            "lines_end_pts": segs.reshape(-1, 6).tolist(),
        }
        phantom = segs + np.array([0.25, -0.2, 0.15])
        phantom_dict = {
            "curves_ctl_pts": [],
            "lines_end_pts": phantom.reshape(-1, 6).tolist(),
        }
        data_dir = os.path.join(scene_dir, "cube000")
        s_true = score_edges_2d(true_dict, data_dir, "DexiNed")
        s_phantom = score_edges_2d(phantom_dict, data_dir, "DexiNed")
        assert np.isfinite(s_true["f2d"]) and np.isfinite(s_phantom["f2d"])
        assert s_true["f2d"] > s_phantom["f2d"] + 0.1


class TestEndToEndNonSquare:
    def test_train_validate_extract_eval_smoke(self, tmp_path):
        """Short full-pipeline smoke at H != W with an off-center
        principal point and visible_checking=True: train 10 steps,
        validate (stitched image shapes must be (2h, w) / (h, w)),
        extract with the visibility filter, and score vs the analytic
        wireframe — rc 0, finite scores."""
        import json as _json

        import cv2

        from emap_tpu.data.synthetic import sample_cube_edge_points
        from emap_tpu.eval.metrics import (
            compute_precision_recall_iou,
            get_pred_points_and_directions,
        )
        from emap_tpu.train.runner import Runner

        h_img, w_img, pp = 44, 28, (1.5, -1.0)
        data_dir = str(tmp_path / "data")
        make_synthetic_scene(
            data_dir, scan="cube000", n_views=3, H=h_img, W=w_img,
            pp_offset=pp,
        )
        conf = config.Config(
            {
                "general": {
                    "base_exp_dir": str(tmp_path / "exp"),
                    "expname": "emap",
                    "model_type": "udf",
                    "recording": [],
                },
                "dataset": {
                    "data_dir": data_dir,
                    "scan": "cube000",
                    "dataset_name": "NEF",
                    "detector": "DexiNed",
                    "near": 0.05,
                    "far": 4.5,
                },
                "train": {
                    "latest_model_name": "ckpt_best.npz",
                    "importance_sample": True,
                    "learning_rate": 5e-4,
                    "learning_rate_geo": 1e-4,
                    "learning_rate_alpha": 0.05,
                    "end_iter": 10,
                    "batch_size": 32,
                    "validate_resolution_level": 2,
                    "warm_up_end": 2,
                    "anneal_end": 5,
                    "use_white_bkgd": False,
                    "save_freq": 100,
                    "val_freq": 5,
                    "report_freq": 5,
                    "igr_weight": 0.1,
                    "igr_ns_weight": 0.0,
                },
                "edge_loss": {"edge_weight": 1.0, "loss_type": "mse"},
                "model": {
                    "udf_network": {
                        "d_out": 1, "d_in": 3, "d_hidden": 32,
                        "n_layers": 2, "skip_in": [1], "multires": 2,
                        "bias": 0.5, "scale": 1.0, "geometric_init": True,
                        "weight_norm": True, "udf_type": "abs",
                    },
                    "variance_network": {"init_val": 0.3},
                    "beta_network": {
                        "init_var_beta": 0.5, "init_var_gamma": 0.3,
                        "init_var_zeta": 0.3, "beta_min": 0.00005,
                        "requires_grad_beta": True,
                        "requires_grad_gamma": True,
                        "requires_grad_zeta": False,
                    },
                    "udf_renderer": {
                        "n_samples": 8, "n_importance": 5, "n_outside": 0,
                        "up_sample_steps": 5, "perturb": 1.0,
                        "sdf2alpha_type": "numerical",
                        "upsampling_type": "classical",
                        "use_unbias_render": True,
                    },
                },
                "edge_extraction": {
                    "is_pointshift": True, "iters": 1,
                    "is_linedirection": True, "udf_threshold": 0.3,
                    "resolution": 16, "sampling_delta": 0.01,
                    "sampling_N": 8, "visible_checking": True,
                },
            }
        )
        runner = Runner(conf, mode="train")
        runner.train()
        assert int(runner.state.step) == 10

        exp = runner.base_exp_dir
        h2, w2 = h_img // 2, w_img // 2
        edge_imgs = sorted(os.listdir(os.path.join(exp, "edge_maps")))
        assert edge_imgs
        img = cv2.imread(os.path.join(exp, "edge_maps", edge_imgs[-1]))
        # rendered | GT stacked vertically: (2h, w, 3)
        assert img.shape == (2 * h2, w2, 3), img.shape
        nrm = cv2.imread(
            os.path.join(exp, "normals",
                         sorted(os.listdir(os.path.join(exp, "normals")))[-1])
        )
        assert nrm.shape == (h2, w2, 3), nrm.shape

        # extraction with the visibility filter ON at H != W
        runner.save_checkpoint(0.0)
        runner.extract_edge(
            resolution=16, udf_threshold=0.3, sampling_N=8,
            sampling_delta=0.01, is_pointshift=True, iters=1,
            is_linedirection=True, visible_checking=True,
        )
        json_path = os.path.join(exp, "results", "parametric_edges.json")
        with open(json_path) as f:
            edges = _json.load(f)
        assert set(edges.keys()) == {"curves_ctl_pts", "lines_end_pts"}

        # eval protocol end-to-end: finite scores (a 10-step field carries
        # no geometry — the contract here is rc 0 + finite, not quality)
        from collections import defaultdict

        pts = get_pred_points_and_directions(json_path)[0]
        gt = sample_cube_edge_points(0.5, spacing=0.01)
        m = compute_precision_recall_iou(
            np.asarray(pts).reshape(-1, 3), gt, defaultdict(list),
            thresh_list=(0.02,),
        )
        for v in m.values():
            assert np.isfinite(v[0])
