"""Scene data loading and TPU-resident ray generation.

The reference Dataset (src/dataset/dataset.py:49-323) loads meta_data.json +
all edge/color images into host RAM, then generates each training batch on the
host with python `random.choices` importance sampling and per-batch host->GPU
copies (dataset.py:222-307) -- a known input-pipeline stall (SURVEY.md §3.1).

TPU-first redesign:
* all images, camera matrices, and per-image importance CDFs are uploaded to
  HBM once (`RayPool`),
* `sample_rays` is a pure jittable function: pixel sampling (50% uniform +
  50% edge-importance via inverse-CDF searchsorted, matching the reference's
  sampling *distribution* at dataset.py:236-266 -- RNG-sequence parity is not
  required), ray construction, and edge-value gathers all run on device inside
  the train step. No host transfer happens per iteration.

Importance distribution parity: the reference draws half the batch from
p(pixel) proportional to `edge_density` on non-edge pixels (edge<=0.1) and
`1-edge_density` on edge pixels, where edge_density = mean(edge map). We
precompute that exact per-image CDF (float64 on host, stored f32).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SceneData:
    """Host-side scene container (images as numpy, cameras as numpy)."""

    scan: str
    data_dir: str
    dataset_name: str
    detector: str
    H: int
    W: int
    n_images: int
    near: float
    far: float
    radius: float
    aabb: np.ndarray  # (2, 3)
    intrinsics: np.ndarray  # (n, 4, 4)
    intrinsics_inv: np.ndarray  # (n, 4, 4)
    poses: np.ndarray  # (n, 4, 4) camtoworld
    edges: np.ndarray  # (n, H, W) in [0, 1]
    colors: np.ndarray  # (n, H, W, 3) in [0, 1]
    edge_paths: list
    color_paths: list

    @property
    def masks(self) -> np.ndarray:
        return (self.edges > 0.5).astype(np.float32)


def load_meta(data_dir: str) -> Dict[str, Any]:
    with open(os.path.join(data_dir, "meta_data.json"), encoding="utf-8") as f:
        return json.load(f)


def edge_map_path(data_dir: str, rgb_name: str, detector: str) -> str:
    """Edge map location per detector (reference dataset.py:86-102)."""
    if detector == "PidiNet":
        return os.path.join(data_dir, "edge_PidiNet", rgb_name[:-4] + ".png")
    if detector == "DexiNed":
        return os.path.join(data_dir, "edge_DexiNed", rgb_name)
    raise ValueError(f"unknown detector {detector!r}")


def load_scene(conf) -> SceneData:
    """Load a scan as described by the `dataset` conf section."""
    scan = conf.get_string("scan")
    data_dir = os.path.join(conf.get_string("data_dir"), scan)
    detector = conf.get_string("detector", "DexiNed")
    dataset_name = conf.get_string("dataset_name", "ABC")
    meta = load_meta(data_dir)

    H, W = int(meta["height"]), int(meta["width"])
    box = meta["scene_box"]

    intrinsics, poses, edge_paths, color_paths = [], [], [], []
    for frame in meta["frames"]:
        intrinsics.append(np.asarray(frame["intrinsics"], dtype=np.float64))
        poses.append(np.asarray(frame["camtoworld"], dtype=np.float64)[:4, :4])
        edge_paths.append(edge_map_path(data_dir, frame["rgb_path"], detector))
        color_paths.append(os.path.join(data_dir, "color", frame["rgb_path"]))

    intrinsics = np.stack(intrinsics).astype(np.float32)
    poses = np.stack(poses).astype(np.float32)

    def _read(path, flags=None):
        img = cv2.imread(path) if flags is None else cv2.imread(path, flags)
        if img is None:  # cv2 returns None silently on a missing file
            raise FileNotFoundError(
                f"cannot read image {path!r} (check dataset.data_dir and "
                f"that the dataset.detector edge-map directory exists)"
            )
        return img.astype(np.float32) / 255.0

    edges = np.stack([_read(p, 0) for p in edge_paths])
    colors = np.stack([_read(p) for p in color_paths])

    return SceneData(
        scan=scan,
        data_dir=data_dir,
        dataset_name=dataset_name,
        detector=detector,
        H=H,
        W=W,
        n_images=len(edge_paths),
        near=float(box["near"]),
        far=float(box["far"]),
        radius=float(box["radius"]),
        aabb=np.asarray(box["aabb"], dtype=np.float32),
        intrinsics=intrinsics,
        intrinsics_inv=np.linalg.inv(intrinsics.astype(np.float64)).astype(
            np.float32
        ),
        poses=poses,
        edges=edges,
        colors=colors,
        edge_paths=edge_paths,
        color_paths=color_paths,
    )


def importance_cdf(edges: np.ndarray) -> np.ndarray:
    """Per-image inverse-CDF table for edge-importance pixel sampling.

    Distribution identical to reference dataset.py:236-266: probability
    `edge_density` for pixels with edge<=0.1, `1-edge_density` for edge
    pixels, normalized. Computed in float64, stored float32.
    """
    n, H, W = edges.shape
    flat = edges.reshape(n, H * W).astype(np.float64)
    density = flat.mean(axis=1, keepdims=True)
    probs = np.where(flat > 0.1, 1.0 - density, density)
    cdf = np.cumsum(probs, axis=1)
    cdf /= cdf[:, -1:]
    return cdf.astype(np.float32)


@dataclasses.dataclass
class RayPool:
    """Device-resident arrays for in-jit ray generation."""

    edges: jnp.ndarray  # (n, H*W)
    cdf: jnp.ndarray  # (n, H*W)
    intrinsics_inv: jnp.ndarray  # (n, 3, 3)
    rot: jnp.ndarray  # (n, 3, 3) camera-to-world rotation
    origin: jnp.ndarray  # (n, 3) camera centers
    H: int
    W: int
    n_images: int

    @classmethod
    def from_scene(cls, scene: SceneData, device=None) -> "RayPool":
        put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
        return cls(
            edges=put(scene.edges.reshape(scene.n_images, -1)),
            cdf=put(importance_cdf(scene.edges)),
            intrinsics_inv=put(scene.intrinsics_inv[:, :3, :3]),
            rot=put(scene.poses[:, :3, :3]),
            origin=put(scene.poses[:, :3, 3]),
            H=scene.H,
            W=scene.W,
            n_images=scene.n_images,
        )


jax.tree_util.register_dataclass(
    RayPool,
    data_fields=["edges", "cdf", "intrinsics_inv", "rot", "origin"],
    meta_fields=["H", "W", "n_images"],
)


def _rays_from_pixels(pool: RayPool, img_idx, px, py):
    """Pixel coords -> world rays (reference math, dataset.py:272-287).

    Camera matmuls are pinned to HIGHEST precision: on TPU the default
    bf16-pass matmul costs ~1e-3 in ray direction, which is visible in
    reconstruction quality; these (B,3)x(3,3) products are negligible FLOPs.
    """
    prec = jax.lax.Precision.HIGHEST
    p = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)  # (B, 3)
    k_inv = pool.intrinsics_inv[img_idx]  # (3, 3)
    pc = jnp.dot(p, k_inv.T, precision=prec)
    rays_v = pc / jnp.linalg.norm(pc, axis=-1, keepdims=True)
    depth_scale = rays_v[:, 2:3]
    rot = pool.rot[img_idx]
    rays_d = jnp.dot(rays_v, rot.T, precision=prec)
    rays_o = jnp.broadcast_to(pool.origin[img_idx], rays_d.shape)
    return rays_o, rays_d, depth_scale, pc


def sample_rays(
    pool: RayPool,
    img_idx,
    key: jax.Array,
    batch_size: int,
    importance_sample: bool = True,
):
    """Jittable training-batch ray generation.

    Returns dict(rays_o, rays_d, edge, depth_scale, rays_ndc_uv) with
    batch_size rows. img_idx is a traced int32 scalar.
    """
    k_ux, k_uy, k_imp = jax.random.split(key, 3)
    if importance_sample:
        n_uniform = batch_size // 2
        n_imp = batch_size - n_uniform
        px_u = jax.random.randint(k_ux, (n_uniform,), 0, pool.W)
        py_u = jax.random.randint(k_uy, (n_uniform,), 0, pool.H)
        u = jax.random.uniform(k_imp, (n_imp,))
        flat_idx = jnp.searchsorted(pool.cdf[img_idx], u, side="right")
        flat_idx = jnp.clip(flat_idx, 0, pool.H * pool.W - 1)
        py_i = flat_idx // pool.W
        px_i = flat_idx % pool.W
        px = jnp.concatenate([px_u, px_i]).astype(jnp.float32)
        py = jnp.concatenate([py_u, py_i]).astype(jnp.float32)
    else:
        px = jax.random.randint(k_ux, (batch_size,), 0, pool.W).astype(
            jnp.float32
        )
        py = jax.random.randint(k_uy, (batch_size,), 0, pool.H).astype(
            jnp.float32
        )

    flat = (py.astype(jnp.int32) * pool.W + px.astype(jnp.int32))
    edge = pool.edges[img_idx][flat][:, None]

    rays_o, rays_d, depth_scale, _ = _rays_from_pixels(pool, img_idx, px, py)

    ndc_u = 2.0 * px / (pool.W - 1) - 1.0
    ndc_v = 2.0 * py / (pool.H - 1) - 1.0

    return {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "edge": edge,
        "depth_scale": depth_scale,
        "rays_ndc_uv": jnp.stack([ndc_u, ndc_v], axis=-1),
    }


def gen_rays_at(scene: SceneData, img_idx: int, resolution_level: int = 1):
    """Full-image rays for validation (reference dataset.py:137-167).

    Returns numpy (h, w, 3) rays_o, rays_d and (h, w, 1) depth_scale where
    h = H//level, w = W//level; row-major image layout.
    """
    level = resolution_level
    xs = np.linspace(0, scene.W - 1, scene.W // level, dtype=np.float32)
    ys = np.linspace(0, scene.H - 1, scene.H // level, dtype=np.float32)
    px, py = np.meshgrid(xs, ys, indexing="xy")  # (h, w)
    p = np.stack([px, py, np.ones_like(px)], axis=-1)  # (h, w, 3)
    k_inv = scene.intrinsics_inv[img_idx, :3, :3]
    pc = p @ k_inv.T
    rays_v = pc / np.linalg.norm(pc, axis=-1, keepdims=True)
    depth_scale = rays_v[..., 2:].copy()
    rot = scene.poses[img_idx, :3, :3]
    rays_d = rays_v @ rot.T
    rays_o = np.broadcast_to(scene.poses[img_idx, :3, 3], rays_d.shape).copy()
    return rays_o, rays_d, depth_scale


def gen_one_ray_at(scene: SceneData, img_idx: int, x: int, y: int):
    """Single-pixel debug ray (reference dataset.py:169-220)."""
    rays_o, rays_d, depth_scale = gen_rays_at(scene, img_idx, 1)
    return {
        "rays_o": rays_o[y : y + 1, x],
        "rays_v": rays_d[y : y + 1, x],
        "edge": scene.edges[img_idx, y : y + 1, x : x + 1],
        "color": scene.colors[img_idx, y : y + 1, x],
        "mask": scene.masks[img_idx, y : y + 1, x : x + 1],
        "depth_scale": depth_scale[y : y + 1, x],
    }


def edge_at(scene: SceneData, idx: int, resolution_level: int) -> np.ndarray:
    """GT edge image at reduced resolution (reference dataset.py:309-314)."""
    edge = (scene.edges[idx] * 255.0).astype(np.uint8)
    h, w = scene.H // resolution_level, scene.W // resolution_level
    return cv2.resize(edge, (w, h)).clip(0, 255)


def color_at(scene: SceneData, idx: int, resolution_level: int) -> np.ndarray:
    img = (scene.colors[idx] * 255.0).astype(np.uint8)
    h, w = scene.H // resolution_level, scene.W // resolution_level
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)
