from emap_tpu.data.dataset import RayPool, SceneData, gen_rays_at, load_scene
from emap_tpu.data.synthetic import make_synthetic_scene

__all__ = [
    "RayPool",
    "SceneData",
    "gen_rays_at",
    "load_scene",
    "make_synthetic_scene",
]
