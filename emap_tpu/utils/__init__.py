from emap_tpu.utils.ply import read_ply_points, write_ply_points
from emap_tpu.utils.vis import visualize_depth

__all__ = ["read_ply_points", "write_ply_points", "visualize_depth"]
