from emap_tpu.extract.pointcloud import extract_pointcloud
from emap_tpu.extract.parametric import get_parametric_edge

__all__ = ["extract_pointcloud", "get_parametric_edge"]
