from emap_tpu.extract.pointcloud import (
    extract_pointcloud,
    extract_pointcloud_multi,
)
from emap_tpu.extract.parametric import get_parametric_edge

__all__ = [
    "extract_pointcloud",
    "extract_pointcloud_multi",
    "get_parametric_edge",
]
