from emap_tpu.render.renderer import RenderConfig, render
from emap_tpu.render.sampling import (
    sample_pdf_det,
    sdf2alpha_numerical,
    stratified_z_vals,
    udf2logistic,
)

__all__ = [
    "RenderConfig",
    "render",
    "sample_pdf_det",
    "sdf2alpha_numerical",
    "stratified_z_vals",
    "udf2logistic",
]
