from emap_tpu.kernels.mlp_query import (
    pallas_available,
    pallas_udf_value,
    pallas_udf_value_and_grad,
)

__all__ = [
    "pallas_available",
    "pallas_udf_value",
    "pallas_udf_value_and_grad",
]
