from emap_tpu.fields.embedder import pe_dim, positional_encoding
from emap_tpu.fields.udf import (
    UDFConfig,
    apply_udf,
    init_udf_params,
    udf_gradient,
    udf_value,
    udf_value_and_gradient,
)
from emap_tpu.fields.scalars import (
    beta_gamma_zeta,
    init_beta_params,
    init_variance_params,
    inv_s_value,
)

__all__ = [
    "pe_dim",
    "positional_encoding",
    "UDFConfig",
    "apply_udf",
    "init_udf_params",
    "udf_gradient",
    "udf_value",
    "udf_value_and_gradient",
    "beta_gamma_zeta",
    "init_beta_params",
    "init_variance_params",
    "inv_s_value",
]
