"""emap-tpu: TPU-native neural 3D edge reconstruction (EMAP capabilities).

Train a UDF edge field per scene from multi-view 2D edge maps with an
unbiased UDF volume renderer, extract parametric 3D edges (lines + cubic
Beziers), and evaluate with the ABC-NEF / DTU protocols. See README.md.
"""

__version__ = "0.1.0"

from emap_tpu import config

__all__ = ["config", "__version__"]
