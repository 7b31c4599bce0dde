"""emap-tpu: TPU-native neural 3D edge reconstruction (EMAP capabilities).

Train a UDF edge field per scene from multi-view 2D edge maps with an
unbiased UDF volume renderer, extract parametric 3D edges (lines + cubic
Beziers), and evaluate with the ABC-NEF / DTU protocols. See README.md.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache, on by default (opt out by setting
# EMAP_TPU_NO_COMPILE_CACHE). On this class of host the TPU compile path is
# a remote-compile service where the chained train program costs ~35 min
# cold; the cache makes every subsequent process warm-start. jax.config is
# updated (not just env) because the axon sitecustomize may import jax
# before us, after which env vars are ignored.
if not _os.environ.get("EMAP_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/tmp/jax_cache_emap_tpu"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - jax absent or flag renamed
        pass

from emap_tpu import config  # noqa: E402

__all__ = ["config", "__version__"]
