from emap_tpu.ckpt.native import load_pytree, save_pytree
from emap_tpu.ckpt.pth_import import import_reference_checkpoint

__all__ = ["load_pytree", "save_pytree", "import_reference_checkpoint"]
