"""NeRF positional encoding as a pure function.

Matches the reference encoding exactly (reference: src/models/embedder.py:5-53):
output layout is [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]
with log-sampled frequency bands 2^0 .. 2^(multires-1); out_dim = d*(2*multires+1).
The layout order matters for checkpoint interop (the first MLP layer's columns
are ordered by it).

TPU note: the encoding is a handful of elementwise sin/cos on the VPU and gets
fused by XLA into the consuming matmul's producer; no custom kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def pe_dim(multires: int, d_in: int = 3) -> int:
    if multires <= 0:
        return d_in
    return d_in * (2 * multires + 1)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """x: (..., d) -> (..., d*(2*multires+1)). multires<=0 is identity."""
    if multires <= 0:
        return x
    # freqs: 2^0 .. 2^(multires-1), exactly linspace in log2 space
    freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]  # (..., multires, d)
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave per frequency: [sin_f0, cos_f0, sin_f1, cos_f1, ...]
    enc = jnp.stack([sin, cos], axis=-2)  # (..., multires, 2, d)
    enc = enc.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1)
