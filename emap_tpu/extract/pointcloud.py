"""UDF zero-level-set point extraction: dense grid query, gradient normals,
SVD line directions, and point shifting.

Re-design of the reference extraction (src/edge_extraction/extract_pointcloud.py):

* the N^3 grid UDF query runs as fixed-shape jitted chunks (one compile,
  N^3/chunk dispatches) -- reference :36-62,
* near-surface candidates are selected once on host (the only host round
  trip), then processed in fixed-size padded device batches,
* line direction per point = null space of the gradients at 50 jittered
  samples (reference :76-88). The reference takes the last right-singular
  vector of the (50, 3) gradient matrix; we take the smallest-eigenvalue
  eigenvector of the 3x3 Gram matrix G^T G -- mathematically the same vector,
  but a batched 3x3 `eigh` instead of a batched 50x3 SVD (far cheaper and
  TPU-friendly),
* point shift x <- x + udf * (-grad/|grad|) for `iters` rounds with
  re-filtering (reference :271-288).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from emap_tpu.fields.udf import (
    UDFConfig,
    udf_value,
    udf_value_and_gradient,
)


def _grid_chunk_points(flat_start: int, chunk: int, N: int) -> jnp.ndarray:
    """Grid points for flat indices [start, start+chunk) in x-major order
    (x = idx // N^2, y = (idx // N) % N, z = idx % N), coords in [-1, 1]."""
    idx = flat_start + jnp.arange(chunk)
    z = idx % N
    y = (idx // N) % N
    x = (idx // (N * N)) % N
    voxel = 2.0 / (N - 1)
    pts = jnp.stack([x, y, z], axis=-1).astype(jnp.float32) * voxel - 1.0
    return pts


@functools.partial(
    jax.jit, static_argnames=("chunk", "N", "ucfg", "use_pallas")
)
def _grid_udf_chunk(params, flat_start, chunk: int, N: int, ucfg: UDFConfig,
                    use_pallas: bool = False):
    pts = _grid_chunk_points(flat_start, chunk, N)
    if use_pallas:
        from emap_tpu.kernels import pallas_udf_value

        return pallas_udf_value(params, pts, ucfg)
    return udf_value(params, pts, ucfg)


@functools.partial(
    jax.jit, static_argnames=("chunk", "N", "ucfg", "use_pallas")
)
def _grid_mask_chunk(params, flat_start, thresh, chunk: int, N: int,
                     ucfg: UDFConfig, use_pallas: bool = False):
    """Near-surface bitmask for one grid chunk, packed 8 voxels/byte.

    The dense grid values themselves are never needed on the host — only
    which voxels are near-surface (and those voxels' udf, which the feature
    sweep re-queries anyway) — so fetch chunk/8 bytes instead of chunk*4:
    a 32x smaller device->host transfer for the 256^3 (64 MB) grid.
    """
    vals = _grid_udf_chunk(params, flat_start, chunk, N, ucfg, use_pallas)
    return jnp.packbits(jnp.maximum(vals, 0.0) <= thresh)


@functools.partial(
    jax.jit, static_argnames=("thresholds", "chunk", "N", "ucfg",
                              "use_pallas")
)
def _grid_mask_chunk_multi(params, flat_start, thresholds: tuple,
                           chunk: int, N: int, ucfg: UDFConfig,
                           use_pallas: bool = False):
    """Per-threshold near-surface bitmasks from ONE grid evaluation.

    The grid UDF values are threshold-independent, so a selector with K
    candidate thresholds needs one dense pass, not K (VERDICT r3 item 6;
    the reference re-runs its dense grid per extraction,
    extract_pointcloud.py:36-62). Returns (K, chunk/8) packed bits — the
    same bits _grid_mask_chunk would produce per threshold."""
    vals = jnp.maximum(
        _grid_udf_chunk(params, flat_start, chunk, N, ucfg, use_pallas), 0.0
    )
    return jnp.stack(
        [jnp.packbits(vals <= t) for t in thresholds]
    )


def _grid_masks(params, starts, thresholds, chunk, N, ucfg, use_pallas,
                mesh=None, axis: str = "data"):
    """All grid chunks' packed per-threshold masks, (K, total/8) numpy.

    Under a >1-device mesh each chunk is split into per-device sub-ranges
    (shard_map; the voxel coords are iota-derived from the flat index, so
    sharding moves no input data). Each device packs whole bytes of its own
    contiguous sub-range, so the concatenated bits are identical to the
    single-device packbits of the full chunk."""
    thresholds = tuple(thresholds)
    if mesh is not None and mesh.shape[axis] > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape[axis]
        sub = chunk // n_dev
        assert chunk % (8 * n_dev) == 0

        def per_dev(p, s):
            i = jax.lax.axis_index(axis)
            return _grid_mask_chunk_multi(
                p, s + i * sub, thresholds, sub, N, ucfg, use_pallas
            )

        fn = jax.jit(shard_map(
            per_dev, mesh=mesh, in_specs=(P(), P()),
            out_specs=P(None, axis), check_vma=False,
        ))
        pending = [fn(params, jnp.int32(s)) for s in starts]
    else:
        pending = [
            _grid_mask_chunk_multi(params, jnp.int32(s), thresholds,
                                   chunk, N, ucfg, use_pallas)
            for s in starts
        ]
    return np.concatenate([np.asarray(p) for p in pending], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("ucfg", "sampling_n", "with_linedir", "use_pallas"),
)
def _point_batch_features(
    params, pts, jitter, ucfg: UDFConfig, sampling_n: int,
    with_linedir: bool, use_pallas: bool = False,
):
    """udf, normals (-unit grad), and optional line directions for a padded
    (B, 3) batch of candidate points. `jitter` is the pre-scaled
    (B, sampling_n, 3) jitter offsets (generated by the caller so the draw
    is independent of how this function is sharded over the point axis —
    shard_map re-keys per device, which would re-roll the line directions
    vs the single-device run)."""
    if use_pallas:
        from emap_tpu.kernels import pallas_udf_value_and_grad

        value_and_grad = lambda p: pallas_udf_value_and_grad(params, p, ucfg)  # noqa: E731
    else:
        value_and_grad = lambda p: udf_value_and_gradient(params, p, ucfg)  # noqa: E731

    udf, grad = value_and_grad(pts)
    normals = -grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-5)

    if not with_linedir:
        return udf, normals, jnp.zeros_like(pts)

    samples = pts[:, None, :] + jitter
    g = value_and_grad(samples.reshape(-1, 3))[1]
    g = g.reshape(pts.shape[0], sampling_n, 3)
    # normalize like the reference's func_grad (gradient / (|gradient|+1e-5))
    g = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-5)
    # null space of the gradient bundle: smallest-eigenvalue eigenvector of
    # the 3x3 Gram matrix (== last right-singular vector of the (n,3) SVD).
    # Keep jnp.linalg.eigh here: a closed-form Cardano eigensolver was tried
    # (round 3) and costs real quality -- f32 cancellation in lam_min (~1e-2
    # scale against a trace of ~n) degrades the null-space vector enough to
    # drop F@5mm 0.62 -> 0.41 on an identical checkpoint. eigh is ~134 ms
    # per 65k batch, ~0.5 s of a 10 s extraction; not worth the accuracy.
    gram = jnp.einsum("bni,bnj->bij", g, g)
    _, vecs = jnp.linalg.eigh(gram)  # ascending eigenvalues
    line_dir = vecs[:, :, 0]
    line_dir = line_dir / (jnp.linalg.norm(line_dir, axis=-1, keepdims=True) + 1e-5)
    return udf, normals, line_dir


@functools.partial(jax.jit, static_argnames=("batch", "sampling_n"))
def _gen_jitter(key, batch: int, sampling_n: int, sampling_delta):
    """The line-direction jitter draw, identical to the pre-r4 in-function
    draw (threefry is counter-based, so the values are independent of where
    or how sharded this runs)."""
    return sampling_delta * jax.random.normal(
        key, (batch, sampling_n, 3), dtype=jnp.float32
    )


def _feature_fn(mesh, axis, ucfg, sampling_n, with_linedir, use_pallas):
    """(params, pts, jitter) -> features; shard_mapped over the point axis
    under a >1-device mesh (params replicated — the same pattern as the
    train kernel, renderer._query_field). Row-wise math is untouched by the
    partitioning, so the sharded results are bit-equal to single-device
    (pinned by tests/test_extract.py)."""
    def base(p, x, j):
        return _point_batch_features(
            p, x, j, ucfg, sampling_n, with_linedir, use_pallas
        )

    if mesh is None or mesh.shape[axis] == 1:
        return base

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        base, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )


def _run_point_batches(
    params, ucfg, pts_np: np.ndarray, key, sampling_n, sampling_delta,
    with_linedir: bool, batch: int, use_pallas: bool = False, mesh=None,
    axis: str = "data",
):
    """Host loop over fixed-size padded device batches."""
    m = len(pts_np)
    if m == 0:
        return (
            np.zeros((0,), np.float32),
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.float32),
        )
    n_batches = (m + batch - 1) // batch
    padded = np.zeros((n_batches * batch, 3), np.float32)
    padded[:m] = pts_np
    fn = _feature_fn(mesh, axis, ucfg, sampling_n, with_linedir, use_pallas)
    # Dispatch every batch before fetching any result: JAX dispatch is async,
    # so the device (and the tunnel's transfers) pipeline across batches
    # instead of paying one round-trip of dead time per batch.
    pending = []
    no_jitter = (None if with_linedir
                 else jnp.zeros((batch, 1, 3), jnp.float32))
    for b in range(n_batches):
        kb = jax.random.fold_in(key, b)
        jitter = (
            _gen_jitter(kb, batch, sampling_n, sampling_delta)
            if with_linedir else no_jitter
        )
        chunk_pts = jnp.asarray(padded[b * batch : (b + 1) * batch])
        pending.append(fn(params, chunk_pts, jitter))
    udf_out = [np.asarray(u) for u, _, _ in pending]
    nrm_out = [np.asarray(nv) for _, nv, _ in pending]
    ld_out = [np.asarray(ld) for _, _, ld in pending]
    return (
        np.concatenate(udf_out)[:m],
        np.concatenate(nrm_out)[:m],
        np.concatenate(ld_out)[:m],
    )


def extract_fields(
    params, ucfg: UDFConfig, bound_min, bound_max, resolution: int,
    chunk: int = 65536,
):
    """Dense UDF grid over an arbitrary AABB, (res, res, res) numpy.

    API analog of the reference's chunked grid helpers
    (udf_renderer_blending.py:8-36); the pipeline's own extraction uses the
    fixed [-1,1]^3 grid path below."""
    axes = [
        np.linspace(bound_min[d], bound_max[d], resolution, dtype=np.float32)
        for d in range(3)
    ]
    xx, yy, zz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    out = np.empty(len(pts), np.float32)
    pad = (-len(pts)) % chunk
    padded = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    fn = jax.jit(lambda p: udf_value(params, p, ucfg))
    for start in range(0, len(padded), chunk):
        vals = fn(jnp.asarray(padded[start : start + chunk]))
        n_here = min(chunk, len(pts) - start)
        if n_here > 0:
            out[start : start + n_here] = np.asarray(vals)[:n_here]
    return out.reshape(resolution, resolution, resolution)


def extract_gradient_fields(
    params, ucfg: UDFConfig, bound_min, bound_max, resolution: int,
    chunk: int = 65536,
):
    """Dense UDF-gradient grid, (res, res, res, 3) numpy (analog of
    udf_renderer_blending.py:39-66)."""
    axes = [
        np.linspace(bound_min[d], bound_max[d], resolution, dtype=np.float32)
        for d in range(3)
    ]
    xx, yy, zz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    out = np.empty((len(pts), 3), np.float32)
    pad = (-len(pts)) % chunk
    padded = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    fn = jax.jit(
        lambda p: udf_value_and_gradient(params, p, ucfg)[1]
    )
    for start in range(0, len(padded), chunk):
        grads = fn(jnp.asarray(padded[start : start + chunk]))
        n_here = min(chunk, len(pts) - start)
        if n_here > 0:
            out[start : start + n_here] = np.asarray(grads)[:n_here]
    return out.reshape(resolution, resolution, resolution, 3)


def extract_pointcloud(
    params,
    ucfg: UDFConfig,
    resolution: int = 128,
    udf_threshold: float = 0.02,
    sampling_N: int = 50,
    sampling_delta: float = 5e-3,
    is_pointshift: bool = False,
    iters: int = 1,
    is_linedirection: bool = False,
    seed: int = 42,
    grid_chunk: int = 1 << 22,
    point_batch: int | None = None,
    use_pallas: bool | None = None,
    mesh=None,
):
    """Edge point cloud from the UDF (reference get_pointcloud_from_udf
    :212-293). Returns (points (M,3), line_directions (M,3)) numpy arrays.

    mesh (optional jax.sharding.Mesh): shard the grid sweep and feature
    batches over the mesh's "data" axis (params replicated) — the same
    data-parallel decomposition as training. Bit-equal to single-device
    (row-wise math only; pinned by tests/test_extract.py).

    use_pallas=None (auto, the default) routes both the dense GRID queries
    and the candidate FEATURE batches through the fused feature-major Pallas
    kernels when on a real TPU -- measured 1.53x vs XLA at the 256^3 grid
    with 1M-point chunks, and the fwd+grad kernel wins 1.48x at >=262k
    points per call (scripts/bench_kernels.py). The kernel computes
    value+grad directly (no vjp residuals), so the feature batch can be far
    larger than XLA autodiff allows: point_batch=None auto-picks 65536
    candidates (x51 jitter = 3.3M points/call; XLA's jvp would need 21 GB
    of activations there) on the kernel path and the residual-bound 4096 on
    the XLA path. Per-dispatch overhead dominates this phase (measured
    ~0.1-0.3 s/dispatch through the tunneled runtime at any batch size), so
    fewer, larger batches win: 5.2 s -> 0.65 s for the 236k-candidate
    feature sweep going 4096 -> 65536. Pass True/False to force both paths
    on/off.

    grid_chunk defaults to 4M points per dispatch for the same reason; with
    the packed-bitmask fetch the result transfer is 512 KB per chunk.
    """
    if use_pallas is None:
        from emap_tpu.kernels import pallas_available

        # kernels are specialized for the scalar-UDF head (d_out == 1)
        grid_pallas = feature_pallas = pallas_available() and ucfg.d_out == 1
    else:
        grid_pallas = feature_pallas = use_pallas
    if point_batch is None:
        point_batch = 65536 if feature_pallas else 4096
    key = jax.random.key(seed)
    N = resolution
    total = N**3
    n_dev = mesh.shape["data"] if mesh is not None else 1
    chunk = min(grid_chunk, total)
    # packbits: each (per-device) chunk must pack whole bytes
    chunk += (-chunk) % (8 * n_dev)

    # --- phase 1: near-surface bitmask over the grid (device chunks) ---
    # Dispatch all chunks before fetching (async dispatch pipelines the
    # device work); only packed bits cross the tunnel, never grid values.
    starts = list(range(0, total, chunk))
    masks = _grid_masks(params, starts, (float(udf_threshold),), chunk, N,
                        ucfg, grid_pallas, mesh)
    near = np.unpackbits(masks[0], count=total).astype(bool)

    # --- phase 2: candidate coords + first feature sweep ---
    cand_idx = np.nonzero(near)[0]
    voxel = 2.0 / (N - 1)
    xyz = np.stack(
        [
            (cand_idx // (N * N)) % N,
            (cand_idx // N) % N,
            cand_idx % N,
        ],
        axis=-1,
    ).astype(np.float32) * voxel - 1.0

    want_dirs_now = is_linedirection and not (is_pointshift and iters > 0)
    # The sweep re-queries the udf at each candidate, so the grid values
    # never need to be fetched from the device.
    df, normals, line_dirs = _run_point_batches(
        params, ucfg, xyz, jax.random.fold_in(key, 0), sampling_N,
        sampling_delta, want_dirs_now, point_batch, feature_pallas, mesh,
    )
    df = np.maximum(df, 0.0)

    # --- phase 3: point shift toward the zero set (reference :271-288) ---
    if is_pointshift and iters > 0:
        for it in range(iters):
            xyz = xyz + df[:, None] * normals
            last = it == iters - 1
            df, normals, line_dirs = _run_point_batches(
                params, ucfg, xyz, jax.random.fold_in(key, it + 1),
                sampling_N, sampling_delta, is_linedirection and last,
                point_batch, feature_pallas, mesh,
            )
            keep = df <= udf_threshold
            xyz, df, normals, line_dirs = (
                xyz[keep], df[keep], normals[keep], line_dirs[keep],
            )

    return xyz.astype(np.float32), line_dirs.astype(np.float32)


def extract_pointcloud_multi(
    params,
    ucfg: UDFConfig,
    resolution: int,
    thresholds,
    sampling_N: int = 50,
    sampling_delta: float = 5e-3,
    is_pointshift: bool = False,
    iters: int = 1,
    is_linedirection: bool = False,
    seed: int = 42,
    grid_chunk: int = 1 << 22,
    point_batch: int | None = None,
    use_pallas: bool | None = None,
    mesh=None,
):
    """Extraction at K candidate thresholds for ONE grid + feature cost.

    The selector (extract/autothresh.py) previously ran the full dense
    grid + feature sweep + point shift once per candidate (K+1 passes at
    256^3 — 10:55 measured for the 200k DTU run). Every device-side
    quantity is threshold-independent: the grid UDF values, the per-point
    feature sweep (udf/normals are deterministic per point), and the shift
    trajectories. Only the MEMBERSHIP tests (grid mask, per-iteration
    keep) depend on the threshold, and for t <= t_max they are pure
    row-filters of the t_max run: a point dropped by the t_max keep
    (df > t_max) is dropped for every t, and a point alive for t has
    followed the identical shift trajectory. So one run at max(thresholds)
    with per-candidate alive-mask bookkeeping reproduces each standalone
    run exactly, except the line-direction jitter draw (keyed by batch
    layout, a 50-sample average — the same re-roll class as the documented
    platform spread). With K=1 the result is bit-identical to
    extract_pointcloud (pinned by tests/test_extract.py).

    Returns {float(thr): (points (M_t,3), line_dirs (M_t,3))}.
    """
    thresholds = sorted(float(t) for t in thresholds)
    t_max = thresholds[-1]
    if use_pallas is None:
        from emap_tpu.kernels import pallas_available

        grid_pallas = feature_pallas = pallas_available() and ucfg.d_out == 1
    else:
        grid_pallas = feature_pallas = use_pallas
    if point_batch is None:
        point_batch = 65536 if feature_pallas else 4096
    key = jax.random.key(seed)
    N = resolution
    total = N**3
    n_dev = mesh.shape["data"] if mesh is not None else 1
    chunk = min(grid_chunk, total)
    chunk += (-chunk) % (8 * n_dev)

    # --- phase 1: per-threshold bitmasks from ONE dense grid pass ---
    starts = list(range(0, total, chunk))
    masks = _grid_masks(params, starts, tuple(thresholds), chunk, N, ucfg,
                        grid_pallas, mesh)
    near = [np.unpackbits(masks[k], count=total).astype(bool)
            for k in range(len(thresholds))]

    # --- phase 2: superset candidates (t_max) + first feature sweep ---
    cand_idx = np.nonzero(near[-1])[0]
    voxel = 2.0 / (N - 1)
    xyz = np.stack(
        [
            (cand_idx // (N * N)) % N,
            (cand_idx // N) % N,
            cand_idx % N,
        ],
        axis=-1,
    ).astype(np.float32) * voxel - 1.0
    n_super = len(cand_idx)
    # alive[k, i]: superset row i is in candidate k's extraction so far
    alive = np.stack([m[cand_idx] for m in near])

    want_dirs_now = is_linedirection and not (is_pointshift and iters > 0)
    df, normals, line_dirs = _run_point_batches(
        params, ucfg, xyz, jax.random.fold_in(key, 0), sampling_N,
        sampling_delta, want_dirs_now, point_batch, feature_pallas, mesh,
    )
    df = np.maximum(df, 0.0)

    # --- phase 3: shared shift trajectories, per-candidate keep masks ---
    rows = np.arange(n_super)  # original superset row of each live point
    if is_pointshift and iters > 0:
        for it in range(iters):
            xyz = xyz + df[:, None] * normals
            last = it == iters - 1
            df, normals, line_dirs = _run_point_batches(
                params, ucfg, xyz, jax.random.fold_in(key, it + 1),
                sampling_N, sampling_delta, is_linedirection and last,
                point_batch, feature_pallas, mesh,
            )
            for k, t in enumerate(thresholds):
                alive[k, rows] &= df <= t
            keep = df <= t_max
            xyz, df, normals, line_dirs, rows = (
                xyz[keep], df[keep], normals[keep], line_dirs[keep],
                rows[keep],
            )

    out = {}
    for k, t in enumerate(thresholds):
        sel = alive[k, rows]
        out[t] = (
            xyz[sel].astype(np.float32),
            line_dirs[sel].astype(np.float32),
        )
    return out
