"""Driver entry points.

entry() -> (fn, example_args): a jittable forward render step on the flagship
model (full ABC-conf UDF field + unbiased renderer).

dryrun_multichip(n_devices): builds an n-device mesh, jits the FULL training
step with ray sharding over it, and runs one step on tiny shapes.
"""

import os
import tempfile

import numpy as np


def _flagship_configs():
    from emap_tpu.fields.udf import UDFConfig
    from emap_tpu.render.renderer import RenderConfig

    # ABC conf values (confs/ABC.conf)
    ucfg = UDFConfig()  # 8x256, multires 10, geometric init + weight norm
    rcfg = RenderConfig()  # 64 + 5x10 samples, unbiased two-sided render
    return ucfg, rcfg


def entry():
    import jax
    import jax.numpy as jnp

    from emap_tpu.render.renderer import render
    from emap_tpu.train.state import init_train_state

    ucfg, rcfg = _flagship_configs()
    state = init_train_state(42, ucfg)

    batch = 128
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(
        np.tile([[0.0, 0.0, -2.0]], (batch, 1))
        + rng.normal(scale=0.05, size=(batch, 3)),
        dtype=jnp.float32,
    )
    rays_d = rng.normal(size=(batch, 3))
    rays_d[:, 2] += 3.0
    rays_d = jnp.asarray(
        rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True),
        dtype=jnp.float32,
    )
    depth_scale = jnp.ones((batch, 1), jnp.float32)
    key = jax.random.key(0)

    def fn(params, rays_o, rays_d, depth_scale, key):
        out = render(
            params, rays_o, rays_d, 0.05, 6.0, depth_scale, key, rcfg, ucfg,
            cos_anneal_ratio=1.0, flip_saturation=0.9,
        )
        return out["edge"], out["depth"], out["normals"]

    return fn, (state.params, rays_o, rays_d, depth_scale, key)


def dryrun_multichip(n_devices: int) -> None:
    # XLA_FLAGS is consumed when the CPU backend is created, which has not
    # happened yet unless something already ran a CPU computation -- so the
    # virtual-device-count flag can still be injected here even though the
    # axon sitecustomize force-sets JAX_PLATFORMS at interpreter start.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # Force the CPU platform unconditionally: the dryrun validates that the
    # multi-chip sharding compiles + executes, and the single real TPU chip
    # (axon tunnel) can never satisfy an n-device mesh anyway. The env var
    # alone is IGNORED once the axon sitecustomize has set
    # jax.config.jax_platforms at interpreter start -- the config must be
    # updated explicitly, before any backend initialization (same pattern as
    # tests/conftest.py; round-1 dryrun crashed on the axon backend for want
    # of this).
    jax.config.update("jax_platforms", "cpu")

    from emap_tpu import config
    from emap_tpu.data import RayPool, load_scene, make_synthetic_scene
    from emap_tpu.fields.udf import UDFConfig
    from emap_tpu.parallel import build_sharded_train_step, make_mesh, replicate
    from emap_tpu.render.renderer import RenderConfig
    from emap_tpu.train.state import init_train_state
    from emap_tpu.train.step import TrainConfig

    devices = jax.devices()
    if len(devices) < n_devices:
        # default platform too small (e.g. 1 real TPU chip): fall back to the
        # virtual CPU mesh
        devices = jax.devices("cpu")
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    from jax.sharding import Mesh

    mesh = Mesh(devices[:n_devices], ("data",))

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_scene(tmp, scan="dryrun", n_views=3, H=32, W=32)
        conf = config.Config(
            {
                "data_dir": tmp,
                "scan": "dryrun",
                "detector": "DexiNed",
                "near": 0.05,
                "far": 4.5,
            }
        )
        scene = load_scene(conf)

    pool = RayPool.from_scene(scene)
    # tiny shapes, REAL sharding: rays shard across the mesh, params replicate
    ucfg = UDFConfig(d_hidden=32, n_layers=2, skip_in=(1,), multires=2)
    rcfg = RenderConfig(n_samples=8, n_importance=5, up_sample_steps=5)
    tcfg = TrainConfig(
        batch_size=8 * n_devices, end_iter=100, warm_up_end=10.0,
        anneal_end=20.0, fix_geo_end=2.0, near=scene.near, far=scene.far,
    )

    state = init_train_state(0, ucfg)
    state = replicate(state, mesh)
    pool = replicate(pool, mesh)

    step_fn = build_sharded_train_step(
        tcfg, rcfg, ucfg, scene.n_images, mesh, donate=False
    )
    state, metrics = step_fn(state, pool)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss} in multichip dryrun"
    assert int(state.step) == 1
    print(f"dryrun_multichip({n_devices}): ok, loss={loss:.4f}")


if __name__ == "__main__":
    fn, args = entry()
    import jax

    out = jax.jit(fn)(*args)
    print("entry ok:", [o.shape for o in out])
    dryrun_multichip(min(len(jax.devices()), 8))
