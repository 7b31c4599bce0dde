"""Multi-chip correctness: the ray-sharded train step must produce the same
numbers as the single-chip step (same program, GSPMD partitioning only)."""

import jax
import numpy as np
import pytest

from emap_tpu import config
from emap_tpu.data import RayPool, load_scene, make_synthetic_scene
from emap_tpu.fields import UDFConfig
from emap_tpu.parallel import build_sharded_train_step, make_mesh, replicate
from emap_tpu.render import RenderConfig
from emap_tpu.train import build_train_step, init_train_state
from emap_tpu.train.step import TrainConfig


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("par")
    make_synthetic_scene(str(root), scan="c", n_views=3, H=32, W=32)
    conf = config.Config(
        {"data_dir": str(root), "scan": "c", "detector": "DexiNed",
         "near": 0.05, "far": 4.5}
    )
    scene = load_scene(conf)
    ucfg = UDFConfig(d_hidden=32, n_layers=2, skip_in=(1,), multires=2)
    rcfg = RenderConfig(n_samples=8, n_importance=5, up_sample_steps=5,
                        sampler_precision="highest")
    tcfg = TrainConfig(batch_size=32, end_iter=100, warm_up_end=5.0,
                       anneal_end=10.0, fix_geo_end=2.0,
                       near=scene.near, far=scene.far)
    return scene, ucfg, rcfg, tcfg


def test_sharded_step_matches_single_chip(setup):
    scene, ucfg, rcfg, tcfg = setup
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(8)

    pool_single = RayPool.from_scene(scene)
    state_single = init_train_state(3, ucfg)
    step_single = build_train_step(tcfg, rcfg, ucfg, scene.n_images,
                                   donate=False)

    pool_shard = replicate(RayPool.from_scene(scene), mesh)
    state_shard = replicate(init_train_state(3, ucfg), mesh)
    step_shard = build_sharded_train_step(tcfg, rcfg, ucfg, scene.n_images,
                                          mesh, donate=False)

    for _ in range(2):
        state_single, m_single = step_single(state_single, pool_single)
        state_shard, m_shard = step_shard(state_shard, pool_shard)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_shard["loss"]), rtol=1e-4
    )
    # parameters must agree leaf-wise after two updates
    flat_s = jax.tree.leaves(state_single.params)
    flat_p = jax.tree.leaves(state_shard.params)
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )
