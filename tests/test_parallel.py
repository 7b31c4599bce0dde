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


@pytest.fixture(scope="module")
def single_chip_run(setup):
    """4 per-step single-chip steps: per-step losses + final params."""
    scene, ucfg, rcfg, tcfg = setup
    pool = RayPool.from_scene(scene)
    state = init_train_state(3, ucfg)
    step = build_train_step(tcfg, rcfg, ucfg, scene.n_images, donate=False)
    losses = []
    for _ in range(4):
        state, m = step(state, pool)
        losses.append(float(m["loss"]))
    return losses, jax.tree.leaves(state.params)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_mesh_size_sweep_loss_equivalence(setup, single_chip_run, n_dev):
    """GSPMD re-partitions the same program: mesh sizes 2/4/8 must produce
    the single-chip loss trajectory (pins the bench_scaling.py invariant
    as CI; VERDICT r1 item 5)."""
    scene, ucfg, rcfg, tcfg = setup
    assert len(jax.devices()) >= n_dev
    mesh = make_mesh(n_dev)
    pool = replicate(RayPool.from_scene(scene), mesh)
    state = replicate(init_train_state(3, ucfg), mesh)
    step = build_sharded_train_step(tcfg, rcfg, ucfg, scene.n_images, mesh,
                                    donate=False)
    ref_losses, ref_params = single_chip_run
    for i in range(4):
        state, m = step(state, pool)
        np.testing.assert_allclose(float(m["loss"]), ref_losses[i],
                                   rtol=1e-4)
    for a, b in zip(ref_params, jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_chained_scan_under_mesh_matches_per_step(setup, single_chip_run):
    """The lax.scan chained dispatch under an 8-device mesh must reproduce
    the per-step single-chip trajectory step-for-step (loss rows) and land
    on the same parameters."""
    from emap_tpu.train.step import METRIC_KEYS, build_chained_train_step

    scene, ucfg, rcfg, tcfg = setup
    mesh = make_mesh(8)
    pool = replicate(RayPool.from_scene(scene), mesh)
    state = replicate(init_train_state(3, ucfg), mesh)
    chained = build_chained_train_step(tcfg, rcfg, ucfg, scene.n_images,
                                       chain=4, donate=False, mesh=mesh)
    state, rows = chained(state, pool)
    ref_losses, ref_params = single_chip_run
    loss_idx = METRIC_KEYS.index("loss")
    np.testing.assert_allclose(
        np.asarray(rows)[:, loss_idx], np.asarray(ref_losses), rtol=1e-4
    )
    for a, b in zip(ref_params, jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


class TestCliMeshFallback:
    """build_mesh_from_conf trims the mesh to the largest even ray split
    (emap_tpu/cli.py:34-63); previously only exercised manually."""

    def _conf(self, multi=True):
        return config.Config({"train": {"multi_device": multi}})

    def test_even_batch_uses_all_devices(self):
        from emap_tpu.cli import build_mesh_from_conf

        mesh = build_mesh_from_conf(self._conf(), 32)
        assert mesh is not None and mesh.devices.size == 8

    def test_uneven_batch_trims_mesh(self):
        from emap_tpu.cli import build_mesh_from_conf

        # 12 % 8 != 0, % 7 != 0, % 6 == 0 -> 6-device mesh
        mesh = build_mesh_from_conf(self._conf(), 12)
        assert mesh is not None and mesh.devices.size == 6

    def test_prime_batch_falls_back_single_device(self, caplog):
        from emap_tpu.cli import build_mesh_from_conf

        with caplog.at_level("WARNING"):
            mesh = build_mesh_from_conf(self._conf(), 13)
        assert mesh is None
        assert any("no usable device split" in r.message for r in caplog.records)

    def test_multi_device_false_disables(self):
        from emap_tpu.cli import build_mesh_from_conf

        assert build_mesh_from_conf(self._conf(multi=False), 32) is None


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


def test_production_width_sharded_matches_single():
    """Production-WIDTH sharded equivalence, default-run (VERDICT r4 weak
    #2: the toy 32-wide tests can hide padding/tile bugs that appear only
    at 8x256/multires-10, and the flagship wrapper is slow-gated so kernel/
    parallel edits never re-proved flagship sharding in CI). One step at
    the full production field width but tiny ray/sample counts keeps the
    compile cheap while exercising the width-dependent sharding layout.
    The full 64+50-sample flagship program stays covered by
    dryrun_multichip's production tier (driver-run every round) and
    scripts/multichip_flagship.py."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_scene(tmp, scan="pw", n_views=3, H=32, W=32)
        conf = config.Config(
            {"data_dir": tmp, "scan": "pw", "detector": "DexiNed",
             "near": 0.05, "far": 4.5}
        )
        scene = load_scene(conf)

    ucfg = UDFConfig()  # 8x256, multires 10 — the shipped ABC field
    rcfg = RenderConfig(n_samples=8, n_importance=5, up_sample_steps=5,
                        sampler_precision="highest")
    tcfg = TrainConfig(batch_size=16, end_iter=100, warm_up_end=5.0,
                       anneal_end=10.0, fix_geo_end=2.0,
                       near=scene.near, far=scene.far)

    pool = RayPool.from_scene(scene)
    state1 = init_train_state(5, ucfg)
    step1 = build_train_step(tcfg, rcfg, ucfg, scene.n_images, donate=False)
    state1, m1 = step1(state1, pool)

    mesh = make_mesh(8)
    pool8 = replicate(RayPool.from_scene(scene), mesh)
    state8 = replicate(init_train_state(5, ucfg), mesh)
    step8 = build_sharded_train_step(tcfg, rcfg, ucfg, scene.n_images, mesh,
                                     donate=False)
    state8, m8 = step8(state8, pool8)

    np.testing.assert_allclose(
        float(m8["loss"]), float(m1["loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state8.params)):
        a, b = np.asarray(a), np.asarray(b)
        err = float(np.max(np.abs(b - a)) / (np.max(np.abs(a)) + 1e-12))
        assert err < 2e-4, err
