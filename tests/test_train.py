"""Training-layer tests: schedules, masked Adam, and a short smoke train."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emap_tpu import config
from emap_tpu.data import RayPool, load_scene, make_synthetic_scene
from emap_tpu.fields import UDFConfig
from emap_tpu.render import RenderConfig
from emap_tpu.train import (
    build_train_step,
    cos_anneal_ratio,
    flip_saturation,
    init_train_state,
    lr_factor,
    lr_factor_geo,
)
from emap_tpu.train.optim import adam_init, adam_update
from emap_tpu.train.step import TrainConfig


class TestSchedules:
    def test_lr_factor(self):
        # warmup ramp, then cosine from 1 to alpha
        assert float(lr_factor(0, 1000, 50000, 0.05)) == 0.0
        assert float(lr_factor(500, 1000, 50000, 0.05)) == pytest.approx(0.5)
        assert float(lr_factor(1000, 1000, 50000, 0.05)) == pytest.approx(1.0)
        assert float(lr_factor(50000, 1000, 50000, 0.05)) == pytest.approx(0.05)

    def test_lr_factor_geo(self):
        assert float(lr_factor_geo(100, 200, 1000, 50000, 0.05)) == 0.0
        assert float(lr_factor_geo(1000, 200, 1000, 50000, 0.05)) == pytest.approx(0.5)
        assert float(lr_factor_geo(2000, 200, 1000, 50000, 0.05)) == 1.0
        assert float(lr_factor_geo(20000, 200, 1000, 50000, 0.05)) == 1.0
        assert float(lr_factor_geo(50000, 200, 1000, 50000, 0.05)) == pytest.approx(0.05)

    def test_cos_anneal(self):
        assert float(cos_anneal_ratio(5000, 10000)) == 0.5
        assert float(cos_anneal_ratio(20000, 10000)) == 1.0
        assert float(cos_anneal_ratio(0, 0.0)) == 1.0

    def test_flip_saturation(self):
        assert float(flip_saturation(0, 50000)) == 0.0
        assert float(flip_saturation(10000, 50000)) == pytest.approx(0.9)
        assert float(flip_saturation(30000, 50000)) == 1.0


class TestAdam:
    def test_matches_torch_adam(self):
        torch = pytest.importorskip("torch")
        w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
        g_seq = [
            np.random.default_rng(i + 1).normal(size=(4, 3)).astype(np.float32)
            for i in range(5)
        ]
        # torch
        p_t = torch.nn.Parameter(torch.tensor(w0))
        opt = torch.optim.Adam([p_t], lr=1e-2)
        for g in g_seq:
            opt.zero_grad()
            p_t.grad = torch.tensor(g)
            opt.step()
        # ours
        params = {"w": jnp.asarray(w0)}
        state = adam_init(params)
        lr_tree = {"w": jnp.float32(1e-2)}
        mask_tree = {"w": jnp.float32(1.0)}
        for g in g_seq:
            params, state = adam_update(
                params, {"w": jnp.asarray(g)}, state, lr_tree, mask_tree
            )
        np.testing.assert_allclose(
            np.asarray(params["w"]), p_t.detach().numpy(), rtol=1e-4, atol=1e-5
        )

    def test_mask_freezes_param_and_moments(self):
        params = {"a": jnp.ones(3), "b": jnp.ones(3)}
        state = adam_init(params)
        grads = {"a": jnp.ones(3), "b": jnp.ones(3)}
        lr = {"a": jnp.float32(0.1), "b": jnp.float32(0.1)}
        mask = {"a": jnp.float32(1.0), "b": jnp.float32(0.0)}
        new_params, new_state = adam_update(params, grads, state, lr, mask)
        assert not np.allclose(np.asarray(new_params["a"]), 1.0)
        np.testing.assert_array_equal(np.asarray(new_params["b"]), 1.0)
        np.testing.assert_array_equal(np.asarray(new_state.mu["b"]), 0.0)
        assert float(new_state.count["b"]) == 0.0
        assert float(new_state.count["a"]) == 1.0


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    make_synthetic_scene(str(root), scan="cube000", n_views=4, H=48, W=48)
    conf = config.Config(
        {
            "data_dir": str(root),
            "scan": "cube000",
            "detector": "DexiNed",
            "near": 0.05,
            "far": 4.5,
        }
    )
    scene = load_scene(conf)
    pool = RayPool.from_scene(scene)
    ucfg = UDFConfig(d_hidden=32, n_layers=3, skip_in=(2,), multires=4)
    rcfg = RenderConfig(n_samples=16, n_importance=10, up_sample_steps=5)
    tcfg = TrainConfig(
        batch_size=64,
        end_iter=200,
        warm_up_end=10.0,
        anneal_end=50.0,
        fix_geo_end=5.0,
        near=scene.near,
        far=scene.far,
    )
    return scene, pool, ucfg, rcfg, tcfg


class TestTrainStep:
    def test_smoke_train_loss_decreases(self, tiny_setup):
        scene, pool, ucfg, rcfg, tcfg = tiny_setup
        state = init_train_state(42, ucfg)
        step_fn = build_train_step(tcfg, rcfg, ucfg, scene.n_images,
                                   donate=False)
        losses = []
        for _ in range(40):
            state, metrics = step_fn(state, pool)
            losses.append(float(metrics["edge_loss"]))
        assert int(state.step) == 40
        assert np.isfinite(losses).all()
        # edge loss should drop substantially on the tiny scene
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9

    def test_chained_step_matches_single_steps(self, tiny_setup):
        """K steps in one lax.scan dispatch produce the same trajectory and
        per-step metric rows as K single packed-step dispatches (all RNG and
        gating lives in TrainState, so chaining changes dispatch count
        only)."""
        from emap_tpu.train.step import (
            build_chained_train_step,
            build_packed_train_step,
        )

        scene, pool, ucfg, rcfg, tcfg = tiny_setup
        K = 4
        single = build_packed_train_step(tcfg, rcfg, ucfg, scene.n_images,
                                         donate=False)
        chained = build_chained_train_step(tcfg, rcfg, ucfg, scene.n_images,
                                           K, donate=False)

        s_ref = init_train_state(3, ucfg)
        rows_ref = []
        for _ in range(K):
            s_ref, vec = single(s_ref, pool)
            rows_ref.append(np.asarray(vec))
        s_chn, rows = chained(init_train_state(3, ucfg), pool)
        rows = np.asarray(rows)

        assert int(s_chn.step) == int(s_ref.step) == K
        np.testing.assert_allclose(rows, np.stack(rows_ref), rtol=2e-5,
                                   atol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(s_chn.params),
            jax.tree_util.tree_leaves(s_ref.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)

    def test_program_is_seed_independent(self, tiny_setup):
        """The compiled train program must not depend on train.seed: the
        epoch-permutation key lives in TrainState (a runtime input), so two
        TrainConfigs differing only in seed lower to the SAME HLO — one
        compile-cache entry serves every seed/scan (baking the key as a
        trace-time constant used to force a ~10-min remote recompile of the
        chained production program per seed)."""
        import dataclasses

        from emap_tpu.train.step import _build_train_step_fn

        scene, pool, ucfg, rcfg, tcfg = tiny_setup
        state = init_train_state(3, ucfg)

        texts = []
        for seed in (3, 1234):
            fn = _build_train_step_fn(
                dataclasses.replace(tcfg, seed=seed), rcfg, ucfg,
                scene.n_images,
            )
            texts.append(jax.jit(fn).lower(state, pool).as_text())
        assert texts[0] == texts[1]

        # and the perm stream matches the historical trace-time constant
        s = init_train_state(1234, ucfg)
        expect = jax.random.key(1234 + 7919)
        assert np.asarray(
            jax.random.key_data(s.perm_key)
            == jax.random.key_data(expect)
        ).all()

    def test_state_flags_and_metrics(self, tiny_setup):
        scene, pool, ucfg, rcfg, tcfg = tiny_setup
        state = init_train_state(0, ucfg)
        step_fn = build_train_step(tcfg, rcfg, ucfg, scene.n_images,
                                   donate=False)
        state, metrics = step_fn(state, pool)
        for key in (
            "loss", "edge_loss", "psnr", "gradient_error", "variance",
            "beta", "gamma", "lr", "lr_geo", "weight_sum",
        ):
            assert np.isfinite(float(metrics[key])), key
        # geo lr is zero before fix_geo_end
        assert float(metrics["lr_geo"]) == 0.0
        assert bool(state.zeta_trainable) is False
        assert bool(state.variance_trainable) is True
