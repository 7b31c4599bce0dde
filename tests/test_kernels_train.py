"""Tests for the fused training-path field-query kernel
(emap_tpu/kernels/mlp_train.py): hand-derived second-order backward vs JAX
autodiff, integration into the train step, and shard_map'd multi-device use.

All run in interpret mode on the CPU harness (same code path as TPU, minus
Mosaic lowering, which is covered by the TPU benchmarks)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emap_tpu.fields.udf import (
    UDFConfig,
    init_udf_params,
    udf_value_and_gradient,
)
from emap_tpu.kernels.mlp_train import pallas_udf_train_value_and_gradient


def _loss_pair(cfg, N=192, seed=1, tile=128):
    """(loss_fn_xla, loss_fn_kernel, params): eikonal-style second-order
    loss through value+gradient."""
    params = init_udf_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
    w_u = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    w_g = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)

    def mk(qfn):
        def loss(p):
            u, g = qfn(p, pts, cfg)
            return (
                jnp.sum(w_u * u)
                + jnp.sum(w_g * g)
                + 0.1 * jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
            )
        return loss

    ker = lambda p, x, c: pallas_udf_train_value_and_gradient(
        p, x, c, tile_fwd=tile, tile_bwd=tile, interpret=True
    )
    return mk(udf_value_and_gradient), mk(ker), params


def _max_rel_err(tree_a, tree_b):
    fa = jax.tree_util.tree_leaves(tree_a)
    fb = jax.tree_util.tree_leaves(tree_b)
    worst = 0.0
    for x, y in zip(fa, fb):
        scale = float(jnp.max(jnp.abs(y))) + 1e-12
        worst = max(worst, float(jnp.max(jnp.abs(x - y))) / scale)
    return worst


class TestTrainKernelGrads:
    def test_second_order_grads_match_autodiff(self):
        """Weight/bias/weight-norm grads through the hand-derived backward
        match jax.vjp through the pure-JAX query to f32 roundoff."""
        cfg = UDFConfig(d_hidden=64, n_layers=8, multires=6,
                        precision="highest")
        l_xla, l_ker, params = _loss_pair(cfg)
        v_x, g_x = jax.jit(jax.value_and_grad(l_xla))(params)
        v_k, g_k = jax.jit(jax.value_and_grad(l_ker))(params)
        assert float(jnp.abs(v_x - v_k)) < 1e-4 * (1 + abs(float(v_x)))
        assert _max_rel_err(g_k, g_x) < 3e-4

    def test_bwd_precision_knob(self):
        """bwd_precision lowers only the adjoint dots: grads stay within the
        1-pass-bf16 noise band of the exact ones (measured 7.6e-3 rel at
        production width -- why the production default inherits "high";
        see UDFConfig.bwd_precision)."""
        base = dict(d_hidden=64, n_layers=5, multires=4)
        l_xla, _, params = _loss_pair(UDFConfig(**base, precision="highest"))
        _, l_ker, _ = _loss_pair(
            UDFConfig(**base, precision="highest", bwd_precision="default")
        )
        g_x = jax.jit(jax.grad(l_xla))(params)
        g_k = jax.jit(jax.grad(l_ker))(params)
        err = _max_rel_err(g_k, g_x)
        assert 1e-6 < err < 3e-2  # lowered tier actually engaged, bounded

    def test_cache_acts_bitwise_identical(self):
        """cache_acts only memoizes the backward's re-derived activations
        (sigmoid/softplus of the SAME stored f32 z, computed once instead of
        ~6x/2x per layer) — grads must be bitwise equal, not just close."""
        base = dict(d_hidden=64, n_layers=8, multires=6, fuse_pe=True,
                    precision="highest")
        _, l_off, params = _loss_pair(UDFConfig(**base, cache_acts=False))
        _, l_on, _ = _loss_pair(UDFConfig(**base, cache_acts=True))
        g_off = jax.jit(jax.grad(l_off))(params)
        g_on = jax.jit(jax.grad(l_on))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_off),
                        jax.tree_util.tree_leaves(g_on)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("udf_type", ["sdf", "square"])
    def test_other_heads(self, udf_type):
        cfg = UDFConfig(d_hidden=64, n_layers=5, multires=4,
                        precision="highest", udf_type=udf_type)
        l_xla, l_ker, params = _loss_pair(cfg, N=96)
        _, g_x = jax.jit(jax.value_and_grad(l_xla))(params)
        _, g_k = jax.jit(jax.value_and_grad(l_ker))(params)
        assert _max_rel_err(g_k, g_x) < 3e-4

    @pytest.mark.parametrize(
        "fuse_pe,chain_split,chain_mode",
        [(True, 1, "seq"), (False, 2, "seq"), (True, 2, "seq"),
         (False, 2, "interleave"), (True, 2, "interleave")])
    def test_fuse_pe_and_chain_split_match_autodiff(self, fuse_pe,
                                                    chain_split, chain_mode):
        """The in-kernel PE encode/Jacobian (blocked layout + permuted
        weight columns) and the chain_split sub-chain carve-up — in both
        the sequential and the layer-interleaved scheduling — reproduce
        the pure-JAX second-order grads to f32 roundoff: all three knobs
        are pure scheduling/layout changes, not approximations."""
        cfg = UDFConfig(d_hidden=64, n_layers=8, multires=6,
                        precision="highest", fuse_pe=fuse_pe,
                        chain_split=chain_split, chain_mode=chain_mode)
        l_xla, l_ker, params = _loss_pair(cfg, N=256, tile=256)
        v_x, g_x = jax.jit(jax.value_and_grad(l_xla))(params)
        v_k, g_k = jax.jit(jax.value_and_grad(l_ker))(params)
        assert float(jnp.abs(v_x - v_k)) < 1e-4 * (1 + abs(float(v_x)))
        assert _max_rel_err(g_k, g_x) < 3e-4

    def test_interleave_matches_seq_closely(self):
        """Interleaved scheduling issues the SAME dots on the SAME operands
        as the sequential sub-chains — only accumulation order differs, so
        the grads agree far tighter than either agrees with XLA autodiff."""
        base = dict(d_hidden=64, n_layers=8, multires=6, fuse_pe=True,
                    precision="highest", chain_split=2)
        _, l_seq, params = _loss_pair(UDFConfig(**base, chain_mode="seq"),
                                      N=256, tile=256)
        _, l_il, _ = _loss_pair(UDFConfig(**base, chain_mode="interleave"),
                                N=256, tile=256)
        g_seq = jax.jit(jax.grad(l_seq))(params)
        g_il = jax.jit(jax.grad(l_il))(params)
        assert _max_rel_err(g_il, g_seq) < 1e-6


@pytest.fixture(scope="module")
def tiny_pool(tmp_path_factory):
    from emap_tpu import config
    from emap_tpu.data import RayPool, load_scene, make_synthetic_scene

    root = tmp_path_factory.mktemp("ktrain_data")
    make_synthetic_scene(str(root), scan="cube000", n_views=4, H=48, W=48)
    conf = config.Config(
        {"data_dir": str(root), "scan": "cube000", "detector": "DexiNed",
         "near": 0.05, "far": 4.5}
    )
    scene = load_scene(conf)
    return scene, RayPool.from_scene(scene)


def _tiny_setup(pallas_train, scene, pool, mesh=None):
    from emap_tpu.render.renderer import RenderConfig
    from emap_tpu.train.state import init_train_state
    from emap_tpu.train.step import TrainConfig, build_train_step

    ucfg = UDFConfig(d_hidden=64, n_layers=8, multires=6,
                     precision="highest", pallas_train=pallas_train)
    rcfg = RenderConfig(n_samples=16, n_importance=10)
    tcfg = TrainConfig(batch_size=64, end_iter=1000, near=scene.near,
                       far=scene.far)
    state = init_train_state(7, ucfg)
    step = build_train_step(tcfg, rcfg, ucfg, scene.n_images, donate=False,
                            mesh=mesh)
    return step, state


class TestTrainStepIntegration:
    def test_auto_gate_routes_highest_to_xla(self):
        """precision=highest cannot lower through the backward kernel
        (Mosaic scoped-VMEM stack OOM on v5e: 38.4M vs the 16M limit), and a
        user pinning HIGHEST wants exact f32 -- auto mode must route it to
        XLA autodiff. "on" still forces the kernel."""
        from emap_tpu.render.renderer import _use_pallas_train

        assert not _use_pallas_train(UDFConfig(precision="highest"))
        assert not _use_pallas_train(
            UDFConfig(precision="high", bwd_precision="highest")
        )
        assert _use_pallas_train(
            UDFConfig(precision="highest", pallas_train="on")
        )
        assert not _use_pallas_train(
            UDFConfig(precision="highest", pallas_train="off")
        )
        # kernels are specialized for the scalar head; d_out != 1 (feature
        # channels, unused by the pipeline) must take XLA even when forced
        assert not _use_pallas_train(UDFConfig(d_out=2, pallas_train="on"))

    def test_step_with_kernel_matches_xla_step(self, tiny_pool):
        """One full train step with the fused kernel (forced, interpret)
        reproduces the XLA step's loss and updated params."""
        scene, pool = tiny_pool
        step_k, state = _tiny_setup("on", scene, pool)
        step_x, _ = _tiny_setup("off", scene, pool)
        s_k, m_k = step_k(state, pool)
        s_x, m_x = step_x(state, pool)
        assert float(jnp.abs(m_k["loss"] - m_x["loss"])) < 1e-4
        assert _max_rel_err(s_k.params, s_x.params) < 1e-4

    def test_sharded_kernel_step_matches_single(self, tiny_pool):
        """The shard_map'd kernel path on the 8-device mesh reproduces the
        unsharded kernel step (params replicated, grads psummed by the
        shard_map transpose)."""
        from emap_tpu.parallel.mesh import make_mesh, replicate

        scene, pool = tiny_pool
        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        step_1, state = _tiny_setup("on", scene, pool)
        step_8, _ = _tiny_setup("on", scene, pool, mesh=mesh)
        s_1, m_1 = step_1(state, pool)
        s_8, m_8 = step_8(replicate(state, mesh), replicate(pool, mesh))
        assert float(jnp.abs(m_1["loss"] - m_8["loss"])) < 1e-5 * (
            1 + abs(float(m_1["loss"]))
        )
        assert _max_rel_err(s_8.params, s_1.params) < 1e-4
