import numpy as np
import pytest

from emap_tpu.utils.guards import TrainingDiverged, assert_finite_metrics
from emap_tpu.utils.optim_factory import get_optimizer, get_scheduler
from emap_tpu.utils.vis import get_flow_vis, semantic_color_map, visualize_depth


class TestGuards:
    def test_passes_finite(self):
        assert_finite_metrics({"loss": 0.5, "psnr": 20.0}, 100)

    def test_raises_on_nan(self):
        with pytest.raises(TrainingDiverged, match="step 7"):
            assert_finite_metrics({"loss": float("nan")}, 7)

    def test_raises_on_inf(self):
        with pytest.raises(TrainingDiverged):
            assert_finite_metrics({"edge_loss": float("inf")}, 1)


class TestVis:
    def test_visualize_depth(self):
        img = visualize_depth(np.random.default_rng(0).uniform(1, 5, (8, 8)))
        assert img.shape == (8, 8, 3) and img.dtype == np.uint8

    def test_flow_vis(self):
        img = get_flow_vis(np.linspace(0, 2 * np.pi, 64).reshape(8, 8))
        assert img.shape == (8, 8, 3) and img.dtype == np.uint8

    def test_color_map(self):
        cm = semantic_color_map(40)
        assert cm.shape == (40, 3)
        assert (cm >= 0).all() and (cm <= 1).all()


class TestOptimFactory:
    def test_schedulers(self):
        for kind in ("steplr", "cosine", "poly"):
            sched = get_scheduler(
                kind, 1e-3, 1000, decay_step=100, warmup_steps=10,
                warmup_multiplier=2.0,
            )
            assert float(sched(0)) == pytest.approx(5e-4, rel=1e-5)
            assert float(sched(10)) == pytest.approx(1e-3, rel=1e-5)
            assert float(sched(999)) <= 1e-3

    def test_optimizers(self):
        import jax.numpy as jnp

        params = {"w": jnp.ones(4)}
        grads = {"w": jnp.full(4, 0.1)}
        for kind in ("sgd", "adam", "adamw", "radam"):
            tx = get_optimizer(kind, 1e-2, weight_decay=1e-4)
            state = tx.init(params)
            updates, state = tx.update(grads, state, params)
            new_w = np.asarray(params["w"] + updates["w"])
            assert np.isfinite(new_w).all()
            assert (new_w < 1.0).all()
