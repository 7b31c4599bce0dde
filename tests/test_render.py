"""Renderer unit + parity tests.

The parity tests use the PyTorch reference at /root/reference as a test-time
oracle (imported, never copied): identical inputs must produce matching
samplers, alphas, and render outputs. If the reference or torch is
unavailable the parity tests skip and the property tests still run.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emap_tpu.fields import UDFConfig, init_udf_params
from emap_tpu.fields.scalars import init_beta_params, init_variance_params
from emap_tpu.render import RenderConfig, render, sample_pdf_det
from emap_tpu.render.sampling import up_sample_unbias


def _reference(module: str):
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch unavailable")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib

    try:
        return importlib.import_module(module)
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference import failed: {exc}")


SMALL_UDF = UDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4)


class TestSamplePdf:
    def test_matches_reference(self, rng):
        import torch

        ref = _reference("src.models.udf_renderer_blending")
        bins = np.sort(rng.uniform(0, 6, size=(8, 16)).astype(np.float32), axis=-1)
        weights = rng.uniform(0, 1, size=(8, 15)).astype(np.float32)
        ours = np.asarray(sample_pdf_det(jnp.asarray(bins), jnp.asarray(weights), 10))
        theirs = (
            ref.sample_pdf(torch.tensor(bins), torch.tensor(weights), 10, det=True)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_concentrates_samples(self):
        # all the weight in one bin -> all samples land inside it
        bins = jnp.linspace(0.0, 1.0, 11)[None, :]
        weights = jnp.zeros((1, 10)).at[0, 4].set(1.0)
        s = np.asarray(sample_pdf_det(bins, weights, 8))[0]
        assert (s >= 0.38).all() and (s <= 0.52).all()

    def test_stochastic_matches_reference(self, rng, monkeypatch):
        # det=False oracle parity (VERDICT r1 "missing" #3): the stochastic
        # inverse-CDF math must match reference sample_pdf (:69-109) under
        # IDENTICAL uniforms — torch.rand is monkeypatched to the same u that
        # is injected into ours via the test-only `u` parameter.
        import torch

        from emap_tpu.render.sampling import sample_pdf

        ref = _reference("src.models.udf_renderer_blending")
        bins = np.sort(
            rng.uniform(0, 6, size=(8, 16)).astype(np.float32), axis=-1
        )
        weights = rng.uniform(0, 1, size=(8, 15)).astype(np.float32)
        u = rng.uniform(0, 1, size=(8, 10)).astype(np.float32)
        monkeypatch.setattr(
            torch, "rand", lambda *a, **k: torch.tensor(u)
        )
        theirs = ref.sample_pdf(
            torch.tensor(bins), torch.tensor(weights), 10, det=False
        ).numpy()
        ours = np.asarray(
            sample_pdf(
                jnp.asarray(bins), jnp.asarray(weights), 10, det=False,
                u=jnp.asarray(u),
            )
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
        # and the output really is unsorted (the _merge_z_vals caveat)
        assert (np.diff(ours, axis=-1) < 0).any()

    def test_stochastic_key_path_in_support(self):
        # the key-driven branch (no injected u): samples live inside the bin
        # support and concentrate where the weight is
        bins = jnp.linspace(0.0, 1.0, 11)[None, :]
        weights = jnp.zeros((1, 10)).at[0, 4].set(1.0)
        from emap_tpu.render.sampling import sample_pdf

        s = np.asarray(
            sample_pdf(bins, weights, 64, det=False,
                       key=jax.random.PRNGKey(0))
        )[0]
        assert (s >= 0.0).all() and (s <= 1.0).all()
        assert ((s >= 0.38) & (s <= 0.52)).mean() > 0.9


class TestUpSample:
    def test_matches_reference(self, rng):
        import torch

        ref_mod = _reference("src.models.udf_renderer_blending")
        ref = ref_mod.UDFRendererBlending(
            None, None, None, None,
            n_samples=16, n_importance=10, n_outside=0, up_sample_steps=5,
            perturb=1.0, device="cpu",
        )
        # keep all samples inside the unit sphere with healthy alphas: outside
        # it the reference zeroes cos_val and alpha degenerates to
        # (0+1e-5)/(sigmoid(-large)+1e-5), which is noise-floor-sensitive to
        # the f32 sigmoid tail and not meaningfully comparable.
        batch, n = 6, 16
        rays_o = rng.uniform(-0.1, 0.1, size=(batch, 3)).astype(np.float32)
        rays_d = rng.normal(size=(batch, 3)).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        z_vals = np.sort(
            rng.uniform(0.05, 0.9, size=(batch, n)).astype(np.float32), axis=-1
        )
        # synthetic eikonal UDF: distance to the plane z=0.5 along the ray
        udf = np.abs(z_vals - 0.5).astype(np.float32)

        ours = np.asarray(
            up_sample_unbias(
                jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(z_vals),
                jnp.asarray(udf), 0.05, 10, 64.0, 128.0, 320.0,
            )
        )
        theirs = ref.up_sample_unbias(
            torch.tensor(rays_o), torch.tensor(rays_d), torch.tensor(z_vals),
            torch.tensor(udf), 0.05, 10, 64.0, torch.tensor(128.0), 320.0,
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


class TestUpSampleNoOccAware:
    def test_matches_reference(self, rng):
        """Oracle parity vs reference :920-975 (PARITY.md gap, VERDICT r1 #6)."""
        import torch

        ref_mod = _reference("src.models.udf_renderer_blending")
        ref = ref_mod.UDFRendererBlending(
            None, None, None, None,
            n_samples=16, n_importance=10, n_outside=0, up_sample_steps=5,
            perturb=1.0, device="cpu",
        )
        batch, n = 6, 16
        rays_o = rng.uniform(-0.1, 0.1, size=(batch, 3)).astype(np.float32)
        rays_d = rng.normal(size=(batch, 3)).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        z_vals = np.sort(
            rng.uniform(0.05, 0.9, size=(batch, n)).astype(np.float32), axis=-1
        )
        # two zero crossings so the non-occlusion-aware sampler hits BOTH
        udf = np.minimum(np.abs(z_vals - 0.3), np.abs(z_vals - 0.7)).astype(
            np.float32
        )

        from emap_tpu.render.sampling import up_sample_no_occ_aware

        ours = np.asarray(
            up_sample_no_occ_aware(
                jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(z_vals),
                jnp.asarray(udf), 0.05, 10, 64.0, 128.0, 320.0,
            )
        )
        theirs = ref.up_sample_no_occ_aware(
            torch.tensor(rays_o), torch.tensor(rays_d), torch.tensor(z_vals),
            torch.tensor(udf), 0.05, 10, 64.0, torch.tensor(128.0), 320.0,
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def _build_torch_nets(seed=0):
    import torch

    udf_mod = _reference("src.models.udf_model")
    torch.manual_seed(seed)
    udf_net = udf_mod.UDFNetwork(
        d_in=3, d_out=1, d_hidden=SMALL_UDF.d_hidden,
        n_layers=SMALL_UDF.n_layers, skip_in=list(SMALL_UDF.skip_in),
        multires=SMALL_UDF.multires, scale=1.0, bias=0.5,
        geometric_init=True, weight_norm=True, udf_type="abs",
    )
    var_net = udf_mod.SingleVarianceNetwork(0.3)
    beta_net = udf_mod.BetaNetwork(0.5, 0.3, 0.3, requires_grad_zeta=False)
    return udf_net, var_net, beta_net


def _export_import(tmp_path, udf_net, var_net, beta_net):
    import torch

    from emap_tpu.ckpt import import_reference_checkpoint

    ckpt = {
        "udf_network_fine": udf_net.state_dict(),
        "variance_network_fine": var_net.state_dict(),
        "beta_network": beta_net.state_dict(),
        "optimizer": {},
        "iter_step": 1234,
    }
    path = str(tmp_path / "ckpt_best.pth")
    torch.save(ckpt, path)
    return import_reference_checkpoint(path)


class TestCheckpointImportAndFieldParity:
    def test_field_forward_matches_torch(self, tmp_path, rng):
        import torch

        udf_net, var_net, beta_net = _build_torch_nets()
        imported = _export_import(tmp_path, udf_net, var_net, beta_net)
        assert imported["iter_step"] == 1234
        params = imported["params"]

        pts = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
        with torch.no_grad():
            ref_out = udf_net(torch.tensor(pts))[0][:, 0].numpy()
        from emap_tpu.fields import udf_value

        ours = np.asarray(udf_value(params["udf"], jnp.asarray(pts), SMALL_UDF))
        np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=1e-5)

    def test_field_gradient_matches_torch(self, tmp_path, rng):
        import torch

        udf_net, var_net, beta_net = _build_torch_nets()
        imported = _export_import(tmp_path, udf_net, var_net, beta_net)
        params = imported["params"]

        pts = rng.uniform(-0.8, 0.8, size=(32, 3)).astype(np.float32)
        ref_grad = (
            udf_net.gradient(torch.tensor(pts)).detach().numpy().reshape(-1, 3)
        )
        from emap_tpu.fields import udf_gradient

        ours = np.asarray(udf_gradient(params["udf"], jnp.asarray(pts), SMALL_UDF))
        np.testing.assert_allclose(ours, ref_grad, rtol=2e-3, atol=2e-4)


class TestImportanceSampleMix:
    def test_matches_reference(self, tmp_path, rng):
        """Oracle parity for the 'mix' upsampler (reference :843-918),
        including its under-delivery of samples (SURVEY.md bug note)."""
        import torch

        ref_mod = _reference("src.models.udf_renderer_blending")
        udf_net, var_net, beta_net = _build_torch_nets()
        imported = _export_import(tmp_path, udf_net, var_net, beta_net)
        params = imported["params"]

        n_samples, n_importance, steps = 16, 12, 3
        ref = ref_mod.UDFRendererBlending(
            None, udf_net, var_net, beta_net,
            n_samples=n_samples, n_importance=n_importance, n_outside=0,
            up_sample_steps=steps, perturb=1.0, device="cpu",
        )

        batch = 4
        rays_o = rng.uniform(-0.1, 0.1, size=(batch, 3)).astype(np.float32)
        rays_d = rng.normal(size=(batch, 3)).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        z_vals = np.sort(
            rng.uniform(0.05, 0.9, size=(batch, n_samples)).astype(np.float32),
            axis=-1,
        )

        with torch.no_grad():
            theirs = ref.importance_sample_mix(
                torch.tensor(rays_o), torch.tensor(rays_d),
                torch.tensor(z_vals), 0.05,
            ).numpy()
            beta = float(beta_net.get_beta().clip(1e-6, 1e6))
            gamma = float(beta_net.get_gamma().clip(1e-6, 1e6))

        from emap_tpu.fields import udf_value
        from emap_tpu.render.sampling import importance_sample_mix

        def udf_fn(pts):
            return udf_value(params["udf"], pts, SMALL_UDF)

        ours = np.asarray(
            importance_sample_mix(
                udf_fn, jnp.asarray(rays_o), jnp.asarray(rays_d),
                jnp.asarray(z_vals), 0.05, n_importance, steps, beta, gamma,
            )
        )
        # under-delivery reproduced: (steps+1) * (n_importance // (steps+1))
        expected_cols = n_samples + (steps + 1) * (n_importance // (steps + 1))
        assert ours.shape == theirs.shape == (batch, expected_cols)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


class TestRenderParity:
    @pytest.mark.parametrize("anneal,flip_sat", [(1.0, 0.9), (0.4, 0.0)])
    def test_render_matches_reference(self, tmp_path, rng, anneal, flip_sat):
        import torch

        ref_mod = _reference("src.models.udf_renderer_blending")
        udf_net, var_net, beta_net = _build_torch_nets()
        imported = _export_import(tmp_path, udf_net, var_net, beta_net)
        params = imported["params"]

        # pin the sampler to full precision for bitwise-comparable sample
        # placement (production default uses fast matmuls there)
        rcfg = RenderConfig(
            n_samples=16, n_importance=10, up_sample_steps=5,
            sampler_precision="highest",
        )
        ref_renderer = ref_mod.UDFRendererBlending(
            None, udf_net, var_net, beta_net,
            n_samples=16, n_importance=10, n_outside=0, up_sample_steps=5,
            perturb=1.0, device="cpu",
        )

        batch = 4
        rays_o = np.tile(
            np.array([[0.0, 0.0, -2.0]], np.float32), (batch, 1)
        ) + rng.normal(scale=0.05, size=(batch, 3)).astype(np.float32)
        rays_d = np.array([[0, 0, 1.0]], np.float32) + rng.normal(
            scale=0.1, size=(batch, 3)
        ).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        depth_scale = np.ones((batch, 1), np.float32)

        # NOTE: the reference crashes on batch>1 with perturb=0 (z_vals stays
        # (1, n): udf_renderer_blending.py:707 never broadcasts; latent bug,
        # the pipeline always runs perturb=1). Run it ray-by-ray instead.
        ref_rows = {}
        for b in range(batch):
            ro = torch.tensor(rays_o[b : b + 1])
            rd = torch.tensor(rays_d[b : b + 1])
            out_b = ref_renderer.render(
                ro, rd, 0.05, 4.0,
                depth_scale=torch.tensor(depth_scale[b : b + 1]),
                cos_anneal_ratio=anneal, perturb_overwrite=0,
                flip_saturation=flip_sat,
            )
            for k, v in out_b.items():
                if torch.is_tensor(v):
                    ref_rows.setdefault(k, []).append(v.detach())
        ref_out = {
            k: torch.cat(v, dim=0) if v[0].dim() > 0 else torch.stack(v)
            for k, v in ref_rows.items()
        }

        jitted = jax.jit(
            lambda p, ro, rd, ds, k, ca, fs: render(
                p, ro, rd, 0.05, 4.0, ds, k, rcfg, SMALL_UDF,
                cos_anneal_ratio=ca, flip_saturation=fs,
                perturb_overwrite=0.0,
            )
        )
        # run ours per-ray too so the masked-mean eikonal scalars compare 1:1
        rows = {}
        for b in range(batch):
            out_b = jitted(
                params,
                jnp.asarray(rays_o[b : b + 1]),
                jnp.asarray(rays_d[b : b + 1]),
                jnp.asarray(depth_scale[b : b + 1]),
                jax.random.key(0),
                jnp.float32(anneal),
                jnp.float32(flip_sat),
            )
            for k, v in out_b.items():
                rows.setdefault(k, []).append(np.asarray(v))
        out = {
            k: (np.concatenate(v) if v[0].ndim > 0 else np.stack(v))
            for k, v in rows.items()
        }

        for key, tol in [
            ("edge", 2e-3),
            ("depth", 5e-3),
            ("weight_sum", 2e-3),
            ("udf", 1e-3),
        ]:
            np.testing.assert_allclose(
                out[key],
                ref_out[key].numpy(),
                rtol=tol,
                atol=tol,
                err_msg=key,
            )
        for key in ("gradient_error", "gradient_error_near_surface"):
            np.testing.assert_allclose(
                out[key], ref_out[key].numpy(), rtol=1e-2, atol=2e-4,
                err_msg=key,
            )


class TestRenderProperties:
    def test_weights_are_probabilities(self):
        cfg = RenderConfig(n_samples=16, n_importance=10, up_sample_steps=5)
        params = {
            "udf": init_udf_params(jax.random.key(0), SMALL_UDF),
            "variance": init_variance_params(0.3),
            "beta": init_beta_params(0.5, 0.3, 0.3),
        }
        batch = 8
        rng = np.random.default_rng(0)
        rays_o = np.tile(np.array([[0, 0, -2.0]], np.float32), (batch, 1))
        rays_d = np.array([[0, 0, 1.0]], np.float32) + rng.normal(
            scale=0.2, size=(batch, 3)
        ).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        out = jax.jit(
            lambda p, ro, rd, ds, k: render(
                p, ro, rd, 0.05, 4.0, ds, k, cfg, SMALL_UDF,
                cos_anneal_ratio=0.5, flip_saturation=0.9,
            )
        )(
            params, jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.ones((batch, 1)), jax.random.key(1),
        )
        w = np.asarray(out["weights"])
        assert (w >= 0).all()
        assert (w.sum(-1) <= 1.0 + 1e-4).all()
        assert np.isfinite(np.asarray(out["edge"])).all()
        assert np.isfinite(np.asarray(out["normals"])).all()
        assert out["weights"].shape == (batch, 26)


class TestFieldPrecisionOverride:
    """RenderConfig.field_precision overrides the model tier for the
    TRAIN-path field query only (renderer.render_core)."""

    def _render(self, rcfg, ucfg):
        params = {
            "udf": init_udf_params(jax.random.key(0), ucfg),
            "variance": init_variance_params(0.3),
            "beta": init_beta_params(0.5, 0.3, 0.3),
        }
        batch = 4
        rng = np.random.default_rng(3)
        rays_o = np.tile(np.array([[0, 0, -2.0]], np.float32), (batch, 1))
        rays_d = np.array([[0, 0, 1.0]], np.float32) + rng.normal(
            scale=0.2, size=(batch, 3)
        ).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        out = jax.jit(
            lambda p, ro, rd, ds, k: render(
                p, ro, rd, 0.05, 4.0, ds, k, rcfg, ucfg,
                cos_anneal_ratio=0.5, flip_saturation=0.9,
            )
        )(
            params, jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.ones((batch, 1)), jax.random.key(1),
        )
        return np.asarray(out["edge"])

    def test_override_equals_model_tier(self):
        import dataclasses

        base = RenderConfig(n_samples=16, n_importance=10, up_sample_steps=5,
                            sampler_precision="highest")
        # model "high" + field_precision "highest" must equal model
        # "highest" bitwise: the knob reaches the same query path.
        a = self._render(
            dataclasses.replace(base, field_precision="highest"),
            dataclasses.replace(SMALL_UDF, precision="high"),
        )
        b = self._render(
            base, dataclasses.replace(SMALL_UDF, precision="highest")
        )
        np.testing.assert_array_equal(a, b)

    def test_override_reaches_query(self, monkeypatch):
        import dataclasses

        from emap_tpu.render import renderer as renderer_mod

        seen = []
        orig = renderer_mod._query_field

        def spy(params, pts_flat, udf_cfg, mesh=None, axis="data"):
            seen.append(udf_cfg.precision)
            return orig(params, pts_flat, udf_cfg, mesh=mesh, axis=axis)

        monkeypatch.setattr(renderer_mod, "_query_field", spy)
        base = RenderConfig(n_samples=16, n_importance=10, up_sample_steps=5,
                            sampler_precision="highest")
        self._render(
            dataclasses.replace(base, field_precision="default"),
            dataclasses.replace(SMALL_UDF, precision="high"),
        )
        assert seen == ["default"]  # train query runs at the override tier

    def test_from_conf_production_default(self):
        """Conf-driven production trains the field query at bf16 (r2 flip,
        8-seed e2e A/B quality-neutral); pinning "" restores inherit."""
        from emap_tpu.config import Config

        assert RenderConfig.from_conf(Config({})).field_precision == "default"
        assert (
            RenderConfig.from_conf(
                Config({"field_precision": ""})
            ).field_precision
            == ""
        )
        # directly constructed configs (oracle tests, extraction) inherit
        assert RenderConfig().field_precision == ""


class TestSafeNorm:
    def test_eikonal_at_zero_gradient(self):
        """d||g||/dg must be 0 (torch subgradient), not NaN, when the
        spatial gradient is exactly zero — happens for the abs-head UDF at
        y0 == 0.0 (sign(0) == 0 kills the reverse chain); observed with the
        fused train kernel at training step 61 on the synthetic cube."""
        from emap_tpu.render.renderer import _safe_l2norm

        g = jnp.zeros((4, 3)).at[1:].set(1.0)

        def loss(g):
            err = (_safe_l2norm(g, axis=-1) - 1.0) ** 2
            mag = _safe_l2norm(g, axis=-1, keepdims=True)
            gn = g / (mag + 1e-5)
            return jnp.sum(err) + jnp.sum(gn)

        val = jax.jit(loss)(g)
        grad = jax.jit(jax.grad(loss))(g)
        assert bool(jnp.all(jnp.isfinite(grad)))
        # the eikonal term alone has torch's 0 subgradient at g == 0
        eik = jax.jit(jax.grad(
            lambda g: jnp.sum((_safe_l2norm(g, axis=-1) - 1.0) ** 2)
        ))(g)
        assert bool(jnp.all(jnp.isfinite(eik)))
        assert float(jnp.abs(eik[0, 0])) == 0.0
        # primal identical to jnp.linalg.norm
        ref = jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2) + jnp.sum(
            g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-5)
        )
        assert float(jnp.abs(val - ref)) < 1e-6
