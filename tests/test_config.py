import textwrap

import pytest

from emap_tpu import config


ABC_SNIPPET = textwrap.dedent(
    """
    general {
      base_exp_dir = ./exp/ABC/
      expname = emap
      model_type = udf
      recording = [
        ./src/models,
        ./src/dataset,
      ]
    }

    dataset {
      data_dir = ./data/ABC-NEF_Edge/data/
      scan = "00000325"
      near = 0.05
      far = 6
      AABB = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
    }

    train {
      learning_rate = 5e-4
      end_iter = 50000
      importance_sample = True
      use_white_bkgd = False
    }

    model {
      udf_network {
        skip_in = [4]
        udf_type = abs  # square or abs
        geometric_init = True
      }
      udf_renderer {
        up_sample_steps = 5
      }
    }
    """
)


def test_parse_sections_and_scalars():
    conf = config.parse_string(ABC_SNIPPET)
    assert conf["general.model_type"] == "udf"
    assert conf["dataset"]["scan"] == "00000325"
    assert conf.get_float("train.learning_rate") == pytest.approx(5e-4)
    assert conf.get_int("train.end_iter") == 50000
    assert conf.get_bool("train.importance_sample") is True
    assert conf.get_bool("train.use_white_bkgd") is False
    assert conf.get_int("dataset.far") == 6


def test_lists_and_inline_comments():
    conf = config.parse_string(ABC_SNIPPET)
    assert conf.get_list("model.udf_network.skip_in") == [4]
    assert conf.get_list("dataset.AABB") == [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
    assert conf.get_list("general.recording") == ["./src/models", "./src/dataset"]
    # inline comment stripped from bare value
    assert conf["model.udf_network.udf_type"] == "abs"
    # trailing whitespace after value
    assert conf.get_int("model.udf_renderer.up_sample_steps") == 5


def test_defaults_and_setitem():
    conf = config.parse_string(ABC_SNIPPET)
    assert conf.get_float("train.warm_up_end", default=0.0) == 0.0
    assert conf.get_bool("train.same_lr", default=False) is False
    conf["dataset"]["scan"] = "00001234"
    assert conf["dataset.scan"] == "00001234"
    assert "dataset.scan" in conf
    assert "dataset.missing" not in conf


def test_shipped_confs_parse():
    for name in ("ABC", "DTU", "Replica"):
        conf = config.parse_file(f"confs/{name}.conf")
        assert conf["general.model_type"] == "udf"
        assert conf.get_int("model.udf_network.n_layers") == 8
        assert conf.get_int("model.udf_renderer.n_samples") == 64
        assert conf.get_int("model.udf_renderer.n_importance") == 50
        assert conf.get_float("edge_loss.edge_weight") == 1.0


def test_roundtrip_hocon():
    conf = config.parse_string(ABC_SNIPPET)
    text = conf.to_hocon()
    conf2 = config.parse_string(text)
    assert conf2.as_dict() == conf.as_dict()


REFERENCE_CONFS = "/root/reference/confs"


def test_reference_confs_parse_verbatim():
    """The reference's own conf files must parse unmodified (compat contract;
    VERDICT r1 item 9). Values cross-checked against the files' contents,
    including the sections our confs dropped (nerf, rendering_network)."""
    import os

    import pytest

    if not os.path.isdir(REFERENCE_CONFS):
        pytest.skip("reference tree unavailable")
    expected_iters = {"ABC": 50000, "DTU": 200000, "Replica": 200000}
    for name, iters in expected_iters.items():
        conf = config.parse_file(os.path.join(REFERENCE_CONFS, f"{name}.conf"))
        assert conf["general.model_type"] == "udf"
        assert conf.get_int("train.end_iter") == iters
        assert conf.get_int("train.batch_size") == 1024
        assert conf.get_int("model.udf_network.d_hidden") == 256
        assert conf.get_int("model.udf_network.n_layers") == 8
        assert conf.get_list("model.udf_network.skip_in") == [4]
        # sections we dropped from our confs must still parse from theirs
        assert conf.get_int("model.nerf.D") == 8
        assert conf.get_int("model.rendering_network.n_layers") >= 1
        assert conf.get_bool("model.udf_renderer.use_unbias_render") is True


def test_runner_boots_from_reference_abc_conf(tmp_path):
    """A Runner constructed from the reference's unmodified ABC.conf (only
    data_dir/base_exp_dir redirected, as a user would) must initialize the
    full flagship model and build its train step."""
    import os

    import pytest

    path = os.path.join(REFERENCE_CONFS, "ABC.conf")
    if not os.path.isfile(path):
        pytest.skip("reference tree unavailable")

    from emap_tpu.data import make_synthetic_scene
    from emap_tpu.train.runner import Runner

    data_dir = str(tmp_path / "data")
    make_synthetic_scene(data_dir, scan="00000325", n_views=3, H=32, W=32)

    conf = config.parse_file(path)
    conf["dataset"]["data_dir"] = data_dir
    conf["dataset"]["scan"] = "00000325"
    conf["general"]["base_exp_dir"] = str(tmp_path / "exp")
    conf["general"]["recording"] = []

    runner = Runner(conf, mode="train")
    assert runner.ucfg.d_hidden == 256 and runner.ucfg.n_layers == 8
    assert runner.rcfg.n_samples == 64 and runner.rcfg.n_importance == 50
    assert runner.tcfg.batch_size == 1024
    assert runner.end_iter == 50000


def test_udf_from_conf_knob_defaults_match_dataclass():
    """Tuning knobs absent from a conf must inherit the dataclass defaults.

    Regression: the fuse_pe default flip (r3) changed the dataclass default
    to True but from_conf still pinned False, so bench.py (dataclass path)
    and the production CLI (from_conf path) silently ran different kernels.
    """
    import dataclasses

    from emap_tpu.fields.udf import UDFConfig

    conf = config.parse_file("confs/ABC.conf")
    sub = conf.get_config("model.udf_network")
    built = UDFConfig.from_conf(sub)
    default = UDFConfig()
    for f in dataclasses.fields(UDFConfig):
        if f.name in sub:
            continue  # conf-set values legitimately differ
        assert getattr(built, f.name) == getattr(default, f.name), f.name


def test_render_from_conf_knob_defaults_match_dataclass():
    """Same drift guard for RenderConfig, with the documented exceptions:
    `field_precision` intentionally differs (the r4 production flip lives in
    from_conf so dataclass users like bench.py must opt in explicitly), and
    UDFConfig.multires mirrors the reference's constructor default (0) while
    the dataclass default is the flagship 10 (always conf-set in practice).
    """
    import dataclasses

    from emap_tpu.render.renderer import RenderConfig

    conf = config.parse_file("confs/ABC.conf")
    sub = conf.get_config("model.udf_renderer")
    built = RenderConfig.from_conf(sub)
    default = RenderConfig()
    intentional = {"field_precision"}
    for f in dataclasses.fields(RenderConfig):
        if f.name in sub or f.name in intentional:
            continue
        assert getattr(built, f.name) == getattr(default, f.name), f.name
