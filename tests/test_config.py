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
