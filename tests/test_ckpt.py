import numpy as np

from emap_tpu.ckpt.native import load_pytree, save_pytree


def test_npz_roundtrip(tmp_path, rng):
    tree = {
        "params": {
            "udf": {"lin0": {"g": rng.normal(size=(4,)).astype(np.float32),
                             "v": rng.normal(size=(4, 3)).astype(np.float32)}},
            "beta": {"beta": np.asarray([0.5], np.float32)},
        },
        "iter_step": np.asarray(1234),
        "flags": {"beta_trainable": np.asarray(True)},
        "a_list": [np.ones(2), np.zeros(3)],
        "a_tuple": (np.ones(1), np.full((2, 2), 7.0)),
    }
    path = str(tmp_path / "ckpt_best.npz")
    save_pytree(path, tree)
    loaded = load_pytree(path)
    assert int(loaded["iter_step"]) == 1234
    assert bool(loaded["flags"]["beta_trainable"]) is True
    np.testing.assert_array_equal(
        loaded["params"]["udf"]["lin0"]["v"], tree["params"]["udf"]["lin0"]["v"]
    )
    assert isinstance(loaded["a_list"], list) and len(loaded["a_list"]) == 2
    assert isinstance(loaded["a_tuple"], tuple)
    np.testing.assert_array_equal(loaded["a_tuple"][1], tree["a_tuple"][1])
