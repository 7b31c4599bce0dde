"""Conf-driven CLI, interface-compatible with the reference entry point
(/root/reference/main.py:33-102):

    python main.py --conf confs/ABC.conf --mode {train,extract_edge} \
                   [--scan SCAN] [--is_continue]
"""

from __future__ import annotations

import argparse
import logging
import random

import numpy as np

from emap_tpu import config
from emap_tpu.train.runner import Runner

RUNNERS = {"udf": Runner}


def fix_random_seeds(seed: int = 42) -> None:
    """Host-side RNG seeds; device RNG is jax.random keyed from the conf."""
    np.random.seed(seed)
    random.seed(seed)


def get_runner(model_type: str):
    if model_type not in RUNNERS:
        raise ValueError(f"unknown model_type: {model_type}")
    return RUNNERS[model_type]


def build_mesh_from_conf(conf, batch_size: int):
    """Data-parallel ray mesh over all local devices (conf-gated).

    The reference is single-GPU (SURVEY.md §2.4); on TPU the scaling axis is
    the ray batch, sharded via GSPMD over a 1-D mesh. Enabled by default when
    >1 device is visible; `train.multi_device = false` disables. The mesh is
    trimmed to the largest device count that divides the ray batch so the
    sharding is always even.
    """
    import jax

    if not conf.get_bool("train.multi_device", True):
        return None
    n = jax.local_device_count()
    if n <= 1:
        return None
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        logging.warning(
            "multi_device requested but batch_size %d has no usable device "
            "split; running single-device", batch_size,
        )
        return None
    from emap_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n)
    logging.info("data-parallel mesh over %d devices (%s)", n,
                 jax.devices()[0].platform)
    return mesh


def main(argv=None) -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="[%(filename)s:%(lineno)s - %(funcName)20s() ] %(message)s",
    )
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, default="./confs/ABC.conf")
    parser.add_argument(
        "--mode", type=str, default="train", choices=["train", "extract_edge"]
    )
    parser.add_argument("--scan", type=str, default="null")
    parser.add_argument("--gpu", type=int, default=0, help="unused; kept for CLI parity")
    parser.add_argument("--is_continue", default=False, action="store_true")
    args = parser.parse_args(argv)

    fix_random_seeds()

    conf = config.parse_file(args.conf)
    if args.scan != "null":
        conf["dataset"]["scan"] = args.scan

    logging.info("Run on scan %s", conf["dataset.scan"])
    runner_cls = get_runner(conf["general.model_type"])
    mesh = build_mesh_from_conf(conf, conf.get_int("train.batch_size"))
    runner = runner_cls(conf, args.mode, args.is_continue, mesh=mesh)

    if args.mode == "train":
        runner.train()
    elif args.mode == "extract_edge":
        ee = conf.get_config("edge_extraction")
        runner.extract_edge(
            resolution=ee.get_int("resolution"),
            udf_threshold=ee.get_float("udf_threshold"),
            sampling_N=ee.get_int("sampling_N"),
            sampling_delta=ee.get_float("sampling_delta"),
            is_pointshift=ee.get_bool("is_pointshift"),
            iters=ee.get_int("iters"),
            is_linedirection=ee.get_bool("is_linedirection"),
            visible_checking=ee.get_bool("visible_checking"),
            auto_threshold=[
                float(t) for t in ee.get_list("auto_threshold", [])
            ],
            # "" = session backend; "cpu" pins extraction to a canonical
            # backend for cross-machine reproducibility (runner.extract_edge)
            platform=ee.get_string("platform", ""),
            # >1 = best-of-K fit draws ranked by the GT-free probe scorer
            # (runner.extract_edge fit_draws)
            fit_draws=ee.get_int("fit_draws", 1),
        )


if __name__ == "__main__":
    main()
