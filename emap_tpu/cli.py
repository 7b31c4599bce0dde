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
    runner = runner_cls(conf, args.mode, args.is_continue)

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
        )


if __name__ == "__main__":
    main()
