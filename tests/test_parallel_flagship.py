"""Flagship-shape multi-chip equivalence (VERDICT r3 item 5), slow-marked.

The fast tests in test_parallel.py prove GSPMD loss/param equivalence at
toy dims (32-wide net, 8+5 samples); padding/tile/sharding bugs can hide
until production shapes. scripts/multichip_flagship.py runs the full
ABC-conf program (8x256, multires 10, 64+50 samples, 1024 rays, chained
scan, and the fused kernel's shard_map path at the flagship point count)
on the 8-virtual-device CPU mesh and asserts equivalence — its evidence
lands in MULTICHIP_FLAGSHIP.json each time it runs.

This test wraps that script for CI; it takes tens of minutes on the
1-core host, so it is env-gated: EMAP_SLOW_TESTS=1 python -m pytest
tests/test_parallel_flagship.py.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("EMAP_SLOW_TESTS", "") != "1",
    reason="flagship-shape multichip run is slow (tens of minutes); "
    "set EMAP_SLOW_TESTS=1. The same evidence is produced by "
    "scripts/multichip_flagship.py -> MULTICHIP_FLAGSHIP.json.",
)


def test_flagship_multichip_equivalence():
    scripts = os.path.join(os.path.dirname(__file__), "..", "scripts")
    sys.path.insert(0, os.path.abspath(scripts))
    os.environ.setdefault("MCF_STEPS", "2")
    import multichip_flagship

    # main() asserts per-step loss equivalence (rtol 1e-4), final-param
    # agreement (2e-4), and the kernel shard_map grad agreement (1e-4)
    # at the flagship shape; any violation raises.
    multichip_flagship.main()
