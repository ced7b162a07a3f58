"""Shared fixtures: one Ray session per pytest run + reference-oracle loader."""

from __future__ import annotations

import importlib.util
import sys
import types

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    # Hash-join aggregator actors reserve 0.125 CPU × num_partitions per
    # join stage (Ray 2.49 default).  A pipeline chaining 4 hash joins
    # (q8 under the forced cap=0 plan) reserves 4 × 8 × 0.125 = 4 CPUs of
    # actors on this 4-CPU session — zero left for map tasks → livelock.
    # Shrink the per-partition reservation for tests only; real clusters
    # have the CPU headroom (the budget is ~12% of a 256-node cluster).
    from ray.data import DataContext

    DataContext.get_current().join_operator_actor_num_cpus_per_partition_override = 0.02
    yield ray
    ray.shutdown()


def _load_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def reference():
    """The reference implementation as a parity oracle.

    Loads /root/reference/pdfparser/{utils,pdfplumber_parser}.py directly
    (the package __init__ imports PDF backends absent from this sandbox;
    pdfplumber itself is stubbed — only its pure-text functions are used).
    Skips cleanly when the reference checkout is not present.
    """
    import os

    utils_path = "/root/reference/pdfparser/utils.py"
    plumber_path = "/root/reference/pdfparser/pdfplumber_parser.py"
    if not os.path.exists(utils_path):
        pytest.skip("reference checkout not available")
    if "pdfparser" not in sys.modules:
        pkg = types.ModuleType("pdfparser")
        pkg.__path__ = []
        sys.modules["pdfparser"] = pkg
    utils = _load_module("pdfparser.utils", utils_path)
    sys.modules["pdfparser"].utils = utils
    if "pdfplumber" not in sys.modules:
        sys.modules["pdfplumber"] = types.ModuleType("pdfplumber")
    plumber = _load_module("ref_pdfplumber_parser", plumber_path)
    return types.SimpleNamespace(utils=utils, plumber=plumber)
