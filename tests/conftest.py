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
