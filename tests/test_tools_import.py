"""The bench/experiment tools are part of the deliverable: they must at
least import (syntax, top-level imports, helper definitions) without a
device or the reference checkout. Execution paths are exercised by the
bench runs themselves (BENCH_SUITE.json carries their output)."""
import importlib
import os
import sys

import pytest

TOOLS_DIR = os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools")
TOOLS = sorted(f[:-3] for f in os.listdir(TOOLS_DIR)
               if f.endswith(".py") and f[:-3].isidentifier())


@pytest.mark.parametrize("mod", TOOLS)
def test_tool_imports(mod):
    sys.path.insert(0, TOOLS_DIR)
    try:
        importlib.import_module(mod)
    finally:
        sys.path.pop(0)
