"""Standalone runner for the parity-face 100%-coverage gate.

The gate itself lives in the suite (tests/_coverage_gate.py wires a
scoped tracer through tests/conftest.py; tests/test_zz_mapreduce_coverage.py
asserts).  This script just runs the parity modules plus the gate test
in one pytest process for a quick local check — the full suite run
enforces the same thing.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

if __name__ == "__main__":
    import pytest

    from _coverage_gate import PARITY_TEST_MODULES

    args = ["-q", "-p", "no:cacheprovider"]
    args += [os.path.join(REPO, "tests", m) for m in sorted(PARITY_TEST_MODULES)]
    args.append(os.path.join(REPO, "tests", "test_zz_mapreduce_coverage.py"))
    sys.exit(pytest.main(args))
