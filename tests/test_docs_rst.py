"""docs.rst is EXECUTABLE documentation — reference test-strategy parity
(SURVEY §5 layer 1: the reference runs --doctest-modules over its
docs.rst so every documented example is a test).  Running it through
doctest.testfile here keeps the contract enforced no matter how pytest
is invoked."""

from __future__ import annotations

import doctest
import os


def test_docs_rst_examples_all_pass():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs.rst")
    result = doctest.testfile(path, module_relative=False, verbose=False)
    assert result.attempted >= 8, "docs.rst lost its examples"
    assert result.failed == 0
