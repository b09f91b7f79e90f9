"""Line-coverage machinery for the parity-face 100% gate.

pytest-cov/coverage.py are not in this container, so this is a
from-scratch equivalent of the reference CI's ``--cov-fail-under 100``
on its single module (reference .github/workflows/tests.yml:50-53):

* executable lines come from compiling mapreduce.py and walking every
  code object's ``co_lines()`` — the same source of truth coverage.py
  uses — minus ``# pragma: no cover`` lines (same exclusion convention);
* executed lines come from a ``sys.settrace``/``threading.settrace``
  hook that prunes to mapreduce.py frames at call time, so line events
  cost nothing outside the target module.  conftest.py enables it only
  around parity-module tests; test_zz_mapreduce_coverage.py (alphabetically
  last) asserts the gate when a run executed the full parity suite.

Executor-side helpers are module-level functions precisely so this gate
can exercise them in-process (tests/test_mapreduce_coverage_gaps.py) —
a driver-side tracer cannot see Spark worker processes.
"""

from __future__ import annotations

import os
import sys
import threading

MR_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tinymr_spark",
    "mapreduce.py",
)

# Test modules whose runs are traced; the gate requires all of them to
# have run (none deselected, none failed) before it asserts.
PARITY_TEST_MODULES = frozenset(
    {
        "test_mapreduce_api.py",
        "test_mapreduce_sorting.py",
        "test_mapreduce_matrix.py",
        "test_mapreduce_combine.py",
        "test_mapreduce_coverage_gaps.py",
        "test_exceptions.py",
        "test_reference_idioms.py",
        "test_differential_reference.py",
    }
)

executed_lines: set[int] = set()
parity_ran: set[str] = set()
parity_failed: set[str] = set()
parity_deselected: set[str] = set()


def tracer(frame, event, arg):
    if event == "call":
        if frame.f_code.co_filename != MR_PATH:
            return None
        executed_lines.add(frame.f_lineno)
        return tracer
    if event == "line":
        executed_lines.add(frame.f_lineno)
    return tracer


def trace_on() -> None:
    # threading.settrace covers pool threads the parity tests spawn
    # (multiprocessing.dummy); it applies to threads started from now on.
    threading.settrace(tracer)
    sys.settrace(tracer)


def trace_off() -> None:
    sys.settrace(None)
    threading.settrace(None)  # type: ignore[arg-type]


def import_time_lines() -> None:
    """Re-execute mapreduce.py's top level under the tracer in a throwaway
    module namespace, crediting import-time lines (def/class/docstring
    statements) the session's real import ran before tracing existed."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("_mapreduce_cov_reimport", MR_PATH)
    mod = importlib.util.module_from_spec(spec)
    trace_on()
    try:
        spec.loader.exec_module(mod)
    finally:
        trace_off()


def executable_lines(path: str = MR_PATH) -> set[int]:
    with open(path) as f:
        source = f.read()
    lines: set[int] = set()
    stack = [compile(source, path, "exec")]
    while stack:
        code = stack.pop()
        for _start, _end, lineno in code.co_lines():
            if lineno is not None:
                lines.add(lineno)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines - pragma_no_cover_lines(path)


def pragma_no_cover_lines(path: str = MR_PATH) -> set[int]:
    """Lines excluded the way coverage.py excludes them: a ``# pragma: no
    cover`` on a statement's first line excludes that statement (the
    repo's two uses are single-line ``raise NotImplementedError`` bodies
    and one defensive branch)."""
    excluded: set[int] = set()
    with open(path) as f:
        for i, line in enumerate(f, 1):
            if "# pragma: no cover" in line:
                excluded.add(i)
    return excluded


def missing_lines() -> list[int]:
    return sorted(executable_lines() - executed_lines)
