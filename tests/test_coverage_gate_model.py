"""The coverage gate must itself be falsifiable: these tests pin the
executable-line model (co_lines walk, pragma exclusion, tracer capture)
on a synthetic module with KNOWN coverage, proving the gate fails when
a line goes unexecuted — a gate that cannot fail is decoration."""

from __future__ import annotations

import sys

import _coverage_gate as gate

SYNTH = '''\
"""docstring"""
X = 1


def covered(a):
    if a:
        return a + 1
    return a - 1


def uncovered():
    return X * 2


def gated():
    raise NotImplementedError  # pragma: no cover
'''


def _write(tmp_path):
    p = tmp_path / "synth_mod.py"
    p.write_text(SYNTH)
    return str(p)


def test_executable_line_model(tmp_path):
    path = _write(tmp_path)
    lines = gate.executable_lines(path)
    # def headers, branch bodies and module statements are executable
    # (CPython 3.11 module code also carries a line-0 RESUME entry)
    assert lines == {0, 1, 2, 5, 6, 7, 8, 11, 12, 15}
    # the pragma line (16) is excluded; blank lines are not executable
    assert 16 not in lines and 4 not in lines


def test_tracer_sees_exactly_the_executed_branch(tmp_path):
    path = _write(tmp_path)
    import importlib.util

    spec = importlib.util.spec_from_file_location("synth_mod_traced", path)
    mod = importlib.util.module_from_spec(spec)

    executed: set[int] = set()

    def tracer(frame, event, arg):
        if event == "call":
            if frame.f_code.co_filename != path:
                return None
            executed.add(frame.f_lineno)
            return tracer
        if event == "line":
            executed.add(frame.f_lineno)
        return tracer

    sys.settrace(tracer)
    try:
        spec.loader.exec_module(mod)  # import-time lines
        mod.covered(1)  # takes the true branch only
    finally:
        sys.settrace(None)

    missing = gate.executable_lines(path) - executed
    # the gate MUST fail here: the false branch (8) and uncovered()'s
    # body (12) never ran — and nothing else may be reported
    assert missing == {8, 12}
    # ...and pass once the remaining paths run
    sys.settrace(tracer)
    try:
        mod.covered(0)
        mod.uncovered()
    finally:
        sys.settrace(None)
    assert not gate.executable_lines(path) - executed
