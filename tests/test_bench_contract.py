"""The bench output contract: ONE parseable JSON line that fits the
driver's 2000-char stdout tail even with the full query inventory (the
round-1/2 BENCH files recorded "parsed": null because the full-name line
overflowed the tail)."""

from __future__ import annotations

import json

from bench import format_bench_line


def _inventory_names():
    import __spark_entry__ as entrymod

    return list(entrymod.queries())


def test_bench_line_fits_driver_tail_and_parses():
    # Padded to 200 hypothetical queries: headroom for future rounds, so
    # growth can't silently reintroduce the round-1 "parsed": null.
    names = _inventory_names()
    names += [
        f"q{i}_hypothetical_future_query" for i in range(len(names) + 1, 201)
    ]
    timings = {n: round(0.0001 + 11.1111 * (i % 7), 4) for i, n in enumerate(names)}
    timings[names[0]] = -1.0  # a failed query must not break the format
    line = format_bench_line(timings, "/root/testdata/sf0.1")
    assert "\n" not in line
    assert len(line) <= 1900, f"{len(line)} chars overflows the driver tail"
    d = json.loads(line)
    assert d["metric"] == "total_query_wall_sec"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.1
    assert len(d["queries"]) == len(names)
    # total excludes failures and keeps full resolution
    assert d["value"] == round(
        sum(t for t in timings.values() if t >= 0), 4
    )
    # per-query values trim to <=2 decimals (1 when the 2-decimal line
    # would overflow the tail); the -1.0 sentinel survives
    assert all(v == round(v, 2) for v in d["queries"].values())
    assert -1.0 in d["queries"].values()
    # short keys stay unique (fall back to the full name on collision)
    assert len(set(d["queries"])) == len(names)


def test_bench_hot_rows_keep_resolution_at_realistic_scale():
    """The r7 regression this format fixes: rows >= 0.5s must keep
    >= 0.1s resolution (2 decimals here) at the real inventory's
    distribution — BENCH_r07's flat ladder degraded all 177 rows to
    integers and the round report could no longer verify per-query perf
    targets.  Modeled on the r7 driver run (116 sub-half-second rows,
    61 hot rows) padded to 190 queries."""
    names = _inventory_names()
    names += [f"q{i}_hypothetical_future_query" for i in range(len(names) + 1, 191)]
    timings = {}
    for i, n in enumerate(names):
        if i % 3 == 0:  # ~63 hot rows, awkward 2-decimal values
            timings[n] = round(0.51 + (i % 25) * 0.1003, 4)
        else:  # cold rows: the 0.1-0.4s band
            timings[n] = round(0.1 + (i % 4) * 0.09, 4)
    timings[names[5]] = -1.0
    line = format_bench_line(timings, "/root/testdata/sf0.1")
    assert len(line) <= 1900, f"{len(line)} chars overflows the driver tail"
    d = json.loads(line)
    assert len(d["queries"]) == len(names)
    short = {n.split("_", 1)[0].lstrip("q"): t for n, t in timings.items()}
    for k, v in d["queries"].items():
        t = short[k.lstrip("q").split("_", 1)[0]] if k.lstrip("q").split("_", 1)[0] in short else None
        if v == -1.0:
            continue
        if t is not None and t >= 0.5:
            assert v == round(t, 2), (k, t, v)  # hot rows: full 2-decimal fidelity


def test_bench_short_key_collision_falls_back_to_full_name():
    line = format_bench_line({"q01_a": 1.0, "q01_b": 2.0}, "sf0.01")
    d = json.loads(line)
    assert d["queries"] == {"q01": 1.0, "q01_b": 2.0}


def test_bench_full_name_colliding_with_short_key_loses_no_timing():
    # 'q01' the full name equals the short key already taken by q01_a
    line = format_bench_line({"q01_a": 1.0, "q01": 2.0}, "sf0.01")
    d = json.loads(line)
    assert sorted(d["queries"].values()) == [1.0, 2.0]
    assert len(d["queries"]) == 2
