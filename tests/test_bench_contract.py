"""The bench output contract: ONE parseable JSON line that fits the
driver's 2000-char stdout tail even with the full query inventory (the
round-1/2 BENCH files recorded "parsed": null because the full-name line
overflowed the tail)."""

from __future__ import annotations

import json

from bench import format_bench_line, record_pass


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


def test_bench_digest_stage_never_overflows(tmp_path):
    """The r9-verdict forward plan: past the integer ladder's ~240-query
    capacity the line switches to DIGEST mode — full 4-decimal fidelity
    goes to BENCH_DETAIL.json, the printed line keeps failures + the
    slowest hot rows + a cold rollup and ALWAYS fits the driver tail.
    Simulated at 210 and at 400 queries (the 'no OVERFLOW at 210'
    acceptance bar, then far past it)."""
    for n_q in (210, 400):
        names = [f"q{i}_simulated_query_name_{i}" for i in range(1, n_q + 1)]
        timings = {}
        for i, n in enumerate(names):
            # worst realistic shape: MANY hot rows (every other row)
            timings[n] = round(0.51 + (i % 40) * 0.1003, 4) if i % 2 else 0.21
        timings[names[3]] = -1.0
        detail = str(tmp_path / f"detail_{n_q}.json")
        line = format_bench_line(timings, "/root/testdata/sf0.1", detail_path=detail)
        assert len(line) <= 1900, (n_q, len(line))
        d = json.loads(line)
        assert d["value"] == round(sum(t for t in timings.values() if t >= 0), 4)
        if "cold" in d:  # digest stage engaged
            assert d["detail"] == f"detail_{n_q}.json"
            # failures always stay inline
            assert -1.0 in d["queries"].values()
            # cold rollup accounts for every sub-hot row
            n_cold = sum(1 for t in timings.values() if 0 <= t < 0.45)
            assert d["cold"]["n"] == n_cold
            # inline + omitted + cold + failed == inventory
            assert (
                len(d["queries"]) + d.get("hot_omitted", 0) + n_cold
                == len(names)
            )
            # the detail file holds the FULL map at 4-decimal fidelity
            with open(detail) as f:
                full = json.load(f)
            assert full["queries"] == {n: round(t, 4) for n, t in timings.items()}
            # inline hot rows are the SLOWEST ones, full 2-decimal
            inline_ts = [v for v in d["queries"].values() if v >= 0]
            slowest = sorted((t for t in timings.values() if t >= 0.45), reverse=True)
            assert max(inline_ts) == round(slowest[0], 2)


def test_bench_digest_not_engaged_at_current_inventory():
    """The real registry must still use the plain ladder (per-query rows
    inline) — digest is the overflow path, not the default."""
    names = _inventory_names()
    timings = {n: round(0.0001 + 1.7 * (i % 5), 4) for i, n in enumerate(names)}
    line = format_bench_line(timings, "/root/testdata/sf0.1", detail_path=None)
    d = json.loads(line)
    assert "cold" not in d and len(d["queries"]) == len(names)


def test_bench_retry_pass_lands_in_samples():
    """The r14-verdict artifact contradiction: the adaptive third pass
    updated `timings` but not `samples`, so a retried row's reported min
    was absent from its own sample list.  Every recorded pass — the two
    main passes AND the retry — must appear in samples, and the reported
    min must be a member of that list."""
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for t in (6.03, 8.11):  # the two contended main passes (BENCH_r14 q146)
        record_pass(timings, samples, "q146_pagerank", t)
    record_pass(timings, samples, "q146_pagerank", 3.65)  # the adaptive retry
    assert samples["q146_pagerank"] == [6.03, 8.11, 3.65]
    assert timings["q146_pagerank"] == 3.65
    assert timings["q146_pagerank"] in samples["q146_pagerank"]
    # the -1.0 failure sentinel (set by main's except path) is replaced
    # by a later successful pass, not min'd against it
    timings.setdefault("q_fail", -1.0)
    record_pass(timings, samples, "q_fail", 2.0)
    assert timings["q_fail"] == 2.0


def test_bench_digest_does_not_clobber_sampled_detail(tmp_path):
    """main() writes the RICH detail file (per-pass samples + load
    averages) before formatting; the digest stage must leave an existing
    detail file alone so the samples survive even when the line
    overflows to digest mode."""
    detail = str(tmp_path / "detail.json")
    rich = {"queries": {"q1_x": 1.0}, "samples": {"q1_x": [1.2, 1.0]}}
    with open(detail, "w") as f:
        json.dump(rich, f)
    names = [f"q{i}_simulated_query_name_{i}" for i in range(1, 401)]
    timings = {n: round(0.51 + (i % 40) * 0.1003, 4) for i, n in enumerate(names)}
    line = format_bench_line(timings, "/root/testdata/sf0.1", detail_path=detail)
    d = json.loads(line)
    assert d.get("detail") == "detail.json"  # digest engaged at 400 rows
    with open(detail) as f:
        assert json.load(f) == rich  # untouched
