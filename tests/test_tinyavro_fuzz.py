"""Property-based round-trip fuzz for the hand-rolled Avro OCF codec
(sources/tinyavro.py) — the same differential strategy the MapReduce
face uses against the reference: if write(read(x)) != x for ANY
generated input, the codec is wrong, no matter how many example tests
pass.  Covers the full primitive surface including the varint edges
(int64 extremes, zero, sign flips), empty/unicode/long strings, empty
byte strings, block-boundary row counts, and zero-row files."""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from tinymr_spark.sources.tinyavro import (
    _BLOCK_ROWS,
    avro_record_schema,
    read_avro_file,
    write_avro_file,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
# doubles: exclude NaN (NaN != NaN breaks equality-based round-trip
# checking; the codec itself is bit-transparent for any payload)
DBL = st.floats(allow_nan=False, width=64)
STR = st.text(max_size=60)
BYT = st.binary(max_size=60)
BOOL = st.booleans()

FIELD_TYPES = {
    "long": I64,
    "double": DBL,
    "string": STR,
    "boolean": BOOL,
    "bytes": BYT,
}


@st.composite
def _table(draw):
    types = draw(
        st.lists(st.sampled_from(sorted(FIELD_TYPES)), min_size=1, max_size=5)
    )
    row = st.tuples(*[FIELD_TYPES[t] for t in types])
    rows = draw(st.lists(row, max_size=50))
    return types, rows


@settings(max_examples=150, deadline=None)
@given(_table())
def test_roundtrip_identity(tmp_path_factory, table):
    types, rows = table
    p = str(tmp_path_factory.mktemp("avfuzz") / "t.avro")
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": f"c{i}", "type": t} for i, t in enumerate(types)],
    }
    n = write_avro_file(p, json.dumps(schema), types, rows)
    assert n == len(rows)
    got = list(read_avro_file(p))
    assert len(got) == len(rows)
    for g, w in zip(got, rows):
        for gv, wv in zip(g, w):
            if isinstance(wv, float):
                # struct.pack/unpack '<d' is bit-transparent, so demand
                # BIT equality (stricter than ==): distinguishes -0.0
                # from 0.0, and would catch NaN payloads if they were
                # ever generated
                assert math.copysign(1.0, gv) == math.copysign(1.0, wv)
                assert gv == wv
            else:
                assert gv == wv


def test_block_boundary_row_counts(tmp_path):
    """Row counts straddling the container block size must tile into
    multiple sync-delimited blocks without gap or duplication."""
    for n in (_BLOCK_ROWS - 1, _BLOCK_ROWS, _BLOCK_ROWS + 1, 2 * _BLOCK_ROWS + 3):
        p = str(tmp_path / f"b{n}.avro")
        rows = [(i,) for i in range(n)]
        write_avro_file(p, json.dumps(
            {"type": "record", "name": "row",
             "fields": [{"name": "a", "type": "long"}]}), ["long"], rows)
        assert [r[0] for r in read_avro_file(p)] == list(range(n))


def test_zero_row_file_roundtrip(tmp_path):
    p = str(tmp_path / "empty.avro")
    write_avro_file(p, json.dumps(
        {"type": "record", "name": "row",
         "fields": [{"name": "a", "type": "long"}]}), ["long"], [])
    assert list(read_avro_file(p)) == []


def test_schema_mapping_matches_fuzzed_types(spark):
    """avro_record_schema maps every fuzzed Spark primitive to the avro
    type the codec encodes it as."""
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(
        "a bigint, b double, c string, d boolean, e binary, f int"
    )
    rec = avro_record_schema(schema)
    assert [f["type"] for f in rec["fields"]] == [
        "long", "double", "string", "boolean", "bytes", "int"
    ]
