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


def test_null_value_raises_naming_column(tmp_path):
    """A None in a non-nullable column must fail with a ValueError naming
    the column (the loud-failure contract), not an opaque encoder
    TypeError/struct.error."""
    import pytest

    schema = json.dumps(
        {"type": "record", "name": "row",
         "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    )
    p = str(tmp_path / "n.avro")
    with pytest.raises(ValueError, match="NULL in column 'b'"):
        write_avro_file(p, schema, ["long", "string"], [(1, "x"), (2, None)],
                        field_names=["a", "b"])


def test_header_read_touches_only_header_bytes(tmp_path):
    """read_avro_header is the planning-time probe: it must not slurp the
    data blocks.  Prove it by truncating a written file to just past its
    header — the header still parses; the (now amputated) data does
    not."""
    from tinymr_spark.sources.tinyavro import read_avro_header

    schema = json.dumps(
        {"type": "record", "name": "row", "fields": [{"name": "a", "type": "long"}]}
    )
    p = str(tmp_path / "h.avro")
    write_avro_file(p, schema, ["long"], [(i,) for i in range(10_000)])
    _, _, data_off = read_avro_header(p)
    raw = open(p, "rb").read()
    assert data_off < len(raw) // 4, "header offset should be tiny vs data"
    trunc = str(tmp_path / "trunc.avro")
    open(trunc, "wb").write(raw[:data_off])
    got_schema, sync, off = read_avro_header(trunc)
    assert got_schema["fields"][0]["name"] == "a" and off == data_off


def test_negative_block_count_reads_as_abs(tmp_path):
    """Foreign writers may emit array-style negative block counts
    (abs(count) rows, byte size follows) — the data-block loop must
    mirror the header parser's tolerance instead of failing on the sync
    check."""
    import io as _io

    from tinymr_spark.sources.tinyavro import (
        MAGIC, SYNC_SIZE, _write_bytes, _write_long, read_avro_file,
    )

    schema = json.dumps(
        {"type": "record", "name": "row", "fields": [{"name": "a", "type": "long"}]}
    )
    sync = b"\x07" * SYNC_SIZE
    body = _io.BytesIO()
    for v in (10, 20, 30):
        _write_long(body, v)
    out = _io.BytesIO()
    out.write(MAGIC)
    _write_long(out, 2)
    _write_bytes(out, b"avro.schema")
    _write_bytes(out, schema.encode())
    _write_bytes(out, b"avro.codec")
    _write_bytes(out, b"null")
    _write_long(out, 0)
    out.write(sync)
    _write_long(out, -3)  # negative count: 3 rows
    _write_long(out, body.tell())
    out.write(body.getvalue())
    out.write(sync)
    p = str(tmp_path / "neg.avro")
    open(p, "wb").write(out.getvalue())
    assert list(read_avro_file(p)) == [(10,), (20,), (30,)]


# ---------------------------------------------------------------------------
# Error surface (VERDICT r14 task 6 — the tinybmp/decode_wav precedent):
# garbage and bit-flipped containers either decode or raise the codec's
# own AvroError, never a raw struct/Index/Key/UnicodeDecodeError from a
# worker's decode loop.  Every case must also TERMINATE (crafted
# negative lengths used to walk the block cursor backwards).
# ---------------------------------------------------------------------------
def _reference_file_bytes() -> bytes:
    import io as _io

    from tinymr_spark.sources.tinyavro import write_avro_file as _w  # noqa: F401

    schema = json.dumps(
        {"type": "record", "name": "row",
         "fields": [{"name": "a", "type": "long"}, {"name": "s", "type": "string"},
                    {"name": "d", "type": "double"}, {"name": "b", "type": "boolean"}]}
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/ref.avro"
        write_avro_file(
            p, schema, ["long", "string", "double", "boolean"],
            [(i, f"s{i}", i / 3.0, i % 2 == 0) for i in range(50)],
        )
        return open(p, "rb").read()


_REF_BYTES = _reference_file_bytes()


def _decode_all(tmp_path, payload: bytes):
    from tinymr_spark.sources.tinyavro import AvroError

    p = str(tmp_path / "fuzz.avro")
    open(p, "wb").write(payload)
    try:
        return list(read_avro_file(p))
    except AvroError:
        return None


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_garbage_bytes_never_escape_avroerror(tmp_path_factory, data):
    _decode_all(tmp_path_factory.mktemp("g"), data)


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_mutated_valid_files_never_escape_avroerror(tmp_path_factory, data):
    payload = bytearray(_REF_BYTES)
    for _ in range(data.draw(st.integers(min_value=1, max_value=8))):
        pos = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        payload[pos] ^= data.draw(st.integers(min_value=1, max_value=255))
    _decode_all(tmp_path_factory.mktemp("m"), bytes(payload))


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=len(_REF_BYTES) - 1))
def test_truncated_valid_files_never_escape_avroerror(tmp_path_factory, cut):
    _decode_all(tmp_path_factory.mktemp("t"), _REF_BYTES[:cut])


def test_magic_prefixed_garbage_raises_avroerror(tmp_path):
    """The adversarial corner: a correct magic + crafted varints (all
    continuation bits, negative lengths) must raise AvroError, not spin
    or leak IndexError."""
    from tinymr_spark.sources.tinyavro import MAGIC, AvroError

    import pytest

    for tail in (b"\xff" * 40, b"\x80" * 40, b"\x03\x05" + b"\xfe" * 20):
        p = str(tmp_path / "adv.avro")
        open(p, "wb").write(MAGIC + tail)
        with pytest.raises(AvroError):
            list(read_avro_file(p))


def test_avroerror_is_a_valueerror():
    """Callers matching the codec's historical ValueError contract keep
    working."""
    from tinymr_spark.sources.tinyavro import AvroError

    assert issubclass(AvroError, ValueError)


def test_manifest_consolidation_orders_batches_numerically(tmp_path):
    """_MANIFEST-10 must consolidate AFTER _MANIFEST-2 (numeric batchId
    order, not lexicographic), with the base _MANIFEST first."""
    from tinymr_spark.sources.tinyavro import _committed_files

    d = str(tmp_path)
    open(f"{d}/_MANIFEST", "w").write("base.avro\n")
    for b in (10, 2, 1):
        open(f"{d}/_MANIFEST-{b}", "w").write(f"batch{b}.avro\n")
    assert _committed_files(d) == [
        "base.avro", "batch1.avro", "batch2.avro", "batch10.avro",
    ]


def test_wide_final_varint_byte_raises_avroerror():
    """A 10-byte varint whose FINAL byte carries bits above the uint64
    range (b'\\xff'*9 + b'\\x7f') passes the byte-count guard — the loop
    exits on the clear continuation bit before any 11th byte — yet
    decodes outside int64.  Python's bigints mask what C would overflow,
    and the out-of-range value would crash later in Spark's bigint/Arrow
    conversion with exactly the raw worker traceback AvroError exists to
    prevent.  Both decoders must refuse with the codec's own error,
    while the maximal VALID 10-byte varint (int64 min) still decodes."""
    import io

    import pytest

    from tinymr_spark.sources.tinyavro import AvroError, _FileCursor, _read_long

    crafted = b"\xff" * 9 + b"\x7f"
    with pytest.raises(AvroError, match="64 bits"):
        _read_long(memoryview(crafted), 0)
    with pytest.raises(AvroError, match="64 bits"):
        _FileCursor(io.BytesIO(crafted)).read_long()
    ok = b"\xff" * 9 + b"\x01"  # zigzag uint64 max -> int64 min
    assert _read_long(memoryview(ok), 0)[0] == -(2**63)
    assert _FileCursor(io.BytesIO(ok)).read_long() == -(2**63)
