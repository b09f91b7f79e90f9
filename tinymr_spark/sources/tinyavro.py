"""`tinyavro`: an Avro Object Container File source/sink as a Spark 4
Python DataSource — batch READ and WRITE, partition-parallel on both
sides.

Why hand-rolled: this environment ships neither the `spark-avro` JVM
module (external to the Spark distribution) nor any Python avro
library, but Avro remains a mainstream lake interchange format, so the
engine carries a minimal, SPEC-COMPLIANT codec for the null-codec
container file (magic `Obj\\x01`, metadata map with `avro.schema`,
sync-marker-delimited blocks; primitives: zigzag-varint int/long,
little-endian IEEE double, length-prefixed string/bytes, 1-byte
boolean).  Files written here are readable by any Avro tooling and vice
versa for files limited to those primitives.

Scale shape — the part that must survive 100 TB — is in the PLUMBING,
not the codec: the writer runs once per input partition on executors
(one container file per task, unique names, no coordination), the
driver `commit()` publishes a `_MANIFEST` naming exactly the files of
successfully committed tasks (so readers never see orphan output of
failed/speculative tasks), and the reader plans one input partition per
manifest file, decoding executor-side.  The per-row Python codec is the
documented slow path: production swaps it for the JVM `spark-avro`
scan/write behind the same format string, exactly like the multimodal
codec seam.

The reference has no I/O at all (/root/reference/tinymr.py:156-230);
formats are beyond-reference surface (SURVEY.md §2.3).
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
_BLOCK_ROWS = 4096  # rows per container block: bounded memory either side


class AvroError(ValueError):
    """Raised on malformed or unsupported Avro container payloads.

    The reader's single-typed error contract (the tinybmp/decode_wav
    precedent, fuzz-pinned): garbage or bit-flipped files either decode
    or raise AvroError — never a raw IndexError/struct.error/
    UnicodeDecodeError/KeyError from deep inside a worker's decode loop,
    which would crash the scan with an undiagnosable traceback.
    Subclasses ValueError so callers matching the codec's historical
    error type keep working."""


# Raw exception types the decode paths can hit on adversarial bytes;
# _as_avro_error normalizes them (ValueError — including json decode
# errors — is re-raised as-is or already an AvroError).
_RAW_DECODE_ERRORS = (
    IndexError,
    KeyError,
    TypeError,
    struct.error,
    UnicodeDecodeError,
    OverflowError,
)

# Spark simpleString -> (avro type, encoder, decoder-key)
_SPARK_TO_AVRO = {
    "bigint": "long",
    "int": "int",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}
_AVRO_TO_SPARK = {
    "long": "bigint",
    "int": "int",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "bytes": "binary",
}


# ---------------------------------------------------------------------------
# Binary primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------
def _write_long(out: io.BytesIO, n: int) -> None:
    u = (n << 1) ^ (n >> 63)  # zigzag; arbitrary-precision-safe in Python
    while u > 0x7F:
        out.write(bytes(((u & 0x7F) | 0x80,)))
        u >>= 7
    out.write(bytes((u,)))


def _read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:  # spec: a zigzag int64 is at most 10 varint bytes
            raise AvroError(f"varint overruns 64 bits at offset {pos}")
    if u >> 64:
        # a 10-byte varint whose FINAL byte carries high bits (e.g.
        # b'\xff'*9 + b'\x7f') passes the byte-count check above but
        # decodes outside uint64 — Python's bigints mask what C would
        # overflow, and the out-of-range value would crash later in the
        # Arrow/bigint conversion with exactly the raw worker traceback
        # AvroError exists to prevent
        raise AvroError(f"varint exceeds 64 bits at offset {pos}")
    return (u >> 1) ^ -(u & 1), pos


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        # a negative length would walk pos BACKWARDS (infinite block
        # loop on crafted input); an overlong one would silently
        # truncate via slicing
        raise AvroError(f"bad byte-length {n} at offset {pos}")
    return bytes(buf[pos : pos + n]), pos + n


_ENCODERS = {
    "long": _write_long,
    "int": _write_long,
    "double": lambda out, v: out.write(struct.pack("<d", v)),
    "string": lambda out, v: _write_bytes(out, v.encode("utf-8")),
    "boolean": lambda out, v: out.write(b"\x01" if v else b"\x00"),
    "bytes": _write_bytes,
}


def _dec_double(buf: memoryview, pos: int) -> tuple[float, int]:
    return struct.unpack_from("<d", buf, pos)[0], pos + 8


def _dec_string(buf: memoryview, pos: int) -> tuple[str, int]:
    b, pos = _read_bytes(buf, pos)
    return b.decode("utf-8"), pos


_DECODERS = {
    "long": _read_long,
    "int": _read_long,
    "double": _dec_double,
    "string": _dec_string,
    "boolean": lambda buf, pos: (buf[pos] == 1, pos + 1),
    "bytes": _read_bytes,
}


# ---------------------------------------------------------------------------
# Container file
# ---------------------------------------------------------------------------
def avro_record_schema(spark_schema: StructType, name: str = "row") -> dict:
    """Map a Spark schema (non-null primitive fields) to the Avro record
    schema embedded in the file header.  Unsupported types raise loudly:
    silently coercing a timestamp would corrupt a lake interchange
    file."""
    fields = []
    for f in spark_schema.fields:
        t = f.dataType.simpleString()
        if t not in _SPARK_TO_AVRO:
            raise ValueError(
                f"tinyavro supports primitive columns {sorted(_SPARK_TO_AVRO)}; "
                f"column {f.name!r} is {t!r} — cast or project it first"
            )
        fields.append({"name": f.name, "type": _SPARK_TO_AVRO[t]})
    return {"type": "record", "name": name, "fields": fields}


def write_avro_file(
    path: str,
    schema_json: str,
    field_types: list[str],
    rows,
    field_names: list[str] | None = None,
) -> int:
    """One Avro OCF with the null codec; returns rows written.

    NULLs fail LOUDLY: the declared schema is non-null primitives
    (avro_record_schema), so a None anywhere would otherwise surface as
    an opaque executor-side TypeError/struct.error deep in an encoder —
    instead the first null raises a ValueError naming the column, the
    same loud-failure contract as the schema-level type check."""
    sync = os.urandom(SYNC_SIZE)
    encs = [_ENCODERS[t] for t in field_types]
    n_rows = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        head = io.BytesIO()
        _write_long(head, 2)  # metadata map: one block of two entries
        _write_bytes(head, b"avro.schema")
        _write_bytes(head, schema_json.encode("utf-8"))
        _write_bytes(head, b"avro.codec")
        _write_bytes(head, b"null")
        _write_long(head, 0)  # map terminator
        f.write(head.getvalue())
        f.write(sync)

        block = io.BytesIO()
        count = 0

        def flush():
            nonlocal count
            if count == 0:
                return
            hdr = io.BytesIO()
            _write_long(hdr, count)
            _write_long(hdr, block.tell())
            f.write(hdr.getvalue())
            f.write(block.getvalue())
            f.write(sync)
            block.seek(0)
            block.truncate()
            count = 0

        for row in rows:
            for i, (enc, v) in enumerate(zip(encs, row)):
                if v is None:
                    col = field_names[i] if field_names else f"#{i}"
                    raise ValueError(
                        f"tinyavro: NULL in column {col!r} (row {n_rows} of "
                        f"this partition) but the avro schema declares "
                        f"non-null primitives — filter or fill nulls first"
                    )
                enc(block, v)
            count += 1
            n_rows += 1
            if count >= _BLOCK_ROWS:
                flush()
        flush()
    return n_rows


class _FileCursor:
    """Incremental reads straight off the file handle — the header parse
    touches ONLY header bytes (important on the driver: schema() probes a
    part file's header at planning time, and a slurp would make planning
    cost O(first file size) instead of O(header), breaking the
    parquet-footer cost-class contract)."""

    def __init__(self, f):
        self.f = f
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.f.read(n)
        if len(b) < n:
            raise ValueError("truncated Avro header")
        self.pos += n
        return b

    def read_long(self) -> int:
        u = 0
        shift = 0
        while True:
            b = self.read(1)[0]
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise AvroError(f"varint overruns 64 bits at offset {self.pos}")
        if u >> 64:  # final-byte high bits: see _read_long
            raise AvroError(f"varint exceeds 64 bits at offset {self.pos}")
        return (u >> 1) ^ -(u & 1)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0:
            # f.read(-1) would slurp to EOF and walk self.pos backwards
            raise AvroError(f"bad byte-length {n} in header at offset {self.pos}")
        return self.read(n)


def read_avro_header(path: str) -> tuple[dict, bytes, int]:
    """(record schema, sync marker, data offset) from a container file —
    a metadata-only read, the avro analog of a parquet footer probe:
    only header bytes are read, never the data blocks.  Malformed or
    unsupported headers raise :class:`AvroError`, nothing else."""
    try:
        with open(path, "rb") as f:
            cur = _FileCursor(f)
            if cur.read(4) != MAGIC:
                raise AvroError(f"{path} is not an Avro object container file")
            meta: dict[bytes, bytes] = {}
            while True:
                n = cur.read_long()
                if n == 0:
                    break
                if n < 0:  # spec: negative count prefixes a block byte size
                    n = -n
                    cur.read_long()
                for _ in range(n):
                    k = cur.read_bytes()
                    v = cur.read_bytes()
                    meta[k] = v
            codec = meta.get(b"avro.codec", b"null")
            if codec != b"null":
                raise AvroError(f"unsupported avro codec {codec!r} (null only)")
            if b"avro.schema" not in meta:
                raise AvroError(f"{path} header carries no avro.schema")
            sync = cur.read(SYNC_SIZE)
            schema = json.loads(meta[b"avro.schema"])
            if not isinstance(schema, dict) or not isinstance(
                schema.get("fields"), list
            ):
                raise AvroError(f"{path} schema is not a record with fields")
            return schema, sync, cur.pos
    except AvroError:
        raise
    except (*_RAW_DECODE_ERRORS, ValueError) as e:
        raise AvroError(
            f"malformed Avro header in {path}: {type(e).__name__}: {e}"
        ) from e


def read_avro_file(path: str):
    """Yield row tuples; decodes with the file's own embedded writer
    schema (no external schema needed — reader-side projection happens
    in Spark above this scan).  Malformed blocks raise
    :class:`AvroError`, nothing else (fuzz-pinned)."""
    schema, sync, pos = read_avro_header(path)
    try:
        decs = [_DECODERS[f["type"]] for f in schema["fields"]]
        if not decs:
            # a zero-field record consumes no bytes per row: a crafted
            # huge block count would spin forever without advancing
            raise AvroError(f"{path} schema has no fields")
        with open(path, "rb") as f:
            raw = f.read()
        buf = memoryview(raw)
        end = len(raw)
        while pos < end:
            count, pos = _read_long(buf, pos)
            if count < 0:
                # OCF data blocks are spec'd count-then-size, but mirror
                # the header map's negative-count tolerance for foreign
                # writers that emit array-style blocks: abs(count) rows
                # follow.
                count = -count
            _, pos = _read_long(buf, pos)  # block byte size (unused: null codec)
            for _ in range(count):
                row = []
                for dec in decs:
                    v, pos = dec(buf, pos)
                    row.append(v)
                yield tuple(row)
            if buf[pos : pos + SYNC_SIZE] != sync:
                raise AvroError(f"sync marker mismatch in {path} at {pos}")
            pos += SYNC_SIZE
    except AvroError:
        raise
    except (*_RAW_DECODE_ERRORS, ValueError) as e:
        raise AvroError(
            f"malformed Avro block in {path}: {type(e).__name__}: {e}"
        ) from e


# ---------------------------------------------------------------------------
# The DataSource
# ---------------------------------------------------------------------------
MANIFEST = "_MANIFEST"


class _FileCommit(WriterCommitMessage):
    """Names the one container file a task wrote (picklable)."""

    def __init__(self, value: str):
        self.value = value


class TinyAvroDataSource(DataSource):
    """`spark.read.format("tinyavro").load(dir)` /
    `df.write.format("tinyavro").mode(...).save(dir)`."""

    @classmethod
    def name(cls) -> str:
        return "tinyavro"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("tinyavro requires a path")
        return path

    def schema(self) -> str:
        # Schema of record = the embedded writer schema of the first
        # manifest file — a header-only driver read, same planning-time
        # cost class as a parquet footer.
        files = _manifest_files(self._path())
        if not files:
            raise ValueError(f"no tinyavro files at {self._path()}")
        schema, _, _ = read_avro_header(files[0])
        return ", ".join(
            f"{f['name']} {_AVRO_TO_SPARK[f['type']]}" for f in schema["fields"]
        )

    def reader(self, schema) -> "TinyAvroReader":
        return TinyAvroReader(self._path())

    def writer(self, schema, overwrite: bool) -> "TinyAvroWriter":
        return TinyAvroWriter(self._path(), schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "TinyAvroStreamWriter":
        return TinyAvroStreamWriter(self._path(), schema)


def _committed_files(path: str) -> list[str]:
    """Basenames listed by manifests only — NO bare-file fallback: the
    writer's notion of 'already committed' must never include
    uncommitted part files."""
    if not os.path.isdir(path):
        return []
    out: list[str] = []

    def _order(name: str):
        # base manifest (prior consolidated data) first, then streaming
        # batch manifests in NUMERIC batchId order — lexicographic would
        # consolidate _MANIFEST-10 before _MANIFEST-2, scrambling batch
        # order in the merged file list.
        if name == MANIFEST:
            return (0, 0, name)
        suffix = name[len(MANIFEST) + 1 :]
        return (1, int(suffix), name) if suffix.isdigit() else (2, 0, name)

    for mf in sorted(
        (f for f in os.listdir(path)
         if f == MANIFEST or f.startswith(MANIFEST + "-")),
        key=_order,
    ):
        with open(os.path.join(path, mf)) as f:
            out.extend(line.strip() for line in f if line.strip())
    return list(dict.fromkeys(out))


def _manifest_files(path: str) -> list[str]:
    """Committed files only: manifests are written by the driver at
    commit (`_MANIFEST` for a batch write, `_MANIFEST-<batchId>` per
    streaming micro-batch), so orphan part files from failed,
    speculative, or replayed-then-superseded tasks are invisible to
    readers.  A manifest-less directory of bare .avro files (foreign
    tooling's output) is read whole — a READER-only courtesy; the
    writer's committed-set never uses this fallback."""
    committed = _committed_files(path)
    if committed:
        return [os.path.join(path, f) for f in committed]
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".avro")
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TinyAvroReader(DataSourceReader):
    def __init__(self, path: str):
        self.files = _manifest_files(path)

    def partitions(self):
        # One partition per container file: reads scale with the writer's
        # task parallelism, no driver data path.
        return [_FilePartition(p) for p in self.files]

    def read(self, partition: _FilePartition):
        yield from read_avro_file(partition.path)


class TinyAvroWriter(DataSourceWriter):
    """Batch writer with ATOMIC publish semantics: tasks write new part
    files beside the live data, and only the driver-side commit() swaps
    the manifest (os.replace — readers resolve the old manifest or the
    new one, never a partial state).  A failed or aborted job therefore
    leaves the previously committed table fully intact — abort() removes
    only the new attempt's part files; nothing is deleted at plan time.
    On overwrite, superseded part files are garbage-collected only AFTER
    the manifest swap.  (A reader that resolved the old manifest just
    before the swap can race the GC of old files — the inherent limit of
    a plain-filesystem table; snapshot isolation needs a versioned
    manifest log, which is the q124/q133 territory.)"""

    def __init__(self, path: str, schema: StructType, overwrite: bool):
        self.path = path
        self.overwrite = overwrite
        # avro_record_schema first: it raises the loud unsupported-type
        # error before the per-field lookup could KeyError opaquely
        self.schema_json = json.dumps(avro_record_schema(schema))
        self.field_types = [
            _SPARK_TO_AVRO[f.dataType.simpleString()] for f in schema.fields
        ]
        self.field_names = [f.name for f in schema.fields]
        os.makedirs(path, exist_ok=True)

    def write(self, iterator) -> WriterCommitMessage:
        # Executor-side, once per input partition; unique name, no
        # coordination with other tasks.
        fname = f"part-{uuid.uuid4().hex}.avro"
        write_avro_file(
            os.path.join(self.path, fname),
            self.schema_json,
            self.field_types,
            (tuple(row) for row in iterator),
            field_names=self.field_names,
        )
        return _FileCommit(fname)

    def commit(self, messages) -> None:
        new = [m.value for m in messages if m is not None]
        # append keeps everything currently COMMITTED (consolidating any
        # streaming batch manifests); overwrite publishes only the new
        # attempt's files.  "Committed" means manifest-listed ONLY —
        # using the reader's bare-.avro fallback here would enroll this
        # attempt's own just-written part files (listing everything
        # twice) and any aborted attempts' orphans into the table.
        prior = [] if self.overwrite else _committed_files(self.path)
        mf = os.path.join(self.path, MANIFEST)
        tmp = mf + ".tmp"
        with open(tmp, "w") as f:
            for fname in prior + new:
                f.write(fname + "\n")
        os.replace(tmp, mf)  # the atomic publish point
        # post-swap cleanup: superseded batch manifests, and (on
        # overwrite) the no-longer-referenced part files
        live = set(prior + new)
        for fname in os.listdir(self.path):
            try:
                if fname.startswith(MANIFEST + "-"):
                    os.remove(os.path.join(self.path, fname))
                elif (
                    self.overwrite
                    and fname.endswith(".avro")
                    and fname not in live
                ):
                    os.remove(os.path.join(self.path, fname))
            except OSError:
                pass

    def abort(self, messages) -> None:
        # remove only the failed attempt's files; committed data untouched
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.value))
                except OSError:
                    pass


class TinyAvroStreamWriter(DataSourceStreamWriter):
    """The STREAMING sink face (Spark 4 `streamWriter`) — completes the
    format's read/write x batch/stream matrix (q121 batch read, q136
    stream read, q141 batch write, q143 stream write).  Per micro-batch
    the tasks write container files executor-side exactly like the batch
    writer; the driver `commit(messages, batchId)` then publishes
    `_MANIFEST-<batchId>` listing that batch's files — REPLACING any
    manifest a previous attempt of the same batchId left behind, which
    is the exactly-once contract: after a failure Spark replays the
    micro-batch from the checkpoint, the new attempt's manifest
    supersedes the old one, and the superseded attempt's part files
    become invisible orphans (readers resolve manifests only).  No
    coordination beyond the manifest write, so the sink scales with
    task count."""

    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.schema_json = json.dumps(avro_record_schema(schema))
        self.field_types = [
            _SPARK_TO_AVRO[f.dataType.simpleString()] for f in schema.fields
        ]
        self.field_names = [f.name for f in schema.fields]
        os.makedirs(path, exist_ok=True)

    def write(self, iterator) -> WriterCommitMessage:
        fname = f"part-{uuid.uuid4().hex}.avro"
        write_avro_file(
            os.path.join(self.path, fname),
            self.schema_json,
            self.field_types,
            (tuple(row) for row in iterator),
            field_names=self.field_names,
        )
        return _FileCommit(fname)

    def commit(self, messages, batchId: int) -> None:
        mf = os.path.join(self.path, f"{MANIFEST}-{batchId}")
        tmp = mf + ".tmp"
        with open(tmp, "w") as f:
            for m in messages:
                if m is not None:
                    f.write(m.value + "\n")
        os.replace(tmp, mf)  # atomic: a replayed batch swaps, never appends

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.value))
                except OSError:
                    pass


def register(spark) -> None:
    """Idempotent per-session registration of the format."""
    if getattr(spark, "_tinymr_tinyavro_registered", False):
        return
    spark.dataSource.register(TinyAvroDataSource)
    spark._tinymr_tinyavro_registered = True
