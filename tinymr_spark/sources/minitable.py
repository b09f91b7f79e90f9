"""`minitable`: a minimal snapshot-isolated versioned table on plain
parquet — the lakehouse commit-log primitive (Delta/Iceberg's core idea)
at the smallest size that preserves its guarantees.

A table directory holds immutable parquet part files plus a `_log/`
commit log of JSON records `v{N}.json`:

    {"version": N, "action": "append"|"overwrite", "added": [...]}

The LIVE FILE SET of version V is derived by replaying the log to V:
`append` unions its files in; `overwrite` replaces the whole set (a
compaction is an overwrite whose rows are unchanged).  Readers resolve a
version (latest by default, or AS OF any past version) to a file list
and read exactly those parquet files — a reader never sees a partial
commit, because:

* part files are immutable once a commit references them and are
  written BEFORE the commit record (write-ordering barrier);
* the commit record itself is claimed with `os.open(O_CREAT | O_EXCL)`
  — creation is the atomic publish point, and two writers racing to
  commit version N get exactly one winner (OPTIMISTIC CONCURRENCY: the
  loser re-reads the log, rebases, retries with N+1 — returned loudly
  here as `CommitConflict` rather than hidden behind a retry loop, so
  callers own their merge semantics);
* superseded files are never deleted by commit — history stays
  readable; `vacuum()` is the explicit, destructive retention step and
  refuses to drop files still referenced by a retained version.

Scale: the log is O(commits) driver-side JSON (Delta's exact shape —
table data never flows through it), reads plan the resolved file list
as an ordinary parquet scan (pushdown/pruning intact), and writes are
executor-parallel parquet jobs.  The reference has no I/O at all
(/root/reference/tinymr.py:156-230); versioned tables are
beyond-reference surface (SURVEY.md §2.3), the snapshot-isolation
follow-on the q141/q124 manifest commits pointed at.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer claimed this version first — re-read the log,
    rebase, retry against the new head."""


def _log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def _version_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"v{version}.json")


def versions(path: str) -> list[int]:
    """All committed versions, ascending.  Only fully-published records
    appear: the O_CREAT|O_EXCL claim makes file EXISTENCE the commit."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def snapshot(path: str, version: int | None = None) -> list[str]:
    """The live file list AS OF `version` (latest when None), absolute
    paths, in commit-then-manifest order (deterministic)."""
    vs = versions(path)
    if not vs:
        return []
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise ValueError(f"minitable {path} has no version {version} (log: {vs})")
    live: list[str] = []
    for v in vs:
        if v > version:
            break
        with open(_version_file(path, v)) as f:
            rec = json.load(f)
        if rec["action"] == "overwrite":
            live = list(rec["added"])
        else:
            live.extend(rec["added"])
    return [os.path.join(path, f) for f in live]


def commit(
    path: str,
    action: str,
    added: list[str],
    txn: tuple[str, int] | None = None,
) -> int:
    """Publish the next version atomically; returns its number.

    The O_CREAT|O_EXCL open is the publish point: if another writer
    claimed the same number between our log read and our claim, the
    open fails and we surface CommitConflict — the caller rebases
    (its `added` files are already on disk and stay valid for the
    retry, so rebase cost is one more commit attempt, not a rewrite).

    `txn=(app_id, txn_version)` records an idempotence token in the
    commit (Delta's txnAppId/txnVersion pattern): a replaying writer
    checks `last_txn_version(path, app_id)` before committing and skips
    already-applied work — how a streaming micro-batch sink stays
    exactly-once across checkpoint replays (q163)."""
    if action not in ("append", "overwrite"):
        raise ValueError(f"unknown minitable action {action!r}")
    os.makedirs(_log_dir(path), exist_ok=True)
    vs = versions(path)
    version = (vs[-1] + 1) if vs else 0
    body = {"version": version, "action": action, "added": added}
    if txn is not None:
        body["txn"] = {"app": txn[0], "version": txn[1]}
    # Write the FULL record to a private temp name first, then publish
    # via os.link — link both fails atomically if the version was
    # claimed concurrently (EXCL semantics) AND makes the name visible
    # only with its complete body (a bare O_EXCL open would let readers
    # see an empty v{N}.json in the create-to-write window, and a writer
    # crash there would brick the log with a permanently empty record).
    tmp = _version_file(path, version) + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(body))
    try:
        os.link(tmp, _version_file(path, version))
    except FileExistsError as e:
        raise CommitConflict(
            f"version {version} of {path} was claimed concurrently"
        ) from e
    finally:
        os.remove(tmp)
    return version


def last_txn_version(path: str, app_id: str) -> int | None:
    """Highest txn_version this app has committed, or None — the
    replay-detection read half of the txn idempotence protocol."""
    # Newest-first scan, first match wins: one app's txn versions are
    # monotone (the idempotence protocol skips anything <= the last
    # applied id), so this is O(1) amortized per call instead of
    # re-parsing the whole log — q163 calls it once per micro-batch,
    # which would otherwise make a long-lived stream O(batches^2) in
    # driver JSON reads.
    for v in reversed(versions(path)):
        with open(_version_file(path, v)) as f:
            rec = json.load(f)
        t = rec.get("txn")
        if t and t.get("app") == app_id:
            return t["version"]
    return None


def write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    action: str = "append",
    txn: tuple[str, int] | None = None,
) -> int:
    """Write `df` as new part files under `path` and commit them.
    Files land under a unique attempt prefix BEFORE the commit record
    exists, so a crash between write and commit leaves only invisible
    orphans (the q141 manifest argument)."""
    attempt = f"part-{uuid.uuid4().hex[:12]}"
    staging = os.path.join(path, attempt)
    df.write.mode("overwrite").parquet(staging)
    added = sorted(
        f"{attempt}/{f}" for f in os.listdir(staging) if f.endswith(".parquet")
    )
    return commit(path, action, added, txn=txn)


def read(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """AS-OF read: resolve the snapshot to a file list, plan an ordinary
    parquet scan over exactly those files."""
    files = snapshot(path, version)
    if not files:
        raise ValueError(f"minitable {path} is empty at version {version}")
    return spark.read.parquet(*files)


def changes(
    spark: SparkSession, path: str, from_version: int, to_version: int
) -> DataFrame:
    """CHANGE DATA FEED: the rows added in versions (from_version,
    to_version] — for append commits the added files ARE the delta, so
    the feed is a plain parquet scan of exactly those files (no diffing
    join, no full-table read; the q133 row-hash diff is the fallback
    when history spans a rewrite).  An intervening `overwrite` breaks
    the append-only delta semantics and raises LOUDLY rather than
    returning a wrong feed — Delta's own CDF restriction."""
    vs = versions(path)
    for bound in (from_version, to_version):
        if bound not in vs:
            raise ValueError(f"minitable {path} has no version {bound} (log: {vs})")
    if to_version <= from_version:
        raise ValueError("changes() needs from_version < to_version")
    added: list[str] = []
    for v in vs:
        if v <= from_version or v > to_version:
            continue
        with open(_version_file(path, v)) as f:
            rec = json.load(f)
        if rec["action"] == "overwrite":
            raise ValueError(
                f"version {v} is an overwrite — the ({from_version}, "
                f"{to_version}] range has no append-only change feed; "
                "use a snapshot diff instead"
            )
        added.extend(rec["added"])
    if not added:
        # A quiet period (empty append commits) is a legitimate EMPTY
        # delta, not an error — a polling CDF consumer must get an empty
        # feed (Delta's behavior), typed like the table itself.
        base = snapshot(path, to_version)
        if not base:
            raise ValueError(
                f"minitable {path} is empty at version {to_version} — "
                "no schema to type an empty change feed"
            )
        return spark.read.parquet(*base).limit(0)
    return spark.read.parquet(*[os.path.join(path, f) for f in added])


def vacuum(path: str, retain_from_version: int) -> list[str]:
    """Delete part files unreferenced by EVERY version >=
    `retain_from_version`; versions before it become unreadable (their
    log records remain for audit).  Returns the deleted files.  This is
    the only operation that destroys history — explicit by design."""
    vs = versions(path)
    if retain_from_version not in vs:
        # A typo'd bound above the head would retain NOTHING and delete
        # every data file including the live version's — refuse instead
        # (Delta's vacuum can never drop current-snapshot files).
        raise ValueError(
            f"retain_from_version {retain_from_version} is not a committed "
            f"version of {path} (log: {vs}) — refusing a vacuum that could "
            "drop the live snapshot"
        )
    keep: set[str] = set()
    for v in vs:
        if v >= retain_from_version:
            keep.update(os.path.relpath(p, path) for p in snapshot(path, v))
    deleted = []
    for root, _dirs, files in os.walk(path):
        if os.path.basename(root) == "_log":
            continue
        for f in files:
            full = os.path.join(root, f)
            rel = os.path.relpath(full, path)
            if rel.endswith(".parquet") and rel not in keep:
                os.remove(full)
                deleted.append(rel)
    return deleted
