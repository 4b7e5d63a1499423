"""Manifest-based snapshot commits over plain parquet (multi-writer
atomic publish).

The reference's own pain point was transactionality: plain Hive tables
give INSERT OVERWRITE no isolation (/root/reference/README.md:8,
"Hive 2.md":10 lament that a reader racing the overwrite sees partial
state, and two writers corrupt each other). Table formats (Delta,
Iceberg) solve this with an ordered log of manifest files; delta-spark
is unavailable in this environment, so this module implements the same
protocol shape over nothing but POSIX rename/link semantics:

Layout::

    table_root/
      data/snap-<uuid>/part-*.parquet   # immutable, uniquely named
      _manifests/v0000000001.json        # one file per committed version

Commit protocol (the Delta/Iceberg recipe, reduced to its core):

1. The writer stages its data under ``data/snap-<uuid>/`` — a fresh
   directory no other writer or reader can collide with. Readers never
   list ``data/``; they only follow manifests, so half-written stage
   dirs are invisible.
2. The writer resolves the latest committed version N, renders a
   manifest (file list, schema JSON, row count, parent version) to a
   temp file, fsyncs it, and publishes with ``os.link(tmp,
   v{N+1}.json)``. ``link`` is atomic and fails with ``FileExistsError``
   if another writer committed N+1 first — exactly one writer wins each
   version. Readers therefore see either the complete old manifest set
   or the complete new one, never a torn state.
3. A losing writer either rebases and retries at N+2 (blind overwrite /
   append carries no read-dependency, so retrying is linearizable) or —
   when the caller passed ``expected_version`` for optimistic
   concurrency — cleans up its stage dir and raises
   :class:`CommitConflictError`.

Crashes at ANY point before step 2's link leave only an unreferenced
stage dir / manifest temp, which :func:`vacuum` reclaims; a crash after
the link is a completed commit. There is no window in which a reader
can observe partial data — the property the dir-swap ``publish()`` this
replaces could not give a reader that was mid-listing during the swap.

``read_table`` is the universal reader: manifest-backed roots resolve
the highest committed manifest (or ``version=`` for time travel); plain
parquet dirs fall back to ``spark.read.parquet`` so call sites need not
care which kind of table they were handed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"
_VERSION_WIDTH = 10

# Column naming the data file a tombstone row applies to (manifest-
# relative path) inside a deletion-vector parquet file; every other
# vector column is a key column the read overlay anti-joins null-safely.
DELETE_FILE_COL = "__file"

# POSITIONAL deletion vectors (the Delta/Iceberg DV design): a vector
# whose columns are exactly {__file, __pos} tombstones the row at
# within-file ordinal __pos (parquet row index — stable because data
# files are immutable). The overlay recovers each row's ordinal from
# the ``_metadata.row_index`` scan column and anti-joins on
# (file, position): exact for ANY row — duplicate tuples, NULL keys,
# no key column required — at two narrow columns per tombstone
# regardless of table width. Both names are reserved: a data column
# named __file/__pos would collide with the overlay's join keys.
DELETE_POS_COL = "__pos"


class CommitConflictError(RuntimeError):
    """Another writer committed the version this writer expected to
    write (optimistic-concurrency loss). The loser's staged files have
    already been removed; retry from the new latest version."""


class ConstraintViolationError(ValueError):
    """A CHECK constraint failed during publish — nothing was staged or
    committed. ``.violations`` maps constraint name -> offending row
    count."""

    def __init__(self, violations: dict[str, int]):
        self.violations = violations
        super().__init__(
            "snapshot constraints violated: "
            + ", ".join(f"{k} ({v} rows)" for k, v in violations.items())
        )


def check_constraints(df: DataFrame, constraints: dict[str, str]) -> None:
    """Enforce Delta-style CHECK constraints in ONE aggregation pass
    (every constraint counted in the same job — not one scan each):
    raises :class:`ConstraintViolationError` naming each failed
    constraint and its offending row count. A NULL predicate result
    counts as a violation (CHECK semantics are 'must be true')."""
    from pyspark.sql import functions as F

    if not constraints:
        return
    aggs = [
        F.sum(
            F.when(F.coalesce(F.expr(pred), F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, pred in constraints.items()
    ]
    row = df.agg(*aggs).collect()[0]
    bad = {k: int(row[k]) for k in constraints if row[k] and int(row[k]) > 0}
    if bad:
        raise ConstraintViolationError(bad)


def _manifest_dir(root: str) -> str:
    return os.path.join(root, MANIFEST_DIR)


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_manifest_dir(root), f"v{version:0{_VERSION_WIDTH}d}.json")


def is_snapshot_table(root: str) -> bool:
    return os.path.isdir(_manifest_dir(root))


def list_versions(root: str) -> list[int]:
    """Committed versions, ascending. Only fully-committed manifests
    (``v*.json``) appear — temp files are dot-prefixed and skipped."""
    mdir = _manifest_dir(root)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(root: str) -> int | None:
    vs = list_versions(root)
    return vs[-1] if vs else None


_MANIFEST_CACHE: dict[str, tuple[tuple, dict]] = {}
_MANIFEST_CACHE_MAX = 16


def load_manifest(root: str, version: int) -> dict:
    """Parse a committed manifest. Cached: a manifest file is IMMUTABLE
    once its ``os.link`` wins (the protocol never rewrites one), so the
    parsed dict is reusable for the process lifetime — at ~10^5 file
    entries the JSON parse costs ~0.3 s (measured,
    scripts/manifest_ceiling.py), which a read-heavy driver would
    otherwise pay on every resolution. Every hit re-validates FILE
    IDENTITY via ``os.stat`` (inode + mtime + size, µs): a vacuumed
    version raises FileNotFoundError exactly like the uncached path, and
    a table DROPPED AND RECREATED at the same root (same v0000000001
    path, brand-new file) re-parses instead of serving the old table's
    manifest. Callers must treat the returned dict as read-only (every
    existing caller copies before mutating). Small-bounded with FIFO
    eviction — workloads touch the latest few versions per table."""
    p = _manifest_path(root, version)
    try:
        st = os.stat(p)
    except FileNotFoundError:
        _MANIFEST_CACHE.pop(p, None)
        raise
    ident = (st.st_ino, st.st_mtime_ns, st.st_size)
    hit = _MANIFEST_CACHE.get(p)
    if hit is not None and hit[0] == ident:
        return hit[1]
    with open(p) as f:
        m = json.load(f)
    _MANIFEST_CACHE.pop(p, None)
    while len(_MANIFEST_CACHE) >= _MANIFEST_CACHE_MAX:
        _MANIFEST_CACHE.pop(next(iter(_MANIFEST_CACHE)))
    _MANIFEST_CACHE[p] = (ident, m)
    return m


def column_mapping(m: dict) -> dict:
    """The manifest's LOGICAL -> PHYSICAL column-name mapping (Delta's
    name-mode column mapping): absent/empty means identity. Files and
    deletion vectors always store PHYSICAL names; the manifest schema,
    partition_by and stats keys are LOGICAL. RENAME COLUMN changes only
    the logical name (the mapping keeps serving the old physical name
    from every carried file); DROP COLUMN removes the field and retires
    its physical name (``retired_physical``) so a later ADD of the same
    logical name gets a FRESH physical name and can never resurrect the
    dropped column's bytes from old files."""
    return dict(m.get("column_mapping") or {})


def physical_schema(m: dict):
    """The manifest's schema with field names translated to their
    PHYSICAL (file-side) names — what parquet scans of the manifest's
    files must be pinned with once a mapping is active."""
    from pyspark.sql.types import StructField, StructType

    schema = StructType.fromJson(json.loads(m["schema"]))
    cm = column_mapping(m)
    if not cm:
        return schema
    return StructType(
        [
            StructField(cm.get(f.name, f.name), f.dataType, f.nullable)
            for f in schema.fields
        ]
    )


def group_vector_lists(root: str, deletes: dict) -> dict[tuple, list]:
    """Group a manifest ``deletes`` map for per-schema vector
    processing (shared by the read overlay and ``consolidate_vectors``
    — r10 second review pass deduplication): data files sharing the
    SAME vector-file list form one ``(rels, served)`` unit — tombstones
    for file f are EXACTLY the ``__file == f`` rows of f's OWN manifest
    list, so a vector file shared with another file must not re-apply
    superseded positions (replace semantics) — and units group by the
    vector files' footer column set (vector batches from different
    commits can be keyed differently; a single-file sample would
    mis-group). One driver-side footer read per DISTINCT vector file,
    no data scanned. Returns ``{sorted-column-name-tuple:
    [(rels_tuple, served_sorted_list), ...]}``."""
    by_list: dict[tuple, list[str]] = {}
    for f, rels in deletes.items():
        by_list.setdefault(tuple(rels), []).append(f)
    schema_of = vector_schemas(
        root, (r for rels in by_list for r in rels)
    )
    groups: dict[tuple, list] = {}
    for rels, served in sorted(by_list.items()):
        groups.setdefault(tuple(sorted(schema_of[rels[0]])), []).append(
            (rels, sorted(served))
        )
    return groups


def logical_vector_schemas(root: str, m: dict, rels) -> dict[str, set]:
    """:func:`vector_schemas` translated PHYSICAL -> LOGICAL through
    ``m``'s column mapping — what fold-compatibility probes compare
    against a new (logical-named) vector batch. A physical name with no
    live logical (its column was dropped) passes through untranslated,
    so the probe mismatches loudly instead of silently folding."""
    cm = column_mapping(m)
    rev = {p: l for l, p in cm.items()}
    return {
        r: {rev.get(n, n) for n in names}
        for r, names in vector_schemas(root, rels).items()
    }


def _used_physical(sdoc: dict, cm: dict, retired) -> set:
    """Physical names that exist (or may exist) in referenced or
    historical files — the collision set a new column's physical name
    must avoid. CASEFOLDED (r10 second review pass, CONFIRMED): parquet
    name resolution follows the analyzer's case-insensitivity
    (``spark.sql.caseSensitive=false``), so re-adding a dropped ``seg``
    as ``Seg`` would resolve to the old bytes in every carried file —
    an exact-case check here would let the no-resurrection invariant be
    bypassed by a case variant. Membership tests against this set must
    casefold the probe."""
    return {
        cm.get(f["name"], f["name"]).casefold() for f in sdoc["fields"]
    } | {r.casefold() for r in (retired or [])}


def _fresh_physical(name: str, version: int, used: set) -> str:
    """A physical name for a NEW column whose logical name collides
    (case-insensitively) with a used/retired physical name. ``used``
    is the casefolded set from :func:`_used_physical`."""
    phys = f"{name}__r{version}"
    while phys.casefold() in used:
        phys += "x"
    return phys


def stage_files(
    df: DataFrame,
    root: str,
    *,
    partition_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
) -> dict:
    """Step 1: materialize ``df`` under a fresh immutable stage dir and
    return the pending-commit description (relative file list, schema
    JSON, partitioning). Safe to abandon at any point — nothing
    references the stage dir until a manifest wins its link.

    ``stats_cols`` collects per-file min/max for the named columns from
    the parquet footers into the manifest (Delta-style data skipping:
    the commit log carries the file-pruning index, so a predicate read
    never even LISTS the skipped files — cluster the table on those
    columns, e.g. ``df.repartitionByRange(...).sortWithinPartitions``,
    for the stats to be disjoint and the skipping to bite)."""
    snap_rel = os.path.join(DATA_DIR, f"snap-{uuid.uuid4().hex}")
    snap_abs = os.path.join(root, snap_rel)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(snap_abs)
    files = []
    for dirpath, _dirnames, filenames in os.walk(snap_abs):
        for name in filenames:
            if name.startswith(("_", ".")) or not name.endswith(".parquet"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, name), root)
            files.append(rel)
    staged = {
        "snapshot_dir": snap_rel,
        "files": sorted(files),
        "schema": df.schema.json(),
        "partition_by": list(partition_by or []),
    }
    stats: dict[str, dict] = {}
    if stats_cols:
        for rel in staged["files"]:
            fs = _footer_stats(os.path.join(root, rel), stats_cols)
            if fs:
                stats[rel] = fs
    if partition_by:
        # hive-partition columns have no footer stats (their values live
        # in the path, not the file), so without this a prune on the
        # FIRST column a user partitions by would silently keep every
        # file; the path IS the exact [v, v] stats entry.
        ptypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for rel in staged["files"]:
            pv = _partition_values(os.path.relpath(rel, snap_rel), ptypes)
            if pv:
                stats.setdefault(rel, {}).update(
                    {c: [v, v] for c, v in pv.items()}
                )
    if stats:
        staged["stats"] = stats
    return staged


_VECTOR_SCHEMA_CACHE: dict[tuple, set] = {}


def vector_schemas(root: str, rels) -> dict[str, set]:
    """Column set of each deletion-vector file, one driver-side parquet
    footer read apiece (O(#vector files), no data scanned). Vector
    batches from different commits can be keyed differently (single-key
    SCD vectors vs full-row DML vectors), so both the read overlay and
    the DML fold/route paths group by this.

    Memoized: vector files are IMMUTABLE once staged (content-addressed
    dirs, never rewritten in place), so a footer read is valid for the
    file's lifetime — one DML statement probes the same footers in its
    route/fold/overlay steps, and on object storage each read is a
    round trip. Existence is re-checked per hit so a vacuumed file's
    entry dies with it (FIFO-bounded, the manifest-cache idiom)."""
    import pyarrow.parquet as pq

    out = {}
    for r in sorted(set(rels)):
        key = (os.path.realpath(root), r)
        path = os.path.join(root, r)
        cached = _VECTOR_SCHEMA_CACHE.get(key)
        if cached is not None and os.path.exists(path):
            out[r] = cached
            continue
        names = set(pq.read_schema(path).names)
        if len(_VECTOR_SCHEMA_CACHE) >= 4096:
            _VECTOR_SCHEMA_CACHE.pop(next(iter(_VECTOR_SCHEMA_CACHE)))
        _VECTOR_SCHEMA_CACHE[key] = names
        out[r] = names
    return out


_ROW_COUNT_CACHE: dict[tuple, int] = {}


def file_row_counts(root: str, rels) -> dict[str, int]:
    """Per-file row counts from parquet footer metadata, one driver-side
    read apiece (O(#files), no data scanned) — the DML auto-router's
    matched-row-fraction signal. Memoized like ``vector_schemas``: data
    files are IMMUTABLE once staged (content-addressed dirs, never
    rewritten in place), so a footer count is valid for the file's
    lifetime; existence is re-checked per hit so a vacuumed file's entry
    dies with it (FIFO-bounded)."""
    import pyarrow.parquet as pq

    out = {}
    for r in sorted(set(rels)):
        key = (os.path.realpath(root), r)
        path = os.path.join(root, r)
        cached = _ROW_COUNT_CACHE.get(key)
        if cached is not None and os.path.exists(path):
            out[r] = cached
            continue
        n = pq.ParquetFile(path).metadata.num_rows
        if len(_ROW_COUNT_CACHE) >= 65536:
            _ROW_COUNT_CACHE.pop(next(iter(_ROW_COUNT_CACHE)))
        _ROW_COUNT_CACHE[key] = n
        out[r] = n
    return out


def fold_prior_vectors(
    spark: SparkSession,
    root: str,
    m: dict,
    touched: list[str],
    tomb: DataFrame,
) -> DataFrame:
    """Fold the parent manifest's live tombstones for ``touched`` files
    into a new vector batch. A staged vector REPLACES the parent's for
    its file, so prior tombstones on re-vectored files must fold
    forward or their rows resurrect. Two exactness rules, both
    mirroring the read overlay (:func:`read_manifest_files`):

    * tombstones for file f are EXACTLY the ``__file == f`` rows of
      f's OWN manifest vector list — a vector file shared with some
      other file must not re-apply tombstones that f's re-vectoring
      dropped (those rows resurrected, per replace semantics);
    * EVERY prior vector file must carry this batch's column set
      (checked per file, driver-side footers — vectors from different
      commits can differ). A different set (e.g. an SCD merge's
      single-key vectors under a DML vector) cannot be expressed in
      one batch — fold them into clean files first
      (``sinks.compact_deletes``)."""
    deletes = m.get("deletes", {})
    by_list: dict[tuple, list[str]] = {}
    for f in touched:
        rels = deletes.get(f)
        if rels:
            by_list.setdefault(tuple(rels), []).append(f)
    if not by_list:
        return tomb
    # tomb is LOGICAL-named (callers build it from reads); prior vector
    # files store PHYSICAL names — compare and fold through the mapping
    cm = column_mapping(m)
    rev = {p: l for l, p in cm.items()}
    want = set(tomb.columns)
    for rel, names in vector_schemas(
        root, (r for rels in by_list for r in rels)
    ).items():
        if {rev.get(n, n) for n in names} != want:
            raise ValueError(
                f"touched files carry a deletion vector ({rel}) keyed by "
                f"{sorted(names)} which cannot fold into this "
                f"operation's {sorted(want)} vectors — run "
                f"sinks.compact_deletes({root!r}) first"
            )
    from pyspark.sql import functions as F

    out = tomb
    for rels, served in sorted(by_list.items()):
        prior = spark.read.parquet(
            *[os.path.join(root, p) for p in rels]
        ).where(F.col(DELETE_FILE_COL).isin(served))
        if rev:
            prior = prior.select(
                *[prior[c].alias(rev.get(c, c)) for c in prior.columns]
            )
        out = out.unionByName(prior.select(*tomb.columns))
    return out


def stage_delete_vectors(
    tomb: DataFrame, root: str
) -> tuple[str, list[str], list[str]]:
    """Stage a deletion-vector batch (the merge-on-read write side, the
    Delta/Iceberg answer to key-scattered small updates): ``tomb`` holds
    one row per tombstone with ``__file`` = the manifest-relative path of
    the data file the tombstone applies to, plus >=1 key column that the
    read overlay anti-joins NULL-SAFELY against that file's rows. Vector
    files are plain parquet under their own immutable ``data/snap-*``
    stage dir — nothing references them until a manifest commit wins, so
    abandoning at any point is safe (vacuum reclaims the orphan dir).

    Returns ``(dir_rel, vector_file_rels, covered_data_files)``; the
    covered list is read back from the written files (one tiny scan of
    the vector parquet, never the upstream plan twice). An empty batch
    returns empty lists and removes the stage dir."""
    if DELETE_FILE_COL not in tomb.columns or len(tomb.columns) < 2:
        raise ValueError(
            f"delete_vectors needs a {DELETE_FILE_COL!r} column plus at "
            f"least one key column; got {tomb.columns}"
        )
    snap_rel = os.path.join(DATA_DIR, f"snap-{uuid.uuid4().hex}")
    snap_abs = os.path.join(root, snap_rel)
    tomb.write.mode("overwrite").parquet(snap_abs)
    files = []
    for dirpath, _dirnames, filenames in os.walk(snap_abs):
        for name in filenames:
            if name.startswith(("_", ".")) or not name.endswith(".parquet"):
                continue
            files.append(os.path.relpath(os.path.join(dirpath, name), root))
    covered = [
        r[DELETE_FILE_COL]
        for r in tomb.sparkSession.read.parquet(snap_abs)
        .select(DELETE_FILE_COL)
        .distinct()
        .collect()
    ]
    if not covered:
        shutil.rmtree(snap_abs, ignore_errors=True)
        return snap_rel, [], []
    return snap_rel, sorted(files), sorted(covered)


_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}
_INT_RE = None  # compiled lazily


def _partition_values(rel_in_snapshot: str, col_types: dict) -> dict:
    """Typed partition values parsed from a file's ``col=value`` path
    segments (Spark's hive layout). Coercion follows the COLUMN'S
    DECLARED TYPE (``col_types``: name -> simpleString), never blind
    inference — a StringType partition value like '007' must stay the
    string '007' or pruning against string bounds raises on a str/int
    comparison (and '1_0' would silently become 10). A value that does
    not parse as its declared type, an unknown column, or the null
    sentinel yields NO entry, so pruning on that column keeps the file
    (absence of stats must never cost correctness)."""
    import re
    from urllib.parse import unquote

    global _INT_RE
    if _INT_RE is None:
        _INT_RE = (
            re.compile(r"^-?\d+$"),
            re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"),
        )
    int_re, float_re = _INT_RE
    out: dict = {}
    for seg in rel_in_snapshot.split(os.sep)[:-1]:
        name, eq, raw = seg.partition("=")
        if not eq:
            continue
        name = unquote(name)
        raw = unquote(raw)
        if raw == "__HIVE_DEFAULT_PARTITION__" or name not in col_types:
            continue
        ctype = col_types[name]
        if ctype in _INT_TYPES:
            if int_re.match(raw):
                out[name] = int(raw)
        elif ctype in _FLOAT_TYPES or ctype.startswith("decimal"):
            if float_re.match(raw):
                out[name] = float(raw)
        else:
            out[name] = raw
    return out


def _footer_stats(path: str, cols: list[str]) -> dict:
    """Per-file min/max for ``cols`` from the parquet footer (row-group
    column-chunk statistics folded across groups) — no data read. A
    column with missing stats (or a type JSON cannot carry faithfully)
    is simply omitted: skipping is an optimization, absence of stats
    must only cost performance, never correctness."""
    import datetime

    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict = {}
    for col in cols:
        if col not in idx:
            continue
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    ok = False
                    break
            if isinstance(mn, (datetime.datetime, datetime.date)):
                # normalize tz-aware stats (TIMESTAMP columns read back
                # as UTC-aware) to NAIVE-UTC isoformat so the stored
                # form compares lexicographically with prune bounds
                if (
                    isinstance(mn, datetime.datetime)
                    and mn.tzinfo is not None
                ):
                    utc = datetime.timezone.utc
                    mn = mn.astimezone(utc).replace(tzinfo=None)
                    mx = mx.astimezone(utc).replace(tzinfo=None)
                mn, mx = mn.isoformat(), mx.isoformat()
            if not isinstance(mn, (int, float, str)):
                ok = False
                break
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        if ok and lo is not None:
            out[col] = [lo, hi]
    return out


def _check_staged_physical(root: str, staged: dict, pm: dict) -> None:
    """Guard for the stage->commit window (r10 self-review): the staged
    files were written with physical names computed from the parent AT
    STAGE TIME. If a concurrent DROP/RENAME COLUMN committed in
    between, an evolution column whose staged physical name is now
    RETIRED (or collides with a live physical) would — once committed —
    silently serve the dropped/renamed column's bytes from every
    carried file, breaking the no-resurrection invariant. The staged
    parquet already holds the stale name, so the only safe outcome is
    a loud abort; the caller re-stages against the new parent.

    Two checks (ADVICE r10: the appended-column collision test alone
    misses the shape-restoring race):

    1. every PREFIX field's staged physical name must equal the
       CURRENT parent's physical for that field — a concurrent
       DROP-then-ADD of the same logical name restores the parent's
       schema shape (``new_fields`` empty) while retiring the old
       physical, so the staged files hold the retired name and the
       committed mapping would read the appended rows' column as NULL
       (or, with a stale staged mapping, resurrect retired bytes);
    2. appended evolution columns must not collide with physicals
       used or retired by the CURRENT parent."""
    sdoc_p = json.loads(pm["schema"])
    cm_staged = staged.get("column_mapping") or {}
    cm_parent = column_mapping(pm)
    n_prefix = len(sdoc_p["fields"])
    staged_fields = json.loads(staged["schema"])["fields"]
    bad_prefix = []
    # the PREFIX check only applies when data files were actually
    # staged — a vectors-only commit (consolidate_vectors) stages no
    # physically-named bytes and carries no mapping, which the check
    # would misread as a stale stage and abort every fold on a mapped
    # table (r11 review pass #1, CONFIRMED by reproduction). The
    # appended-column collision check below stays UNCONDITIONAL: it
    # guards the committed manifest's resolution over CARRIED files,
    # which a zero-data-file schema-evolving commit can still poison
    # (r11 review pass #3).
    for f in staged_fields[:n_prefix] if staged["files"] else []:
        sp = cm_staged.get(f["name"], f["name"])
        pp = cm_parent.get(f["name"], f["name"])
        if sp.casefold() != pp.casefold():
            bad_prefix.append((f["name"], sp, pp))
    if bad_prefix:
        _abandon(root, staged)
        raise CommitConflictError(
            f"staged physical names {bad_prefix} (logical, staged, "
            f"current) disagree with the CURRENT parent "
            f"v{pm['version']}'s column mapping — a concurrent "
            f"DROP/ADD or RENAME COLUMN landed between stage and "
            f"commit; re-stage against the new parent"
        )
    new_fields = staged_fields[n_prefix:]
    if not new_fields:
        return
    used = _used_physical(sdoc_p, cm_parent, pm.get("retired_physical"))
    bad = [
        (f["name"], cm_staged.get(f["name"], f["name"]))
        for f in new_fields
        if cm_staged.get(f["name"], f["name"]).casefold() in used
    ]
    if bad:
        _abandon(root, staged)
        raise CommitConflictError(
            f"staged evolution columns {bad} collide with physical "
            f"names used or retired by the CURRENT parent "
            f"v{pm['version']} — a concurrent RENAME/DROP COLUMN "
            f"landed between stage and commit; re-stage against the "
            f"new parent"
        )


def _merge_app_meta(parent: dict | None, explicit: dict | None) -> dict:
    """Carry-forward merge for ``app_meta``: the parent's dict survives
    every commit by default, the committing writer's explicit dict wins
    per key, and keys whose values are BOTH dicts merge one level deep
    — so ``{"stream_txn": {"A": 5}}`` and a later ``{"stream_txn":
    {"B": 3}}`` coexist instead of clobbering each other (the Delta
    SetTransaction accumulation semantics). Deeper nesting is
    last-writer-wins, documented."""
    out = dict(parent or {})
    for k, v in (explicit or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = {**out[k], **v}
        else:
            out[k] = v
    return out


def commit(
    root: str,
    staged: dict,
    *,
    mode: str = "overwrite",
    expected_version: int | None = None,
    max_retries: int = 50,
) -> int:
    """Step 2: publish ``staged`` as the next table version via an
    atomic manifest link. ``mode="overwrite"`` makes the new snapshot
    the entire table; ``mode="append"`` unions the parent manifest's
    files with the staged ones (the parent list is re-resolved on every
    retry, so concurrent appends all land — none overwrites another's
    rows). ``mode="replace"`` is the file-granular copy-on-write commit
    (the Delta/Iceberg MERGE shape): the parent's files are carried BY
    REFERENCE except for ``staged["drop_files"]``, which the staged
    files supersede — a merge touching 0.1% of a 100 TB table commits
    rewritten-files + carried-references instead of rewriting the table.
    Because a replace is a read-modify-write of the parent file list, it
    REQUIRES ``expected_version`` (the version whose manifest the
    drop-set was computed from): blind retry after a concurrent commit
    could silently resurrect rows the winner rewrote, so the loser must
    re-read and re-merge instead.

    With ``expected_version`` set, a single CAS attempt is made
    at ``expected_version + 1``; on loss the stage dir is deleted and
    :class:`CommitConflictError` raised. ``expected_version=0`` means
    "I expect the table to have NO committed versions" — the CAS guard
    holds even against a concurrently wiped/initialized table, never
    silently degrading to a blind write."""
    if mode not in ("overwrite", "append", "replace"):
        raise ValueError(f"mode must be overwrite|append|replace, got {mode!r}")
    if mode == "replace" and expected_version is None:
        raise ValueError(
            "mode='replace' is a read-modify-write of the parent file list "
            "and requires expected_version= (the version the drop-set was "
            "computed from) for optimistic concurrency"
        )
    mdir = _manifest_dir(root)
    os.makedirs(mdir, exist_ok=True)
    attempts = 0
    while True:
        # A vacuum racing a LONG stage may have tombstoned — or, past
        # the grace window, reclaimed — the still-unreferenced stage
        # dirs (data stage + any deletion-vector stage). Clear the
        # tombstones (restarting the grace clock) and refuse to link a
        # manifest whose files are already gone: a loud failure here
        # beats committing a table that references deleted data.
        # snapshot_dir may be None for a VECTORS-ONLY commit (no data
        # rows staged — consolidate_vectors): the manifest then carries
        # no phantom data stage dir (ADVICE r10 — a same-named
        # never-on-disk dir rode in snapshot_dirs forever)
        if staged["snapshot_dir"] is None and staged["files"]:
            _abandon(root, staged)  # clean the stray extra_dirs too
            raise ValueError("staged files present but snapshot_dir is None")
        own_dirs = [
            d
            for d in [staged["snapshot_dir"], *staged.get("extra_dirs", [])]
            if d is not None
        ]
        for d in own_dirs:
            try:
                os.unlink(_tombstone_path(root, d))
            except FileNotFoundError:
                pass
        needed = ([staged["snapshot_dir"]] if staged["files"] else []) + list(
            staged.get("extra_dirs", [])
        )
        for d in needed:
            if not os.path.isdir(os.path.join(root, d)):
                raise RuntimeError(
                    f"stage dir {d} was reclaimed by a concurrent vacuum "
                    f"before the commit (the stage outlived the vacuum "
                    f"grace window) — re-stage, and raise grace_seconds "
                    f"above the longest expected stage duration"
                )
        parent = latest_version(root)
        if expected_version is not None and (parent or 0) != expected_version:
            _abandon(root, staged)
            raise CommitConflictError(
                f"expected version {expected_version} but table is at {parent or 0}"
            )
        version = (parent if parent is not None else 0) + 1
        files = list(staged["files"])
        dirs = list(own_dirs)
        stats = dict(staged.get("stats", {}))
        deletes: dict[str, list[str]] = {}
        lineage = False
        schema_json = staged["schema"]
        parent_meta: dict = {}
        if mode == "overwrite" and parent is not None:
            # app_meta carry-forward needs the parent manifest even
            # though an overwrite carries no files from it
            try:
                parent_meta = (
                    load_manifest(root, parent).get("app_meta") or {}
                )
            except FileNotFoundError:
                # a concurrent vacuum dropped the parent between our
                # latest_version and the read; re-resolve and retry
                attempts += 1
                if attempts >= max_retries:
                    _abandon(root, staged)
                    raise CommitConflictError(
                        f"parent manifests kept vanishing under concurrent "
                        f"vacuums for {max_retries} attempts at {root}"
                    )
                continue
        if mode == "append" and parent is not None:
            try:
                pm = load_manifest(root, parent)
            except FileNotFoundError:
                # a concurrent vacuum dropped the parent between our
                # latest_version and the read; re-resolve and retry
                attempts += 1
                if attempts >= max_retries:
                    _abandon(root, staged)
                    raise CommitConflictError(
                        f"parent manifests kept vanishing under concurrent "
                        f"vacuums for {max_retries} attempts at {root}"
                    )
                continue
            parent_meta = pm.get("app_meta") or {}
            schema_json = _evolved_schema(root, staged, pm, mode)
            _check_staged_physical(root, staged, pm)
            files = pm["files"] + files
            dirs = pm["snapshot_dirs"] + dirs
            stats = {**pm.get("stats", {}), **stats}
            deletes = {k: list(v) for k, v in pm.get("deletes", {}).items()}
            lineage = pm.get("cow_lineage", False)
        elif mode == "replace":
            if parent is None:
                _abandon(root, staged)
                raise ValueError(
                    "mode='replace' needs a committed parent version to "
                    "carry files from; use overwrite for the first commit"
                )
            try:
                pm = load_manifest(root, parent)
            except FileNotFoundError:
                _abandon(root, staged)
                raise CommitConflictError(
                    f"parent version {parent} was vacuumed during the "
                    f"commit; re-read the table and re-merge"
                )
            lineage = True
            parent_meta = pm.get("app_meta") or {}
            schema_json = _evolved_schema(root, staged, pm, mode)
            _check_staged_physical(root, staged, pm)
            drop = set(staged.get("drop_files", []))
            unknown = drop - set(pm["files"])
            if unknown:
                _abandon(root, staged)
                raise ValueError(
                    f"drop_files not in parent v{parent} manifest: "
                    f"{sorted(unknown)[:5]}"
                )
            carried = [f for f in pm["files"] if f not in drop]
            files = carried + files
            dirs = pm["snapshot_dirs"] + dirs
            stats = {
                **{f: s for f, s in pm.get("stats", {}).items() if f not in drop},
                **stats,
            }
            # a rewritten file's deletion vector dies with it: the staged
            # replacement holds only live rows
            deletes = {
                k: list(v)
                for k, v in pm.get("deletes", {}).items()
                if k not in drop
            }
        staged_dv = {
            k: list(v) for k, v in staged.get("delete_vectors", {}).items()
        }
        if staged_dv:
            bad_dv = set(staged_dv) - set(files)
            if bad_dv:
                _abandon(root, staged)
                raise ValueError(
                    f"delete_vectors reference files not in the committed "
                    f"file list: {sorted(bad_dv)[:5]}"
                )
            # the staged vector REPLACES the parent's for that file — a
            # merge-on-read writer accumulates prior positions into the
            # new vector, so the manifest always maps a file to ONE
            # complete position set (the superseded vector becomes
            # unreferenced and the file-granular sweep reclaims it)
            deletes.update(staged_dv)
            lineage = True
        if mode == "replace":
            # keep only dirs that still contribute a data file OR a live
            # deletion vector, so vacuum can reclaim fully-superseded
            # stage dirs
            sep = os.sep
            live = set(files)
            live.update(r for rels in deletes.values() for r in rels)
            dirs = [
                d for d in dirs if any(f.startswith(d + sep) for f in live)
            ]
        manifest = {
            "version": version,
            "parent": parent,
            "mode": mode,
            "snapshot_dirs": dirs,
            "files": files,
            "schema": schema_json,
            "partition_by": staged["partition_by"],
            "writer": uuid.uuid4().hex,
        }
        if mode in ("append", "replace") and parent is not None:
            # column mapping + retired physical names travel with the
            # carried files they describe; a full overwrite resets both
            # (write_snapshot stages an explicit mapping when it
            # translated columns; manual stagers inherit the parent's)
            mapping = staged.get("column_mapping")
            pmap = pm.get("column_mapping") or {}
            if mapping is None:
                mapping = pmap
            else:
                # MERGE over the current parent's mapping, never replace
                # (ADVICE r10): the staged mapping was computed from the
                # parent AT STAGE TIME — its prefix entries were just
                # verified physical-identical by _check_staged_physical,
                # so the CURRENT parent's (fresher) entries win for
                # prefix fields and the staged dict contributes only the
                # appended evolution columns; a verbatim override could
                # resurrect an entry a concurrent RENAME/DROP retired.
                pf_names = {f["name"] for f in json.loads(pm["schema"])["fields"]}
                mapping = {
                    **pmap,
                    **{k: v for k, v in mapping.items() if k not in pf_names},
                }
            if mapping:
                manifest["column_mapping"] = mapping
            if pm.get("retired_physical"):
                manifest["retired_physical"] = pm["retired_physical"]
        elif staged.get("column_mapping"):
            manifest["column_mapping"] = staged["column_mapping"]
        # wall-clock commit instant: what resolves TIMESTAMP AS OF
        # reads (best-effort under writer clock skew, the same trade
        # Delta/Iceberg make — version pins stay the exact form)
        manifest["committed_at"] = time.time()
        if deletes:
            manifest["deletes"] = deletes
        if mode == "replace":
            manifest["replaced"] = sorted(staged.get("drop_files", []))
        if lineage:
            # propagated through append/replace chains, reset by a full
            # overwrite: tells vacuum whether individually-superseded
            # files can exist inside still-referenced dirs, so the
            # file-granular sweep (an O(files) walk) only runs on
            # tables that have actually seen a replace commit
            manifest["cow_lineage"] = True
        merged_meta = _merge_app_meta(parent_meta, staged.get("app_meta"))
        if merged_meta:
            # application-level metadata committed ATOMICALLY with the
            # data (the Delta txnAppId/txnVersion idea): e.g. a
            # materialized view stores its source watermark here, so a
            # crash can never separate "deltas applied" from "watermark
            # advanced" — the exactly-once hook operators/matview.py
            # builds on. The PARENT's app_meta is carried forward by
            # default and the explicit dict merges OVER it (one level
            # deep for dict values, so two streams' markers under one
            # key coexist): Delta's SetTransaction survives unrelated
            # commits via log accumulation, and before this carry an
            # ordinary foreign write (any verb with app_meta=None)
            # silently erased every stream marker and matview watermark
            # — the ADVICE r9 double-apply window.
            manifest["app_meta"] = merged_meta
        if stats:
            manifest["stats"] = stats
        tmp = os.path.join(mdir, f".tmp-{manifest['writer']}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _manifest_path(root, version))
            os.unlink(tmp)
            _fsync_dir(mdir)
            # a vacuum racing our stage may have tombstoned the dirs while
            # they were still unreferenced; committing must reset that
            # clock or a later dereference would reclaim with no grace
            for d in own_dirs:
                try:
                    os.unlink(_tombstone_path(root, d))
                except FileNotFoundError:
                    pass
            return version
        except FileExistsError:
            os.unlink(tmp)
            if expected_version is not None:
                _abandon(root, staged)
                raise CommitConflictError(
                    f"version {version} was committed by a concurrent writer"
                )
            attempts += 1
            if attempts >= max_retries:
                _abandon(root, staged)
                raise CommitConflictError(
                    f"lost {max_retries} consecutive commit races at {root}"
                )


def restore_commit(
    root: str,
    version: int,
    *,
    expected_version: int | None = None,
    max_retries: int = 50,
) -> int:
    """Commit a NEW version whose manifest ADOPTS a retained historical
    version's files, deletion vectors, stats and schema BY REFERENCE —
    the O(manifest) restore (a re-publishing restore of a 100 TB table
    would rewrite 100 TB; the bytes are still on disk, protected by the
    retained manifest, so only a manifest commit is needed). History is
    preserved Delta-style: the restore is itself a commit a second
    restore can undo.

    Safety against a racing vacuum mirrors ``commit``: every adopted
    file is required to EXIST immediately before the link (a retained
    manifest keeps its files live, and phase-1 tombstones give
    ``grace_seconds`` of slack), and dir tombstones / file drop markers
    on adopted paths are cleared after the link wins, restarting any
    grace clock a concurrent sweep started."""
    mdir = _manifest_dir(root)
    attempts = 0
    while True:
        m_old = load_manifest(root, version)  # FileNotFoundError if vacuumed
        parent = latest_version(root)
        if parent is None:
            raise FileNotFoundError(f"no committed snapshot under {root}")
        if expected_version is not None and parent != expected_version:
            raise CommitConflictError(
                f"expected version {expected_version} but table is at {parent}"
            )
        live = list(m_old["files"]) + [
            r for rels in m_old.get("deletes", {}).values() for r in rels
        ]
        missing = [
            f for f in live if not os.path.exists(os.path.join(root, f))
        ]
        if missing:
            raise RuntimeError(
                f"cannot restore {root} to v{version}: adopted files are "
                f"gone (vacuumed mid-restore?): {missing[:5]}"
            )
        new_v = parent + 1
        manifest = {
            **{
                k: m_old[k]
                for k in (
                    "snapshot_dirs",
                    "files",
                    "schema",
                    "partition_by",
                )
            },
            "version": new_v,
            "parent": parent,
            "mode": "restore",
            "writer": uuid.uuid4().hex,
            "committed_at": time.time(),
            # adopted dirs can hold files newer manifests superseded, so
            # the file-granular sweep must keep running on this table
            "cow_lineage": True,
            # the restored CONTENT corresponds to m_old's app-level
            # metadata (e.g. a matview's source watermark), so adopt it
            # — dropping it would silently force a full view rebuild
            "app_meta": {
                **(m_old.get("app_meta") or {}),
                "restored_from_version": version,
            },
        }
        for k in ("deletes", "stats", "column_mapping", "retired_physical"):
            # mapping + retirement travel WITH the schema they describe:
            # a restore across a rename/drop must read the adopted files
            # under the adopted version's names
            if m_old.get(k):
                manifest[k] = m_old[k]
        tmp = os.path.join(mdir, f".tmp-{manifest['writer']}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _manifest_path(root, new_v))
            os.unlink(tmp)
            _fsync_dir(mdir)
        except FileExistsError:
            os.unlink(tmp)
            if expected_version is not None:
                raise CommitConflictError(
                    f"version {new_v} was committed by a concurrent writer"
                )
            attempts += 1
            if attempts >= max_retries:
                raise CommitConflictError(
                    f"lost {max_retries} consecutive commit races at {root}"
                )
            continue
        for d in manifest["snapshot_dirs"]:
            if os.path.isabs(d):
                # external dir adopted from a shallow clone's manifest:
                # its tombstones belong to the SOURCE table's vacuum —
                # clearing them from here would restart a foreign grace
                # clock (the clone must never mutate source storage)
                continue
            try:
                os.unlink(_tombstone_path(root, d))
            except FileNotFoundError:
                pass
        for f_rel in live:
            if os.path.isabs(f_rel):
                continue
            try:
                os.unlink(os.path.join(root, f_rel + ".dropped-at"))
            except FileNotFoundError:
                pass
        return new_v


def evolve_schema_commit(
    root: str,
    new_fields: list[tuple[str, str]],
    *,
    expected_version: int | None = None,
    max_retries: int = 50,
) -> int:
    """``ALTER TABLE ... ADD COLUMNS`` as a PURE METADATA commit: a new
    manifest adopting the parent's files/vectors/stats verbatim with
    the union schema (new columns appended, forced nullable). Not a
    byte of data is written — pinned reads NULL-backfill every carried
    file (the same evolution contract append/replace commits use).
    ``new_fields`` is ``[(name, catalog_type_string), ...]``."""
    from pyspark.sql.types import StructType

    mdir = _manifest_dir(root)
    attempts = 0
    while True:
        parent = latest_version(root)
        if parent is None:
            raise FileNotFoundError(f"no committed snapshot under {root}")
        if expected_version is not None and parent != expected_version:
            raise CommitConflictError(
                f"expected version {expected_version} but table is at {parent}"
            )
        pm = load_manifest(root, parent)
        sdoc = json.loads(pm["schema"])
        have = {f["name"] for f in sdoc["fields"]}
        dup = sorted({n for n, _ in new_fields} & have)
        if dup:
            raise ValueError(f"columns already exist: {dup}")
        widened = StructType.fromJson(sdoc)
        for name, typ in new_fields:
            widened = widened.add(
                name, _parse_col_type(typ), nullable=True
            )
        # column mapping: a new logical name whose PHYSICAL name is
        # already used (a live column's physical, or a RETIRED one from
        # a dropped/renamed-away column that still exists inside old
        # files) gets a fresh physical name — reading the new column
        # from pre-existing files must NULL-backfill, never resurrect
        # the old bytes that happen to share the name
        cm = column_mapping(pm)
        used = _used_physical(sdoc, cm, pm.get("retired_physical"))
        for name, _typ in new_fields:
            if name.casefold() in used:
                cm[name] = _fresh_physical(name, parent + 1, used)
                used.add(cm[name].casefold())
        manifest = {
            **{
                k: pm[k]
                for k in (
                    "snapshot_dirs",
                    "files",
                    "partition_by",
                )
            },
            "version": parent + 1,
            "parent": parent,
            "mode": "evolve",
            "schema": json.dumps(widened.jsonValue()),
            "writer": uuid.uuid4().hex,
            "committed_at": time.time(),
        }
        for k in ("deletes", "stats", "cow_lineage", "app_meta",
                  "retired_physical"):
            # app_meta adopted verbatim: content is unchanged, so the
            # parent's atomically-committed metadata (e.g. a matview
            # watermark) still describes this version exactly
            if pm.get(k):
                manifest[k] = pm[k]
        if cm:
            manifest["column_mapping"] = cm
        tmp = os.path.join(mdir, f".tmp-{manifest['writer']}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _manifest_path(root, manifest["version"]))
            os.unlink(tmp)
            _fsync_dir(mdir)
            return manifest["version"]
        except FileExistsError:
            os.unlink(tmp)
            if expected_version is not None:
                raise CommitConflictError(
                    f"version {manifest['version']} was committed by a "
                    f"concurrent writer"
                )
            attempts += 1
            if attempts >= max_retries:
                raise CommitConflictError(
                    f"lost {max_retries} consecutive commit races at {root}"
                )


def _resolve_field(sdoc: dict, name: str) -> str:
    """Resolve ``name`` against the schema CASE-INSENSITIVELY (like
    Spark's analyzer — a case-sensitive guard would be bypassable) to
    the field's exact stored name; loud on missing/ambiguous."""
    hits = [
        f["name"] for f in sdoc["fields"]
        if f["name"].casefold() == name.casefold()
    ]
    if not hits:
        raise ValueError(
            f"no such column {name!r}; table has "
            f"{[f['name'] for f in sdoc['fields']]}"
        )
    if len(hits) > 1:
        raise ValueError(f"column name {name!r} is ambiguous: {hits}")
    return hits[0]


def _metadata_commit(root, compute, *, expected_version, max_retries):
    """Shared CAS loop for the pure-metadata column commits: per
    attempt, re-read the latest manifest, re-run ``compute(pm) ->
    manifest_updates`` against it (a lost race must NOT re-apply
    updates derived from a stale parent — a concurrent append's new
    files and stats would be clobbered), adopt the parent's
    files/vectors/stats/meta verbatim, apply the updates, link."""
    mdir = _manifest_dir(root)
    attempts = 0
    while True:
        parent = latest_version(root)
        if parent is None:
            raise FileNotFoundError(f"no committed snapshot under {root}")
        if expected_version is not None and parent != expected_version:
            raise CommitConflictError(
                f"expected version {expected_version} but table is at "
                f"{parent}"
            )
        pm = load_manifest(root, parent)
        manifest_updates = compute(pm)
        manifest = {
            **{
                k: pm[k]
                for k in ("snapshot_dirs", "files", "partition_by")
            },
            "version": pm["version"] + 1,
            "parent": pm["version"],
            "schema": pm["schema"],
            "writer": uuid.uuid4().hex,
            "committed_at": time.time(),
        }
        for k in ("deletes", "stats", "cow_lineage", "app_meta",
                  "column_mapping", "retired_physical"):
            if pm.get(k):
                manifest[k] = pm[k]
        for k, v in manifest_updates.items():
            if not v and k in (
                "stats", "column_mapping", "retired_physical", "deletes"
            ):
                # empty OPTIONAL keys leave the manifest entirely;
                # required keys (schema, partition_by, mode) always set
                manifest.pop(k, None)
            else:
                manifest[k] = v
        tmp = os.path.join(mdir, f".tmp-{manifest['writer']}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _manifest_path(root, manifest["version"]))
            os.unlink(tmp)
            _fsync_dir(mdir)
            return manifest["version"]
        except FileExistsError:
            os.unlink(tmp)
            if expected_version is not None:
                raise CommitConflictError(
                    f"version {manifest['version']} was committed by a "
                    f"concurrent writer"
                )
            attempts += 1
            if attempts >= max_retries:
                raise CommitConflictError(
                    f"lost {max_retries} consecutive commit races at "
                    f"{root}"
                )


def rename_column_commit(
    root: str,
    old: str,
    new: str,
    *,
    expected_version: int | None = None,
    max_retries: int = 50,
) -> int:
    """``ALTER TABLE ... RENAME COLUMN old TO new`` as a PURE METADATA
    commit (Delta/Iceberg name-mode column mapping, VERDICT r9
    next-round #2): the schema field, partition_by entry and stats keys
    take the new LOGICAL name while the column mapping keeps serving
    the unchanged PHYSICAL name from every carried file — not a byte of
    data is written, and a pinned read at a pre-rename version still
    sees the OLD name (the pin resolves through that manifest's own
    schema + mapping). Deletion vectors are keyed by PHYSICAL names and
    keep working untouched. Name matching is case-insensitive like the
    analyzer; renaming onto an existing column is refused."""
    if not new or "." in new:
        raise ValueError(f"invalid column name {new!r}")

    def compute(pm: dict) -> dict:
        sdoc = json.loads(pm["schema"])
        old_exact = _resolve_field(sdoc, old)
        if new.casefold() != old_exact.casefold() and any(
            f["name"].casefold() == new.casefold() for f in sdoc["fields"]
        ):
            raise ValueError(f"column {new!r} already exists")
        cm = column_mapping(pm)
        phys = cm.pop(old_exact, old_exact)
        if new != phys:
            cm[new] = phys
        fields = [
            {**f, "name": new} if f["name"] == old_exact else f
            for f in sdoc["fields"]
        ]
        stats = {
            rel: {
                (new if c == old_exact else c): v for c, v in per.items()
            }
            for rel, per in (pm.get("stats") or {}).items()
        }
        return {
            "mode": "rename_column",
            "schema": json.dumps({**sdoc, "fields": fields}),
            "partition_by": [
                new if c == old_exact else c for c in pm["partition_by"]
            ],
            "stats": stats,
            "column_mapping": cm,
        }

    return _metadata_commit(
        root, compute,
        expected_version=expected_version, max_retries=max_retries,
    )


def drop_column_commit(
    root: str,
    name,
    *,
    expected_version: int | None = None,
    max_retries: int = 50,
) -> int:
    """``ALTER TABLE ... DROP COLUMN(S)`` as ONE PURE METADATA commit:
    the fields leave the schema and their PHYSICAL names are RETIRED
    (``retired_physical``) — carried files keep the bytes (pinned
    pre-drop reads still serve them; rewrites retire them physically
    over time), but a later ADD COLUMN of the same logical name maps to
    a FRESH physical name, so the dropped values can never resurrect.
    ``name`` is one column or a list; a multi-column drop is ATOMIC —
    every name is validated against the same manifest and either all
    drop in one commit or none do (a per-column loop would leave the
    table half-altered when the second name is refused, r10
    self-review). Refused for partition columns (the hive path layout
    cannot be remapped), for dropping ALL remaining columns, and while
    any LIVE deletion vector is keyed by a dropped column (row-format
    vectors embed key VALUES per column — fold them into clean files
    first: ``sinks.compact_deletes``); positional vectors are
    unaffected."""
    names = [name] if isinstance(name, str) else list(name)
    if not names:
        raise ValueError("drop_column_commit needs at least one column")

    def compute(pm: dict) -> dict:
        sdoc = json.loads(pm["schema"])
        exact = []
        for n in names:
            e = _resolve_field(sdoc, n)
            if e in exact:
                raise ValueError(f"duplicate column in drop list: {e!r}")
            exact.append(e)
        if len(exact) >= len(sdoc["fields"]):
            raise ValueError("cannot drop every column of the table")
        for e in exact:
            if e in pm["partition_by"]:
                raise ValueError(
                    f"cannot drop partition column {e!r}; rewrite the "
                    f"table with a different partitioning first"
                )
        cm = column_mapping(pm)
        phys = {e: cm.pop(e, e) for e in exact}
        rels = {
            r for rels in (pm.get("deletes") or {}).values() for r in rels
        }
        vschemas = vector_schemas(root, rels)
        for e, p in phys.items():
            keyed = [r for r, cols in vschemas.items() if p in cols]
            if keyed:
                raise ValueError(
                    f"cannot drop {e!r}: live deletion vectors are "
                    f"keyed by it ({keyed[:3]}); run "
                    f"sinks.compact_deletes first"
                )
        gone = set(exact)
        stats = {
            rel: {c: v for c, v in per.items() if c not in gone}
            for rel, per in (pm.get("stats") or {}).items()
        }
        return {
            "mode": "drop_column",
            "schema": json.dumps(
                {
                    **sdoc,
                    "fields": [
                        f for f in sdoc["fields"] if f["name"] not in gone
                    ],
                }
            ),
            "stats": {rel: per for rel, per in stats.items() if per},
            "column_mapping": cm,
            "retired_physical": sorted(
                {*(pm.get("retired_physical") or []), *phys.values()}
            ),
        }

    return _metadata_commit(
        root, compute,
        expected_version=expected_version, max_retries=max_retries,
    )


# schema-JSON primitive names differ from the DDL/catalogString names
# users (and Spark's own parser, via the SQL face's catalogString())
# write — 'x int' must not crash the ALTER with an opaque
# CANNOT_PARSE_DATATYPE
_DDL_TYPE_ALIASES = {
    "int": "integer",
    "bigint": "long",
    "smallint": "short",
    "tinyint": "byte",
}


def _parse_col_type(typ):
    """A column type for ``evolve_schema_commit``: a DataType instance
    passes through; a string accepts BOTH the schema-JSON primitive
    names ('integer', 'string', 'decimal(10,2)') and the DDL /
    ``catalogString`` forms ('int', 'bigint', 'array<int>', ...) — the
    latter via the alias map then Spark's DDL parser (which needs an
    active session, always true when a statement face calls this)."""
    if not isinstance(typ, str):
        return typ
    canon = _DDL_TYPE_ALIASES.get(typ.strip().lower(), typ)
    from pyspark.sql.types import _parse_datatype_json_value

    try:
        return _parse_datatype_json_value(canon)
    except Exception:
        from pyspark.sql.types import DataType

        try:
            return DataType.fromDDL(typ)
        except Exception:
            raise ValueError(
                f"cannot parse column type {typ!r}; use a schema-JSON "
                f"name ('integer', 'string', ...) or a DDL type "
                f"('int', 'decimal(10,2)', 'array<int>', ...)"
            ) from None


def _evolved_schema(root: str, staged: dict, pm: dict, mode: str) -> str:
    """Schema contract for commits that carry parent files by reference
    (append/replace): the parent's fields must be a PREFIX of the staged
    fields with matching names and types (nullability may relax), and
    partitioning must match. The staged schema may APPEND new columns —
    SCHEMA EVOLUTION without rewriting a byte: the manifest stores the
    superset schema (new fields forced nullable), and the pinned-schema
    read NULL-backfills carried files that predate the column. Anything
    else — dropped, reordered, renamed, or retyped columns — still
    requires a full overwrite, exactly as before. Returns the manifest
    schema JSON."""
    shape = lambda fs: [(f["name"], f["type"]) for f in fs]  # noqa: E731
    sdoc = json.loads(staged["schema"])
    pf = json.loads(pm["schema"])["fields"]
    sf = sdoc["fields"]
    if staged["partition_by"] != pm["partition_by"] or len(sf) < len(
        pf
    ) or shape(sf[: len(pf)]) != shape(pf):
        _abandon(root, staged)
        raise ValueError(
            f"mode={mode!r} carries parent files by reference, so the "
            "staged schema must extend the parent's as a prefix (same "
            "names/types/order; NEW nullable columns may be appended — "
            "schema evolution) and partition_by must match; dropping, "
            "reordering or retyping columns needs a full overwrite"
        )
    if len(sf) > len(pf):
        for f in sf[len(pf):]:
            # carried files lack the column, so reads WILL produce NULLs
            f["nullable"] = True
        return json.dumps(sdoc)
    return staged["schema"]


def _abandon(root: str, staged: dict) -> None:
    for d in [staged["snapshot_dir"], *staged.get("extra_dirs", [])]:
        if d is not None:  # vectors-only commits stage no data dir
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def _fsync_dir(path: str) -> None:
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:  # platform without dir fds
        return
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def write_snapshot(
    df: DataFrame,
    root: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    expected_version: int | None = None,
    constraints: dict[str, str] | None = None,
    stats_cols: list[str] | None = None,
    drop_files: list[str] | None = None,
    delete_vectors: DataFrame | None = None,
    app_meta: dict | None = None,
) -> int:
    """Stage + commit in one call; returns the committed version.
    ``stats_cols`` records per-file min/max in the manifest for
    data-skipping reads (``read_snapshot(prune=...)``).
    ``constraints`` are CHECK predicates (name -> SQL boolean expr)
    validated against the STAGED files before the manifest commit —
    the input plan computes exactly once (no second execution for the
    check, it reads the just-written parquet), and a violating publish
    abandons the stage dir leaving the table byte-identical: the
    transactional behavior Delta CHECK constraints give (an empty
    result set trivially satisfies every CHECK).

    ``mode="replace"`` + ``drop_files`` is the file-granular
    copy-on-write commit: ``df`` holds ONLY the rewritten rows, the
    parent manifest's files minus ``drop_files`` are carried by
    reference, and ``expected_version`` (required) CASes against the
    version the drop-set was computed from.

    ``delete_vectors`` is the MERGE-ON-READ tier (key-scattered small
    updates, where CoW would degrade to a full rewrite): a tombstone
    DataFrame (``__file`` = manifest-relative data-file path, plus key
    columns) staged alongside ``df``; reads of the committed version
    anti-join each vectored file's rows against its tombstones. The
    staged vector REPLACES any prior vector for the same file, so a
    merge-on-read writer must fold prior tombstones for the files it
    re-vectors into the new batch (``scd2_merge_mor`` does).

    Column mapping (RENAME/DROP COLUMN support): callers always work in
    LOGICAL names. When the parent manifest carries a non-identity
    ``column_mapping`` and the commit carries parent files by reference
    (append/replace), the staged data AND delete-vector columns are
    translated to their PHYSICAL names before writing (files are
    physical by protocol), while the staged manifest schema, stats keys
    and partition_by stay logical; brand-new evolution columns whose
    logical name collides with a used/RETIRED physical name get a fresh
    physical name, so a dropped column can never resurrect. A full
    ``overwrite`` resets the mapping (no carried files to serve)."""
    logical_schema_json = df.schema.json()
    logical_partition = list(partition_by or [])
    cm: dict = {}
    if mode in ("append", "replace"):
        pv = latest_version(root)
        if pv is not None:
            pmeta = load_manifest(root, pv)
            cm = column_mapping(pmeta)
            retired = pmeta.get("retired_physical") or []
            if cm or retired:
                sdoc = json.loads(pmeta["schema"])
                parent_names = {
                    f["name"].casefold() for f in sdoc["fields"]
                }
                used = _used_physical(sdoc, cm, retired)
                for f in df.schema.fields:
                    if (
                        f.name.casefold() not in parent_names
                        and f.name.casefold() in used
                    ):
                        cm[f.name] = _fresh_physical(f.name, pv + 1, used)
                        used.add(cm[f.name].casefold())
    if cm:
        df = df.select(
            *[df[f.name].alias(cm.get(f.name, f.name))
              for f in df.schema.fields]
        )
        partition_by = [cm.get(c, c) for c in logical_partition] or None
        stats_cols = (
            [cm.get(c, c) for c in stats_cols] if stats_cols else None
        )
        if delete_vectors is not None:
            delete_vectors = delete_vectors.select(
                *[
                    delete_vectors[c].alias(cm.get(c, c))
                    for c in delete_vectors.columns
                ]
            )
    staged = stage_files(
        df, root, partition_by=partition_by, stats_cols=stats_cols
    )
    if cm:
        rev = {p: l for l, p in cm.items()}
        staged["schema"] = logical_schema_json
        staged["partition_by"] = logical_partition
        if staged.get("stats"):
            staged["stats"] = {
                rel: {rev.get(c, c): v for c, v in per.items()}
                for rel, per in staged["stats"].items()
            }
        staged["column_mapping"] = {
            l: p for l, p in cm.items() if l != p
        }
    if delete_vectors is not None:
        dv_dir, dv_files, covered = stage_delete_vectors(delete_vectors, root)
        if covered:
            staged["extra_dirs"] = [dv_dir]
            staged["delete_vectors"] = {f: list(dv_files) for f in covered}
    if drop_files is not None:
        staged["drop_files"] = list(drop_files)
    if app_meta is not None:
        staged["app_meta"] = dict(app_meta)
    if constraints and staged["files"]:
        from pyspark.sql.types import StructType

        back = (
            df.sparkSession.read.schema(df.schema)
            .option("basePath", os.path.join(root, staged["snapshot_dir"]))
            .parquet(*[os.path.join(root, f) for f in staged["files"]])
        )
        if cm:
            rev = {p: l for l, p in cm.items()}
            back = back.select(
                *[back[c].alias(rev.get(c, c)) for c in back.columns]
            )
        try:
            check_constraints(back, constraints)
        except ConstraintViolationError:
            _abandon(root, staged)
            raise
    return commit(
        root, staged, mode=mode, expected_version=expected_version
    )


def _resolve_source_pin(
    src_root: str, dst_root: str, version, as_of_timestamp, verb: str
) -> int:
    """Shared head of the two CREATE TABLE ... FROM-a-source verbs
    (LIKE and SHALLOW CLONE): resolve the optional VERSION/TIMESTAMP
    pin against the source's commit log (default: latest) and require
    a fresh destination root."""
    if as_of_timestamp is not None:
        if version is not None:
            raise ValueError(
                "pass either version= or as_of_timestamp=, not both"
            )
        version = version_at_timestamp(src_root, as_of_timestamp)
    if version is None:
        version = latest_version(src_root)
        if version is None:
            raise FileNotFoundError(
                f"no committed snapshot under {src_root}"
            )
    if latest_version(dst_root) is not None:
        raise ValueError(
            f"{dst_root} is already a snapshot table; {verb} needs a "
            f"fresh root"
        )
    return version


def create_table_like(
    src_root: str,
    dst_root: str,
    *,
    version: int | None = None,
    as_of_timestamp=None,
) -> int:
    """``CREATE TABLE d LIKE s`` — the reference's LITERAL step 1
    (``CREATE TABLE dim_user_new LIKE dim_user_production``,
    /root/reference/SCD_script.txt:4): commit an EMPTY table at
    ``dst_root`` with the source version's LOGICAL schema and
    partitioning. No data files, fresh history, and — deliberately —
    no column mapping or retired physicals: the new table has no
    carried files to serve, so its physical namespace starts clean
    (``SHALLOW CLONE`` is the variant that brings the data).
    ``version=`` / ``as_of_timestamp=`` pin which historical schema to
    copy (default: latest)."""
    version = _resolve_source_pin(
        src_root, dst_root, version, as_of_timestamp, "CREATE TABLE LIKE"
    )
    m = load_manifest(src_root, version)
    staged = {
        "snapshot_dir": None,
        "files": [],
        "schema": m["schema"],
        "partition_by": list(m["partition_by"]),
    }
    return commit(dst_root, staged, mode="overwrite", expected_version=0)


def _clone_vectors_spark(
    spark,
    src_root: str,
    dst_root: str,
    deletes: dict,
    dv_rel: str,
    _abs,
    sizes: dict | None = None,
) -> dict:
    """Distributed deletion-vector materialization for SHALLOW CLONE
    (VERDICT r10 #4's second option): when a source's vector debt is
    too large to funnel through the driver, rewrite it THROUGH SPARK.
    Shape (hardened by the r11 focused review pass):

    - ONE scan + ONE write job per vector SCHEMA group, however many
      distinct (data file -> vector list) units the group holds: the
      per-unit "tombstones for f are f's OWN list" restriction (the
      replace-semantics invariant the read overlay enforces) is applied
      by a broadcast join against a (vector-file basename, served data
      file) pair set built from the manifest — never a per-unit scan
      branch with giant ``isin`` literals, which would grow the plan
      with the debt this path exists to absorb;
    - output is hash-partitioned on ``__file``, so every served data
      file's tombstones land in EXACTLY ONE output file and the
      clone's manifest maps each file to a one-element list — never
      the whole group's output set (an O(files x outputs) manifest);
    - a read-back coverage check fails LOUDLY if any served file lost
      its tombstones (the ``consolidate_vectors`` invariant — silent
      loss would resurrect the source's deleted rows in the clone).

    ``__file`` is rewritten to the absolute source path by a Catalyst
    expression (clone-of-clone rows are already absolute and pass
    through). Returns the clone's ``deletes`` map."""
    import math

    from pyspark.sql import functions as F

    src_abs = os.path.realpath(src_root)
    groups = group_vector_lists(src_root, deletes)
    if sizes is None:  # caller normally passes its own stat pass
        sizes = {
            r: os.path.getsize(os.path.join(src_root, r))
            for rels in deletes.values()
            for r in rels
        }
    try:
        bcast_thresh = int(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            .removesuffix("b")
            .removesuffix("B")
        )
    except (ValueError, TypeError):
        bcast_thresh = 10 << 20  # unit-suffixed custom value: default
    deletes_out: dict[str, list[str]] = {}
    for gi, (_schema, lists) in enumerate(sorted(groups.items())):
        rel_set = sorted({r for rels, _served in lists for r in rels})
        base_of = {r: os.path.basename(r) for r in rel_set}
        if len(set(base_of.values())) != len(rel_set):
            raise RuntimeError(
                "duplicate vector-file basenames in one schema group — "
                "cannot attribute scan rows to manifest lists"
            )  # pragma: no cover - part-file names embed a job uuid
        bytes_g = sum(sizes[r] for r in rel_set)
        n_out = max(1, math.ceil(bytes_g / (64 << 20)))
        pair_rows = [
            (base_of[r], f)
            for rels, served in lists
            for r in rels
            for f in served
        ]
        pairs = spark.createDataFrame(
            pair_rows, "__vec_base string, __served string"
        )
        # broadcast is the normal case (the pair set is O(manifest
        # entries), already held driver-side), but this path exists
        # precisely for over-debt sources — past the session's
        # broadcast threshold leave the strategy to the planner
        # (shuffle join: slower, safe), mirroring the read overlay's
        # guard. Estimate from the rows we just built.
        pair_bytes = sum(
            len(b) + len(f) + 32 for b, f in pair_rows
        )
        if bcast_thresh >= 0 and pair_bytes <= bcast_thresh:
            pairs = F.broadcast(pairs)  # thresh -1 = broadcasts off
        vec = (
            spark.read.parquet(
                *[os.path.join(src_root, r) for r in rel_set]
            )
            .withColumn(
                "__vb",
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ),
            )
            .join(
                pairs,
                on=[
                    F.col("__vb") == pairs["__vec_base"],
                    F.col(DELETE_FILE_COL) == pairs["__served"],
                ],
                how="inner",
            )
            .drop("__vb", "__vec_base", "__served")
        )
        # clone-of-clone rows are already absolute; everything else
        # prefixes the source root (mirrors the driver-side _abs)
        vec = vec.withColumn(
            DELETE_FILE_COL,
            F.when(
                F.col(DELETE_FILE_COL).startswith(os.sep),
                F.col(DELETE_FILE_COL),
            ).otherwise(
                F.concat(
                    F.lit(src_abs + os.sep), F.col(DELETE_FILE_COL)
                )
            ),
        )
        gdir_rel = os.path.join(dv_rel, f"g{gi}")
        gdir_abs = os.path.join(dst_root, gdir_rel)
        vec.repartition(n_out, DELETE_FILE_COL).write.mode(
            "overwrite"
        ).parquet(gdir_abs)
        # read-back attribution: each served file sits in exactly one
        # output part (hash partitioning on __file), so the manifest
        # gets minimal one-element lists AND an exact coverage check
        placed = (
            spark.read.parquet(gdir_abs)
            .select(
                F.col(DELETE_FILE_COL).alias("__f"),
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("__out"),
            )
            .distinct()
            .collect()
        )
        for row in placed:
            deletes_out.setdefault(row["__f"], []).append(
                os.path.join(gdir_rel, row["__out"])
            )
        want = {
            _abs(f) for _rels, served in lists for f in served
        }
        got = {row["__f"] for row in placed}
        if got != want:  # pragma: no cover - protocol invariant
            raise RuntimeError(
                f"distributed clone lost vector coverage: "
                f"{len(want - got)} served files have no tombstones in "
                f"the rewritten output (and {len(got - want)} "
                f"unexpected) — refusing to commit a clone that would "
                f"resurrect deleted rows"
            )
    return {f: sorted(set(rels)) for f, rels in deletes_out.items()}


def clone_table(
    src_root: str,
    dst_root: str,
    *,
    version: int | None = None,
    as_of_timestamp=None,
    max_vector_bytes: int | None = 1 << 30,
    spark=None,
) -> int:
    """SHALLOW CLONE (the Delta ``CREATE TABLE ... SHALLOW CLONE``
    verb): commit a NEW table at ``dst_root`` whose v1 manifest adopts
    the source version's data files, stats, schema and column mapping
    BY ABSOLUTE REFERENCE — an O(manifest + vector bytes) zero-copy
    clone of a table of any size (deletion vectors are the one
    materialized part: their rows embed source-relative paths, so they
    rewrite locally — tombstone volume is compaction-bounded and tiny
    next to the data; the rewrite streams per row group and, above
    ``max_vector_bytes`` total, either refuses pointing at the
    source-side fold verbs or — when ``spark=`` is passed, as the SQL
    face always does — switches to a DISTRIBUTED rewrite through Spark
    (per-schema consolidation, the consolidate_vectors shape), so a
    badly-maintained source can never funnel unbounded vector debt
    through the driver). Reference anchor: the reference's own
    step 1 is a table clone (``CREATE TABLE dim_user_new LIKE
    dim_user_production``, /root/reference/SCD_script.txt:4) and its
    backup-table idiom; ``CREATE TABLE b AS SELECT * FROM t VERSION AS
    OF n`` (the CTAS pin) is the DEEP clone — this is the variant that
    doesn't copy the bytes.

    Independence: writes to the clone commit LOCAL files; a CoW rewrite
    simply drops external references (the source's bytes are never
    touched — the clone's vacuum skips external dirs entirely, and the
    commit/restore marker paths tolerate them). The clone starts a
    FRESH history (v1; the source's versions are not readable through
    it) and drops ``app_meta`` (stream markers and matview watermarks
    are source-scoped — carrying them would make a stream against the
    clone silently skip batches).

    The Delta caveat carries over verbatim: the source's VACUUM does
    not know about clones, so vacuuming the source past the cloned
    version (after rewrites there) makes the clone's reads fail LOUDLY
    with missing files. Clone-of-clone works (absolute references copy
    verbatim). ``version=`` / ``as_of_timestamp=`` pin the source
    version (default: latest); ``dst_root`` must not already be a
    snapshot table."""
    version = _resolve_source_pin(
        src_root, dst_root, version, as_of_timestamp, "SHALLOW CLONE"
    )
    m = load_manifest(src_root, version)
    src_abs = os.path.realpath(src_root)

    def _abs(rel: str) -> str:
        return rel if os.path.isabs(rel) else os.path.join(src_abs, rel)

    manifest = {
        "version": 1,
        "parent": None,
        "mode": "clone",
        "snapshot_dirs": [_abs(d) for d in m["snapshot_dirs"]],
        "files": [_abs(f) for f in m["files"]],
        "schema": m["schema"],
        "partition_by": m["partition_by"],
        "writer": uuid.uuid4().hex,
        "committed_at": time.time(),
        "cloned_from": {"root": src_abs, "version": version},
        # cow_lineage deliberately NOT set: the clone's only local dir
        # at v1 is a freshly-materialized vector dir with nothing
        # superseded, and the external dirs are skipped by the sweep
        # anyway — a later replace/vector commit sets the flag itself
        # the moment individually-superseded LOCAL files become
        # possible, so an append-only clone never pays the
        # O(files-on-disk) sweep (r10 clone review)
    }
    if m.get("deletes"):
        # Deletion vectors cannot carry by reference: their rows store
        # the data file's MANIFEST-RELATIVE path in __file, which the
        # clone's overlay compares against its own (absolute) manifest
        # entries. Materialize them LOCALLY with __file rewritten to
        # the absolute form — O(vector bytes), driver-side pyarrow, the
        # data files stay zero-copy. One local file per distinct source
        # vector file keeps every list's structure (and therefore the
        # "tombstones for f are f's OWN list" restriction) intact.
        # Memory is bounded per ROW GROUP (streamed rewrite), and total
        # volume is bounded by ``max_vector_bytes`` (VERDICT r10: a
        # clone of a badly-maintained 100 TB source would otherwise
        # funnel its whole vector debt through one driver) — above the
        # cap the clone refuses loudly and points at the fold verbs
        # that retire the debt at the source.
        import pyarrow as pa
        import pyarrow.parquet as pq

        vec_rels = sorted(
            {r for rels in m["deletes"].values() for r in rels}
        )
        # one stat pass, shared with the distributed path (on an
        # object store a second per-file stat sweep doubles the
        # round trips — r11 review)
        per_size = {
            r: os.path.getsize(os.path.join(src_root, r))
            for r in vec_rels
        }
        total = sum(per_size.values())
        over_cap = max_vector_bytes is not None and total > max_vector_bytes
        if over_cap and spark is None:
            raise ValueError(
                f"source v{version} carries {total} bytes of deletion "
                f"vectors across {len(vec_rels)} files — above the "
                f"clone's max_vector_bytes={max_vector_bytes} driver "
                f"materialization cap. Pass spark= to rewrite the "
                f"vectors THROUGH Spark (distributed, no driver "
                f"funnel), retire the debt at the source first "
                f"(maintain_table / consolidate_vectors for the "
                f"O(vector-bytes) fold, compact_deletes / OPTIMIZE "
                f"APPLY (PURGE) to fold into clean data files), or "
                f"raise max_vector_bytes explicitly"
            )
        dv_rel = os.path.join(DATA_DIR, f"snap-clone-{manifest['writer']}")
        dv_abs = os.path.join(dst_root, dv_rel)
        os.makedirs(dv_abs, exist_ok=True)
        manifest["snapshot_dirs"] = manifest["snapshot_dirs"] + [dv_rel]
        # any failure mid-materialization (Spark job loss, coverage
        # check, disk full) must not leak the partially-written dv dir:
        # dst_root has no manifest yet so no vacuum can ever reclaim
        # it, and a retried clone uses a fresh writer uuid (r11 review)
        try:
            if over_cap:
                manifest["deletes"] = _clone_vectors_spark(
                    spark,
                    src_root,
                    dst_root,
                    m["deletes"],
                    dv_rel,
                    _abs,
                    sizes=per_size,
                )
                vec_rels = []  # driver path below skipped
            local_of: dict[str, str] = {}
            for i, r in enumerate(vec_rels):
                pf = pq.ParquetFile(os.path.join(src_root, r))
                local = os.path.join(dv_rel, f"vector-{i:05d}.parquet")
                fidx = pf.schema_arrow.get_field_index(DELETE_FILE_COL)
                ftype = pf.schema_arrow.field(fidx).type
                with pq.ParquetWriter(
                    os.path.join(dst_root, local), pf.schema_arrow
                ) as w:
                    for batch in pf.iter_batches():
                        t = pa.Table.from_batches([batch])
                        t = t.set_column(
                            fidx,
                            DELETE_FILE_COL,
                            pa.array(
                                [
                                    _abs(x)
                                    for x in t.column(
                                        DELETE_FILE_COL
                                    ).to_pylist()
                                ],
                                type=ftype,
                            ),
                        )
                        w.write_table(t)
                local_of[r] = local
        except BaseException:
            shutil.rmtree(dv_abs, ignore_errors=True)
            try:  # drop the data/ parent too if this made it empty
                os.rmdir(os.path.dirname(dv_abs))
            except OSError:
                pass
            raise
        if not over_cap:
            manifest["deletes"] = {
                _abs(f): [local_of[r] for r in rels]
                for f, rels in m["deletes"].items()
            }
    if m.get("stats"):
        manifest["stats"] = {
            _abs(f): per for f, per in m["stats"].items()
        }
    for k in ("column_mapping", "retired_physical"):
        if m.get(k):
            manifest[k] = m[k]
    mdir = _manifest_dir(dst_root)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{manifest['writer']}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _manifest_path(dst_root, 1))
        os.unlink(tmp)
        _fsync_dir(mdir)
    except FileExistsError:
        os.unlink(tmp)
        for d_rel in manifest["snapshot_dirs"]:
            if not os.path.isabs(d_rel):
                shutil.rmtree(
                    os.path.join(dst_root, d_rel), ignore_errors=True
                )
        raise CommitConflictError(
            f"a concurrent writer initialized {dst_root}"
        )
    return 1


def version_at_timestamp(root: str, ts) -> int:
    """The committed version a reader at wall-clock instant ``ts``
    (epoch float, naive ``datetime`` read as UTC, or aware ``datetime``
    in any zone) would have resolved: the LARGEST version whose
    ``committed_at`` is <= ts — Delta/Iceberg's ``TIMESTAMP AS OF``
    resolution. Versions from before the field existed (or vacuumed
    away) cannot match; a ``ts`` earlier than every known commit raises
    ValueError with the earliest instant, so a caller can distinguish
    "before history" from "no such table"."""
    import datetime as _dt

    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        ts = ts.timestamp()  # aware: honor the zone, don't overwrite it
    best, earliest = None, None
    for v in list_versions(root):
        try:
            at = load_manifest(root, v).get("committed_at")
        except FileNotFoundError:
            continue  # vacuumed between listing and load
        if at is None:
            continue  # pre-timestamp manifest: cannot participate
        earliest = at if earliest is None else min(earliest, at)
        if at <= ts and (best is None or v > best):
            best = v
    if best is None:
        raise ValueError(
            f"no committed version of {root} at or before timestamp {ts}"
            + (f" (earliest known commit: {earliest})" if earliest else "")
        )
    return best


def table_history(root: str) -> list[dict]:
    """DESCRIBE HISTORY equivalent: one summary dict per RETAINED
    version, ascending — ``{"version", "committed_at", "mode",
    "parent", "n_files", "n_replaced", "n_vectored", "app_meta"}`` —
    read driver-side from the manifests (O(retained versions), no data
    touched). Vacuumed versions are simply absent; a version vacuumed
    mid-listing is skipped, not raised on."""
    out = []
    for v in list_versions(root):
        try:
            m = load_manifest(root, v)
        except FileNotFoundError:
            continue
        out.append(
            {
                "version": m["version"],
                "committed_at": m.get("committed_at"),
                "mode": m["mode"],
                "parent": m.get("parent"),
                "n_files": len(m["files"]),
                "n_replaced": len(m.get("replaced", [])),
                "n_vectored": len(m.get("deletes", {})),
                "app_meta": m.get("app_meta"),
            }
        )
    return out


def read_snapshot(
    spark: SparkSession,
    root: str,
    *,
    version: int | None = None,
    as_of_timestamp=None,
    prune: dict[str, tuple] | None = None,
) -> DataFrame:
    """The table as of ``version`` (default: latest committed). Reads
    exactly the manifest's file list with the manifest's schema pinned —
    concurrent commits and staged-but-uncommitted data are invisible.

    ``prune`` = ``{col: (lo, hi)}`` closed intervals applies the
    manifest's per-file min/max stats (written via ``stats_cols``) as a
    FILE-SKIPPING index: files whose recorded range is disjoint from
    every interval never reach the scan (Delta-style data skipping —
    the caller still applies the exact row filter; skipping only
    shrinks the file list and is a no-op for files without stats).
    ``(None, hi)`` / ``(lo, None)`` are half-open.

    ``as_of_timestamp`` (epoch float or naive-UTC datetime; mutually
    exclusive with ``version``) resolves the version via
    :func:`version_at_timestamp` — the ``TIMESTAMP AS OF`` read."""
    if as_of_timestamp is not None:
        if version is not None:
            raise ValueError(
                "pass either version= or as_of_timestamp=, not both"
            )
        version = version_at_timestamp(root, as_of_timestamp)
    if version is None:
        version = latest_version(root)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {root}")
    m = load_manifest(root, version)
    files = m["files"]
    if prune:
        stats = m.get("stats", {})
        files = [f for f in files if _survives_prune(stats.get(f, {}), prune)]
    return read_manifest_files(spark, root, m, files)


def read_manifest_files(
    spark: SparkSession,
    root: str,
    m: dict,
    files: list[str],
    *,
    file_path_col: str | None = None,
    rel_path_col: str | None = None,
    row_pos_col: str | None = None,
    apply_deletes: bool = True,
) -> DataFrame:
    """Read an explicit subset of a manifest's files with the manifest's
    schema pinned — the building block behind pruned reads and the
    copy-on-write merge's touched-files-only scan. Groups by snapshot
    dir so hive-partition columns resolve against the right basePath
    (append/replace manifests span several stage dirs).

    ``file_path_col`` appends each row's source file path (from the
    hidden ``_metadata`` column, captured BEFORE the projection that
    would drop it) — how the CoW merge recovers file identity.

    ``rel_path_col`` appends each row's MANIFEST-RELATIVE file path.
    Derivation is EXACT by construction, never a URI-parsing guess:
    files whose basename is unique within the rel-needing read set get
    the rel via a tiny broadcast basename->rel mapping joined on the
    file path's last segment (part-file basenames are plain ASCII —
    the one path component ``_metadata.file_path``'s percent-encoding
    can never alter); colliding basenames (same write job fanning one
    task across hive partition dirs) fall back to per-file reads tagged
    with a literal.

    ``row_pos_col`` appends each row's WITHIN-FILE ordinal
    (``_metadata.row_index``, captured at scan like ``file_path_col``)
    — how positional deletion vectors are built: ``(rel, pos)``
    identifies a physical row exactly, whatever its content.

    ``apply_deletes`` (default) overlays the manifest's deletion vectors
    (merge-on-read): a row whose ``(file, key)`` — or ``(file, pos)``
    for positional vectors — appears in a live vector is anti-joined
    out before the caller sees it. Only the vectored subset of
    ``files`` pays the overlay — files without a vector stream through
    the plain bulk scan untouched, and the vector side is a broadcast
    (tombstone volume is bounded by the compaction cadence —
    ``sinks.compact_deletes`` folds vectors back into clean files)."""
    from pyspark.sql import functions as F

    logical = StructType.fromJson(json.loads(m["schema"]))
    # files (and deletion vectors) store PHYSICAL names; once a column
    # mapping is active the scan is pinned with the physical schema and
    # the very last projection renames back to the manifest's LOGICAL
    # names — so every internal step (vector overlay keys, hive
    # partition dirs, metadata capture) stays name-consistent with the
    # bytes on disk
    schema = physical_schema(m)
    logical_cols = [f.name for f in logical.fields]
    meta_cols = [
        c for c in (file_path_col, rel_path_col, row_pos_col) if c
    ]
    cols = [f.name for f in schema.fields] + meta_cols
    remap = [f.name for f in schema.fields] != logical_cols
    fileset = set(files)
    deletes = {
        f: v
        for f, v in (m.get("deletes") or {}).items()
        if apply_deletes and f in fileset
    }
    if not files:
        empty = spark.createDataFrame([], logical)
        for c in (file_path_col, rel_path_col):
            if c:
                empty = empty.withColumn(c, F.lit(None).cast("string"))
        if row_pos_col:
            empty = empty.withColumn(
                row_pos_col, F.lit(None).cast("bigint")
            )
        return empty.select(*logical_cols, *meta_cols)

    rel_col = rel_path_col or "__mor_rel"
    # rel paths are needed for every file when the caller asked for
    # them, else only for the vectored subset (the delete anti-join's
    # probe side); the anti-join itself applies ONLY to vectored files
    # in either case — clean files never pay the overlay join.
    vectored = sorted(deletes)
    extra_rel = (
        [f for f in files if f not in deletes] if rel_path_col else []
    )
    rel_set = set(vectored) | set(extra_rel)
    plain = [f for f in files if f not in rel_set]

    def _by_dir(subset: list[str]) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {}
        for rel in subset:
            for d in m["snapshot_dirs"]:
                if rel.startswith(d + os.sep):
                    out.setdefault(d, []).append(rel)
                    break
            else:
                raise ValueError(
                    f"manifest file {rel} outside any snapshot dir"
                )
        return out

    need_pos_all = bool(row_pos_col)

    def _bulk(
        subset: list[str], with_path: bool, with_pos: bool = False
    ) -> list[DataFrame]:
        parts = []
        for d, rels in sorted(_by_dir(subset).items()):
            p = (
                spark.read.schema(schema)
                .option("basePath", os.path.join(root, d))
                .parquet(*[os.path.join(root, r) for r in rels])
            )
            # metadata columns are only reachable on the scan relation —
            # materialize BEFORE any join/projection drops them
            if with_path:
                p = p.withColumn("__mor_fp", F.col("_metadata.file_path"))
            if with_pos or need_pos_all:
                p = p.withColumn("__mor_pos", F.col("_metadata.row_index"))
            parts.append(p)
        return parts

    def _rel_tagged(
        subset: list[str], with_pos: bool = False
    ) -> list[DataFrame]:
        """Scan ``subset`` with an exact ``rel_col``: basename-unique
        files via one bulk scan + broadcast basename->rel map (basename
        ambiguity only matters WITHIN one scan), colliding basenames via
        per-file literal-tagged reads."""
        from collections import Counter

        base_count = Counter(os.path.basename(f) for f in subset)
        tagged = {f for f in subset if base_count[os.path.basename(f)] > 1}
        mapped = [f for f in subset if f not in tagged]
        parts: list[DataFrame] = []
        if mapped:
            mapping = spark.createDataFrame(
                [(os.path.basename(f), f) for f in mapped],
                "__mor_base string, __mor_rel_v string",
            )
            for p in _bulk(mapped, True, with_pos):
                q = p.withColumn(
                    "__mor_base",
                    F.element_at(F.split(F.col("__mor_fp"), "/"), -1),
                ).join(F.broadcast(mapping), "__mor_base")
                parts.append(
                    q.withColumn(rel_col, F.col("__mor_rel_v")).drop(
                        "__mor_base", "__mor_rel_v"
                    )
                )
        for f in sorted(tagged):
            d = next(
                d for d in m["snapshot_dirs"] if f.startswith(d + os.sep)
            )
            p = (
                spark.read.schema(schema)
                .option("basePath", os.path.join(root, d))
                .parquet(os.path.join(root, f))
                .withColumn("__mor_fp", F.col("_metadata.file_path"))
            )
            if with_pos or need_pos_all:
                p = p.withColumn("__mor_pos", F.col("_metadata.row_index"))
            parts.append(p.withColumn(rel_col, F.lit(f)))
        return parts

    vec_parts = []
    if vectored:
        # Per-(vector list, footer schema) groups — replace semantics
        # and keyed-differently handling documented on the shared
        # helper; the common all-one-schema case keeps a single join.
        groups = group_vector_lists(root, deletes)
        try:
            thresh = int(
                spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
                .removesuffix("b")
                .removesuffix("B")
            )
        except (ValueError, TypeError):
            thresh = 10 << 20  # unit-suffixed custom value: use default
        for _cols_key, lists in sorted(groups.items()):
            positional = set(_cols_key) == {DELETE_FILE_COL, DELETE_POS_COL}
            g_files = sorted(f for _rels, served in lists for f in served)
            joined = None
            for p in _rel_tagged(g_files, with_pos=positional):
                joined = p if joined is None else joined.unionByName(p)
            vec = None
            for rels, served in lists:
                v = spark.read.parquet(
                    *[os.path.join(root, r) for r in rels]
                ).where(F.col(DELETE_FILE_COL).isin(served))
                vec = v if vec is None else vec.unionByName(v)
            cond = F.col(f"__l.{rel_col}") == F.col(f"__r.{DELETE_FILE_COL}")
            if positional:
                # a position identifies a physical row exactly — plain
                # equality on the captured scan ordinal, no key columns
                cond = cond & (
                    F.col("__l.__mor_pos") == F.col(f"__r.{DELETE_POS_COL}")
                )
            else:
                key_cols = [
                    c for c in vec.columns if c != DELETE_FILE_COL
                ]
                for k in key_cols:
                    cond = cond & F.col(f"__l.{k}").eqNullSafe(
                        F.col(f"__r.{k}")
                    )
            # broadcast is the normal case (compaction bounds tombstone
            # volume), but forcing it on a table whose fold is overdue
            # would OOM the driver — past the session's broadcast
            # threshold, leave the strategy to the planner (shuffle
            # anti-join: slower, safe). Vector bytes are known
            # driver-side from the file sizes.
            vec_bytes = sum(
                os.path.getsize(os.path.join(root, r))
                for r in {r for rels, _served in lists for r in rels}
            )
            right = vec.alias("__r")
            if thresh >= 0 and vec_bytes <= thresh:
                right = F.broadcast(right)  # thresh -1 = broadcasts off
            vec_parts.append(
                joined.alias("__l").join(right, cond, "left_anti")
            )

    parts = (
        vec_parts
        + _rel_tagged(extra_rel)
        + _bulk(plain, bool(file_path_col))
    )
    norm = []
    for p in parts:
        q = p
        if file_path_col:
            q = q.withColumn(file_path_col, F.col("__mor_fp")) if (
                "__mor_fp" in q.columns
            ) else q.withColumn(
                file_path_col, F.col("_metadata.file_path")
            )
        if rel_path_col and rel_col not in q.columns:
            q = q.withColumn(rel_col, F.lit(None).cast("string"))
        if row_pos_col:
            q = q.withColumn(row_pos_col, F.col("__mor_pos")) if (
                "__mor_pos" in q.columns
            ) else q.withColumn(
                row_pos_col, F.col("_metadata.row_index")
            )
        norm.append(q.select(*cols))
    out = norm[0]
    for p in norm[1:]:
        out = out.unionByName(p)
    # a partitioned read surfaces partition columns LAST regardless of
    # the pinned schema; restore manifest order so round-trips (e.g. a
    # replace-mode rewrite of a partitioned table) keep a stable shape
    out = out.select(*cols)
    if remap:
        # the one projection that translates PHYSICAL -> LOGICAL names
        # (resolution happens against the physical input before any
        # alias lands, so even a full name SWAP a<->b is exact)
        out = out.select(
            *[
                out[p].alias(l)
                for p, l in zip(cols[: len(logical_cols)], logical_cols)
            ],
            *meta_cols,
        )
    return out


def _iso_bound(b):
    """Stats for date/timestamp columns are stored as isoformat STRINGS
    (JSON can't carry the native types; see _footer_stats) — a
    date/datetime prune bound must be compared in the same form, or the
    mixed str/date comparison raises. Isoformat is zero-padded, so its
    lexicographic order IS chronological order; an aware datetime is
    normalized to naive UTC first (parquet footer stats are UTC)."""
    import datetime

    if isinstance(b, datetime.datetime):
        if b.tzinfo is not None:
            b = b.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return b.isoformat()
    if isinstance(b, datetime.date):
        return b.isoformat()
    return b


def _canon_iso(s: str) -> str:
    """Stored stats strings can deviate from the canonical naive-UTC
    'T'-separated isoformat two ways: manifests written before the
    naive-UTC normalization carry a timezone suffix ('...+00:00'), and
    TIMESTAMP-typed hive-partition path values use Spark's
    SPACE-separated form ('2024-01-01 00:00:00' — stored verbatim by
    ``_partition_values``). Both orders wrong lexicographically against
    a 'T'-separated bound (' ' < 'T' < '+'), silently pruning boundary
    files, so re-render values WITH a time component through
    ``isoformat()``. Values WITHOUT one (DATE-typed stats like
    '2024-01-05', and non-temporal strings) pass through untouched —
    inflating a date to midnight here while ``_iso_bound`` renders a
    ``date`` bound as the bare date would wrongly prune the
    upper-boundary file (r9 self-review); the date-vs-datetime MIXED
    frame is handled by ``_survives_prune`` inflating BOTH sides."""
    import datetime

    if "T" not in s and " " not in s:
        return s
    try:
        d = datetime.datetime.fromisoformat(s)
    except (ValueError, TypeError):
        return s
    if d.tzinfo is not None:
        d = d.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return d.isoformat()


def _survives_prune(file_stats: dict, prune: dict) -> bool:
    import datetime

    for col, (lo, hi) in prune.items():
        rng = file_stats.get(col)
        if rng is None:
            continue  # no stats recorded -> must keep (correctness)
        fmin, fmax = rng
        probe = lo if lo is not None else hi
        if isinstance(fmin, str) and isinstance(
            probe, (datetime.date, datetime.datetime)
        ):
            # temporal bounds vs string-stored stats: compare both
            # sides in naive-UTC isoformat (zero-padded, so the
            # lexicographic order IS chronological order)
            lo, hi = _iso_bound(lo), _iso_bound(hi)
            fmin, fmax = _canon_iso(fmin), _canon_iso(fmax)
            vals = (lo, hi, fmin, fmax)
            if any(v is not None and "T" in v for v in vals):
                # MIXED date/datetime frame (datetime bounds over a
                # DATE column or vice versa): bare dates order before
                # any same-day 'T'-form, wrongly pruning the boundary
                # file — inflate date-only values to midnight so every
                # operand lives in one frame (a DATE value IS its
                # midnight instant)
                def _mid(v):
                    return (
                        v + "T00:00:00"
                        if v is not None
                        and "T" not in v
                        and len(v) == 10
                        and v[4:5] == "-"
                        else v
                    )

                lo, hi, fmin, fmax = map(_mid, vals)
        if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
            return False
    return True


def read_table(
    spark: SparkSession,
    path: str,
    *,
    version: int | None = None,
    as_of_timestamp=None,
) -> DataFrame:
    """Universal reader: manifest-backed tables resolve through the
    commit log (``version=`` or ``as_of_timestamp=`` time travel);
    anything else falls back to a plain parquet read (so pre-snapshot
    seed dirs and external inputs keep working)."""
    if is_snapshot_table(path):
        return read_snapshot(
            spark, path, version=version, as_of_timestamp=as_of_timestamp
        )
    if version is not None or as_of_timestamp is not None:
        raise ValueError(f"{path} is not a snapshot table; cannot time-travel")
    return spark.read.parquet(path)


def _pin_wider_schema(narrow: dict, wide: dict) -> dict:
    """Pin ``wide``'s (logical) schema onto the ``narrow`` manifest for
    a version diff, TRANSLATING the column mapping so every field still
    resolves to the right bytes in narrow's files (ADVICE r10 — the
    pre-mapping pin kept narrow's own mapping, so a borrowed new column
    that reused a previously-dropped logical name resolved to the
    RETIRED physical and read the dropped column's bytes out of carried
    files):

    - prefix fields keep narrow's OWN physical, keyed under wide's
      logical name (a rename changes only the logical name);
    - borrowed new fields map to wide's physical when that name is
      absent from narrow's used∪retired set (reads NULL-backfill), else
      to a fresh phantom name guaranteed absent from narrow's files."""
    sdoc_n = json.loads(narrow["schema"])
    nf = sdoc_n["fields"]
    wf = json.loads(wide["schema"])["fields"]
    cm_n = column_mapping(narrow)
    cm_w = column_mapping(wide)
    mapping: dict = {}
    for i, f in enumerate(wf[: len(nf)]):
        phys = cm_n.get(nf[i]["name"], nf[i]["name"])
        if f["name"] != phys:
            mapping[f["name"]] = phys
    used = _used_physical(sdoc_n, cm_n, narrow.get("retired_physical"))
    for f in wf[len(nf):]:
        phys = cm_w.get(f["name"], f["name"])
        if phys.casefold() in used:
            phys = _fresh_physical(f["name"], wide["version"], used)
        used.add(phys.casefold())
        if f["name"] != phys:
            mapping[f["name"]] = phys
    out = {**narrow, "schema": wide["schema"]}
    if mapping:
        out["column_mapping"] = mapping
    else:
        out.pop("column_mapping", None)
    return out


def _diff_sides(
    spark: SparkSession, root: str, v_from: int, v_to: int
) -> tuple[DataFrame, DataFrame]:
    """Both sides of a version diff, restricted to the files that
    DIFFER between the two manifests. Rows in shared (carried) files
    are byte-identical on both sides, so they can never contribute a
    change — and under the keyed-table precondition the restriction is
    EXACT: if a key's v_from row sat in a dropped file while its v_to
    row sat in a carried file, the carried file's row would exist in
    v_from too, giving v_from two rows for the key. On a copy-on-write
    table this makes the change feed (and everything built on it — the
    materialized view refresh, the streaming subscriber) cost O(changed
    files), not O(table): a 1-file merge commit diffs 1+1 files however
    large the table is. Overwrite commits share no files, so they fall
    back to the full two-snapshot diff unchanged."""
    m_from = load_manifest(root, v_from)
    m_to = load_manifest(root, v_to)
    if m_from["schema"] != m_to["schema"]:
        # (equal LOGICAL schemas need no pinning even when the column
        # mappings differ — e.g. a DROP+re-ADD of the same logical name
        # across the window: each side reads through its OWN manifest,
        # so the old side serves the old bytes and the new side the
        # fresh column's NULLs, which is exactly the coherent diff)
        # schema evolution across the window: when one side's schema
        # extends the other's as a prefix (the carried-by-reference
        # contract), pin the WIDER schema on both sides — the narrow
        # side's rows read the new columns as NULL, which is exactly
        # what they were ("the column did not exist"), so the diff
        # reports the backfill-visible changes. Prefix equality
        # resolves through each side's column mapping (ADVICE r10): a
        # RENAME across the window keeps the physical name, so the
        # columns ARE identical and the diff runs under the TO side's
        # logical names. Any other divergence (an overwrite that
        # dropped/retyped columns) has no coherent row diff — fail
        # with the re-bootstrap instruction instead of an analyzer
        # error deep in the join.
        pfields = lambda m: [  # noqa: E731
            (
                f["name"].casefold(),
                column_mapping(m).get(f["name"], f["name"]).casefold(),
                f["type"],
            )
            for f in json.loads(m["schema"])["fields"]
        ]
        ff, tf = pfields(m_from), pfields(m_to)

        def _prefix_ok(short, long_):
            # positional fields correspond when the types match AND
            # either the PHYSICAL name matches (a RENAME across the
            # window — same bytes, new logical name) or the LOGICAL
            # name matches (a DROP+re-ADD across the window — fresh
            # physical; the old side serves the old bytes, the new
            # side the re-added column's NULL backfill, which is the
            # coherent diff). The r11 physical-only compare refused the
            # second shape whenever the schema JSONs differed in any
            # incidental bit (nullability), while accepting the
            # byte-identical-schema variant of the SAME history —
            # confirmed live (r12 review).
            return all(
                (s[1] == l[1] or s[0] == l[0]) and s[2] == l[2]
                for s, l in zip(short, long_)
            )

        if len(ff) <= len(tf) and _prefix_ok(ff, tf):
            m_from = _pin_wider_schema(m_from, m_to)
        elif len(tf) < len(ff) and _prefix_ok(tf, ff):
            m_to = _pin_wider_schema(m_to, m_from)
        else:
            raise ValueError(
                f"versions {v_from} and {v_to} of {root} have incompatible "
                f"schemas (a full-overwrite change, not an extension) — "
                f"no row diff exists; re-bootstrap the consumer from the "
                f"current snapshot"
            )
    # a file carried by BOTH manifests still differs if its deletion
    # vector changed (a merge-on-read commit changes rows without
    # touching the data file list); reading each side through its own
    # manifest applies the right vector, so the diff stays exact
    d_from = m_from.get("deletes", {})
    d_to = m_to.get("deletes", {})
    shared = {
        f
        for f in set(m_from["files"]) & set(m_to["files"])
        if d_from.get(f) == d_to.get(f)
    }
    return (
        read_manifest_files(
            spark, root, m_from, [f for f in m_from["files"] if f not in shared]
        ),
        read_manifest_files(
            spark, root, m_to, [f for f in m_to["files"] if f not in shared]
        ),
    )


def snapshot_changes(
    spark: SparkSession,
    root: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
    *,
    op_col: str = "op",
) -> DataFrame:
    """Row-level change feed between two committed versions (the
    ``table_changes`` every table format grows once it has time travel):
    one full-outer join on ``key_cols`` between the two snapshots,
    emitting I (key only in ``v_to``), D (only in ``v_from``, payload
    NULLs like a real feed) and U (any null-safe difference in the
    non-key columns); identical rows emit nothing, so downstream apply
    cost is O(changed keys). ``key_cols`` must identify rows uniquely
    within each version (a KEYED table feed — duplicate keys fan the
    join out and mis-weight the diff); dedupe or aggregate first for
    multiset tables. For SCD dimensions prefer
    ``operators/cdc.py:snapshot_to_cdc`` over the same two reads — this
    generic form serves any keyed table. Versions must both still be
    committed (i.e. not vacuumed away)."""
    from functools import reduce

    from pyspark.sql import Column
    from pyspark.sql import functions as F

    # presence via literal marker columns, NOT key-null probes: the join
    # matches NULL keys null-safely, so a legitimately-NULL key must not
    # read as "row absent" (it would emit a phantom insert every diff)
    d_old, d_new = _diff_sides(spark, root, v_from, v_to)
    old = d_old.withColumn("__po", F.lit(1)).alias("o")
    new = d_new.withColumn("__pn", F.lit(1)).alias("n")
    payload = [c for c in new.columns if c not in key_cols and c != "__pn"]
    if not payload:
        raise ValueError("need at least one non-key column to diff")
    oc = lambda c: F.col(f"o.{c}")  # noqa: E731
    nc = lambda c: F.col(f"n.{c}")  # noqa: E731
    differs = reduce(
        Column.__or__, [~oc(c).eqNullSafe(nc(c)) for c in payload]
    )
    op = (
        F.when(oc("__po").isNull(), F.lit("I"))
        .when(nc("__pn").isNull(), F.lit("D"))
        .when(differs, F.lit("U"))
    )
    cond = reduce(Column.__and__, [oc(k).eqNullSafe(nc(k)) for k in key_cols])
    return (
        old.join(new, cond, "full_outer")
        .withColumn("__op", op)
        .where(F.col("__op").isNotNull())
        .select(
            *[F.coalesce(nc(k), oc(k)).alias(k) for k in key_cols],
            *[F.when(F.col("__op") != "D", nc(c)).alias(c) for c in payload],
            F.col("__op").alias(op_col),
        )
    )


def snapshot_deltas(
    spark: SparkSession,
    root: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
    *,
    weight_col: str = "__w",
) -> DataFrame:
    """Signed row deltas (Z-set style: the differential-dataflow/DBSP
    representation) between two committed versions: every changed key
    contributes its OLD row with weight -1 and/or its NEW row with
    weight +1 (U emits both, I only +1, D only -1); identical rows emit
    nothing. Any commutative-monoid aggregate then maintains
    incrementally under updates AND deletes — ``count -> sum(w)``,
    ``sum(x) -> sum(x*w)`` — which plain insert-only delta folds
    (``operators/incremental.py:merge_rollup``) cannot express. Cost is
    one full-outer join of the two snapshots on the key. Same keyed-table
    precondition as :func:`snapshot_changes`: ``key_cols`` unique within
    each version."""
    from functools import reduce

    from pyspark.sql import Column
    from pyspark.sql import functions as F

    d_old, d_new = _diff_sides(spark, root, v_from, v_to)
    old = d_old.withColumn("__po", F.lit(1)).alias("o")
    new = d_new.withColumn("__pn", F.lit(1)).alias("n")
    cols = [c for c in new.columns if c != "__pn"]
    payload = [c for c in cols if c not in key_cols]
    if not payload:
        raise ValueError("need at least one non-key column to diff")
    oc = lambda c: F.col(f"o.{c}")  # noqa: E731
    nc = lambda c: F.col(f"n.{c}")  # noqa: E731
    differs = reduce(
        Column.__or__, [~oc(c).eqNullSafe(nc(c)) for c in payload]
    )
    # literal presence markers, not key-null probes (NULL keys are data)
    has_old, has_new = oc("__po").isNotNull(), nc("__pn").isNotNull()
    changed = (~has_old) | (~has_new) | differs
    mk = lambda side, w: F.struct(  # noqa: E731
        *[side(c).alias(c) for c in cols], F.lit(w).alias(weight_col)
    )
    pair = F.array_compact(
        F.array(
            F.when(has_old & changed, mk(oc, -1)),
            F.when(has_new & changed, mk(nc, 1)),
        )
    )
    cond = reduce(Column.__and__, [oc(k).eqNullSafe(nc(k)) for k in key_cols])
    return (
        old.join(new, cond, "full_outer")
        .select(F.explode(pair).alias("__r"))
        .select("__r.*")
    )


def changes_since(
    spark: SparkSession,
    root: str,
    last_version: int | None,
    key_cols: list[str],
    *,
    signed: bool = False,
    to_version: int | None = None,
) -> tuple[DataFrame | None, int | None]:
    """Poll face of the commit log (the batch analog of a readStream on
    a table): deltas between ``last_version`` and the current latest,
    plus the new high-watermark to persist. ``last_version=None`` means
    "from the beginning" — the full first snapshot arrives as inserts
    (weight +1 when ``signed``). Returns ``(None, last_version)`` when
    nothing new committed (the watermark passes through unchanged —
    still ``None`` on an empty table, so the eventual first commit
    arrives as the initial load). ``signed=True`` yields the ±1-weighted Z-set
    form (:func:`snapshot_deltas`) that feeds incremental aggregate
    maintenance; default is the I/U/D feed (:func:`snapshot_changes`).
    A consumer loop is just: persist the watermark after applying each
    batch — replays are idempotent because the diff of the same two
    versions is deterministic.

    ``to_version`` caps the batch at an older committed version (bounded
    catch-up: rate-limit how much history one poll folds, or replay a
    historical window deterministically); the returned watermark is then
    that cap, and the next poll continues from it."""
    from pyspark.sql import functions as F

    latest = latest_version(root)
    if (
        latest is not None
        and last_version is not None
        and latest < last_version
    ):
        # vacuum never drops the newest version, so a TRUE latest below
        # the stored watermark means the source's history was reset
        # (table wiped and re-created). Returning a no-op here would
        # stall every consumer forever — the view silently serving a
        # table that no longer exists (r11 matview review; same loud
        # rule as the streaming maintainers' watermark guard).
        raise RuntimeError(
            f"{root} is at version {latest}, BELOW the consumer's "
            f"watermark {last_version}: the source history was reset. "
            f"Rebuild the consumer (drop its watermark) instead of "
            f"polling on."
        )
    if to_version is not None and latest is not None:
        latest = min(latest, to_version)
    if latest is None or (last_version is not None and latest <= last_version):
        # watermark passes through UNCHANGED — fabricating 0 for an
        # empty table would make the next poll diff against a version
        # that never existed instead of delivering the initial load
        return None, last_version
    if last_version is None:
        # PIN the initial load to the captured watermark: an unpinned
        # read here races a concurrent commit landing between the
        # latest_version() capture above and the read's own resolution —
        # the load would contain rows newer than the returned watermark
        # and the next poll would replay them (double-folded aggregates
        # downstream). ADVICE r7 #1.
        first = read_snapshot(spark, root, version=latest)
        if signed:
            return first.withColumn("__w", F.lit(1)), latest
        return first.withColumn("op", F.lit("I")), latest
    fn = snapshot_deltas if signed else snapshot_changes
    return fn(spark, root, last_version, latest, key_cols), latest


_TOMBSTONE = ".dropped-at"


def _tombstone_path(root: str, rel_dir: str) -> str:
    return os.path.join(root, rel_dir, _TOMBSTONE)


def vacuum(
    root: str,
    *,
    keep_last: int = 2,
    grace_seconds: float = 600.0,
    dry_run: bool = False,
) -> dict:
    """Reclaim storage: drop manifests beyond the last ``keep_last``
    versions, then delete every ``data/snap-*`` dir no retained manifest
    references — crashed writers' orphans included.

    Reclamation is TWO-PHASE: the first vacuum pass that observes a dir
    unreferenced writes a ``.dropped-at`` tombstone inside it (phase 1);
    the dir is deleted only once ``grace_seconds`` have elapsed since
    that tombstone (phase 2). The grace clock therefore starts when the
    dir was *dereferenced* (or first seen orphaned), not when its data
    was written — so compacting or vacuuming a table that was last
    written long ago still leaves in-flight readers of the superseded
    version a full grace window mid-scan, and an in-flight writer's
    stage dir (referenced by nothing until its commit) survives until
    its commit makes it referenced (``commit`` clears any stale
    tombstone). ``grace_seconds=0`` collapses both phases into one pass
    — use ONLY when no other writer or reader can be in flight.

    Reader contract (same trade Delta's VACUUM makes vs time travel):
    a time-travel read pinned to a version older than ``keep_last``
    races vacuum — its manifest and files can disappear between plan
    and collect. Materialize (or copy out) old versions you still need
    BEFORE vacuuming past them.

    Safe to run concurrently with other vacuums and publishers: files
    another process reclaims first are skipped, not raised on. Also
    sweeps abandoned manifest temp files. Returns
    ``{"dropped_versions": [...], "removed_dirs": [...]}``.

    ``dry_run=True`` (the Delta ``VACUUM ... DRY RUN`` verb, r11) is a
    strictly READ-ONLY preview: nothing is unlinked and — unlike a real
    pass — no grace tombstones are written, so it never even starts a
    reclamation clock. ``removed_dirs``/``removed_files`` then list
    what a real pass would delete NOW (grace already elapsed), and the
    extra ``pending_dirs``/``pending_files`` keys list what it would
    tombstone for a later pass."""
    versions = list_versions(root)
    if not versions:
        out = {
            "dropped_versions": [], "removed_dirs": [], "removed_files": []
        }
        if dry_run:
            out.update(
                {"dry_run": True, "pending_dirs": [], "pending_files": []}
            )
        return out
    kept, dropped = versions[-keep_last:], versions[:-keep_last]
    referenced: set[str] = set()
    referenced_files: set[str] = set()
    cow_lineage = False
    for v in kept:
        try:
            pm = load_manifest(root, v)
        except FileNotFoundError:
            # a concurrent vacuum dropped this version between our
            # list_versions and the read; its dirs are then fair game
            # for WHOEVER still references them — nothing to add here
            continue
        referenced.update(pm["snapshot_dirs"])
        referenced_files.update(pm["files"])
        # live deletion-vector files must survive the file-granular
        # sweep exactly like data files (a superseded vector — its file
        # re-vectored or rewritten — drops out of every kept manifest
        # and is then reclaimed two-phase like any superseded file)
        referenced_files.update(
            r for rels in pm.get("deletes", {}).values() for r in rels
        )
        cow_lineage = cow_lineage or pm.get("cow_lineage", False)
    if not dry_run:
        for v in dropped:
            try:
                os.unlink(_manifest_path(root, v))
            except FileNotFoundError:
                pass  # concurrent vacuum got there first
    now = time.time()
    mdir = _manifest_dir(root)
    if not dry_run:
        for name in os.listdir(mdir):
            p = os.path.join(mdir, name)
            if name.startswith(".tmp-"):
                try:
                    if now - os.path.getmtime(p) >= grace_seconds:
                        os.unlink(p)
                except FileNotFoundError:
                    pass
    removed = []
    pending_dirs: list[str] = []
    ddir = os.path.join(root, DATA_DIR)
    if os.path.isdir(ddir):
        for name in sorted(os.listdir(ddir)):
            rel = os.path.join(DATA_DIR, name)
            p = os.path.join(ddir, name)
            if not os.path.isdir(p):
                continue
            tomb = _tombstone_path(root, rel)
            if rel in referenced:
                # a dir tombstoned while staged but since committed must
                # not carry a stale clock into its eventual dereference
                if not dry_run:
                    try:
                        os.unlink(tomb)
                    except FileNotFoundError:
                        pass
                continue
            try:
                with open(tomb) as f:
                    dropped_at = float(f.read().strip() or "0")
            except FileNotFoundError:
                if not dry_run:
                    try:  # phase 1: start the grace clock at dereference
                        with open(tomb, "w") as f:
                            f.write(repr(now))
                    except FileNotFoundError:
                        continue  # dir vanished under a concurrent vacuum
                # dry run writes nothing but must CLASSIFY like the real
                # pass would after tombstoning at `now` (r11 review #2:
                # at grace 0 a real pass deletes in the same pass, so
                # the preview must report `removed`, not `pending`)
                dropped_at = now
            except (OSError, ValueError):
                dropped_at = now
            if now - dropped_at < grace_seconds:
                if dry_run:
                    pending_dirs.append(rel)
                continue
            if dry_run:
                removed.append(rel)
                continue
            shutil.rmtree(p, ignore_errors=True)
            removed.append(rel)
    # The file-granular sweep is an O(files-on-disk) recursive walk; a
    # per-trigger vacuum (streaming upsert, view refresh) must not pay
    # it on tables that never saw a replace commit — the cow_lineage
    # flag (set by replace, carried by append, reset by overwrite) says
    # whether an individually-superseded file can possibly exist inside
    # a still-referenced dir.
    pending_files: list[str] = []
    removed_files = (
        _sweep_replaced_files(
            root,
            referenced,
            referenced_files,
            grace_seconds,
            now,
            pending=pending_files,
            dry_run=dry_run,
        )
        if cow_lineage
        else []
    )
    out = {
        "dropped_versions": dropped,
        "removed_dirs": removed,
        "removed_files": removed_files,
    }
    if dry_run:
        out.update(
            {
                "dry_run": True,
                "pending_dirs": pending_dirs,
                "pending_files": pending_files,
            }
        )
    return out


def _sweep_replaced_files(
    root: str,
    referenced_dirs: set[str],
    referenced_files: set[str],
    grace_seconds: float,
    now: float,
    pending: list[str] | None = None,
    dry_run: bool = False,
) -> list[str]:
    """File-granular reclamation inside still-referenced dirs: a
    ``mode="replace"`` commit supersedes individual files whose stage
    dir lives on (its untouched siblings are still carried by
    reference), so dir-level vacuum alone would leak every rewritten
    file forever. Same two-phase discipline as the dir sweep — a
    sibling ``<file>.dropped-at`` marker starts the grace clock at the
    first pass that observes the file unreferenced; the file is deleted
    a full ``grace_seconds`` later, protecting readers that resolved a
    pre-replace manifest mid-scan."""
    removed: list[str] = []
    for d in sorted(referenced_dirs):
        if os.path.isabs(d):
            # an EXTERNAL dir referenced by a shallow clone
            # (clone_table): the bytes belong to the SOURCE table,
            # whose own manifests still reference them — a file the
            # clone's replace commit superseded is reclaimed by the
            # source's vacuum, never here. Walking it would compute
            # ../..-style rels that can never match the clone's
            # absolute references and DELETE SOURCE DATA.
            continue
        base = os.path.join(root, d)
        for dirpath, _dirnames, filenames in os.walk(base):
            for name in filenames:
                if name.startswith(("_", ".")) or not name.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, name), root)
                marker = os.path.join(root, rel + ".dropped-at")
                if rel in referenced_files:
                    if not dry_run:
                        try:
                            os.unlink(marker)
                        except FileNotFoundError:
                            pass
                    continue
                try:
                    with open(marker) as f:
                        dropped_at = float(f.read().strip() or "0")
                except FileNotFoundError:
                    if not dry_run:
                        try:
                            with open(marker, "w") as f:
                                f.write(repr(now))
                        except FileNotFoundError:
                            continue
                    # dry run: classify as the real pass would after
                    # tombstoning at `now` (grace 0 -> removed)
                    dropped_at = now
                except (OSError, ValueError):
                    dropped_at = now
                if now - dropped_at < grace_seconds:
                    if dry_run and pending is not None:
                        pending.append(rel)
                    continue
                if dry_run:
                    removed.append(rel)
                    continue
                for victim in (os.path.join(root, rel), marker):
                    try:
                        os.unlink(victim)
                    except FileNotFoundError:
                        pass
                removed.append(rel)
    return removed
