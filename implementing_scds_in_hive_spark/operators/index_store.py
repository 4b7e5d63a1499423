"""Durable on-disk lifecycle for the similarity/dedup index structures.

The MinHash corpus index (``operators/dedup.py:portable_minhash_index``)
and the IVF assignment (``operators/similarity.py:ivf_assign``) are the
two artifacts a 100 TB pipeline builds ONCE and probes for months, from
*different jobs*. This module turns the session-local DataFrames into
bucketed parquet tables plus a JSON sidecar, so a fresh process — whose
in-memory catalog is empty — can re-register and probe them without
rebuilding anything.

Physical layouts (the part that matters at scale):

* MinHash, two tables under one root:

  - ``{table}_docs``   = (did, sh, bb), bucketed+sorted by ``did``.
    The shingle-verification join pulls candidate docs from here; the
    bucketing means a sort-merge join against the (small) candidate set
    never shuffles the corpus side.
  - ``{table}_buckets`` = (bkey, band, bucket, did), bucketed+sorted by
    the single composite ``bkey = xxhash64(band, bucket)``. A delta
    batch touches at most ``|batch| x bands`` bkeys; probing filters
    this table with a LITERAL ``bkey IN (...)`` predicate, which Spark
    turns into bucket pruning (``SelectedBucketsCount`` in the scan) —
    the probe reads only the touched buckets' files, so per-delta cost
    is O(batch + touched buckets), not O(corpus scan).

* IVF, two tables under one root:

  - ``{table}_assign``    = (vec_id, embedding, centroid_id), bucketed+
    sorted by ``centroid_id``. ``ivf_topk(..., probe_prune=True)``
    pushes the probed centroid ids as a literal filter => bucket
    pruning: only the probed inverted lists are read.
  - ``{table}_centroids`` = the K centroid rows, plain parquet (tiny).

All tables are EXTERNAL (explicit ``LOCATION``): ``DROP TABLE`` removes
only catalog metadata, never the index files — which is also how the
round-trip tests simulate a fresh process (drop the entries, re-load
from the sidecar). The sidecar (``_index_meta.json``, underscore prefix
so parquet readers ignore it) records the schema DDL, bucketing spec and
index parameters; on a cluster it would live on the object store via the
Hadoop FS API — here plain local-file I/O, same contract.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = [
    "save_minhash_index",
    "load_minhash_index",
    "append_minhash_index",
    "incremental_minhash_pairs_stored",
    "save_winnow_index",
    "load_winnow_index",
    "append_winnow_index",
    "incremental_exact_substring_spans_stored",
    "save_ivf_index",
    "load_ivf_index",
    "append_ivf_index",
    "compact_index",
    "index_file_counts",
    "maintain_index",
    "ivf_index_stats",
]

_META_FILE = "_index_meta.json"


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)


def _save_external_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None,
) -> dict:
    # bucketed-write hygiene: bucketBy splits EVERY task's rows across
    # all its buckets, so writing from t upstream partitions sprays up
    # to t x n_buckets files and the probe pays per-file open/footer
    # cost (measured 3.7x slower probes at 50k docs). repartition on
    # the bucket columns uses the SAME murmur3-pmod hash as the bucket
    # assignment, so each task holds exactly one bucket -> one file per
    # bucket, with sortBy giving clusterd row-group stats inside it.
    # (At 100 TB an index bucket spanning multiple files is fine too —
    # raise n_buckets rather than splitting buckets across writers.)
    import uuid as _uuid

    df = df.repartition(n_buckets, *bucket_cols)
    # Write under a TEMP catalog name, then swap: the old drop-first
    # sequence removed the LIVE name for the whole multi-second (at
    # corpus scale: multi-minute) bucketed write, so a same-session
    # lock-free probe registering the tables mid-rebuild crashed with
    # TABLE_OR_VIEW_NOT_FOUND (r12 hunt, CONFIRMED by a rebuild-loop
    # repro). With the temp-name write the live entry vanishes only for
    # the DROP->RENAME pair (~ms), and _register_external_bucketed's
    # retry rides that window out. saveAsTable still cannot reuse the
    # live name directly — a stale entry at another location would
    # hijack the write path.
    spark = df.sparkSession
    tmp = f"{table}__stg{_uuid.uuid4().hex[:8]}"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").option("path", path).saveAsTable(tmp)
    try:
        # The DROP->RENAME pair is not atomic: a lock-free probe's
        # re-registration CREATE can land exactly between them (r13
        # review of this fresh r12 code), making the RENAME fail with
        # already-exists and spuriously aborting the whole rebuild.
        # Bounded retry: re-DROP whatever claimed the name (the probe's
        # entry points at the old committed path; its in-flight reads
        # keep working — external files stay) and rename again.
        for attempt in range(3):
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            try:
                spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
                break
            except Exception as e:
                exists = (
                    "TABLE_OR_VIEW_ALREADY_EXISTS" in str(e)
                    or "already exists" in str(e).lower()
                )
                if not exists or attempt == 2:
                    raise
    except Exception:
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")  # external: files stay
        raise
    return {
        "table": table,
        "path": path,
        "schema_ddl": _schema_ddl(df),
        "bucket_cols": bucket_cols,
        "n_buckets": n_buckets,
        "sort_cols": sort_cols or [],
    }


def _register_external_bucketed(spark: SparkSession, spec: dict) -> DataFrame:
    """(Re-)register an external bucketed table from its saved spec —
    the fresh-process path: bucketing lives in the catalog, not in the
    parquet footers, so it must be re-declared; Spark then recovers each
    file's bucket id from the filename written by ``bucketBy``.

    An existing catalog entry is trusted only if its LOCATION matches
    the spec: a compact_index that failed between staging and the
    sidecar commit leaves the in-process catalog pointing at the
    uncommitted generation (which the orphan sweep later deletes), so a
    mismatched entry is dropped and re-created at the committed path.

    Retries briefly on the catalog-swap window (r12): a same-session
    rebuild replaces the live entry via DROP -> RENAME (~ms); a
    lock-free probe landing exactly inside it sees a vanished table for
    one beat, not an error."""
    last_exc = None
    for _attempt in range(5):
        try:
            return _register_external_once(spark, spec)
        except Exception as e:  # AnalysisException: concurrent swap
            transient = (
                isinstance(e, AnalysisExistsRetry)
                or "TABLE_OR_VIEW_NOT_FOUND" in str(e)
                or "cannot be found" in str(e)
            )
            if not transient:
                raise
            last_exc = e
            time.sleep(0.2)
    raise last_exc


def _register_external_once(spark: SparkSession, spec: dict) -> DataFrame:
    if spark.catalog.tableExists(spec["table"]):
        loc = next(
            (
                r["data_type"]
                for r in spark.sql(
                    f"DESCRIBE FORMATTED {spec['table']}"
                ).collect()
                if r["col_name"] == "Location"
            ),
            None,
        )
        want = os.path.abspath(spec["path"]).rstrip("/")
        have = (loc or "").removeprefix("file:").rstrip("/")
        if have == want:
            return spark.table(spec["table"])
        spark.sql(f"DROP TABLE IF EXISTS {spec['table']}")  # external: files stay
    sorted_clause = (
        f" SORTED BY ({', '.join(spec['sort_cols'])})" if spec["sort_cols"] else ""
    )
    try:
        spark.sql(
            f"CREATE TABLE {spec['table']} ({spec['schema_ddl']}) USING parquet "
            f"CLUSTERED BY ({', '.join(spec['bucket_cols'])}){sorted_clause} "
            f"INTO {spec['n_buckets']} BUCKETS LOCATION '{spec['path']}'"
        )
    except Exception as e:
        # a concurrent rebuild's RENAME can land between our exists
        # check and the CREATE — treat "already exists" as the swap
        # window too and let the retry loop re-validate the location
        if "TABLE_OR_VIEW_ALREADY_EXISTS" not in str(e) and "already exists" not in str(e).lower():
            raise
        raise AnalysisExistsRetry(str(e))
    return spark.table(spec["table"])


class AnalysisExistsRetry(RuntimeError):
    """Internal: concurrent catalog swap detected mid-registration."""


def _write_meta(root: str, meta: dict) -> None:
    # temp+rename like _replace_meta_atomic: a torn sidecar from a
    # crash mid-write would leave the index unreadable (r11 review)
    os.makedirs(root, exist_ok=True)
    _replace_meta_atomic(root, meta)


def _stage_dir(root: str, name: str) -> str:
    """Destination dir for a table (re)build: the plain base on first
    build, a FRESH generation sibling when the base already holds data
    — a rebuild onto a LIVE index must stage-then-commit like
    compact_index, never overwrite in place (a crash mid-write would
    destroy old and new together; the superseded generation is swept
    by maintain_index after the meta commit dereferences it)."""
    import uuid

    base = os.path.join(root, name)
    if not os.path.exists(base):
        return base
    return f"{base}-g{uuid.uuid4().hex[:8]}"


def _read_meta(root: str) -> dict:
    with open(os.path.join(root, _META_FILE)) as f:
        return json.load(f)


_LOCK_FILE = "_maintenance.lock"
_LOCK_STALE_SECONDS = 600.0
_LOCK_HEARTBEAT_SECONDS = 30.0


def _read_lock_token(path: str) -> str | None:
    try:
        with open(path) as f:
            return f.read()
    except OSError:
        return None


def _break_confirm_seconds() -> float:
    # Sustained-staleness observation window before a rename-claim
    # (r13 ADVICE): long enough that a replaced/refreshed lock is seen
    # before renaming, short enough that breaking a genuinely dead lock
    # does not eat a waiter's whole acquire timeout. Derived at call
    # time so tests that shrink the heartbeat shrink the confirm too.
    return min(_LOCK_HEARTBEAT_SECONDS, _LOCK_STALE_SECONDS / 4.0, 2.0)


def _restore_lock(claim: str, path: str, *, patience: float = 10.0) -> bool:
    """Put a mistakenly-claimed LIVE lock back on its canonical name
    (r13 ADVICE): link-then-unlink, retrying on EEXIST — a waiter that
    acquired during the claim vacancy simply runs first, and the live
    lock returns to its name the moment that waiter releases. The claim
    is NEVER unlinked without a successful restore: an unrestorable
    live lock stays parked (and keeps heartbeating — the holder beats
    the inode, not the name) rather than being destroyed."""
    stop_at = time.monotonic() + patience
    while True:
        try:
            os.link(claim, path)
        except FileExistsError:
            if time.monotonic() > stop_at:
                return False  # leave the claim parked; holder sweeps it
            time.sleep(0.05)
            continue
        except OSError:
            return False  # claim vanished (holder's release swept it)
        try:
            os.unlink(claim)
        except OSError:
            pass
        return True


def _release_lock(path: str, token: str) -> None:
    """Rename-inspect release (r13 ADVICE): check-then-unlink was a
    TOCTOU — between token check and unlink a breaker plus new holder
    could replace the file, and the exiting holder would unlink the NEW
    holder's lock. Renaming to a private name first makes the check and
    the removal act on the same file: if the renamed file carries our
    token we discard it; if not, a replacement landed in the window and
    is restored via the EEXIST-safe link path."""
    import uuid as _uuid

    try:
        if _read_lock_token(path) == token:
            rel = f"{path}.rel-{_uuid.uuid4().hex[:8]}"
            try:
                os.rename(path, rel)
            except OSError:
                return  # broken + released under us — nothing to do
            if _read_lock_token(rel) == token:
                try:
                    os.unlink(rel)
                except OSError:
                    pass
            else:
                _restore_lock(rel, path)
            return
    except OSError:
        pass
    # Our lock is not at its name — it was broken, and may be parked
    # under a breaker's claim that could not be restored. Sweep only
    # files carrying OUR token; a competitor's claim/lock is untouched.
    base = os.path.basename(path)
    try:
        entries = os.listdir(os.path.dirname(path))
    except OSError:
        return
    for fn in entries:
        if fn.startswith(base + ".break-") or fn.startswith(base + ".rel-"):
            p = os.path.join(os.path.dirname(path), fn)
            try:
                if _read_lock_token(p) == token:
                    os.unlink(p)
            except OSError:
                pass


@contextmanager
def _index_lock(root: str, *, timeout: float = 30.0):
    """Advisory mutual exclusion between ``append_*`` and
    ``compact_index`` on one index root (r11 ADVICE: compaction's
    check-then-commit window — between the appended-parts re-listing
    and ``_replace_meta_atomic`` — can still silently drop an append
    that lands inside it; the pre-commit re-check narrows the window
    but cannot close it without serialization).

    O_CREAT|O_EXCL on a lock file: atomic on POSIX local filesystems
    (and on HDFS via create-no-overwrite semantics; object stores
    would use a conditional PUT). Liveness, not start time, decides
    staleness (r12 ADVICE): the holder writes a UNIQUE token into the
    lock and a daemon heartbeat refreshes the lock INODE's mtime (by
    fd, so the beat stays visible even while a breaker briefly parks
    the file under a claim name) every ``_LOCK_HEARTBEAT_SECONDS``
    while the work runs — a slow-but-alive multi-minute corpus-scale
    write never LOOKS stale, while a crashed holder stops heartbeating
    and is broken after ``_LOCK_STALE_SECONDS``.

    Breaking (r13 ADVICE hardening — the earlier mtime-only verdict
    could steal a FRESH lock re-created between stat and rename, and a
    failed link-restore then unlinked the live holder's lock):

    1. *Sustained observation*: the breaker records the stale lock's
       token + mtime, waits ``_break_confirm_seconds()``, and re-reads
       both — any change (heartbeat advanced the mtime, or a release +
       re-acquire swapped the token) aborts the break attempt.
    2. *Atomic rename-claim*: exactly one breaker wins the rename.
    3. *Token verdict on the claim*: the claim is discarded ONLY if it
       still carries the very token observed stale in step 1 AND its
       mtime is still past the horizon; anything else is a concurrently
       replaced or revived lock and is put back via ``_restore_lock`` —
       which retries on EEXIST and never unlinks what it cannot
       restore, so a live lock is never destroyed and at worst waits,
       parked but still heartbeating, for the vacancy-acquirer to
       finish.

    Release is rename-inspect (``_release_lock``): the token check and
    the removal act on the same renamed file, closing the residual
    check-then-unlink window. Writers hold the lock for the duration of
    the append / compaction; probes never take it (readers keep the old
    generation via the grace window instead)."""
    import threading
    import uuid as _uuid

    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, _LOCK_FILE)
    token = f"pid={os.getpid()} token={_uuid.uuid4().hex}\n"
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, token.encode())
            except OSError:
                os.close(fd)
                raise
            break  # fd stays open: the heartbeat beats the inode
        except FileExistsError:
            try:
                obs_token = _read_lock_token(path)
                obs_mtime = os.path.getmtime(path)
            except OSError:
                continue  # holder released between open and stat — retry
            age = time.time() - obs_mtime
            if obs_token is not None and age > _LOCK_STALE_SECONDS:
                # Step 1: sustained observation — confirm nothing moved.
                time.sleep(_break_confirm_seconds())
                try:
                    if (
                        _read_lock_token(path) != obs_token
                        or os.path.getmtime(path) != obs_mtime
                    ):
                        continue  # refreshed or replaced — not stale
                except OSError:
                    continue  # released meanwhile
                # Step 2: atomic rename-claim — one winner.
                claim = f"{path}.break-{_uuid.uuid4().hex[:8]}"
                try:
                    os.rename(path, claim)
                except OSError:
                    continue  # another breaker won, or holder released
                # Step 3: token verdict on the claimed file itself.
                try:
                    claim_live = (
                        _read_lock_token(claim) != obs_token
                        or time.time() - os.path.getmtime(claim)
                        <= _LOCK_STALE_SECONDS
                    )
                except OSError:
                    continue  # claim vanished (holder's sweep)
                if claim_live:
                    _restore_lock(claim, path)
                else:
                    os.unlink(claim)  # confirmed-stale lock discarded
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"index maintenance lock {path} held for {age:.0f}s "
                    f"(timeout {timeout}s) — another append/compact is "
                    f"running; retry, or remove the lock if its holder "
                    f"crashed"
                )
            time.sleep(0.05)
    stop = threading.Event()

    def _heartbeat() -> None:
        while not stop.wait(_LOCK_HEARTBEAT_SECONDS):
            try:
                os.utime(fd)  # inode-addressed: beats even while parked
            except OSError:
                try:
                    if _read_lock_token(path) == token:
                        os.utime(path, None)
                except OSError:
                    pass  # lock broken under us; release will notice

    hb = threading.Thread(target=_heartbeat, daemon=True, name="index-lock-heartbeat")
    hb.start()
    try:
        yield
    finally:
        stop.set()
        hb.join(timeout=5.0)
        try:
            os.close(fd)
        except OSError:
            pass
        _release_lock(path, token)


def save_minhash_index(
    index: DataFrame,
    table: str,
    root: str,
    *,
    n_buckets: int = 32,
    params: dict | None = None,
) -> dict:
    """Persist a ``portable_minhash_index`` DataFrame (did, sh, bb) as
    the two-table durable layout described in the module docstring.
    Returns the sidecar metadata. ``params`` should record the build
    parameters (n, num_perm, bands) so future deltas are built
    compatibly — they are stored in the sidecar verbatim.

    Serialized via the root's maintenance lock (r12 review): a REBUILD
    onto a live root replaces the whole index by design, but without
    the lock an append could land in the OLD generation between the
    rebuild's staging and its sidecar replace — returning success while
    its rows ride a dead generation straight into the orphan sweep
    (silent loss despite a successful append). Locked, appends either
    wholly precede the rebuild (replacement semantics — loudly the
    caller's contract) or follow it into the new generation."""
    with _index_lock(root, timeout=120.0):
        return _save_minhash_locked(
            index, table, root, n_buckets=n_buckets, params=params
        )


def _save_minhash_locked(
    index: DataFrame,
    table: str,
    root: str,
    *,
    n_buckets: int,
    params: dict | None,
) -> dict:
    if index.storageLevel == StorageLevel.NONE:
        # the index plan (shingling + num_perm permutation scans) is
        # referenced twice below (docs write, buckets derivation);
        # uncached it would execute end-to-end TWICE — the most
        # expensive pass of a corpus-scale build (r11 index review)
        index = index.localCheckpoint(eager=True)
    docs_spec = _save_external_bucketed(
        index,
        f"{table}_docs",
        _stage_dir(root, "docs"),
        ["did"],
        n_buckets,
        ["did"],
    )
    buckets = index.select("did", F.explode("bb").alias("bb")).select(
        _bkey_from("bb").alias("bkey"),
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        "did",
    )
    buckets_spec = _save_external_bucketed(
        buckets,
        f"{table}_buckets",
        _stage_dir(root, "buckets"),
        ["bkey"],
        n_buckets,
        ["bkey"],
    )
    meta = {
        "kind": "minhash",
        "docs": docs_spec,
        "buckets": buckets_spec,
        "params": params or {},
    }
    _write_meta(root, meta)
    return meta


def _bkey_from(struct_col: str) -> "F.Column":
    # single composite bucket key: bucket pruning applies to literal
    # predicates on a SINGLE bucket column, so (band, bucket) is folded
    # into one deterministic hash on both save and probe sides. A hash
    # collision only merges two LSH buckets — candidates are always
    # re-verified by exact Jaccard, so collisions cost recall nothing.
    return F.xxhash64(F.col(f"{struct_col}.band"), F.col(f"{struct_col}.bucket"))


def load_minhash_index(spark: SparkSession, root: str) -> tuple[DataFrame, DataFrame, dict]:
    """Load a saved MinHash index in (possibly) a fresh process:
    returns (docs, buckets, params). ``docs`` is drop-in compatible with
    ``incremental_minhash_pairs``'s ``corpus_index`` argument."""
    meta = _read_meta(root)
    if meta.get("kind") != "minhash":
        raise ValueError(f"{root} holds a {meta.get('kind')!r} index, not minhash")
    docs = _register_external_bucketed(spark, meta["docs"])
    buckets = _register_external_bucketed(spark, meta["buckets"])
    return docs, buckets, meta["params"]


def append_minhash_index(
    spark: SparkSession, root: str, new_index: DataFrame, *, crash_hook=None
) -> None:
    """Fold a new batch's index rows (from ``portable_minhash_index``,
    built with the SAME params the sidecar records) into the saved
    corpus index: append to both bucketed tables with the identical
    bucket spec, so future probes see the grown corpus without any
    rebuild. Each append adds one file per touched bucket — run
    ``sources/sinks.py:compact``-style maintenance when file counts
    matter, or size ``n_buckets`` for the append cadence. The caller is
    responsible for ``did`` uniqueness across appends (ids are the
    dedup identity)."""
    with _index_lock(root):
        _append_minhash_locked(spark, root, new_index, crash_hook=crash_hook)


def _append_minhash_locked(
    spark: SparkSession, root: str, new_index: DataFrame, *, crash_hook=None
) -> None:
    meta = _read_meta(root)
    if meta.get("kind") != "minhash":
        raise ValueError(f"{root} holds a {meta.get('kind')!r} index, not minhash")
    # make sure both tables are registered before appending by name
    _register_external_bucketed(spark, meta["docs"])
    _register_external_bucketed(spark, meta["buckets"])

    def _append(df: DataFrame, spec: dict) -> None:
        (
            df.repartition(spec["n_buckets"], *spec["bucket_cols"])
            .write.mode("append")
            .bucketBy(spec["n_buckets"], *spec["bucket_cols"])
            .sortBy(*spec["sort_cols"])
            .format("parquet")
            .option("path", spec["path"])
            .saveAsTable(spec["table"])
        )

    if new_index.storageLevel == StorageLevel.NONE:
        # referenced twice below; uncached it would execute twice
        new_index = new_index.localCheckpoint(eager=True)
    # BUCKETS FIRST, docs last (r11 index review): the docs table is
    # the replay sentinel — dedup_stream's guard skips the append when
    # the batch's dids are already in docs. Appending docs first left a
    # crash window where docs committed without buckets, and the replay
    # guard then skipped the batch forever: its bucket rows never
    # written, the documents permanently invisible to candidate
    # generation. The reverse order's crash window (buckets committed,
    # docs not) replays into DUPLICATE bucket rows, which candidate
    # generation already absorbs (.distinct() before the verify join).
    _append(
        new_index.select("did", F.explode("bb").alias("bb")).select(
            _bkey_from("bb").alias("bkey"),
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
            "did",
        ),
        meta["buckets"],
    )
    if crash_hook:
        crash_hook("post_buckets")  # the replay-window fault injection
    _append(new_index.select("did", "sh", "bb"), meta["docs"])
    # The write above runs on new_index's OWN session and invalidates
    # only that session's table-relation cache. Under foreachBatch the
    # batch DataFrame lives in a per-trigger CLONED session, so without
    # an explicit refresh the caller's session (and every later clone
    # seeded from it) keeps serving the pre-append file list — probes
    # silently miss everything ever appended. Refresh on the session
    # the caller probes with.
    spark.catalog.refreshTable(meta["docs"]["table"])
    spark.catalog.refreshTable(meta["buckets"]["table"])


def incremental_minhash_pairs_stored(
    spark: SparkSession,
    root: str,
    new_index: DataFrame,
    *,
    threshold: float = 0.8,
    prune_threshold: int = 256,
    index: tuple[DataFrame, DataFrame, dict] | None = None,
) -> DataFrame:
    """Near-dup pairs between a SAVED corpus index and a new batch's
    index (from ``portable_minhash_index``). Candidate generation joins
    the bucketed ``_buckets`` table against the broadcast delta burst;
    candidate doc ids are then verified with exact Jaccard against the
    ``_docs`` table, whose did-bucketing keeps the corpus side of that
    join exchange-free. Semantics identical to
    ``incremental_minhash_pairs`` on the in-memory index
    (tests/test_index_store.py).

    When the delta's touched-bkey set is small (≤ ``prune_threshold``),
    it is additionally pushed as a literal IN filter on the bucket
    column => Spark prunes untouched buckets (and, with the sorted
    one-file-per-bucket layout, row groups) at the scan — the
    tiny-delta regime where the probe reads O(touched buckets) of a
    100 TB index. For larger deltas the filter is skipped: measured at
    50k docs / 500-doc delta, a 4 000-literal IN costs ~5 s of
    planning/codegen while pruning nothing (the delta already touches
    every bucket), vs 0.7 s for the bare broadcast join."""
    # callers probing repeatedly within one unit of work (the dedup
    # stream's trigger loop) pass the already-loaded index via
    # ``index=`` to avoid re-reading meta and re-registering the
    # bucketed tables per call (r11 streaming review)
    docs, buckets, _ = index if index is not None else load_minhash_index(spark, root)
    if new_index.storageLevel == StorageLevel.NONE:
        # same re-inline trap as incremental_minhash_pairs: the batch is
        # referenced three times; GC-cleaned checkpoint, nothing pinned
        new_index = new_index.localCheckpoint(eager=True)

    delta_burst = new_index.select(
        F.col("did").alias("id_b"), F.explode("bb").alias("bb")
    ).select(_bkey_from("bb").alias("bkey"), "bb.band", "bb.bucket", "id_b")
    # O(|batch| x bands) driver-side — the price of knowing whether a
    # literal pruning predicate is worth planning at all
    touched = [r["bkey"] for r in delta_burst.select("bkey").distinct().collect()]
    if len(touched) <= prune_threshold:
        buckets = buckets.where(F.col("bkey").isin(touched))

    cand = (
        buckets.join(F.broadcast(delta_burst), ["bkey", "band", "bucket"])
        # a batch re-ingesting a stored doc id would emit the
        # degenerate self-pair (X, X, 1.0) — see
        # dedup.incremental_minhash_pairs (r11 review)
        .where(F.col("did") != F.col("id_b"))
        .select(F.col("did").alias("id_a"), "id_b")
        .distinct()
    )
    sh_a = docs.select(F.col("did").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = new_index.select(F.col("did").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(F.broadcast(sh_b), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def build_ivf_index(
    corpus: DataFrame,
    table: str,
    root: str,
    *,
    k: int = 256,
    n_iter: int = 3,
    n_buckets: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "ivf0",
) -> dict:
    """One-call IVF index construction + durable save: deterministic
    content-addressed sample of ``k`` seed vectors, ``n_iter`` rounds of
    Lloyd refinement (one corpus pass each), final assignment (one more
    pass), then :func:`save_ivf_index` bucketed by centroid id. Returns
    the sidecar metadata; probe with ``load_ivf_index`` +
    ``ivf_topk(..., probe_prune=True)``.

    Seeding: rank by ``xxhash64(salt, id)`` and take the first ``k`` —
    reproducible across runs/partitionings without a Date/RNG
    dependency, and well-spread for any non-adversarial id space. A
    TakeOrderedAndProject top-k, not a global sort."""
    from implementing_scds_in_hive_spark.operators.similarity import (
        ivf_assign,
        kmeans_refine,
    )

    seeds = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.lit(salt), F.col(id_col)), F.col(id_col))
        .limit(k)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
    )
    centroids = kmeans_refine(
        corpus, seeds, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    return save_ivf_index(
        assigned, centroids, table, root, n_buckets=n_buckets
    )


def save_ivf_index(
    assigned: DataFrame,
    centroids: DataFrame,
    table: str,
    root: str,
    *,
    n_buckets: int = 32,
    centroid_id_col: str = "centroid_id",
) -> dict:
    """Persist an IVF index: ``assigned`` from ``ivf_assign`` (vec_id,
    embedding, centroid_id) bucketed+sorted by centroid id — the on-disk
    form of the inverted lists — plus the K centroid rows. Returns the
    sidecar metadata. Serialized via the root's maintenance lock for
    the same rebuild-vs-append reason as ``save_minhash_index``."""
    with _index_lock(root, timeout=120.0):
        return _save_ivf_locked(
            assigned, centroids, table, root,
            n_buckets=n_buckets, centroid_id_col=centroid_id_col,
        )


def _save_ivf_locked(
    assigned: DataFrame,
    centroids: DataFrame,
    table: str,
    root: str,
    *,
    n_buckets: int,
    centroid_id_col: str,
) -> dict:
    assign_spec = _save_external_bucketed(
        assigned,
        f"{table}_assign",
        _stage_dir(root, "assign"),
        [centroid_id_col],
        n_buckets,
        [centroid_id_col],
    )
    cpath = _stage_dir(root, "centroids")
    centroids.write.mode("overwrite").parquet(cpath)
    meta = {
        "kind": "ivf",
        "assign": assign_spec,
        "centroids_path": cpath,
        "centroid_id_col": centroid_id_col,
        "centroids_schema_ddl": _schema_ddl(centroids),
    }
    _write_meta(root, meta)
    return meta


def append_ivf_index(spark: SparkSession, root: str, new_vectors: DataFrame) -> None:
    """Fold new vectors into a saved IVF index: assign them to the
    EXISTING centroids (one broadcast pass over the batch only) and
    append to the bucketed assignment table. Centroids are left as
    built — the standard IVF maintenance trade: inserts are cheap and
    probes stay correct, while centroid drift accumulates until the
    owner rebuilds (``build_ivf_index``) on their re-train cadence.
    ``new_vectors`` must carry the index's (id, vector) columns; ids
    are the caller's responsibility to keep unique.

    Serialized against ``compact_index`` via the root's maintenance
    lock (r11 ADVICE)."""
    with _index_lock(root):
        _append_ivf_locked(spark, root, new_vectors)


def _append_ivf_locked(
    spark: SparkSession, root: str, new_vectors: DataFrame
) -> None:
    from implementing_scds_in_hive_spark.operators.similarity import ivf_assign

    meta = _read_meta(root)
    if meta.get("kind") != "ivf":
        raise ValueError(f"{root} holds a {meta.get('kind')!r} index, not ivf")
    spec = meta["assign"]
    _register_external_bucketed(spark, spec)
    centroids = spark.read.parquet(meta["centroids_path"])
    id_col, vec_col = [
        c for c in spark.table(spec["table"]).columns if c != meta["centroid_id_col"]
    ]
    assigned = ivf_assign(
        new_vectors,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        centroid_id_col=meta["centroid_id_col"],
    ).select(*spark.table(spec["table"]).columns)
    (
        assigned.repartition(spec["n_buckets"], *spec["bucket_cols"])
        .write.mode("append")
        .bucketBy(spec["n_buckets"], *spec["bucket_cols"])
        .sortBy(*spec["sort_cols"])
        .format("parquet")
        .option("path", spec["path"])
        .saveAsTable(spec["table"])
    )
    # same cloned-session cache hazard as append_minhash_index: refresh
    # the caller's session or later probes read the pre-append file list
    spark.catalog.refreshTable(spec["table"])


def load_ivf_index(spark: SparkSession, root: str) -> tuple[DataFrame, DataFrame]:
    """Load a saved IVF index in (possibly) a fresh process: returns
    (assigned, centroids). Feed both straight into ``ivf_topk`` — the
    ``centroid_id`` column on ``assigned`` makes it skip the build, and
    ``probe_prune=True`` exploits the bucketed layout."""
    meta = _read_meta(root)
    if meta.get("kind") != "ivf":
        raise ValueError(f"{root} holds a {meta.get('kind')!r} index, not ivf")
    assigned = _register_external_bucketed(spark, meta["assign"])
    centroids = spark.read.parquet(meta["centroids_path"])
    return assigned, centroids


def _index_specs(meta: dict) -> list[dict]:
    kind = meta.get("kind")
    if kind == "minhash":
        return [meta["docs"], meta["buckets"]]
    if kind == "winnow":
        return [meta["docs"], meta["fps"]]
    return [meta["assign"]]


def _replace_meta_atomic(root: str, meta: dict) -> None:
    """Commit a sidecar update with the same temp+rename discipline as
    the snapshot protocol (sources/snapshot.py): readers resolve either
    the whole old meta or the whole new one, never a torn file."""
    tmp = os.path.join(root, f".{_META_FILE}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _META_FILE))


def _sweep_orphan_generations(
    root: str, meta: dict, *, grace_seconds: float = 600.0
) -> list[str]:
    """Remove compaction generation dirs (``<name>-g<hex>``) that no
    spec in the committed sidecar references — the leftovers of a crash
    between staging and meta commit (stale new dir) or between meta
    commit and cleanup (stale old dir). ``grace_seconds`` protects a
    CONCURRENT compaction's freshly staged generation (referenced by
    nothing until its sidecar commit) from the sweep — the same
    discipline as ``sources/snapshot.py:vacuum``."""
    import shutil
    import time

    referenced = {os.path.basename(s["path"]) for s in _index_specs(meta)}
    if meta.get("centroids_path"):
        # the IVF centroids dir is not a bucketed spec but rebuilds
        # stage it generationally too (r11 review) — sweep its
        # superseded generations, protect the referenced one
        referenced.add(os.path.basename(meta["centroids_path"]))
    families = {re.sub(r"-g[0-9a-f]{8}$", "", r) for r in referenced}
    removed = []
    now = time.time()
    for name in os.listdir(root):
        p = os.path.join(root, name)
        if not os.path.isdir(p) or name in referenced:
            continue
        if now - os.path.getmtime(p) < grace_seconds:
            continue
        # same family = same name modulo the generation suffix; covers
        # both a stale staged generation (crash pre-commit) and the
        # original un-suffixed dir (crash post-commit, pre-cleanup)
        if re.sub(r"-g[0-9a-f]{8}$", "", name) in families:
            shutil.rmtree(p, ignore_errors=True)
            removed.append(name)
    return removed


def index_file_counts(root: str) -> dict[str, int]:
    """Data files per index table — the growth signal every ``append_*``
    feeds (one new file per touched bucket per batch)."""
    meta = _read_meta(root)
    return {
        s["table"]: len(
            [f for f in os.listdir(s["path"]) if f.startswith("part-")]
        )
        for s in _index_specs(meta)
    }


def compact_index(spark: SparkSession, root: str, *, crash_hook=None) -> dict[str, int]:
    """Rewrite an index's bucketed tables back to one file per bucket.

    Every ``append_*`` adds one file per touched bucket, so a
    long-running ingest accumulates per-bucket file counts and probes
    pay growing open/footer overhead — the same small-file problem as
    any streaming sink (``sources/sinks.py:compact``), but for bucketed
    tables the rewrite must preserve the bucket spec, so the generic
    path-based compactor does not apply.

    Crash-safe by the same stage-then-commit discipline as the snapshot
    protocol: rows stream from the CURRENT files into a fresh generation
    dir (``<path>-g<hex>`` — no self-overwrite, no whole-index
    materialization on the driver), then ONE atomic sidecar replace
    points every spec at its new generation. The superseded generation
    dirs are left for ``_sweep_orphan_generations`` to reclaim after its
    grace window (their mtime is touched at dereference so the clock
    starts here, not at last append) — a prober mid-scan of the old
    generation keeps working, the same discipline as the snapshot
    vacuum. A crash before the meta commit leaves the old index fully
    intact; after it, the new one — either way the orphaned generation
    is swept by the next maintenance run. ``crash_hook(phase)`` (phases
    ``"post_stage"``, ``"post_meta"``) injects faults exactly there for
    the recovery tests. Returns {table: files_before}.

    Serialized against ``append_*`` via the root's maintenance lock
    (r11 ADVICE): the pre-commit appended-parts re-check narrows the
    check-then-commit window but cannot close it — an append landing
    between the re-listing and the sidecar replace would still be
    silently dropped from the new generation. With the lock held for
    the whole stage+commit, that interleaving cannot happen; the
    re-check stays as defense-in-depth against lock-breaking (stale
    holder) and out-of-band writers."""
    with _index_lock(root, timeout=120.0):
        return _compact_index_locked(spark, root, crash_hook=crash_hook)


def _compact_index_locked(
    spark: SparkSession, root: str, *, crash_hook=None
) -> dict[str, int]:
    import uuid

    meta = _read_meta(root)
    specs = _index_specs(meta)
    orig_specs = [dict(sp) for sp in specs]

    def _restore_catalog() -> None:
        # Abort repair (r11 ADVICE): the staging loop dropped and
        # re-created each catalog table at its STAGED path, and the
        # abort rmtree's those dirs — leaving same-session probes
        # broken until _register_external_bucketed's location check
        # happens to repair them. Re-register at the old committed
        # paths BEFORE raising so the session stays usable.
        for orig in orig_specs:
            try:
                spark.sql(f"DROP TABLE IF EXISTS {orig['table']}")
                _register_external_bucketed(spark, orig)
            except Exception:
                pass  # repair is best-effort; the raise below carries the cause

    counts: dict[str, int] = {}
    old_paths: list[str] = []
    seen_parts: dict[str, set] = {}
    new_paths: list[str] = []
    for spec in specs:
        parts = {
            f for f in os.listdir(spec["path"]) if f.startswith("part-")
        }
        seen_parts[spec["path"]] = parts
        counts[spec["table"]] = len(parts)
        # read the files directly (bypass the catalog): the lazy plan
        # keeps reading the old generation while the new one is written
        rows = spark.read.parquet(spec["path"])
        base = re.sub(r"-g[0-9a-f]{8}$", "", spec["path"])
        new_path = f"{base}-g{uuid.uuid4().hex[:8]}"
        # No up-front DROP of the live name (r12 ADVICE): the entry
        # stays registered at the OLD committed path for the whole
        # multi-second staged rewrite — lock-free probes keep reading
        # the old generation — and _save_external_bucketed's temp-name
        # write + DROP->RENAME swap replaces it in a ~ms window at the
        # end, same as the rebuild path.
        new_spec = _save_external_bucketed(
            rows,
            spec["table"],
            new_path,
            spec["bucket_cols"],
            spec["n_buckets"],
            spec["sort_cols"] or None,
        )
        old_paths.append(spec["path"])
        new_paths.append(new_path)
        spec.update(new_spec)
        spark.catalog.refreshTable(spec["table"])
    if crash_hook:
        crash_hook("post_stage")
    # Pre-commit validation (r11 index review), mirroring the snapshot
    # protocol's own pre-link re-checks:
    # (a) rows appended to an OLD generation after our file listing
    #     would be silently dropped from the new generation and later
    #     reclaimed with it — abort and leave the old index current;
    # (b) a slow compaction can outlive the sweep grace window, letting
    #     a concurrent maintain_index reclaim the still-unreferenced
    #     staged dirs — committing meta pointing at deleted dirs would
    #     destroy the index.
    appended = {
        p: sorted(
            {f for f in os.listdir(p) if f.startswith("part-")}
            - seen_parts[p]
        )
        for p in old_paths
        if os.path.isdir(p)
    }
    appended = {p: fs for p, fs in appended.items() if fs}
    if appended:
        for p in new_paths:
            shutil.rmtree(p, ignore_errors=True)
        _restore_catalog()
        raise RuntimeError(
            f"concurrent append landed during compaction "
            f"({ {p: len(fs) for p, fs in appended.items()} } new part "
            f"files) — the staged generation would lose those rows; "
            f"staged dirs removed, old index left current. Re-run "
            f"compaction (or serialize it with the append cadence)."
        )
    missing = [p for p in new_paths if not os.path.isdir(p)]
    if missing:
        _restore_catalog()
        raise RuntimeError(
            f"staged generation dirs {missing} were reclaimed by a "
            f"concurrent orphan sweep before the meta commit (staging "
            f"outlived the sweep grace window) — old index left "
            f"current; raise sweep_grace_seconds or serialize "
            f"maintenance"
        )
    # Old generations are NOT removed inline: a concurrent prober that
    # resolved its plan against the pre-compaction generation gets the
    # same grace window the snapshot vacuum gives dereferenced versions.
    # Touch restarts the mtime clock at dereference time so
    # _sweep_orphan_generations reclaims them only grace_seconds later —
    # and the touch happens BEFORE the meta commit (harmless while the
    # dirs are still referenced), so neither a crash right after the
    # commit nor a sweep racing the gap between commit and touch can
    # see an unreferenced dir with a stale clock and reclaim it with
    # zero grace.
    for p in old_paths:
        try:
            os.utime(p, None)
        except FileNotFoundError:
            pass
    _replace_meta_atomic(root, meta)
    if crash_hook:
        crash_hook("post_meta")
    return counts


def maintain_index(
    spark: SparkSession,
    root: str,
    *,
    max_files_per_bucket: float = 8.0,
    min_mean_cos: float | None = None,
    max_list_skew: float | None = None,
    sweep_grace_seconds: float = 600.0,
) -> dict:
    """The maintenance policy loop a long-running ingest needs, in one
    idempotent call: sweep crash orphans, compact when append growth
    crosses ``max_files_per_bucket`` (mean data files per bucket), and —
    for IVF indexes with a drift/skew policy set — compute
    :func:`ivf_index_stats` and FLAG a rebuild (``build_ivf_index`` is
    the owner's call on their re-train cadence; maintenance never moves
    centroids behind a prober's back). Returns the decision record::

        {"swept": [...], "files_per_bucket": {table: float},
         "compacted": bool, "files_before": {..} | None,
         "stats": {..} | None, "rebuild_recommended": bool,
         "reasons": [..]}
    """
    meta = _read_meta(root)
    swept = _sweep_orphan_generations(root, meta, grace_seconds=sweep_grace_seconds)
    counts = index_file_counts(root)
    per_bucket = {
        s["table"]: counts[s["table"]] / max(1, s["n_buckets"])
        for s in _index_specs(meta)
    }
    report: dict = {
        "swept": swept,
        "files_per_bucket": per_bucket,
        "compacted": False,
        "files_before": None,
        "stats": None,
        "rebuild_recommended": False,
        "reasons": [],
    }
    if any(v > max_files_per_bucket for v in per_bucket.values()):
        report["files_before"] = compact_index(spark, root)
        report["compacted"] = True
        report["reasons"].append(
            f"files_per_bucket {max(per_bucket.values()):.1f} > {max_files_per_bucket}"
        )
    if meta.get("kind") == "ivf" and (
        min_mean_cos is not None or max_list_skew is not None
    ):
        stats = ivf_index_stats(spark, root)
        report["stats"] = stats
        if min_mean_cos is not None and stats["mean_cos"] is not None and (
            stats["mean_cos"] < min_mean_cos
        ):
            report["rebuild_recommended"] = True
            report["reasons"].append(
                f"mean_cos {stats['mean_cos']:.4f} < {min_mean_cos}"
            )
        if max_list_skew is not None and stats["median_list"]:
            skew = stats["max_list"] / stats["median_list"]
            if skew > max_list_skew:
                report["rebuild_recommended"] = True
                report["reasons"].append(
                    f"list skew {skew:.1f} > {max_list_skew}"
                )
    return report


def ivf_index_stats(spark: SparkSession, root: str) -> dict:
    """Health metrics that drive the rebuild decision for an appended
    IVF index: inverted-list size distribution (append skew — new
    vectors pile onto whichever centroids fit them best) and the mean
    cosine of each vector to its centroid (drift — falls as appended
    data diverges from the build-time distribution). One aggregation
    pass over the assignment table; compare ``mean_cos`` across
    maintenance runs and rebuild (``build_ivf_index``) when it sags or
    ``max/median`` list skew starts starving ``nprobe`` probes."""
    from implementing_scds_in_hive_spark.functions.vectors import norm

    meta = _read_meta(root)
    if meta.get("kind") != "ivf":
        raise ValueError(f"{root} holds a {meta.get('kind')!r} index, not ivf")
    assigned, centroids = load_ivf_index(spark, root)
    cid = meta["centroid_id_col"]
    id_col, vec_col = [c for c in assigned.columns if c != cid]
    c = F.broadcast(
        centroids.select(
            F.col(cid), F.col(vec_col).alias("__cv"), norm(F.col(vec_col)).alias("__cn")
        )
    )
    from implementing_scds_in_hive_spark.functions.vectors import dot

    per_list = (
        assigned.join(c, cid)
        .select(
            cid,
            (
                dot(F.col(vec_col), F.col("__cv"))
                / (norm(F.col(vec_col)) * F.col("__cn"))
            ).alias("__cos"),
        )
        .groupBy(cid)
        .agg(F.count(F.lit(1)).alias("n"), F.avg("__cos").alias("mean_cos"))
    )
    row = per_list.agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.sum("n").alias("n_vectors"),
        F.min("n").alias("min_list"),
        F.expr("percentile(n, 0.5)").alias("median_list"),
        F.max("n").alias("max_list"),
        F.avg("mean_cos").alias("mean_cos"),
    ).first()
    return {k: (float(v) if v is not None else None) for k, v in row.asDict().items()}


# --- durable winnow-span index (r14: exact-substring tier, stored) --------

def save_winnow_index(
    index: DataFrame,
    table: str,
    root: str,
    *,
    n_buckets: int = 32,
    params: dict | None = None,
) -> dict:
    """Persist a ``winnow_span_index`` DataFrame (did, ws, fps) as the
    exact-substring tier's durable two-table layout: ``<table>_docs``
    (did, ws) bucketed by did — the verification side, co-located so the
    candidate-id join never shuffles the corpus — and ``<table>_fps``
    (fp, did) bucketed by fp — the candidate side, probe-prunable by
    literal fingerprint sets. ``params`` should record (min_len, k) so
    delta batches are built compatibly (the probe ENFORCES it).
    Serialized via the root's maintenance lock like the minhash save."""
    with _index_lock(root, timeout=120.0):
        return _save_winnow_locked(
            index, table, root, n_buckets=n_buckets, params=params
        )


def _save_winnow_locked(
    index: DataFrame,
    table: str,
    root: str,
    *,
    n_buckets: int,
    params: dict | None,
) -> dict:
    if index.storageLevel == StorageLevel.NONE:
        # the index plan (tokenize + winnow tower) feeds both tables;
        # uncached it would execute twice — and the fps derivation
        # explodes from the tower, the measured ~90x Generate trap
        index = index.localCheckpoint(eager=True)
    docs_spec = _save_external_bucketed(
        index.select("did", "ws"),
        f"{table}_docs",
        _stage_dir(root, "docs"),
        ["did"],
        n_buckets,
        ["did"],
    )
    fps = index.select("did", F.explode("fps").alias("fp")).select("fp", "did")
    fps_spec = _save_external_bucketed(
        fps,
        f"{table}_fps",
        _stage_dir(root, "fps"),
        ["fp"],
        n_buckets,
        ["fp"],
    )
    meta = {
        "kind": "winnow",
        "docs": docs_spec,
        "fps": fps_spec,
        "params": params or {},
    }
    _write_meta(root, meta)
    _sweep_orphan_generations(root, meta)
    return meta


def load_winnow_index(
    spark: SparkSession, root: str
) -> tuple[DataFrame, DataFrame, dict]:
    meta = _read_meta(root)
    if meta.get("kind") != "winnow":
        raise ValueError(f"{root} holds a {meta.get('kind')!r} index, not winnow")
    docs = _register_external_bucketed(spark, meta["docs"])
    fps = _register_external_bucketed(spark, meta["fps"])
    return docs, fps, meta["params"]


def append_winnow_index(
    spark: SparkSession, root: str, new_index: DataFrame, *, crash_hook=None
) -> None:
    """Fold a delta batch's ``winnow_span_index`` rows into the saved
    index. FPS FIRST, docs last (the minhash append's replay-sentinel
    order): the docs table is the replay guard's witness, so a crash
    between the two appends must leave the batch look un-appended
    (duplicate fp rows on replay are absorbed by the candidate
    distinct), never half-visible. ``did`` uniqueness across appends is
    the caller's contract."""
    with _index_lock(root):
        meta = _read_meta(root)
        if meta.get("kind") != "winnow":
            raise ValueError(
                f"{root} holds a {meta.get('kind')!r} index, not winnow"
            )
        _register_external_bucketed(spark, meta["docs"])
        _register_external_bucketed(spark, meta["fps"])
        if new_index.storageLevel == StorageLevel.NONE:
            new_index = new_index.localCheckpoint(eager=True)

        def _append(df: DataFrame, spec: dict) -> None:
            (
                df.repartition(spec["n_buckets"], *spec["bucket_cols"])
                .write.mode("append")
                .bucketBy(spec["n_buckets"], *spec["bucket_cols"])
                .sortBy(*spec["sort_cols"])
                .format("parquet")
                .option("path", spec["path"])
                .saveAsTable(spec["table"])
            )

        _append(
            new_index.select("did", F.explode("fps").alias("fp")).select("fp", "did"),
            meta["fps"],
        )
        if crash_hook:
            crash_hook("post_fps")
        _append(new_index.select("did", "ws"), meta["docs"])
        # foreachBatch clone-session cache trap (see append_minhash_index)
        spark.catalog.refreshTable(meta["docs"]["table"])
        spark.catalog.refreshTable(meta["fps"]["table"])


def incremental_exact_substring_spans_stored(
    spark: SparkSession,
    root: str,
    delta_index: DataFrame,
    *,
    prune_threshold: int = 256,
    index: tuple[DataFrame, DataFrame, dict] | None = None,
) -> DataFrame:
    """Cross-side exact-substring spans between a SAVED winnow index and
    a delta batch's ``winnow_span_index`` (built with the sidecar's
    (min_len, k) — enforced): candidate pairs from the fingerprint
    equi-join (delta side broadcast; small touched-fp sets additionally
    pushed as a literal IN so the fp-bucketed scan prunes), then the
    shared diagonal-run verification with corpus grams derived from the
    did-bucketed ``_docs`` table — the corpus is never re-tokenized from
    raw text and never shuffles on the verification join. Returns
    ``(id_a=stored doc, id_b=delta doc, start_a, start_b, span_len)``.
    Intra-delta spans are the batch operator's job
    (``exact_substring_spans`` on the delta alone)."""
    from implementing_scds_in_hive_spark.operators.dedup import (
        _diagonal_spans,
        _grams_from_tokens,
    )

    docs, fps, params = index if index is not None else load_winnow_index(spark, root)
    min_len, k = params.get("min_len"), params.get("k")
    if min_len is None or k is None:
        raise ValueError(
            f"winnow index at {root} lacks (min_len, k) params — rebuild "
            f"with save_winnow_index(params={{'min_len': ..., 'k': ...}})"
        )
    if delta_index.storageLevel == StorageLevel.NONE:
        # referenced three times (burst, grams, verification) — the
        # incremental_minhash_pairs re-inline lesson
        delta_index = delta_index.localCheckpoint(eager=True)

    burst = delta_index.select(
        F.col("did").alias("id_b"), F.explode("fps").alias("fp")
    )
    touched = [r["fp"] for r in burst.select("fp").distinct().collect()]
    if len(touched) <= prune_threshold:
        fps = fps.where(F.col("fp").isin(touched))
    cand = (
        fps.join(F.broadcast(burst), "fp")
        .where(F.col("did") != F.col("id_b"))  # re-ingested id: no self-pair
        .select(F.col("did").alias("id_a"), "id_b")
        .distinct()
    ).localCheckpoint(eager=True)

    corpus_grams = _grams_from_tokens(
        docs.join(
            cand.select(F.col("id_a").alias("did")).distinct(), "did", "left_semi"
        ),
        k,
    )
    delta_grams = _grams_from_tokens(
        delta_index.select("did", "ws").join(
            cand.select(F.col("id_b").alias("did")).distinct(), "did", "left_semi"
        ),
        k,
    ).localCheckpoint(eager=True)
    return _diagonal_spans(cand, corpus_grams, delta_grams, min_len=min_len, k=k)
