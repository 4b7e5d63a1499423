"""Randomized multi-writer concurrency harness for the snapshot commit
protocol (VERDICT r11 next-round #1).

The last two rounds' worst protocol bugs were stage/commit-window races
found by reading (_check_staged_physical prefix validation, _diff_sides
pinned-schema resolution, the compact CAS) — each got a targeted
regression test, but nothing was hunting the NEXT interleaving. This
harness interleaves the protocol's verbs — append, copy-on-write
replace, merge-on-read delete-vector commits, RENAME COLUMN,
DROP+ADD COLUMN, shallow clone, vectors-only consolidation, vacuum —
from several threads against ONE table, with every writer recording the
version its commit won, then replays the op log versionwise through a
pure-Python model and asserts the linearizable invariants:

* CAS monotonicity — the committed chain is contiguous 1..N and every
  version maps to EXACTLY ONE recorded winner (no phantom or lost
  commits);
* no resurrection / no lost rows — every retained version's full
  contents (values, not just keys) equal the model state after
  replaying ops 1..v, so a deleted row reappearing, an appended row
  vanishing, or a dropped column's bytes resurfacing under a re-added
  name all fail the exact compare;
* no silent NULL column — appended rows carry per-op-unique values, so
  a column silently NULL-backfilled (the r10 DROP+ADD race) or served
  from stale bytes differs from the model;
* losers leave no trace — ops that aborted (CommitConflictError /
  ValueError from the stage-window guards) contribute nothing;
* vacuum never breaks a referenced version — concurrent vacuums run
  with a real grace window, and a final quiesced grace=0 vacuum must
  leave every retained version fully readable.

Interleaving is driven by per-thread seeded RNGs (bounded seeds, so a
failure replays deterministically up to OS scheduling; the model check
is interleaving-agnostic either way). The deterministic companions at
the bottom pin the exact r10 ADVICE races: a DROP+ADD landing inside
another writer's stage->commit window, and the RENAME variant.
"""

from __future__ import annotations

import random
import threading

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.sources.snapshot import (
    CommitConflictError,
    clone_table,
    commit,
    drop_column_commit,
    evolve_schema_commit,
    fold_prior_vectors,
    latest_version,
    list_versions,
    load_manifest,
    read_snapshot,
    read_table,
    rename_column_commit,
    restore_commit,
    stage_files,
    vacuum,
    write_snapshot,
)
from implementing_scds_in_hive_spark.sources.sinks import consolidate_vectors

# errors a racing writer may legitimately see: CAS losses and the loud
# stage-window aborts (schema drift between stage and commit)
_EXPECTED = (CommitConflictError, ValueError, FileNotFoundError)


def _mk_rows(spark, keys, cols, opseq):
    """One row per key with per-op-unique values: payload 'p{k}-{opseq}'
    and extra k*1000+opseq, so any resurrection of stale bytes differs
    from both the model and a NULL backfill."""
    data = []
    for k in keys:
        row = {"k": k}
        if "payload" in cols:
            row["payload"] = f"p{k}-{opseq}"
        if "payload2" in cols:
            row["payload2"] = f"p{k}-{opseq}"
        if "extra" in cols:
            row["extra"] = k * 1000 + opseq
        data.append(tuple(row[c] for c in cols))
    schema = ", ".join(
        f"{c} {'long' if c in ('k', 'extra') else 'string'}" for c in cols
    )
    return spark.createDataFrame(data, schema).coalesce(1)


class _Worker:
    """One writer thread: runs ``n_ops`` randomly chosen verbs, records
    (version, kind, data) for every commit that WON, nothing for ops
    that aborted."""

    def __init__(self, spark, root, tid, seed, n_ops, log, errors):
        self.spark, self.root, self.tid = spark, root, tid
        self.rng = random.Random(seed * 1000 + tid)
        self.n_ops, self.log, self.errors = n_ops, log, errors

    def run(self):
        try:
            for j in range(self.n_ops):
                op = self.rng.choices(
                    ["append", "replace_del", "mor_del", "rename",
                     "drop", "evolve", "clone", "consolidate", "vacuum",
                     "restore"],
                    weights=[32, 13, 9, 8, 7, 7, 7, 6, 6, 5],
                )[0]
                try:
                    getattr(self, op)(j)
                except _EXPECTED:
                    pass  # loser: must leave no trace (model asserts it)
        except Exception as e:  # pragma: no cover - harness failure
            self.errors.append((self.tid, repr(e)))

    def _cols(self):
        # current logical schema, freshly read (may be stale by commit
        # time — then the stage-window guards must abort loudly)
        v = latest_version(self.root)
        m = load_manifest(self.root, v)
        import json

        return [f["name"] for f in json.loads(m["schema"])["fields"]]

    def append(self, j):
        opseq = self.tid * 1000 + j
        keys = [100 + self.tid * 100_000 + j * 100 + i for i in range(4)]
        cols = self._cols()
        df = _mk_rows(self.spark, keys, cols, opseq)
        v = write_snapshot(df, self.root, mode="append")
        rows = {}
        for k in keys:
            rows[k] = {
                c: (f"p{k}-{opseq}" if c in ("payload", "payload2")
                    else k * 1000 + opseq)
                for c in cols
                if c != "k"
            }
        self.log.append((v, "append", {"rows": rows, "cols": cols}))

    def replace_del(self, j):
        # full-rewrite copy-on-write delete of one currently-live key,
        # CASed on the version the drop-set was computed from
        v = latest_version(self.root)
        m = load_manifest(self.root, v)
        cur = read_snapshot(self.spark, self.root, version=v)
        keys = [r["k"] for r in cur.select("k").limit(50).collect()]
        if not keys:
            return
        victim = self.rng.choice(sorted(keys))
        nv = write_snapshot(
            cur.where(F.col("k") != victim),
            self.root,
            mode="replace",
            expected_version=v,
            drop_files=list(m["files"]),
        )
        self.log.append((nv, "delete", {"keys": [victim]}))

    def mor_del(self, j):
        # merge-on-read: tombstone one live key across every parent
        # file (over-tombstoning is sound), folding prior vectors so
        # replaced vector lists never resurrect rows
        v = latest_version(self.root)
        m = load_manifest(self.root, v)
        if not m["files"]:
            return
        cur = read_snapshot(self.spark, self.root, version=v)
        keys = [r["k"] for r in cur.select("k").limit(50).collect()]
        if not keys:
            return
        victim = self.rng.choice(sorted(keys))
        tomb = self.spark.createDataFrame(
            [(f, victim) for f in m["files"]], "__file string, k long"
        )
        tomb = fold_prior_vectors(
            self.spark, self.root, m, list(m["files"]), tomb
        )
        nv = write_snapshot(
            cur.limit(0),
            self.root,
            mode="replace",
            expected_version=v,
            drop_files=[],
            delete_vectors=tomb,
        )
        self.log.append((nv, "delete", {"keys": [victim]}))

    def rename(self, j):
        cols = self._cols()
        if "payload" in cols:
            old, new = "payload", "payload2"
        elif "payload2" in cols:
            old, new = "payload2", "payload"
        else:
            return
        v = rename_column_commit(self.root, old, new)
        self.log.append((v, "rename", {"old": old, "new": new}))

    def drop(self, j):
        if "extra" not in self._cols():
            return
        v = drop_column_commit(self.root, "extra")
        self.log.append((v, "drop", {"col": "extra"}))

    def evolve(self, j):
        if "extra" in self._cols():
            return
        v = evolve_schema_commit(self.root, [("extra", "bigint")])
        self.log.append((v, "evolve", {"col": "extra"}))

    def clone(self, j):
        # shallow clone at a pinned version must read back identical to
        # the source AT THAT VERSION, regardless of concurrent commits
        v = latest_version(self.root)
        dst = f"{self.root}-clone-{self.tid}-{j}"
        clone_table(self.root, dst, version=v, spark=self.spark)
        src = {
            tuple(r) for r in read_snapshot(
                self.spark, self.root, version=v
            ).collect()
        }
        got = {tuple(r) for r in read_table(self.spark, dst).collect()}
        assert got == src, f"clone of v{v} diverged from pinned source"

    def consolidate(self, j):
        res = consolidate_vectors(self.spark, self.root)
        if res["consolidated"]:
            self.log.append((res["version"], "noop", {}))

    def vacuum(self, j):
        # real grace window: concurrent stages/readers must survive
        vacuum(self.root, keep_last=4, grace_seconds=300.0)

    def restore(self, j):
        # roll the table back to a RETAINED earlier version, CASed on
        # the head we computed the target from — the model replays it
        # as state := states[target]
        versions = list_versions(self.root)
        if len(versions) < 2:
            return
        cur = versions[-1]
        target = self.rng.choice(versions[:-1])
        v = restore_commit(self.root, target, expected_version=cur)
        self.log.append((v, "restore", {"to": target}))


def _replay(log, n_versions, seed_rows):
    """Apply the winner ops versionwise to a pure-Python model; return
    {version: (schema_cols, {k: {col: val}})} snapshots. The model
    starts from the v1 seed state."""
    by_v = {}
    for v, kind, data in log:
        assert v not in by_v, f"two winners recorded for version {v}"
        by_v[v] = (kind, data)
    assert set(by_v) == set(range(2, n_versions + 1)), (
        "committed chain and op log disagree: "
        f"log={sorted(by_v)}, chain=2..{n_versions}"
    )
    schema = ["k", "payload"]
    rows: dict[int, dict] = {k: dict(v) for k, v in seed_rows.items()}
    states = {1: (list(schema), {k: dict(r) for k, r in rows.items()})}
    for v in range(2, n_versions + 1):
        kind, data = by_v[v]
        if kind == "append":
            # an append may legitimately EXTEND the schema (evolution:
            # staged ⊇ parent prefix; write_snapshot gives a re-added
            # name a FRESH physical so old bytes never resurrect — the
            # harness's exact-value compare below proves the carried
            # rows NULL-backfill instead of serving stale bytes). It
            # may never commit NARROWER than the parent.
            assert set(schema) <= set(data["cols"]), (
                f"v{v} append committed columns {data['cols']} against "
                f"wider model schema {schema} — a stage-window guard "
                f"missed concurrent schema drift; full op log: "
                f"{[(vv, kk, dd if kk != 'append' else sorted(dd['rows'])) for vv, kk, dd in sorted(log)]}"
            )
            for c in data["cols"]:
                if c not in schema:
                    schema.append(c)
            for k, vals in data["rows"].items():
                rows[k] = dict(vals)
        elif kind == "delete":
            for k in data["keys"]:
                rows.pop(k, None)
        elif kind == "rename":
            old, new = data["old"], data["new"]
            schema = [new if c == old else c for c in schema]
            for r in rows.values():
                if old in r:
                    r[new] = r.pop(old)
        elif kind == "drop":
            schema = [c for c in schema if c != data["col"]]
            for r in rows.values():
                r.pop(data["col"], None)
        elif kind == "evolve":
            schema = schema + [data["col"]]
        elif kind == "restore":
            schema, rows = states[data["to"]]
            schema = list(schema)
            rows = {k: dict(r) for k, r in rows.items()}
        elif kind == "noop":
            pass
        else:  # pragma: no cover
            raise AssertionError(kind)
        states[v] = (list(schema), {k: dict(r) for k, r in rows.items()})
    return states


def _assert_version_matches(spark, root, v, state):
    schema, rows = state
    df = read_snapshot(spark, root, version=v)
    value_cols = [c for c in df.columns if c != "k"]
    assert sorted(value_cols) == sorted(c for c in schema if c != "k"), (
        f"v{v} schema {df.columns} != model {schema}"
    )
    got = {
        r["k"]: tuple(r[c] for c in sorted(value_cols))
        for r in df.collect()
    }
    want = {
        k: tuple(vals.get(c) for c in sorted(value_cols))
        for k, vals in rows.items()
    }
    assert got == want, (
        f"v{v} contents diverged from model: "
        f"extra={set(got) - set(want)}, missing={set(want) - set(got)}, "
        f"changed={[k for k in set(got) & set(want) if got[k] != want[k]][:5]}"
    )


@pytest.mark.stress  # multi-minute randomized sweep; deterministic companions below stay default
@pytest.mark.parametrize("seed", [0, 1])
def test_multi_writer_interleaving_preserves_invariants(
    spark, tmp_path, seed
):
    root = str(tmp_path / "t")
    seed_keys = [1, 2, 3]
    write_snapshot(
        _mk_rows(spark, seed_keys, ["k", "payload"], 0), root
    )
    log: list = []
    errors: list = []
    workers = [
        _Worker(spark, root, tid, seed, n_ops=7, log=log, errors=errors)
        for tid in range(3)
    ]
    threads = [threading.Thread(target=w.run) for w in workers]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    n = latest_version(root)
    states = _replay(
        log, n, seed_rows={k: {"payload": f"p{k}-0"} for k in seed_keys}
    )

    # every retained version — not just the head — matches the model
    retained = list_versions(root)
    assert retained == sorted(retained)
    assert retained[-1] == n, "latest version must be retained"
    for v in retained:
        _assert_version_matches(spark, root, v, states[v])

    # quiesced end-state vacuum: grace=0 single pass must reclaim
    # orphans WITHOUT breaking any retained version
    vacuum(root, keep_last=3, grace_seconds=0.0)
    for v in list_versions(root):
        _assert_version_matches(spark, root, v, states[v])


def test_drop_add_between_stage_and_commit_aborts_loudly(spark, tmp_path):
    """The exact r10 ADVICE race, pinned deterministically: a DROP+ADD
    of the same logical column lands inside another writer's
    stage->commit window, restoring the schema SHAPE while retiring the
    staged physical name. Committing would silently NULL the appended
    rows' column (or resurrect retired bytes) — the prefix check must
    abort instead, and the table must stay byte-identical."""
    root = str(tmp_path / "t")
    write_snapshot(
        _mk_rows(spark, [1, 2], ["k", "payload", "extra"], 0), root
    )
    staged = stage_files(
        _mk_rows(spark, [10, 11], ["k", "payload", "extra"], 1), root
    )
    # the race: DROP extra, then ADD extra back (same logical name,
    # fresh physical) — schema shape identical to what was staged
    drop_column_commit(root, "extra")
    evolve_schema_commit(root, [("extra", "bigint")])
    before = {tuple(r) for r in read_table(spark, root).collect()}
    with pytest.raises(CommitConflictError, match="column mapping|collide"):
        commit(root, staged, mode="append")
    after = {tuple(r) for r in read_table(spark, root).collect()}
    assert after == before, "aborted commit must leave the table untouched"
    # and the re-added column NULL-backfills — never the retired bytes
    assert all(r["extra"] is None for r in read_table(spark, root).collect())


def test_rename_between_stage_and_commit_aborts_loudly(spark, tmp_path):
    """RENAME variant of the stage-window race: the staged prefix field
    'payload' now resolves to a different physical under the renamed
    parent — commit must abort, not serve mixed columns."""
    root = str(tmp_path / "t")
    write_snapshot(_mk_rows(spark, [1, 2], ["k", "payload"], 0), root)
    staged = stage_files(_mk_rows(spark, [10, 11], ["k", "payload"], 1), root)
    rename_column_commit(root, "payload", "payload2")
    before = {tuple(r) for r in read_table(spark, root).collect()}
    with pytest.raises((CommitConflictError, ValueError)):
        commit(root, staged, mode="append")
    assert {tuple(r) for r in read_table(spark, root).collect()} == before
