"""Intensified concurrency hunt: materialized-view maintenance composed
with clone / restore / vacuum pressure (VERDICT r13 next-round #8).

Run-as-script wave (the r12-proven pattern: fresh seeds, biased op mix,
4 threads, NOT a committed test — committed seeds live in
tests/test_matview.py and tests/test_clone_chain_harness.py). Surface
under attack, chosen because it is the newest compose:

* ``maintain_view`` refreshes (manifest-watermark CAS commits) racing
* source appends / replaces / restores / graced vacuums, while
* the VIEW itself is restored to older versions (restore_commit must
  adopt the old manifest's app_meta watermark — a restore that kept the
  NEW watermark over OLD data would silently drop the intervening
  deltas from every later refresh), and
* clones of the view are taken mid-flight and verified read-only.

Forbidden outcome: silent divergence. After quiescing, the view must
EXACTLY equal a from-scratch rollup of the current source; every clone
must either serve its clone-time model rows or fail loudly on a
reclaimed file. All raced errors must be in the expected classes.

Usage: python scripts/matview_clone_hunt.py [seed ...]
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.incremental import event_rollup
from implementing_scds_in_hive_spark.operators.matview import (
    maintain_view,
    view_watermark,
)
from implementing_scds_in_hive_spark.sources.registry import load_table
from implementing_scds_in_hive_spark.sources.snapshot import (
    CommitConflictError,
    clone_table,
    latest_version,
    list_versions,
    read_snapshot,
    read_table,
    restore_commit,
    vacuum,
    write_snapshot,
)

SF = "/root/testdata/sf0.001"
KEY = ["event_id"]
EXPECTED = (CommitConflictError, ValueError, FileNotFoundError, RuntimeError)
LOUD = ("FILE_NOT_EXIST", "PATH_NOT_FOUND", "FileNotFoundException", "does not exist",
        "cannot restore", "no longer", "vacuumed")


def _loud(e) -> bool:
    return any(m in str(e) for m in LOUD)


def run_wave(spark, seed: int) -> dict:
    rng = random.Random(seed)
    work = tempfile.mkdtemp(prefix=f"mvhunt_{seed}_")
    source = f"{work}/src"
    view = f"{work}/view"
    e = (
        load_table(spark, SF, "events")
        .where(F.col("event_id") % 10 == 0)
        .select("event_id", "ts", "event_type", "value")
        .localCheckpoint(eager=True)
    )
    write_snapshot(e.where(F.col("event_id") % 3 == 0), source)
    maintain_view(spark, source, view, KEY, retain_versions=None)

    errors: list[str] = []
    clones: list[tuple[str, list]] = []
    gate = threading.Lock()
    next_id = iter(range(10_000))

    def guard(fn, *, allow_loud=True):
        try:
            fn()
        except EXPECTED as exc:
            if not (_loud(exc) or isinstance(exc, (CommitConflictError, ValueError, FileNotFoundError))):
                errors.append(f"unexpected: {exc!r}")
        except Exception as exc:  # noqa: BLE001 — the hunt records everything
            if not (allow_loud and _loud(exc)):
                errors.append(f"unexpected: {exc!r}")

    def source_mutator(tseed):
        r = random.Random(tseed)
        for i in range(14):
            op = r.choices(
                ["append", "replace", "restore", "vacuum"],
                weights=[6, 2, 2, 2],
            )[0]
            if op == "append":
                batch = e.where(F.col("event_id") % 7 == r.randrange(7)).withColumn(
                    "event_id", F.col("event_id") + F.lit((tseed * 100 + i) * 10_000_000)
                )
                guard(lambda b=batch: write_snapshot(b.coalesce(1), source, mode="append"))
            elif op == "replace":
                content = e.where(F.col("event_id") % 5 != r.randrange(5))
                guard(lambda c=content: write_snapshot(c, source))
            elif op == "restore":
                def do_restore():
                    vs = list_versions(source)
                    if len(vs) > 2:
                        restore_commit(source, r.choice(vs[:-1]))
                guard(do_restore)
            else:
                guard(lambda: vacuum(source, keep_last=4, grace_seconds=300.0))

    def refresher(tseed):
        r = random.Random(tseed)
        for _ in range(16):
            guard(lambda: maintain_view(
                spark, source, view, KEY,
                retain_versions=None,
            ))
            time.sleep(r.uniform(0, 0.05))

    def view_restorer(tseed):
        r = random.Random(tseed)
        for i in range(10):
            if r.random() < 0.5:
                def do_restore():
                    vs = list_versions(view)
                    if len(vs) > 2:
                        restore_commit(view, r.choice(vs[:-1]))
                guard(do_restore)
            else:
                def do_clone():
                    v = latest_version(view)
                    if v is None:
                        return
                    model = sorted(map(tuple, read_snapshot(spark, view, version=v).collect()))
                    croot = f"{work}/clone_{next(next_id)}"
                    clone_table(view, croot, version=v, spark=spark)
                    with gate:
                        clones.append((croot, model))
                guard(do_clone)
            time.sleep(r.uniform(0, 0.05))

    def view_vacuumer(tseed):
        r = random.Random(tseed)
        for _ in range(10):
            guard(lambda: vacuum(view, keep_last=3, grace_seconds=300.0))
            time.sleep(r.uniform(0, 0.08))

    threads = [
        threading.Thread(target=source_mutator, args=(seed * 11 + 1,)),
        threading.Thread(target=refresher, args=(seed * 11 + 2,)),
        threading.Thread(target=view_restorer, args=(seed * 11 + 3,)),
        threading.Thread(target=view_vacuumer, args=(seed * 11 + 4,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not any(t.is_alive() for t in threads), "hunt wedged"

    # quiesce: refresh until current, then demand exact convergence
    for _ in range(6):
        rep = maintain_view(spark, source, view, KEY, retain_versions=None)
        if rep["updated"] is False:
            break
    expected = sorted(map(tuple, event_rollup(read_table(spark, source)).collect()))
    got = sorted(map(tuple, read_table(spark, view).collect()))
    converged = got == expected

    clone_results = {"ok": 0, "loud": 0, "silent_bad": 0}
    for croot, model in clones:
        try:
            got_c = sorted(map(tuple, read_table(spark, croot).collect()))
        except Exception as exc:  # noqa: BLE001
            if _loud(exc):
                clone_results["loud"] += 1
            else:
                errors.append(f"clone {croot} unexpected: {exc!r}")
            continue
        if got_c == model:
            clone_results["ok"] += 1
        else:
            clone_results["silent_bad"] += 1
            errors.append(f"clone {croot} SILENT divergence")

    final_wm = view_watermark(view)
    shutil.rmtree(work, ignore_errors=True)
    return {
        "seed": seed,
        "converged": converged,
        "view_watermark": final_wm,
        "clones": clone_results,
        "errors": errors[:5],
        "n_errors": len(errors),
    }


def main(seeds) -> None:
    import json

    from implementing_scds_in_hive_spark.session import get_spark

    spark = get_spark("matview-clone-hunt")
    out = []
    for seed in seeds:
        rec = run_wave(spark, seed)
        print(f"# seed {seed}: {rec}", file=sys.stderr)
        out.append(rec)
    bad = [r for r in out if r["n_errors"] or not r["converged"]
           or r["clones"]["silent_bad"]]
    print(json.dumps({"waves": out, "clean": not bad}))
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [2026_08_17, 424242, 990017])
