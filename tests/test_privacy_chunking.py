"""Unit semantics of PII redaction/pseudonymization and token-window
chunking. sf-scale value equivalence runs in test_pytest_only_oracles
(pii_redaction / pseudonymize_users / text_chunks)."""

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.functions.chunking import chunk_text
from implementing_scds_in_hive_spark.functions.privacy import pseudonymize, redact_pii


def _redact(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"]


def test_redaction_masks_all_three_kinds(spark):
    out = _redact(
        spark,
        "mail a.b+c@x-corp.co.uk, call +44 20 7946 0958, host 192.168.0.1 ok",
    )
    assert out == "mail <EMAIL>, call <PHONE>, host <IP> ok"


def test_redaction_leaves_years_and_small_numbers(spark):
    s = "born 1984, moved in 2020, 42 items"
    assert _redact(spark, s) == s


def test_ip_not_eaten_by_phone_pass(spark):
    # dotted quad must become <IP>, not <PHONE> (pass order)
    assert _redact(spark, "10.0.0.255") == "<IP>"


def test_pseudonym_stable_and_salt_dependent(spark):
    df = spark.createDataFrame([(7,), (8,)], "user_id long")
    a = {r["user_id"]: r["p"] for r in df.select("user_id", pseudonymize(F.col("user_id"), "s1").alias("p")).collect()}
    b = {r["user_id"]: r["p"] for r in df.select("user_id", pseudonymize(F.col("user_id"), "s1").alias("p")).collect()}
    c = {r["user_id"]: r["p"] for r in df.select("user_id", pseudonymize(F.col("user_id"), "s2").alias("p")).collect()}
    assert a == b  # stable across runs
    assert a[7] != c[7]  # unlinkable across salts
    assert len(a[7]) == 16 and a[7] != a[8]


def _chunks(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_text(df, **kw).orderBy("chunk_idx").collect()
    return [r["chunk"] for r in rows]


def test_chunking_overlap_and_clamping(spark):
    text = " ".join(str(i) for i in range(10))  # 10 tokens
    got = _chunks(spark, text, size=4, stride=3)
    assert got == ["0 1 2 3", "3 4 5 6", "6 7 8 9"]


def test_short_doc_is_one_chunk(spark):
    assert _chunks(spark, "a b", size=40, stride=30) == ["a b"]


def test_stride_equals_size_is_disjoint(spark):
    text = " ".join("abcde")
    assert _chunks(spark, text, size=2, stride=2) == ["a b", "c d", "e"]


def test_no_token_dropped(spark):
    text = " ".join(str(i) for i in range(97))
    got = _chunks(spark, text, size=40, stride=30)
    covered = set()
    for ch in got:
        covered.update(ch.split(" "))
    assert covered == {str(i) for i in range(97)}


def test_pack_sequences_partitions_every_token_once(spark):
    from implementing_scds_in_hive_spark.functions.chunking import pack_sequences

    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate([5, 12, 3, 9, 20, 1], 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, seq_len=8).collect()
    total = sum(n for n in [5, 12, 3, 9, 20, 1])
    # every token lands in exactly one (sequence, span) slot
    assert sum(r["slice_len"] for r in out) == total
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, spans in per_doc.items():
        spans.sort(key=lambda r: r["seq_id"])
        # doc slices are contiguous from 0 to n
        assert spans[0]["doc_slice_start"] == 0
        for a, b in zip(spans, spans[1:]):
            assert a["doc_slice_start"] + a["slice_len"] == b["doc_slice_start"]
            assert b["pos_in_seq"] == 0  # continuation spans start sequences
    # every sequence except the last is exactly full
    per_seq = {}
    for r in out:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["slice_len"]
    last = max(per_seq)
    for sid, filled in per_seq.items():
        assert filled == 8 or sid == last
    # within a sequence, spans tile [0, seq_len) without overlap
    for sid in per_seq:
        spans = sorted((r for r in out if r["seq_id"] == sid), key=lambda r: r["pos_in_seq"])
        cursor = 0
        for r in spans:
            assert r["pos_in_seq"] == cursor
            cursor += r["slice_len"]


def test_pack_sequences_matches_naive_cumsum(spark):
    from implementing_scds_in_hive_spark.functions.chunking import pack_sequences

    rows = [(i, " ".join(["w"] * ((i * 7) % 13 + 1))) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["seq_id"], r["doc_id"]): r for r in pack_sequences(df, seq_len=16).collect()}
    off = 0
    for i in range(1, 40):
        n = (i * 7) % 13 + 1
        first = off // 16
        r = out[(first, i)]
        assert r["pos_in_seq"] == off - first * 16
        off += n


def test_invalid_stride_raises(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_text(df, size=3, stride=4)
    with pytest.raises(ValueError):
        chunk_text(df, size=3, stride=0)


def test_pack_sequences_rejects_nonpositive_seq_len(spark):
    """r12 review: sequence(first, last) steps DOWNWARD when first >
    last, so seq_len <= 0 produced garbage manifests silently."""
    from implementing_scds_in_hive_spark.functions.chunking import (
        pack_sequences,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for bad in (0, -4):
        with pytest.raises(ValueError, match="seq_len"):
            pack_sequences(df, seq_len=bad)
