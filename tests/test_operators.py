"""Unit tests for the pipeline operators: dedup tiers on planted
near-duplicates, similarity recall, as-of join edges, multimodal
plumbing, and the atomic publish / self-overwrite trap.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.asof import asof_join
from implementing_scds_in_hive_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_duplicate_groups,
)
from implementing_scds_in_hive_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_stub,
    extract_features,
)
from implementing_scds_in_hive_spark.operators.scd import publish
from implementing_scds_in_hive_spark.operators.similarity import (
    cosine_topk,
    embedding_near_duplicates,
    lsh_bucketed_topk,
)


from implementing_scds_in_hive_spark.sources.snapshot import read_table


def _mk_docs(spark):
    """Corpus with known duplicate structure: 1<->2 exact, 3 a near-dup
    of 1 (one token changed), 4 unrelated, 5<->6 exact."""
    base = "the quick brown fox jumps over the lazy dog again and again until dawn breaks over the quiet hill"
    near = base.replace("lazy", "sleepy")
    other = "completely different text about spark catalyst optimizer plans and shuffle exchanges at massive scale"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, near),
            (4, other),
            (5, other + " with a tail"),
            (6, other + " with a tail"),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup(spark):
    docs = _mk_docs(spark)
    groups = {tuple(r["members"]) for r in exact_duplicates(docs).collect()}
    assert groups == {(1, 2), (5, 6)}
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert kept == [1, 3, 4, 5]


def test_ngram_jaccard_finds_planted_near_dup(spark):
    docs = _mk_docs(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (5, 6) in pairs and pairs[(5, 6)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert not any({a, b} & {4} and {a, b} & {1, 2, 3} for a, b in pairs)


def test_minhash_lsh_recall_on_exact_and_near(spark):
    docs = _mk_docs(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    # identical docs collide in every band -> guaranteed; near-dup is
    # probabilistic but deterministic given fixed hash seeds
    assert pairs[(1, 2)] == 1.0 and pairs[(5, 6)] == 1.0
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    # LSH verified-Jaccard values must equal the exhaustive tier's
    for k, v in pairs.items():
        assert exact[k] == v


def test_portable_minhash_agrees_with_exhaustive_tier(spark):
    """The portable mod-p family must behave like the xxhash64 family:
    exact duplicates collide in every band, and every verified Jaccard
    equals the exhaustive tier's value (verification is hash-agnostic —
    Jaccard over distinct shingle hashes == Jaccard over shingles)."""
    from implementing_scds_in_hive_spark.operators.dedup import portable_minhash_lsh_pairs

    docs = _mk_docs(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in portable_minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0 and pairs[(5, 6)] == 1.0
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    for k, v in pairs.items():
        assert exact[k] == v


def test_simhash_groups_exact_dups(spark):
    docs = _mk_docs(spark)
    groups = {tuple(r["members"]) for r in simhash_duplicate_groups(docs).collect()}
    assert (1, 2) in groups and (5, 6) in groups


def _mk_vectors(spark):
    # 2-d unit-ish vectors: ids 1-3 near [1,0], ids 4-6 near [0,1]
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.99, 0.1]),
        (3, [0.95, 0.2]),
        (4, [0.0, 1.0]),
        (5, [0.1, 0.99]),
        (6, [0.2, 0.95]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(spark):
    corpus = _mk_vectors(spark)
    q = spark.createDataFrame([(100, [1.0, 0.0])], "query_id long, embedding array<double>")
    got = [(r["vec_id"], r["rank"]) for r in cosine_topk(corpus, q, k=3).orderBy("rank").collect()]
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_lsh_topk_same_bucket_neighbors(spark):
    corpus = _mk_vectors(spark)
    q = spark.createDataFrame([(100, [1.0, 0.0])], "query_id long, embedding array<double>")
    got = {r["vec_id"] for r in lsh_bucketed_topk(corpus, q, k=3, n_bits=2).collect()}
    # sign-bit blocking keeps the x-axis cluster together
    assert got <= {1, 2, 3} and 1 in got


def test_embedding_near_duplicates(spark):
    corpus = _mk_vectors(spark)
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_near_duplicates(corpus, threshold=0.99).collect()}
    assert (1, 2) in pairs
    assert all(not ({a, b} & {1, 2, 3} and {a, b} & {4, 5, 6}) for a, b in pairs)


def test_asof_join_edges(spark):
    orders = spark.createDataFrame(
        [
            (10, 1, datetime(2024, 1, 1), 100.0),
            (11, 1, datetime(2024, 1, 5), 200.0),
            (12, 1, datetime(2024, 1, 5), 300.0),  # same-instant: higher id wins
            (13, 2, datetime(2024, 2, 1), 999.0),
        ],
        "o_id long, cust long, o_ts timestamp, price double",
    )
    events = spark.createDataFrame(
        [
            (1, 1, datetime(2024, 1, 4)),   # after order 10 only
            (2, 1, datetime(2024, 1, 5)),   # exactly at 11/12 -> 12 (<=, max id)
            (3, 1, datetime(2024, 1, 9)),   # after all
            (4, 2, datetime(2024, 1, 1)),   # before any order for cust 2 -> null
            (5, 3, datetime(2024, 1, 1)),   # no orders at all -> null
        ],
        "event_id long, user long, e_ts timestamp",
    )
    out = asof_join(
        events,
        orders,
        left_on="user",
        right_on="cust",
        left_ts="e_ts",
        right_ts="o_ts",
        right_cols=["o_id", "price"],
        right_id="o_id",
    )
    got = {r["event_id"]: (r["o_id"], r["price"]) for r in out.collect()}
    assert got[1] == (10, 100.0)
    assert got[2] == (12, 300.0)
    assert got[3] == (12, 300.0)
    assert got[4] == (None, None)
    assert got[5] == (None, None)


def test_multimodal_plumbing(spark):
    docs = _mk_docs(spark)
    media = attach_binary_payload(docs)
    assert [f.name for f in media.schema.fields] == ["doc_id", "payload", "media_meta"]
    feats = {r["doc_id"]: r.asDict() for r in extract_features(media).collect()}
    assert len(feats) == 6
    row1 = feats[1]
    text1 = docs.where("doc_id = 1").collect()[0]["text"]
    assert row1["byte_len"] == len(text1.encode())
    assert row1["head_byte"] == text1.encode()[0]
    import hashlib

    assert row1["content_md5"] == hashlib.md5(text1.encode()).hexdigest()


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG")


def test_publish_self_overwrite_trap(spark, tmp_path):
    """The reference's INSERT OVERWRITE reads the table it replaces
    (SCD_script.txt:141-155); Spark cannot overwrite a parquet path it is
    lazily reading. publish() must handle reading-from-the-target."""
    path = str(tmp_path / "dim")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(path)
    # derive the next state FROM the published table, then publish back
    cur = read_table(spark, path)
    nxt = cur.withColumn("v", F.concat("v", F.lit("+")))
    publish(nxt, path)
    got = {(r["id"], r["v"]) for r in read_table(spark, path).collect()}
    assert got == {(1, "a+")}
    # and again, proving repeatability
    publish(read_table(spark, path).withColumn("v", F.concat("v", F.lit("+"))), path)
    assert {r["v"] for r in read_table(spark, path).collect()} == {"a++"}


def test_sample_frames_slicing_and_boundaries(spark):
    """Fixed-size frame records: stride skips, the tail frame is short,
    an empty payload emits nothing, and features are byte-exact."""
    import hashlib

    from implementing_scds_in_hive_spark.operators.multimodal import sample_frames

    rows = [
        (1, b"A" * 10),   # frames of 4 bytes: idx 0 (4B), 2 (2B tail)
        (2, b""),          # no frames
        (3, b"B" * 4),    # exactly one frame
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        (r["doc_id"], r["frame_idx"]): r
        for r in sample_frames(media, frame_bytes=4, stride=2).collect()
    }
    assert set(out) == {(1, 0), (1, 2), (3, 0)}
    assert out[(1, 0)]["frame_len"] == 4
    assert out[(1, 2)]["frame_len"] == 2  # tail shorter than frame_bytes
    assert out[(1, 2)]["frame_md5"] == hashlib.md5(b"AA").hexdigest()
    assert out[(3, 0)]["frame_md5"] == hashlib.md5(b"BBBB").hexdigest()


def test_sample_frames_rejects_nonpositive_params(spark):
    from implementing_scds_in_hive_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    with pytest.raises(ValueError):
        sample_frames(media, frame_bytes=0, stride=1)
    with pytest.raises(ValueError):
        sample_frames(media, frame_bytes=4, stride=0)


def test_vocab_topk_counts_and_tiebreak(spark):
    from implementing_scds_in_hive_spark.functions.scoring import vocab_topk

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a")], "doc_id long, text string"
    )
    rows = [(r["tok"], r["tf"], r["df"]) for r in vocab_topk(docs, k=2).collect()]
    # a: tf=3 df=2; b: tf=2 df=2; c excluded by k=2. Order tf desc.
    assert rows == [("a", 3, 2), ("b", 2, 2)]


def test_ngram_cap_sizes_use_surviving_shingles(spark):
    """max_doc_freq must size |A| and |B| over the SAME post-suppression
    shingle universe the intersection uses (r4 fix): a near-dup pair
    whose shared distinctive content survives the cap must be found even
    when a ubiquitous boilerplate phrase (df > cap) is suppressed.
    Sizing with the full arrays drove measured recall to zero on a
    replicated 50k-doc corpus (PLANS.md)."""
    boiler = "terms of service apply to every document in this corpus"
    rows = [
        # the near-dup pair: identical distinctive text + boilerplate
        (1, f"{boiler} quick brown foxes jump over lazy dogs daily"),
        (2, f"{boiler} quick brown foxes jump over lazy dogs daily"),
        # 10 unrelated docs carrying only the boilerplate + noise word
        *[(10 + i, f"{boiler} filler{i}") for i in range(10)],
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cap=5 suppresses every boilerplate shingle (df = 12 > 5); the
    # pair's distinctive shingles (df = 2) survive -> J = 1.0 over them
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.8, max_doc_freq=5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    # filler docs share nothing surviving -> no pairs among them
    assert all({a, b} == {1, 2} for a, b in pairs)


# --- real image decode (r6: the stub's PPM/BMP replacement) --------------

def test_decode_ppm_header_variants_and_pixels():
    import numpy as np

    from implementing_scds_in_hive_spark.operators.multimodal import decode_ppm

    px = bytes(range(2 * 3 * 3))  # 3x2, values 0..17
    img = decode_ppm(b"P6\n# a comment\n 3\t2 #trailing\n255\n" + px)
    assert img.shape == (2, 3, 3)
    np.testing.assert_array_equal(img.reshape(-1), np.arange(18, dtype=np.uint8))

    import pytest as _pytest

    for bad in (
        b"P5\n1 1\n255\n\x00\x00\x00",        # wrong magic
        b"P6\n3 2\n255\n" + px[:-1],           # truncated raster
        b"P6\n3 2\n70000\n" + px,              # 16-bit maxval unsupported
        b"P6\nnot a header",                   # garbage header
        b"P6\n3",                              # truncated header
    ):
        with _pytest.raises(ValueError):
            decode_ppm(bad)


def _mk_bmp(w, h, rgb_rows, *, top_down=False):
    """Handcraft a 24bpp BI_RGB BMP: rows padded to 4 bytes, bottom-up
    unless top_down (negative height)."""
    import struct

    stride = (w * 3 + 3) & ~3
    raster = b""
    rows = rgb_rows if top_down else rgb_rows[::-1]
    for row in rows:
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)  # BGR on disk
        raster += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    return header + info + raster


def test_decode_bmp_bottom_up_padding_and_bgr():
    import numpy as np

    from implementing_scds_in_hive_spark.operators.multimodal import decode_bmp

    rows = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)],
            [(10, 11, 12), (13, 14, 15), (16, 17, 18)]]
    img = decode_bmp(_mk_bmp(3, 2, rows))
    assert img.shape == (2, 3, 3)
    np.testing.assert_array_equal(img, np.array(rows, dtype=np.uint8))
    # top-down (negative height) must land identically
    img2 = decode_bmp(_mk_bmp(3, 2, rows, top_down=True))
    np.testing.assert_array_equal(img2, np.array(rows, dtype=np.uint8))

    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)  # truncated
    bad_bpp = bytearray(_mk_bmp(3, 2, rows))
    bad_bpp[28] = 32  # bpp field
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad_bpp))


def test_decode_image_dispatch_falls_back_to_stub():
    from implementing_scds_in_hive_spark.operators.multimodal import decode_image

    assert decode_image(b"P6\n1 1\n255\nabc").shape == (1, 1, 3)
    assert decode_image(_mk_bmp(1, 1, [[(9, 8, 7)]])).shape == (1, 1, 3)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")  # compressed: still stubbed


def test_image_stats_survives_corrupt_and_foreign_rows(spark):
    from implementing_scds_in_hive_spark.operators.multimodal import image_stats

    good = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    bmp = _mk_bmp(1, 2, [[(1, 2, 3)], [(4, 5, 6)]])
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"P6\nnot a header")),      # corrupt: must not crash
        (3, bytearray(b"\x89PNG\r\n\x1a\nzz")),   # compressed: stub raises
        (4, bytearray(bmp)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in image_stats(df).collect()}
    assert got[1]["width"] == 2 and got[1]["height"] == 1
    assert (got[1]["sum_r"], got[1]["sum_g"], got[1]["sum_b"]) == (50, 70, 90)
    assert got[1]["decode_ok"] is True
    assert got[2]["decode_ok"] is False and got[2]["width"] is None
    assert got[3]["decode_ok"] is False
    assert got[4]["decode_ok"] is True and (got[4]["width"], got[4]["height"]) == (1, 2)
    assert (got[4]["sum_r"], got[4]["sum_g"], got[4]["sum_b"]) == (5, 7, 9)


def test_detect_modality_recognizes_ppm_and_bmp(spark):
    from implementing_scds_in_hive_spark.operators.multimodal import detect_modality

    rows = [
        (1, bytearray(b"P6\n1 1\n255\nabc")),
        (2, bytearray(_mk_bmp(1, 1, [[(0, 0, 0)]]))),
        (3, bytearray(b"\x89PNG\r\n\x1a\nxx")),
        (4, bytearray(b"plain text")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["modality"] for r in detect_modality(df).collect()}
    assert got == {
        1: "image/x-portable-pixmap",
        2: "image/bmp",
        3: "image/png",
        4: "application/octet-stream",
    }


def test_linear_interpolate_reference_cases(spark):
    """Hand-computed interpolation: interior gaps time-weighted, leading
    and trailing gaps null, observations pass through, equal-timestamp
    neighbors fall back to the previous observation."""
    from datetime import datetime

    from implementing_scds_in_hive_spark.operators.fill import linear_interpolate

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user a: gap between (t=0,v=10) and (t=10,v=30) probed at t=4 -> 18
        (1, "a", t(0), 10.0), (2, "a", t(4), None), (3, "a", t(10), 30.0),
        # leading + trailing gaps stay null
        (4, "b", t(0), None), (5, "b", t(5), 7.0), (6, "b", t(9), None),
        # equal timestamps around the gap: zero-width -> previous value
        (7, "c", t(3), 1.0), (8, "c", t(3), None), (9, "c", t(3), 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["value_interp"]
        for r in linear_interpolate(df, "value").collect()
    }
    assert got[2] == pytest.approx(10.0 + (30.0 - 10.0) * 0.4)
    assert got[1] == 10.0 and got[3] == 30.0
    assert got[4] is None and got[6] is None and got[5] == 7.0
    assert got[8] == 1.0  # zero-width gap -> prev observation


def test_decode_ppm_crlf_terminated_header():
    """Nonconformant CRLF after maxval must not silently shift the
    raster by one byte — the review-found corruption case."""
    import numpy as np

    from implementing_scds_in_hive_spark.operators.multimodal import decode_ppm

    px = bytes(range(6))
    img = decode_ppm(b"P6\r\n2 1\r\n255\r\n" + px)
    np.testing.assert_array_equal(img.reshape(-1), np.arange(6, dtype=np.uint8))


def test_asof_join_null_fact_ts_never_matches(spark):
    """r11 review: a NULL-ts fact sorted FIRST in the as-of window and
    was carried into every earlier event, while SQL semantics
    (right_ts <= left_ts) never match NULL. NULL-ts facts are dropped;
    NULL-ts events enrich as NULL."""
    from implementing_scds_in_hive_spark.operators.asof import asof_join

    events = spark.createDataFrame(
        [(7, "2026-01-05", 1), (7, None, 2)],
        "user_id long, ts string, event_id long",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id")
    facts = spark.createDataFrame(
        [(7, None, 1, 99.0), (7, "2026-01-02", 2, 42.0)],
        "custkey long, odate string, okey long, price double",
    ).selectExpr(
        "custkey", "CAST(odate AS TIMESTAMP) AS odate", "okey", "price"
    )
    out = {
        r["event_id"]: r["price"]
        for r in asof_join(
            events,
            facts,
            left_on="user_id",
            right_on="custkey",
            left_ts="ts",
            right_ts="odate",
            right_cols=["price"],
            right_id="okey",
        ).collect()
    }
    assert out[1] == 42.0, "real fact at-or-before matches"
    assert out[2] is None, "NULL-ts event and NULL-ts fact never match"


def test_asof_join_guards(spark):
    """r11 review: overlapping right_cols and unknown skew_bounded
    strings must raise; string fact ids get a deterministic hash
    tie-break instead of a silent NULL cast."""
    from implementing_scds_in_hive_spark.operators.asof import asof_join

    events = spark.createDataFrame(
        [(1, "2026-01-02", 10)], "k long, ts string, price long"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "price")
    facts = spark.createDataFrame(
        [(1, "2026-01-01", "ORD-1", 5.0), (1, "2026-01-01", "ORD-2", 7.0)],
        "k long, fts string, oid string, price double",
    ).selectExpr("k", "CAST(fts AS TIMESTAMP) AS fts", "oid", "price")
    kw = dict(
        left_on="k", right_on="k", left_ts="ts", right_ts="fts",
        right_id="oid",
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(events, facts, right_cols=["price"], **kw)
    with pytest.raises(ValueError, match="skew_bounded"):
        asof_join(
            events,
            facts.selectExpr("k", "fts", "oid", "price AS fprice"),
            right_cols=["fprice"],
            skew_bounded="AUTO",
            **kw,
        )
    # string fact id: same-instant winner is deterministic across
    # plain and bucketed plans
    f2 = facts.selectExpr("k", "fts", "oid", "price AS fprice")
    plain = asof_join(events, f2, right_cols=["fprice"], **kw).collect()
    bucketed = asof_join(
        events, f2, right_cols=["fprice"], skew_bounded=True, **kw
    ).collect()
    assert plain == bucketed


def test_forward_fill_bucketed_accepts_epoch_longs(spark):
    """r11 review: the bucketed tier threw a data-type error on
    integral epoch ts while the plain tier accepted it — a failure
    that only fired on the day skew routing selected the bucketed
    plan. Both must agree."""
    from implementing_scds_in_hive_spark.operators.fill import (
        forward_fill,
        forward_fill_bucketed,
    )

    df = spark.createDataFrame(
        [(1, 100, 1, "a"), (1, 200, 2, None), (1, 300, 3, "b"),
         (2, 150, 4, None), (2, 250, 5, "c")],
        "user_id long, ts long, event_id long, v string",
    )
    plain = sorted(map(tuple, forward_fill(df, "v").collect()))
    bucketed = sorted(
        map(tuple, forward_fill_bucketed(df, "v", bucket_us=100).collect())
    )
    assert plain == bucketed


def test_retro_splice_rejects_duplicate_late_keys(spark):
    """r11 review: two late rows for one key silently fanned out the
    splice join and emitted duplicated, overlapping intervals."""
    from implementing_scds_in_hive_spark.operators.retro import retro_splice
    from implementing_scds_in_hive_spark.operators.scd import SCDConfig

    cfg = SCDConfig(
        key="k",
        surrogate_col="sk",
        type2_cols=["v"],
        type1_cols=[],
        start_col="s",
        end_col="e",
        active_col="a",
        version_col="ver",
    )
    prod = spark.createDataFrame(
        [(1, 10, "x", "2026-01-01", "9999-12-31", True, 1)],
        "sk long, k long, v string, s string, e string, a boolean, ver long",
    ).selectExpr(
        "sk", "k", "v", "CAST(s AS TIMESTAMP) AS s",
        "CAST(e AS TIMESTAMP) AS e", "a", "ver",
    )
    late = spark.createDataFrame(
        [(10, "y", "2026-02-01"), (10, "z", "2026-03-01")],
        "k long, v string, eff_ts string",
    )
    with pytest.raises(ValueError, match="one late row per key"):
        retro_splice(prod, late, cfg)


def test_range_join_rejects_nonpositive_granule(spark):
    """r11 review: granule 0 made every bucket NULL and the inner join
    silently returned zero rows."""
    from implementing_scds_in_hive_spark.operators.rangejoin import (
        bucketized_range_join,
    )

    facts = spark.createDataFrame(
        [(1, "2026-01-01")], "fid long, fts string"
    ).selectExpr("fid", "CAST(fts AS TIMESTAMP) AS fts")
    iv = spark.createDataFrame(
        [(1, "2026-01-01", "2026-01-02")], "iid long, lo string, hi string"
    ).selectExpr(
        "iid", "CAST(lo AS TIMESTAMP) AS lo", "CAST(hi AS TIMESTAMP) AS hi"
    )
    with pytest.raises(ValueError, match="granule_seconds"):
        bucketized_range_join(
            facts, iv, ts_col="fts", start_col="lo", end_col="hi",
            granule_seconds=0,
        )


def test_ngram_jaccard_default_is_exact(spark):
    """r12 ADVICE: the 'Exact' entry point must BE exact by default —
    max_doc_freq defaults to None; the scale cap (DEFAULT_MAX_DOC_FREQ)
    is opt-in at call sites. A corpus where a df-101 shingle carries a
    qualifying pair distinguishes the two: the capped run suppresses it
    (pair lost), the default run keeps it."""
    import inspect

    from implementing_scds_in_hive_spark.operators.dedup import (
        DEFAULT_MAX_DOC_FREQ,
    )

    sig = inspect.signature(ngram_jaccard_pairs)
    assert sig.parameters["max_doc_freq"].default is None
    assert DEFAULT_MAX_DOC_FREQ == 100

    shared = "alpha beta gamma"  # one 3-gram shingle, df = 102
    rows = [
        (1, shared),
        (2, shared),
        *[(10 + i, f"{shared} tail{i} x{i} y{i}") for i in range(100)],
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=1.0).collect()
    }
    assert (1, 2) in exact  # default finds the df>100 pair: exact
    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, threshold=1.0, max_doc_freq=DEFAULT_MAX_DOC_FREQ
        ).collect()
    }
    assert (1, 2) not in capped  # the cap is an explicit approximation


def test_pin_reused_uses_reliable_checkpoint_when_dir_set(spark, tmp_path):
    """r12 ADVICE: localCheckpoint stores unreplicated executor blocks —
    executor loss aborts the job. When the session has a RELIABLE
    checkpoint dir configured, _pin_reused must route through
    DataFrame.checkpoint (replicated, survives executor loss)."""
    import os as _os

    from implementing_scds_in_hive_spark.operators.dedup import _pin_reused

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # suite default: local path
    ckpt = str(tmp_path / "reliable_ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        df = spark.range(100).withColumnRenamed("id", "v")
        pinned = _pin_reused(df, None)
        assert pinned.count() == 100
        assert sorted(r["v"] for r in pinned.collect()) == list(range(100))
        # the reliable dir received the checkpointed RDD
        assert any(
            files for _, _, files in _os.walk(ckpt)
        ), "no files written to the reliable checkpoint dir"
    finally:
        sc.setCheckpointDir(None)  # restore: later tests use localCheckpoint
    assert sc.getCheckpointDir() is None
    # and without a dir the default path still pins via localCheckpoint
    again = _pin_reused(spark.range(5), None)
    assert again.count() == 5


@pytest.mark.stress  # multi-minute sweep (r15: opt-in; see pytest.ini)
def test_simhash_prefix_bits_bands_match_logical_shift(spark):
    """prefix_bits < 64 groups by the top bits via a LOGICAL shift
    (sign-agnostic across engines): the groups must equal a Python
    recomputation of (simhash >> (64-p)) & mask over the full-width
    hashes, and degenerate prefix widths must raise."""
    from implementing_scds_in_hive_spark.operators.dedup import (
        simhash64,
        simhash_duplicate_groups,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} alpha beta gamma delta common words {i % 3}")
         for i in range(30)],
        "doc_id long, text string",
    )
    full = {r["did"]: r["simhash"] for r in simhash64(docs).collect()}
    p = 48
    mask = (1 << p) - 1
    expect: dict[int, list[int]] = {}
    for did, h in full.items():
        expect.setdefault(((h & 0xFFFFFFFFFFFFFFFF) >> (64 - p)) & mask, []).append(did)
    expect = {k: sorted(v) for k, v in expect.items() if len(v) > 1}
    got = {
        r["simhash"]: list(r["members"])
        for r in simhash_duplicate_groups(docs, prefix_bits=p).collect()
    }
    assert got == expect
    # banding is strictly coarser than exact collision: every exact
    # group's members stay together in some band group
    exact = simhash_duplicate_groups(docs).collect()
    for r in exact:
        band = ((r["simhash"] & 0xFFFFFFFFFFFFFFFF) >> (64 - p)) & mask
        assert set(r["members"]) <= set(got.get(band, [])), (
            "banding split an exact-collision group"
        )
    for bad in (0, 65, -1):
        with pytest.raises(ValueError, match="prefix_bits"):
            simhash_duplicate_groups(docs, prefix_bits=bad)


def test_suppress_repeated_lines_semantics(spark):
    """Boilerplate-line suppression (CCNet-style line dedup): identity
    is lower(trim(line)) but kept BYTES and order are original; df
    counts DISTINCT docs (in-doc repeats count once); blank lines are
    structure (never counted, never removed); NULL text passes through;
    a fully-suppressed doc keeps ''."""
    from implementing_scds_in_hive_spark.operators.dedup import (
        suppress_repeated_lines,
    )

    boiler = "subscribe now"
    rows = [
        # 4 docs carry the banner (df=4, threshold) with case/space
        # variants — all must be identified as one line
        (1, f"{boiler}\ncontent one\ncontent shared"),
        (2, f"Subscribe NOW\ncontent two"),
        (3, f"  subscribe now \ncontent three\ncontent three"),  # in-doc repeat
        (4, f"SUBSCRIBE NOW\n\ncontent four"),  # plus a blank line
        # df=3 < threshold: "content shared" appears in 3 docs -> kept
        (5, "content shared\nonly five"),
        (6, "content shared\nonly six"),
        (7, None),  # NULL text passthrough
        (8, "subscribe now"),  # becomes empty after suppression (df=5 with this doc)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in suppress_repeated_lines(
            docs, sep="\n", min_doc_freq=5
        ).collect()
    }
    # banner df = 5 (docs 1,2,3,4,8) >= 5 -> removed everywhere;
    # "content shared" df = 3 -> kept; original bytes/order preserved
    assert out[1] == ("content one\ncontent shared", 1)
    assert out[2] == ("content two", 1)
    assert out[3] == ("content three\ncontent three", 1)  # in-doc repeat kept
    assert out[4] == ("\ncontent four", 1)  # blank line preserved verbatim
    assert out[5] == ("content shared\nonly five", 0)
    assert out[6] == ("content shared\nonly six", 0)
    assert out[7] == (None, 0)
    assert out[8] == ("", 1)  # fully suppressed, not dropped

    # threshold boundary: at min_doc_freq=6 the banner (df=5) survives
    out6 = {
        r["doc_id"]: r["n_removed"]
        for r in suppress_repeated_lines(
            docs, sep="\n", min_doc_freq=6
        ).collect()
    }
    assert all(v == 0 for v in out6.values())

    with pytest.raises(ValueError, match="min_doc_freq"):
        suppress_repeated_lines(docs, min_doc_freq=1)

    # separator is literal, even when it is a regex metachar
    pipe = spark.createDataFrame(
        [(i, "ad banner|unique " + str(i)) for i in range(5)],
        "doc_id long, text string",
    )
    outp = {
        r["doc_id"]: r["text"]
        for r in suppress_repeated_lines(pipe, sep="|", min_doc_freq=5).collect()
    }
    assert outp == {i: f"unique {i}" for i in range(5)}
