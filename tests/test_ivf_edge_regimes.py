"""Regimes the fixture-scale IVF goldens can never reach.

The 2000-doc goldens exercise the trained quantizer end-to-end but keep
every magnitude tiny; these tests pin the behaviors that only matter at
corpus scale or on degenerate inputs:

1. assignment arithmetic stays inside int64 when a cluster holds
   millions of members (the n-scaled numerator the code used to compare
   overflows exactly there);
2. the sign-safe pmod floor division agrees across Spark, DuckDB and
   Python for negative centroid sums (negative embedding dims are real
   — the testdata embeddings span ~[-0.53, 0.46]);
3. an empty md5-threshold training sample falls back to training on the
   whole input instead of committing an empty index;
4. a NULL text row survives ann_enrich (treated as the empty document)
   instead of vanishing through the inner join.
"""

import hashlib

import pytest
from pyspark.sql import functions as F


def test_ivf_assign_no_overflow_at_large_cluster(spark):
    from frontier_engine.corpus import _ivf_assign

    n_big, cent_val = 10_000_000, 9_000
    val = 8_000
    # the pre-fix numerator for this single (dim, cell) term alone
    # already exceeds int64 — this is the regime the fix is for
    assert (n_big * val - n_big * cent_val) ** 2 > 2**63 - 1

    cent = spark.createDataFrame(
        [(0, d, n_big * cent_val, n_big) for d in range(16)]
        + [(1, d, -5_000, 1) for d in range(16)],
        "k int, d int, s long, n long",
    )
    exploded = spark.createDataFrame(
        [(7, d, val) for d in range(16)], "_vid long, d int, val long"
    )
    got = _ivf_assign(exploded, cent, "_vid").collect()
    assert [(r["_vid"], r["k"]) for r in got] == [(7, 0)]


def test_ivf_floor_div_cross_engine_parity(spark):
    import duckdb

    cases = [(-7, 2), (7, 2), (-6, 2), (-1, 3), (1, 3),
             (-90_000_000_000, 7), (90_000_000_000, 7), (0, 5)]
    sdf = spark.createDataFrame(cases, "s long, n long")
    got_spark = {
        (r["s"], r["n"]): r["c"]
        for r in sdf.select(
            "s", "n", F.expr("(s - pmod(s, n)) div n").alias("c")
        ).collect()
    }
    got_duck = {
        (s, n): c
        for s, n, c in duckdb.sql(
            "SELECT s, n, (s - ((s % n + n) % n)) // n FROM (VALUES "
            + ", ".join(f"({s}, {n})" for s, n in cases)
            + ") t(s, n)"
        ).fetchall()
    }
    for s, n in cases:
        assert got_spark[(s, n)] == s // n, (s, n)
        assert got_duck[(s, n)] == s // n, (s, n)


def test_ivf_empty_sample_fallback(spark):
    from frontier_engine.corpus import ivf_py, ivf_train_collect

    # ids whose md5 leading hex is NOT '0': at sample_hex=1 the sample
    # is empty, so training must fall back to the whole input
    ids = [
        i for i in range(200)
        if hashlib.md5(str(i).encode()).hexdigest()[0] != "0"
    ][:20]
    assert len(ids) == 20
    items = [(i, [float(i % 7) - 3.0] * 16) for i in ids]
    df = spark.createDataFrame(
        [(i, e) for i, e in items], "url_hash long, emb array<double>"
    )
    rows = ivf_train_collect(df, "url_hash", sample_hex=1)
    assert rows, "empty sample must fall back, not train on nothing"
    want_rows, _cells = ivf_py(items, sample_hex=1)
    assert rows == want_rows


def test_ann_enrich_null_text_kept(spark):
    from frontier_engine.corpus import ann_enrich, cell_py, embed_py

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "url_hash long, _text string"
    )
    got = {
        r["url_hash"]: (list(r["emb"]), r["cell"])
        for r in ann_enrich(df, "_text").collect()
    }
    assert set(got) == {1, 2}, "NULL text row must not vanish"
    want_emb = embed_py(None)
    assert want_emb == embed_py("")
    assert got[2] == (want_emb, cell_py(want_emb))
    assert got[1] == (embed_py("hello world"), cell_py(embed_py("hello world")))


def test_enrich_scalars_null_text_consistent(spark):
    """enrich_scalars must apply the same NULL->'' coalesce as ann_enrich:
    the two feed ONE fused stage_frame, and without it a NULL-text row got
    NULL fp/n_words/ratios yet a concrete predicted_lang ('other' via the
    when-chain's NULL fall-through) — an internally inconsistent
    page_stats row. NULL text == empty document, in every column."""
    from frontier_engine.corpus import enrich_scalars

    df = spark.createDataFrame(
        [(1, ""), (2, None)], "url_hash long, _text string"
    )
    rows = {
        r["url_hash"]: r.asDict()
        for r in enrich_scalars(df, "_text").collect()
    }
    empty, nul = rows[1], rows[2]
    for k in ("fp", "n_words", "avg_token_len", "stop_ratio",
              "est_bpe_tokens", "predicted_lang"):
        assert nul[k] == empty[k], (k, nul[k], empty[k])
    assert nul["n_words"] == 1  # split('') -> [''], the empty-doc shape
    assert nul["fp"] is not None


def test_ivf_assign_duplicate_ids_per_row_nearest(spark):
    """Re-assigning an ACCUMULATED index under recrawl TTL hits duplicate
    url_hash ids (one row per fetch). Each physical row must still get its
    OWN nearest cell — the assignment is keyed by (id, hash(quantized
    emb)), so two fetches of one URL with different content route
    independently, and identical duplicate rows keep both rows with the
    (shared, correct) cell. Before this fix, duplicate ids were assigned
    over their COMBINED dims: one deterministic-but-wrong cell for both."""
    from frontier_engine.corpus import ivf_assign_cells, ivf_route_py

    # two trained cells: k=0 centered at 0.0, k=1 centered at 1.0
    cent_rows = sorted(
        [(0, d, 0, 1) for d in range(16)]
        + [(1, d, 10_000, 1) for d in range(16)]
    )
    lo, hi = [0.0] * 16, [1.0] * 16
    df = spark.createDataFrame(
        [(42, 0, 0, lo), (42, 0, 0, hi), (7, 0, 0, hi),
         (99, 0, 0, lo), (99, 0, 0, lo)],
        "url_hash long, host_bucket int, cell int, emb array<double>",
    )
    got = ivf_assign_cells(spark, df, "url_hash", cent_rows).collect()
    assert len(got) == 5, "row count must survive the assignment join"
    for r in got:  # every row: its own emb's nprobe=1 route
        assert r["cell"] == ivf_route_py(cent_rows, list(r["emb"]))[0]
    cells_42 = sorted(r["cell"] for r in got if r["url_hash"] == 42)
    assert cells_42 == [0, 1], "recrawled content must route independently"
    assert [r["cell"] for r in got if r["url_hash"] == 99] == [0, 0]


def test_ivf_probe_without_centroids_fails_loudly(spark, tmp_path):
    """Probing an index with NO committed ann_centroids (an LSH-mode
    index, or a cycle before any IVF build) must raise — the old behavior
    routed to zero cells and returned an empty DataFrame, silently."""
    import pytest

    from frontier_engine.corpus import ivf_probe_topk
    from frontier_engine.tableio import TableIO

    io = TableIO(str(tmp_path))
    with pytest.raises(ValueError, match="ann_centroids"):
        ivf_probe_topk(spark, io, 1, [1.0] * 16, topk=3)
    with pytest.raises(ValueError, match="ann_centroids"):
        ivf_probe_topk(spark, io, 1, [1.0] * 16, topk=3, whole_corpus=True)
