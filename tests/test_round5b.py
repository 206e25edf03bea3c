"""Invariant tests for the round-5 second-wave operators.

The oracle-parity suite proves cross-engine value equality; these pin
the SEMANTIC invariants each operator promises — on synthetic frames
engineered to exercise behavior the near-uniform testdata corpus
cannot (e.g. documents that only collapse after normalization).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_normalized_dedup_collapses_case_punct_stopwords(spark, sf_smoke, tmp_path):
    """Docs differing only in casing, punctuation, or stopwords must
    share a norm_fp; docs with different content words must not."""
    from csv_to_parquet_spark.operators import dedup

    rows = [
        (1, "Spark shuffles the data, fast!"),
        (2, "spark shuffles a data fast"),  # stopword/case/punct variant
        (3, "SPARK   shuffles -- data;; fast"),  # whitespace/punct variant
        (4, "spark shuffles data slowly"),  # different content word
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    # route through a staged parquet dir so _docs() sees the same shape
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    out = dedup.dedup_normalized_exact(spark, str(tmp_path)).collect()
    by_fp = {r.norm_fp: r for r in out}
    assert len(by_fp) == 2, f"expected 2 normalized groups, got {out}"
    big = max(by_fp.values(), key=lambda r: r.n_docs)
    assert big.n_docs == 3 and big.keep_doc_id == 1
    assert big.n_raw_variants == 3  # three distinct raw texts collapsed


def test_cdc_chunks_boundaries_are_content_defined(spark, sf_smoke, tmp_path):
    """The defining CDC property: an edit at the head of a document
    must NOT move chunk boundaries in the unedited tail (they are
    content-anchored), whereas fixed-offset windows would shift all
    of them."""
    from csv_to_parquet_spark.operators import textops

    base = "alpha beta gamma delta " * 30  # long shared tail
    rows = [(1, "zzz yyy " + base), (2, "qqq " + base)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    out = {r.doc_id: r for r in textops.text_cdc_chunks(spark, str(tmp_path)).collect()}
    # same boundary pairs exist in the shared tail: chunk counts differ
    # by at most the head perturbation (the head adds/removes at most
    # one boundary), never proportionally to document length
    assert abs(out[1].n_chunks - out[2].n_chunks) <= 1
    # determinism: identical text -> identical chunking
    again = {
        r.doc_id: r for r in textops.text_cdc_chunks(spark, str(tmp_path)).collect()
    }
    assert {(r.n_tokens, r.n_chunks) for r in out.values()} == {
        (r.n_tokens, r.n_chunks) for r in again.values()
    }


def test_hashed_bow_is_vocabulary_free_and_bounded(spark, sf_smoke):
    """Buckets are in [0, 64); per-doc bucket totals reconstruct the
    doc's token count (no token lost to the hashing trick)."""
    from csv_to_parquet_spark.operators import textops

    bow = textops.feat_hashed_bow(spark, sf_smoke)
    agg = bow.agg(
        F.min("bucket").alias("mn"),
        F.max("bucket").alias("mx"),
        F.sum("n").alias("total"),
    ).collect()[0]
    assert 0 <= agg.mn and agg.mx < 64
    toks = textops.text_token_counts(spark, sf_smoke).agg(
        F.sum("n_ws_tokens").alias("t")
    ).collect()[0]
    assert agg.total == toks.t


def test_gdpr_erase_counts_are_consistent(spark, sf_smoke):
    """n_before = n_erased + n_after per status, and every erased
    order belongs to a requested key."""
    from csv_to_parquet_spark.operators import maintenance
    from csv_to_parquet_spark.sources.tables import load_table

    rep = maintenance.maintenance_gdpr_erase(spark, sf_smoke).collect()
    assert rep and all(r.n_before == r.n_erased + r.n_after for r in rep)
    orders = load_table(spark, sf_smoke, "orders")
    expected_erased = orders.filter(F.col("o_custkey") % 97 == 0).count()
    assert sum(r.n_erased for r in rep) == expected_erased


def test_fixed_width_scan_is_typed_and_splittable_text(spark, sf_smoke):
    """Read-back schema is fully typed (no strings-for-numbers) and
    row count matches the staged table."""
    from csv_to_parquet_spark.operators import formats
    from csv_to_parquet_spark.sources.tables import load_table

    df = formats.source_fixed_width_scan(spark, sf_smoke)
    types = dict(df.dtypes)
    assert types["c_custkey"] == "bigint"
    assert types["c_acctbal"] == "double"
    assert df.count() == load_table(spark, sf_smoke, "customer").count()


def test_multiline_fixture_really_embeds_newlines(spark, sf_smoke):
    """The staged CSV must contain quoted embedded newlines: a naive
    line-mode read shreds records (more raw lines than documents),
    while the multiLine read reassembles exactly one row per doc."""
    import os
    import tempfile

    from csv_to_parquet_spark.operators import formats
    from csv_to_parquet_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert formats.source_multiline_csv_scan(spark, sf_smoke).count() == n_docs
    tag = os.path.basename(os.path.normpath(sf_smoke)).replace(".", "_")
    path = os.path.join(
        tempfile.gettempdir(), "csv2pq_formats", f"documents_ml_{tag}.csvdir"
    )
    raw_lines = spark.read.text(path).count()
    assert raw_lines > n_docs  # embedded newlines shred a line-mode read


def test_dynamic_overwrite_preserves_untouched_partitions(spark, sf_smoke):
    """The repair batch contains one day, yet every day's partition
    directory must survive on disk — static overwrite mode would have
    truncated the others."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from csv_to_parquet_spark.operators import layout
    from csv_to_parquet_spark.sources.tables import load_table

    out = layout.sink_dynamic_partition_overwrite(spark, sf_smoke)
    n_days = out.select("event_date").distinct().count()
    expected_days = (
        load_table(spark, sf_smoke, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert n_days == expected_days > 1
    tag = os.path.basename(os.path.normpath(sf_smoke)).replace(".", "_")
    path = os.path.join(
        tempfile.gettempdir(), "csv2pq_warehouse", f"daily_counts_{tag}"
    )
    part_dirs = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert len(part_dirs) == expected_days


def test_weighted_median_definition_on_known_frame(spark, tmp_path):
    """Pin the lower-weighted-median definition on a hand-checkable
    frame: values [10,20,30] with weights [1,1,10] -> median 30
    (cum: 1,2,12 vs total 12, first 2*cum>=12 at v=30); equal
    weights [1,1,1] -> middle value 20."""
    from csv_to_parquet_spark.operators import analytics

    li = spark.createDataFrame(
        [("A", 0.10, 1.0), ("A", 0.20, 1.0), ("A", 0.30, 10.0),
         ("B", 0.10, 1.0), ("B", 0.20, 1.0), ("B", 0.30, 1.0)],
        "l_returnflag STRING, l_extendedprice DOUBLE, l_quantity DOUBLE",
    )
    path = str(tmp_path / "lineitem.parquet")
    li.write.parquet(path)
    out = {
        r.l_returnflag: r
        for r in analytics.agg_weighted_median_cents(spark, str(tmp_path)).collect()
    }
    assert out["A"].weighted_median_cents == 30 and out["A"].total_weight == 12
    assert out["B"].weighted_median_cents == 20 and out["B"].total_weight == 3


def test_filter_attribution_partitions_the_corpus(spark, sf_smoke):
    """Every document lands in exactly one attribution bucket, and the
    'kept' count equals the cleaning pipeline's pre-dedup survivors."""
    from csv_to_parquet_spark.operators import pipelines
    from csv_to_parquet_spark.sources.tables import load_table

    rep = {
        r.drop_rule: r.n_docs
        for r in pipelines.quality_filter_attribution(spark, sf_smoke).collect()
    }
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert sum(rep.values()) == n_docs
    assert rep.get("kept", 0) > 0


def test_gram_matrix_exact_on_known_vectors(spark, tmp_path):
    """Hand-checkable Gram: X = [[1,2],[3,4]] in micro-units ->
    XtX = [[10,14],[14,20]] (x 1e12 for the quantization square)."""
    from csv_to_parquet_spark.operators import clustering

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0], 0), (1, [3.0, 4.0], 0)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    )
    path = str(tmp_path / "embeddings.parquet")
    emb.write.parquet(path)
    out = {
        (r.i, r.j): r.gram_micro2
        for r in clustering.embedding_gram_matrix(spark, str(tmp_path)).collect()
    }
    unit = 10**12  # (1e6 quantization)^2
    assert out == {
        (1, 1): 10 * unit,
        (1, 2): 14 * unit,
        (2, 2): 20 * unit,
    }


def test_gram_matrix_shape_and_diagonal(spark, sf_smoke):
    """Upper triangle of a 64-dim Gram = 2080 cells; diagonals are
    sums of squares, hence non-negative."""
    from csv_to_parquet_spark.operators import clustering

    rows = clustering.embedding_gram_matrix(spark, sf_smoke).collect()
    assert len(rows) == 64 * 65 // 2
    assert all(r.gram_micro2 >= 0 for r in rows if r.i == r.j)
    assert all(r.j >= r.i for r in rows)


def test_pca_power_iter_finds_dominant_direction(spark, tmp_path):
    """On a corpus with one dominant axis, the power-iteration
    projection must rank vectors by their dominant-axis coordinate —
    the defining property of PC1 (sign of the direction is
    arbitrary, so compare by absolute rank order)."""
    import numpy as np

    from csv_to_parquet_spark.operators import clustering

    rng = np.random.RandomState(7)
    rows = []
    for i in range(60):
        v = rng.normal(0, 0.02, 8)
        v[0] = (i - 30) * 0.1  # dominant spread on axis 0
        rows.append((i, [float(x) for x in v], 0))
    emb = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    path = str(tmp_path / "embeddings.parquet")
    emb.write.parquet(path)
    out = clustering.embedding_pca_power_iter(spark, str(tmp_path)).collect()
    proj = {r.vec_id: r.proj_micro for r in out}
    axis0 = {i: rows[i][1][0] for i in range(60)}
    order_by_proj = sorted(proj, key=lambda k: proj[k])
    order_by_axis = sorted(axis0, key=lambda k: axis0[k])
    # PC1 order equals axis-0 order (or its exact reverse)
    assert order_by_proj in (order_by_axis, order_by_axis[::-1])


def test_split_doc_chains_detects_shard_overlap(spark, tmp_path):
    """Doc 1's trailing 8 tokens repeated as doc 2's leading 8 tokens
    (the shard-overlap signature) must produce exactly the (1, 2)
    chain edge; unrelated docs stay unmatched."""
    from csv_to_parquet_spark.operators import dedup

    overlap = "o1 o2 o3 o4 o5 o6 o7 o8"
    rows = [
        (1, "a b c d e f g h i j " + overlap),
        (2, overlap + " k l m n p q r s t"),
        (3, "z y x w v u t s r q p o n m"),
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_split_doc_chains(spark, str(tmp_path)).collect()
    }
    assert pairs == {(1, 2)}


def test_seasonal_decompose_recovers_planted_seasonality(spark, tmp_path):
    """Three years of flat monthly revenue with a December bump: the
    December seasonal index must exceed every other month's, and the
    trend must be NULL exactly at the 5-month series edges."""
    import datetime

    from csv_to_parquet_spark.operators import analytics

    rows = []
    k = 0
    for year in (2020, 2021, 2022):
        for month in range(1, 13):
            amount = 1000.0 + (500.0 if month == 12 else 0.0)
            rows.append((k, datetime.date(year, month, 15), amount))
            k += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey BIGINT, o_orderdate DATE, o_totalprice DOUBLE"
    )
    path = str(tmp_path / "orders.parquet")
    orders.write.parquet(path)
    out = analytics.orders_seasonal_decompose(spark, str(tmp_path)).collect()
    assert len(out) == 36
    by_ym = sorted(out, key=lambda r: r.ym)
    for i, r in enumerate(by_ym):
        if i < 5 or i >= 31:
            assert r.trend_cents is None
        else:
            assert r.trend_cents is not None
    seasonal = {r.ym.month: r.seasonal_cents for r in out}
    assert seasonal[12] == max(seasonal.values())
    assert all(seasonal[12] > v for m, v in seasonal.items() if m != 12)


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    """A series of 30 flat days with a level shift at day 16 must
    peak its CUSUM exactly at the last pre-shift day (day 15)."""
    import datetime

    from csv_to_parquet_spark.operators import analytics

    rows = []
    eid = 0
    for day in range(30):
        n = 2 if day < 15 else 10  # shift after day 15
        for _ in range(n):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, 1, 12)
                    + datetime.timedelta(days=day),
                    1,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    path = str(tmp_path / "events.parquet")
    events.write.parquet(path)
    out = analytics.events_cusum_changepoint(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].change_day == datetime.date(2024, 1, 15)


def test_avro_fixture_is_spec_compliant_and_multi_block(spark, sf_smoke):
    """The staged files must carry the Avro magic, a parseable
    metadata map naming the record schema, and (at sf with >200 rows
    per file, multiple sync-delimited blocks); the decoder must
    round-trip every row bit-exactly."""
    import glob
    import json
    import os
    import tempfile

    from csv_to_parquet_spark.operators import formats
    from csv_to_parquet_spark.sources.tables import load_table

    df = formats.source_avro_scan(spark, sf_smoke)
    n = load_table(spark, sf_smoke, "customer").count()
    assert df.count() == n
    tag = os.path.basename(os.path.normpath(sf_smoke)).replace(".", "_")
    files = sorted(
        glob.glob(
            os.path.join(
                tempfile.gettempdir(),
                "csv2pq_formats",
                f"customer_avro_{tag}",
                "*.avro",
            )
        )
    )
    assert len(files) == 4
    buf = open(files[0], "rb").read()
    assert buf[:4] == b"Obj\x01"
    # metadata map must contain the schema with our record name
    pos = 4
    n_meta, pos = formats._avro_read_long(buf, pos)
    metas = {}
    for _ in range(n_meta):
        klen, pos = formats._avro_read_long(buf, pos)
        k = buf[pos : pos + klen].decode()
        pos += klen
        vlen, pos = formats._avro_read_long(buf, pos)
        metas[k] = buf[pos : pos + vlen]
        pos += vlen
    assert json.loads(metas["avro.schema"])["name"] == "customer"
    assert metas["avro.codec"] == b"null"


def test_avro_zigzag_roundtrip():
    from csv_to_parquet_spark.operators import formats

    for v in (0, 1, -1, 63, -64, 2**40, -(2**40), 2**62, -(2**62)):
        buf = formats._avro_zigzag(v)
        got, pos = formats._avro_read_long(buf, 0)
        assert got == v and pos == len(buf)


def test_novelty_curve_decays_for_repeated_content(spark, tmp_path):
    """A doc repeating an earlier doc's text verbatim must score 0
    novelty; the first doc scores 1e6 ppm; a half-copied doc lands
    strictly between."""
    from csv_to_parquet_spark.operators import textops

    base = " ".join(f"w{i}" for i in range(16))
    fresh = " ".join(f"x{i}" for i in range(9))
    rows = [(1, base), (2, base), (3, base + " " + fresh)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    out = {
        r.doc_id: r
        for r in textops.text_novelty_curve(spark, str(tmp_path)).collect()
    }
    assert out[1].novelty_ppm == 1_000_000
    assert out[2].novelty_ppm == 0
    assert 0 < out[3].novelty_ppm < 1_000_000


def test_max_gap_funnel_is_tighter_and_monotone(spark, sf_smoke):
    """Gap-constrained step counts can never exceed the unconstrained
    funnel's, and each step can only shrink the cohort."""
    from csv_to_parquet_spark.operators import analytics

    tight = {
        r.step: r.n_users
        for r in analytics.events_funnel_max_gap(spark, sf_smoke).collect()
    }
    loose = {
        r.step: r.n_users
        for r in analytics.events_funnel_steps(spark, sf_smoke).collect()
    }
    assert tight["view"] == loose["view"]
    assert tight["click_within_gap"] <= loose["click_after_view"]
    assert tight["purchase_within_gap"] <= loose["purchase_after_click"]
    assert (
        tight["view"] >= tight["click_within_gap"] >= tight["purchase_within_gap"]
    )


def test_dau_mau_bounds_and_truncated_window(spark, sf_smoke):
    """DAU <= MAU on every day (stickiness <= 1e6 ppm), and MAU is
    non-decreasing over the first 30 truncated-window days for a
    stable corpus (each added day can only grow the trailing set
    while the window is still filling)."""
    from csv_to_parquet_spark.operators import analytics

    rows = sorted(
        analytics.events_dau_mau_stickiness(spark, sf_smoke).collect(),
        key=lambda r: r.day,
    )
    assert rows
    for r in rows:
        assert r.dau <= r.mau
        assert r.stickiness_ppm <= 1_000_000
    # while the 30-day window is still filling, it is [d0, d] — a
    # superset of every earlier window, so MAU cannot decrease
    for prev, cur in zip(rows[:29], rows[1:30]):
        assert cur.mau >= prev.mau


def test_gini_known_distributions(spark, tmp_path):
    """Gini pinned on hand-checkable frames: perfectly equal revenue
    -> 0 ppm; one customer owning everything -> (n-1)/n of 1e6."""
    from csv_to_parquet_spark.operators import analytics

    equal = [(i, i, 100.0) for i in range(10)]
    df = spark.createDataFrame(
        equal, "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE"
    )
    p1 = tmp_path / "eq"
    p1.mkdir()
    df.write.parquet(str(p1 / "orders.parquet"))
    out = analytics.orders_revenue_gini(spark, str(p1)).collect()[0]
    assert out.gini_ppm == 0 and out.n_customers == 10

    # 10 customers, one gets all the revenue: G = (n-1)/n = 0.9
    skew = [(i, i, 0.01) for i in range(9)] + [(9, 9, 10_000.0)]
    df2 = spark.createDataFrame(
        skew, "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE"
    )
    p2 = tmp_path / "sk"
    p2.mkdir()
    df2.write.parquet(str(p2 / "orders.parquet"))
    out2 = analytics.orders_revenue_gini(spark, str(p2)).collect()[0]
    assert 880_000 <= out2.gini_ppm <= 900_000  # ~0.9 minus the 9 cents


def test_abc_migration_partitions_all_customers(spark, sf_smoke):
    """Matrix cells sum to the distinct customers active in EITHER
    period, and no cell pairs 'N' with 'N'."""
    from pyspark.sql import functions as F

    from csv_to_parquet_spark.operators import analytics
    from csv_to_parquet_spark.sources.tables import load_table

    cells = analytics.orders_abc_migration(spark, sf_smoke).collect()
    assert all(not (r.class_p1 == "N" and r.class_p2 == "N") for r in cells)
    n_customers = (
        load_table(spark, sf_smoke, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in cells) == n_customers
