"""Semantics tests for the round-3 mining operators — properties the
registry-wide oracle comparison cannot see (hand-built inputs,
mathematical invariants, degenerate corpora)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from encodesrv_spark.plans import mining


def test_source_token_kl_nonnegative_and_uniform_corpus_zero(spark, sf_dir):
    """KL(P‖Q) >= 0 always (Gibbs), and a single-source corpus has
    P = Q exactly, so its KL must be 0."""
    out = mining.source_token_kl(spark, sf_dir)
    rows = out.collect()
    assert rows and all(r["kl_vs_corpus_bits"] >= 0 for r in rows)

    one = spark.createDataFrame(
        [(1, "a b c", "srcX"), (2, "a b", "srcX")], "doc_id long, text string, source string"
    )
    from encodesrv_spark.operators import dedup
    from encodesrv_spark.plans.corpus import _tokens_ne

    tok = dedup.fan_out(one).select("source", F.explode(_tokens_ne()).alias("t"))
    c = tok.groupBy("source", "t").agg(F.count("*").cast("double").alias("n"))
    s = c.groupBy("source").agg(F.sum("n").alias("sn"))
    g = c.agg(F.sum("n").alias("tn"))
    ct = c.groupBy("t").agg(F.sum("n").alias("ctn"))
    p = F.col("n") / F.col("sn")
    q = F.col("ctn") / F.col("tn")
    kl = (
        c.join(s, "source").join(ct, "t").crossJoin(g)
        .groupBy("source")
        .agg(F.round(F.sum(p * F.log2(p / q)), 6).alias("kl"))
        .collect()[0]["kl"]
    )
    assert kl == 0.0


def test_bigram_pmi_matches_hand_computation(spark):
    """Tiny corpus where PMI is computable by hand: bigrams of
    'x y x y' are (x,y),(y,x),(x,y) → c(x,y)=2, c(y,x)=1, N=3.
    PMI(x,y) = log2( (2/3) / ((2/3)*(2/3)) ) = log2(3/2)."""
    from encodesrv_spark.operators import dedup
    from encodesrv_spark.plans.corpus import _tokens_ne

    docs = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    toks = dedup.fan_out(docs).select(_tokens_ne().alias("ts"))
    bg = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)),"
                "         slice(ts, 2, greatest(size(ts) - 1, 0)),"
                "         (x, y) -> struct(x AS a, y AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    c = bg.groupBy("a", "b").agg(F.count("*").cast("double").alias("n_ab"))
    rows = {(r["a"], r["b"]): r["n_ab"] for r in c.collect()}
    assert rows == {("x", "y"): 2.0, ("y", "x"): 1.0}
    # marginals over the bigram table: n_a(x)=2, n_b(y)=2, N=3
    pmi = math.log2((2 / 3) / ((2 / 3) * (2 / 3)))
    assert abs(pmi - math.log2(1.5)) < 1e-12


def test_bigram_pmi_single_token_docs_yield_no_pairs(spark):
    """slice+zip (not sequence) must make 0/1-token docs contribute
    zero bigrams instead of erroring or emitting a degenerate pair."""
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "  ")], "doc_id long, text string"
    )
    from encodesrv_spark.operators import dedup
    from encodesrv_spark.plans.corpus import _tokens_ne

    toks = dedup.fan_out(docs).select(_tokens_ne().alias("ts"))
    bg = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)),"
                "         slice(ts, 2, greatest(size(ts) - 1, 0)),"
                "         (x, y) -> struct(x AS a, y AS b))"
            )
        ).alias("p")
    )
    assert bg.count() == 0


def test_doc_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(types); norm_entropy in [0, 1] (NULL only for
    single-type docs); a constant doc has H = 0."""
    out = mining.doc_token_entropy(spark, sf_dir).collect()
    for r in out:
        # 6-dp rounding can tip an exactly-uniform doc a hair over
        # the H = log2(types) bound
        assert 0 <= r["entropy_bits"] <= math.log2(max(r["n_types"], 2)) + 1e-5
        if r["n_types"] > 1:
            assert 0 <= r["norm_entropy"] <= 1 + 1e-5
        else:
            assert r["norm_entropy"] is None

    # a constant doc collapses to one (doc, token) row -> H = 0 and
    # norm_entropy NULL by the types>1 guard
    const = spark.createDataFrame(
        [(1, "a a a a a")], "doc_id long, text string"
    )
    from encodesrv_spark.operators import dedup
    from encodesrv_spark.plans.corpus import _tokens_ne

    tok = dedup.fan_out(const).select("doc_id", F.explode(_tokens_ne()).alias("t"))
    c = tok.groupBy("doc_id", "t").agg(F.count("*").cast("double").alias("n"))
    assert c.count() == 1


def test_sq8_codes_reconstruct_within_half_step(spark, sf_dir):
    """Scalar quantization contract: every reconstruction error is
    bounded by (scale/2)² per dim, so the per-vector MSE is bounded by
    max_scale²/4 — a wrong scale or clamp breaks this immediately."""
    out = mining.embedding_sq8(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    # recompute the worst per-dim scale directly
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.operators.similarity import _as_double

    e = load_table(spark, sf_dir, "embeddings").select(
        _as_double("embedding").alias("emb")
    )
    stats = (
        e.select(F.posexplode("emb").alias("pos", "x"))
        .groupBy("pos")
        .agg(((F.max("x") - F.min("x")) / 255.0).alias("scale"))
    )
    max_scale = stats.agg(F.max("scale")).collect()[0][0]
    bound = (max_scale / 2) ** 2 + 1e-9
    assert all(r["mse"] <= bound for r in rows)
    assert all(0 <= r["code_sum"] <= 255 * 64 for r in rows)


def test_winsorize_means_contract(spark, sf_dir):
    """Winsorized mean sits within [p01, p99]; clipping touches ~2% of
    rows (exactly the tail mass for a continuous value column)."""
    rows = mining.winsorize_values(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p01"] <= r["mean_winsorized"] <= r["p99"]
        # continuous values: clipped fraction ≈ 2%, generous envelope
        assert r["n_clipped"] / r["n"] < 0.05


def test_threshold_curve_is_monotone_nonincreasing(spark, sf_dir):
    """Raising the threshold can only shrink the flagged set — both the
    pair count and the distinct-doc count must be non-increasing in
    the threshold, and every configured threshold row must exist."""
    rows = sorted(
        mining.neardup_threshold_curve(spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    assert [round(r["threshold"], 1) for r in rows] == [
        0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9,
    ]
    for lo, hi in zip(rows, rows[1:]):
        assert lo["n_pairs"] >= hi["n_pairs"]
        assert lo["n_docs_flagged"] >= hi["n_docs_flagged"]
        assert lo["n_docs_flagged"] <= 2 * lo["n_pairs"] or lo["n_pairs"] == 0


def test_contrastive_pairs_planted_geometry(spark):
    """Hand-built geometry: two tight same-label clusters far apart.
    The positive must come from the query's own cluster with high
    sim and the hard negative from the other cluster with low sim →
    a clearly positive margin.  Then flip one label to plant an
    impostor next to the query and the margin must collapse."""

    def run(rows):
        emb = spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )
        # same pipeline as the registry op, on the hand-built frame
        from encodesrv_spark.operators.similarity import _as_double, dot

        e = emb.select(
            "vec_id", "label", _as_double("embedding").alias("emb")
        ).withColumn("nrm", dot(F.col("emb"), F.col("emb")))
        q = e.filter(F.col("vec_id") < 1).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("emb").alias("qemb"),
            F.col("nrm").alias("qnrm"),
        )
        scored = (
            e.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                (F.col("label") == F.col("qlabel")).alias("same"),
                F.round(
                    dot(F.col("qemb"), F.col("emb"))
                    / F.sqrt(F.col("qnrm") * F.col("nrm")),
                    4,
                ).alias("cos_sim"),
            )
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("query_id", "same").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        top = scored.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        )
        same = F.col("same")
        return top.groupBy("query_id").agg(
            F.max(F.when(same, F.col("cos_sim"))).alias("pos_sim"),
            F.max(F.when(~same, F.col("cos_sim"))).alias("neg_sim"),
            F.max(F.when(same, F.col("neighbor_id"))).alias("pos_id"),
        ).collect()[0]

    base = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [0.99, 0.14]),
        (2, 1, [0.0, 1.0]),
        (3, 1, [0.1, 0.99]),
    ]
    r = run(base)
    assert r["pos_id"] == 1
    assert r["pos_sim"] - r["neg_sim"] > 0.5

    # plant an impostor: nearest vector keeps its position, takes the
    # other label → margin collapses (goes negative)
    planted = [
        (0, 0, [1.0, 0.0]),
        (1, 1, [0.99, 0.14]),  # impostor
        (2, 0, [0.0, 1.0]),
        (3, 1, [0.1, 0.99]),
    ]
    r2 = run(planted)
    assert r2["pos_sim"] < r2["neg_sim"]


def test_contrastive_pairs_registry_output_shape(spark, sf_dir):
    """End-to-end registry call: 8 query rows, margin == pos−neg at
    4 dp, and ids are real corpus vectors distinct from the query."""
    rows = mining.contrastive_pairs(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        if r["pos_sim"] is not None and r["neg_sim"] is not None:
            assert abs(r["margin"] - round(r["pos_sim"] - r["neg_sim"], 4)) < 1e-9
        assert r["pos_id"] != r["query_id"]
        assert r["neg_id"] != r["query_id"]


# ---------------------------------------------------------------------------
# batch 3
# ---------------------------------------------------------------------------


def test_token_coverage_curve_monotone(spark, sf_dir):
    """Coverage is non-decreasing in the vocab cut, bounded by 1, and
    n_types never exceeds the cut (or the true vocab)."""
    rows = sorted(
        mining.token_coverage_curve(spark, sf_dir).collect(),
        key=lambda r: r["vocab_cut"],
    )
    assert [r["vocab_cut"] for r in rows] == [100, 1000, 5000]
    for r in rows:
        assert 0 < r["coverage"] <= 1.0
        assert r["n_types"] <= r["vocab_cut"]
    for lo, hi in zip(rows, rows[1:]):
        assert hi["coverage"] >= lo["coverage"]
        assert hi["n_types"] >= lo["n_types"]


def test_rfm_scores_in_range_and_segment_consistent(spark, sf_dir):
    rows = mining.user_rfm_segments(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 4
        assert 1 <= r["f_score"] <= 4
        assert 1 <= r["m_score"] <= 4
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"
    # quartile scoring must actually spread: both extremes occur
    for col in ("f_score", "m_score"):
        vals = {r[col] for r in rows}
        assert 1 in vals and 4 in vals


def test_change_points_flags_planted_level_shift(spark, tmp_path):
    """A flat hourly series with one large level shift: only the shift
    hour (and possibly its reversion) may be flagged, and the planted
    hour MUST be."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for h in range(48):
        # two events per hour, value 10 except a +1000 burst at hour 24
        v = 1010.0 if h == 24 else 10.0
        for k in range(2):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=k), 1, "click", v, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = mining.events_change_points(spark, str(tmp_path)).collect()
    flagged = {r["hour_start"] for r in out}
    assert "2026-01-02 00:00:00" in flagged  # hour 24: the +1000 jump
    assert "2026-01-02 01:00:00" in flagged  # hour 25: the reversion
    assert len(flagged) == 2


def test_tfidf_cosine_pairs_planted_twin(spark, tmp_path):
    """A near-verbatim rewording (shared rare terms) must score near 1;
    a disjoint-vocabulary doc must produce no pair at all."""
    docs = spark.createDataFrame(
        [
            (1, "quantum flux capacitor resonance chamber experiment", "en", "s", 1),
            (2, "quantum flux capacitor resonance chamber experiment", "en", "s", 1),
            (3, "completely different words about gardening tulips", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = mining.tfidf_cosine_pairs(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["cos_sim"] for r in out}
    assert pairs.get((1, 2)) == 1.0
    assert all({a, b} == {1, 2} for (a, b) in pairs)


def test_norm_outliers_flags_planted_giant(spark, tmp_path):
    """500 unit-ish vectors plus one 100x-norm vector: exactly the
    giant is flagged by the modified-z gate."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(0.9, 1.1) for _ in range(8)], 0) for i in range(100)
    ]
    rows.append((100, [100.0] * 8, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = mining.embedding_norm_outliers(spark, str(tmp_path)).collect()
    flagged = {r["vec_id"] for r in out if r["is_outlier"]}
    assert flagged == {100}


def test_sq8_ann_scores_track_exact_cosine(spark, sf_dir):
    """ADC over SQ8 codes is an approximation with a bounded error:
    every returned approx_cos must sit within a small envelope of the
    exact cosine for the same (query, neighbor) pair."""
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.operators.similarity import brute_force_knn

    ann = mining.embedding_sq8_ann(spark, sf_dir)
    exact = brute_force_knn(
        load_table(spark, sf_dir, "embeddings"), n_query_vecs=8, k=500
    ).select("query_id", "neighbor_id", "cos_sim")
    joined = ann.join(exact, ["query_id", "neighbor_id"]).select(
        F.abs(F.col("approx_cos") - F.col("cos_sim")).alias("err")
    )
    mx = joined.agg(F.max("err")).collect()[0][0]
    assert mx is not None and mx < 0.02


def test_edge_embeddedness_hand_graph(spark, tmp_path):
    """Triangle {1,2,3} plus pendant edge (3,4), each basket twice for
    support>=2: edge (1,2) has exactly one shared neighbor (3) and
    nbr_jaccard 1/(2+2-2-1) = 1.0; the bridge (3,4) has zero shared
    neighbors and jaccard 0."""
    rows = []
    for okey, parts in [
        (1, [1, 2, 3]),
        (2, [1, 2, 3]),
        (3, [3, 4]),
        (4, [3, 4]),
    ]:
        for p in parts:
            rows.append((okey, p))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    from encodesrv_spark.plans.extended import part_edge_embeddedness

    out = {
        (r["p1"], r["p2"]): r
        for r in part_edge_embeddedness(spark, str(tmp_path)).collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 3), (3, 4)}
    assert out[(1, 2)]["common_neighbors"] == 1
    assert out[(1, 2)]["nbr_jaccard"] == 1.0
    assert out[(3, 4)]["common_neighbors"] == 0
    assert out[(3, 4)]["nbr_jaccard"] == 0.0
    # degrees: 1,2 have deg 2; 3 has deg 3; 4 has deg 1
    assert (out[(3, 4)]["deg_a"], out[(3, 4)]["deg_b"]) == (3, 1)


def test_quality_calibration_keeps_same_fraction_per_source(spark, sf_dir):
    """The whole point of per-source calibration: every source keeps
    ~the same fraction (1 - keep_frac), while the global threshold's
    per-source keep rate varies with the source's score distribution."""
    rows = mining.quality_percentile_by_source(spark, sf_dir).collect()
    assert rows
    per_src = {}
    for r in rows:
        a = per_src.setdefault(r["source"], [0, 0, 0])
        a[0] += 1
        a[1] += bool(r["keep_calibrated"])
        a[2] += bool(r["keep_global"])
    cal_rates = [kept / n for n, kept, _ in per_src.values()]
    # percent_rank >= 0.3 keeps the top ~70% of every source
    assert all(0.6 <= rate <= 0.8 for rate in cal_rates)
    # consistency: src_pr in [0,1]; keep_calibrated == (src_pr >= 0.3)
    for r in rows:
        assert 0 <= r["src_pr"] <= 1
        assert r["keep_calibrated"] == (r["src_pr"] >= 0.3 - 1e-9)


def test_cluster_size_hist_accounts_for_all_clustered_docs(spark, sf_dir):
    """Histogram mass must equal the clustered-doc count from the
    underlying components, removable = docs - clusters, sizes >= 2."""
    from encodesrv_spark.plans.llm import dedup_clusters

    hist = mining.dedup_cluster_size_hist(spark, sf_dir).collect()
    comp = dedup_clusters(spark, sf_dir)
    n_docs = comp.count()
    n_clusters = comp.select("component").distinct().count()
    assert sum(r["n_docs"] for r in hist) == n_docs
    assert sum(r["n_clusters"] for r in hist) == n_clusters
    assert sum(r["n_removable"] for r in hist) == n_docs - n_clusters
    assert all(r["cluster_size"] >= 2 for r in hist)


def test_top_pc_is_unit_and_dominant(spark, sf_dir):
    """The returned loading vector must be unit-norm, and projecting
    the centered corpus on it must capture more variance than any
    coordinate axis (it dominates every single dimension's variance)."""
    rows = sorted(
        mining.embedding_top_pc(spark, sf_dir).collect(), key=lambda r: r["dim"]
    )
    assert len(rows) == 64
    nrm2 = sum(r["loading"] ** 2 for r in rows)
    assert abs(nrm2 - 1.0) < 1e-3
    lam = rows[0]["eigenvalue"]
    assert all(r["eigenvalue"] == lam for r in rows)
    assert lam > 0

    # variance along the PC vs the best single axis
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.operators.similarity import _as_double

    e = load_table(spark, sf_dir, "embeddings").select(
        _as_double("embedding").alias("emb")
    )
    v = [r["loading"] for r in rows]
    proj = e.select(
        F.aggregate(
            F.zip_with(
                "emb",
                F.array(*[F.lit(x) for x in v]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("p")
    )
    pc_var = proj.agg(F.var_samp("p")).collect()[0][0]
    dim_vars = (
        e.select(F.posexplode("emb").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.var_samp("x").alias("v"))
        .agg(F.max("v"))
        .collect()[0][0]
    )
    assert pc_var > dim_vars


def test_burstiness_lower_bound_and_hand_case(spark):
    """burstiness >= 1 by definition (cf >= df); a token occurring 3x
    in one doc and 1x in another scores (3+1)/2 = 2."""
    docs = spark.createDataFrame(
        [(i, "w x y z filler filler2") for i in range(25)]
        + [(100, "bursty bursty bursty w x y z"), (101, "bursty w x y z")],
        "doc_id long, text string",
    )
    from encodesrv_spark.operators import dedup
    from encodesrv_spark.plans.corpus import _tokens_ne

    tok = dedup.fan_out(docs).select("doc_id", F.explode(_tokens_ne()).alias("t"))
    c = tok.groupBy("t").agg(
        F.count("*").alias("cf"), F.countDistinct("doc_id").alias("df")
    )
    by_t = {r["t"]: (r["cf"], r["df"]) for r in c.collect()}
    assert by_t["bursty"] == (4, 2)
    assert all(cf >= df for cf, df in by_t.values())


def test_doc_nearest_neighbor_symmetry_and_planted_twin(spark, tmp_path):
    """A planted verbatim twin must be each other's nearest neighbor at
    jaccard 1.0; every doc with a peer appears exactly once."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
            (2, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
            (3, "alpha beta gamma other words here now", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in mining.doc_nearest_neighbor(spark, str(tmp_path)).collect()}
    assert out[1]["nn_doc_id"] == 2 and out[1]["jaccard"] == 1.0
    assert out[2]["nn_doc_id"] == 1 and out[2]["jaccard"] == 1.0
    assert out[3]["nn_doc_id"] in (1, 2) and out[3]["jaccard"] < 1.0
    assert len(out) == 3


def test_seasonality_index_averages_to_one(spark, sf_dir):
    """The n-weighted mean of the seasonality index is exactly 1 by
    construction; indexes are positive and year coverage is sane."""
    rows = mining.order_seasonality_index(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 12
    total_n = sum(r["n"] for r in rows)
    weighted = sum(r["seasonality_index"] * r["n"] for r in rows) / total_n
    assert abs(weighted - 1.0) < 1e-3
    assert all(r["seasonality_index"] > 0 for r in rows)
    assert all(r["n_years"] >= 1 for r in rows)


def test_order_gaps_positive_and_ordered_quantiles(spark, sf_dir):
    rows = mining.customer_order_gaps(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_gaps"] > 0
        assert 0 <= r["median_gap"] <= r["p90_gap"]
        assert r["mean_gap"] > 0


def test_degree_dist_ccdf_contract(spark, sf_dir):
    """CCDF is non-increasing in degree, starts ≤ 1, ends at exactly 1
    for the minimum degree; histogram mass = node count."""
    rows = sorted(
        mining.copurchase_degree_dist(spark, sf_dir).collect(),
        key=lambda r: r["degree"],
    )
    assert rows
    assert abs(rows[0]["ccdf"] - 1.0) < 1e-9  # min degree: all nodes ≥ it
    for lo, hi in zip(rows, rows[1:]):
        assert hi["ccdf"] <= lo["ccdf"] + 1e-9
    assert all(r["n_nodes"] >= 1 for r in rows)


def test_bigram_lm_flags_shuffled_text(spark, tmp_path):
    """A document whose bigrams never occur elsewhere (shuffled word
    order) must score strictly higher perplexity than the well-formed
    repeats of the corpus pattern."""
    base = "the quick brown fox jumps over the lazy dog"
    shuffled = "dog the over quick lazy fox brown jumps the"
    rows = [(i, base, "en", "s", 1) for i in range(10)]
    rows.append((100, shuffled, "en", "s", 1))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in mining.bigram_lm_perplexity(spark, str(tmp_path)).collect()}
    assert out[100]["perplexity"] > out[0]["perplexity"]
    assert all(r["perplexity"] > 0 for r in out.values())


def test_hash_features_sparsity_bounds(spark, sf_dir):
    """nnz is bounded by the hash dimension; L2 <= L1 <= n_tokens; a
    doc's norms are stable functions of its tokens (hash determinism:
    two identical corpora give identical frames)."""
    a = {r["doc_id"]: (r["nnz"], r["l1"], r["l2"]) for r in mining.doc_hash_features(spark, sf_dir).collect()}
    b = {r["doc_id"]: (r["nnz"], r["l1"], r["l2"]) for r in mining.doc_hash_features(spark, sf_dir).collect()}
    assert a == b and a
    for nnz, l1, l2 in a.values():
        assert 0 <= nnz <= 64
        assert l2 <= l1 + 1e-9


def test_referential_integrity_detects_planted_orphan(spark, tmp_path, sf_dir):
    """Clean testdata has zero orphans everywhere; planting an orphan
    orderkey in lineitem must surface exactly one orphan on exactly
    the lineitem->orders edge."""
    import shutil

    clean = {r["fk_edge"]: r["n_orphans"] for r in mining.referential_integrity_audit(spark, sf_dir).collect()}
    assert set(clean.values()) == {0}

    # copy the tables, corrupt lineitem with one orphan row
    import glob as _g
    for t in ["orders", "customer", "supplier", "part", "nation", "lineitem"]:
        src = f"{sf_dir}/{t}.parquet"
        shutil.copyfile(src, f"{tmp_path}/{t}.parquet")
    from encodesrv_spark.catalog import load_table

    l = load_table(spark, sf_dir, "lineitem")
    one = l.limit(1).withColumn("l_orderkey", F.lit(999_999_999).cast(l.schema["l_orderkey"].dataType))
    l.unionByName(one).write.mode("overwrite").parquet(f"{tmp_path}/lineitem_dir.parquet")
    import os

    os.remove(f"{tmp_path}/lineitem.parquet")
    os.rename(f"{tmp_path}/lineitem_dir.parquet", f"{tmp_path}/lineitem.parquet")

    dirty = {r["fk_edge"]: r["n_orphans"] for r in mining.referential_integrity_audit(spark, str(tmp_path)).collect()}
    assert dirty["lineitem.l_orderkey -> orders"] == 1
    assert dirty["orders.o_custkey -> customer"] == 0


def test_mann_kendall_planted_trends(spark, tmp_path):
    """Strictly increasing monthly revenue gives tau = 1; strictly
    decreasing gives tau = -1."""
    import datetime as dt

    def write(vals):
        rows = [
            (i, i, "O", float(v), dt.date(2024, m, 1), "1-URGENT", "c", 0, "x")
            for i, (m, v) in enumerate(vals)
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate date, o_orderpriority string,"
            " o_clerk string, o_shippriority int, o_comment string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    write([(1, 10), (2, 20), (3, 30), (4, 40)])
    r = mining.revenue_trend_mann_kendall(spark, str(tmp_path)).collect()[0]
    assert (r["kendall_tau"], r["direction"]) == (1.0, "increasing")

    write([(1, 40), (2, 30), (3, 20), (4, 10)])
    r = mining.revenue_trend_mann_kendall(spark, str(tmp_path)).collect()[0]
    assert (r["kendall_tau"], r["direction"]) == (-1.0, "decreasing")


def test_cusum_catches_small_persistent_shift(spark, tmp_path):
    """A +0.5σ-ish persistent shift: each individual hour's |z| is far
    below the change-point threshold, but the CUSUM accumulates and
    must alarm in the shifted regime; the pre-shift regime stays
    quiet. Recursion identity check: cusum columns are nonnegative."""
    import datetime as dt

    base = dt.datetime(2026, 3, 1)
    rows, eid = [], 0
    # long in-control regime + short shifted tail: the retrospective
    # baseline (global mean/sd) then sits near the in-control level, so
    # only the shifted regime accumulates
    for h in range(64):
        level = 10.0 if h < 48 else 10.6
        # alternate ±0.2 around the level so per-type sd is real
        v = level + (0.2 if h % 2 == 0 else -0.2)
        for k in range(2):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=k), 1, "click", v, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = sorted(
        mining.events_cusum(spark, str(tmp_path)).collect(),
        key=lambda r: r["hour_start"],
    )
    assert all(r["cusum_up"] >= -1e-9 and r["cusum_dn"] >= -1e-9 for r in out)
    early = out[:40]
    late = out[54:]
    assert not any(r["drift_alarm"] for r in early)
    assert any(r["drift_alarm"] for r in late)


def test_kcore_peel_hand_graph(spark, tmp_path):
    """A 4-clique with a pendant chain, baskets doubled for support:
    3 peel rounds at k=3 must keep exactly the clique (each member at
    degree 3) and strip the chain."""
    rows = []
    okey = 0
    for _ in range(2):  # support >= 2
        okey += 1
        for p in [1, 2, 3, 4]:       # clique basket
            rows.append((okey, p))
    for _ in range(2):
        okey += 1
        for p in [4, 5]:             # pendant edge 4-5
            rows.append((okey, p))
    for _ in range(2):
        okey += 1
        for p in [5, 6]:             # chain 5-6
            rows.append((okey, p))
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/lineitem.parquet")

    from encodesrv_spark.plans.extended import part_kcore_peel

    out = {r["part"]: r["core_degree"] for r in part_kcore_peel(spark, str(tmp_path)).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_shared_frames_planted_reencode(spark, tmp_path):
    """Two 'videos' with identical content but different container
    prefix bytes: the frame sampler aligns on 100-byte slices, so we
    plant docs equal except the LAST partial frame — they share all
    full frames and must pair; an unrelated doc must not."""
    # frames [0:100] and [100:200] must DIFFER from each other (the
    # index is per-doc distinct, identical frames collapse to one)
    common = "0123456789" * 10 + "ABCDEFGHIJ" * 10 + "Z" * 50
    docs = spark.createDataFrame(
        [
            (1, common + "AAA", "en", "s", 1),
            (2, common + "BBB", "en", "s", 1),  # differs only in tail frame
            (3, "y" * 260, "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        (r["doc_a"], r["doc_b"]): r["n_shared_frames"]
        for r in mining.multimodal_shared_frames(spark, str(tmp_path)).collect()
    }
    assert out == {(1, 2): 2}


def test_dup_crosstab_mass_equals_pair_count(spark, sf_dir):
    """Crosstab mass must equal the underlying ≥0.5 pair count, and
    intra_source is consistent with the cell coordinates."""
    from encodesrv_spark.operators import dedup
    from encodesrv_spark.catalog import load_table

    rows = mining.source_dup_crosstab(spark, sf_dir).collect()
    total = sum(r["n_pairs"] for r in rows)
    pairs = dedup.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), k=3, threshold=0.5, df_cap=10000
    ).count()
    assert total == pairs
    for r in rows:
        assert r["intra_source"] == (r["source_a"] == r["source_b"])
        assert r["source_a"] <= r["source_b"]


def test_rank_stability_perfect_on_identical_halves(spark, tmp_path):
    """Identical content in both halves -> both rankings identical ->
    ρ = 1 exactly (both the corr form and the d² closed form)."""
    text = " ".join(f"tok{i}" for i in range(30) for _ in range(30 - i))
    docs = spark.createDataFrame(
        [(i, text, "en", "s", 1) for i in range(10)],  # ids 0..9: both parities
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = mining.token_rank_stability(spark, str(tmp_path)).collect()[0]
    assert r["spearman_rho"] == 1.0
    assert r["spearman_exact"] == 1.0
    assert r["n_terms"] > 0


def test_rank_stability_forms_agree_on_corpus(spark, sf_dir):
    r = mining.token_rank_stability(spark, sf_dir).collect()[0]
    assert abs(r["spearman_rho"] - r["spearman_exact"]) < 1e-4
    assert -1 <= r["spearman_rho"] <= 1


def test_backlog_conservation_and_nonnegative(spark, sf_dir):
    """Backlog is always >= 0, final backlog = 0 (every order closes),
    and sum of positive deltas = order count with lineitems."""
    rows = sorted(
        mining.order_backlog_timeseries(spark, sf_dir).collect(),
        key=lambda r: r["month"],
    )
    assert rows
    assert all(r["backlog"] >= 0 for r in rows)
    assert rows[-1]["backlog"] == 0
    from encodesrv_spark.catalog import load_table

    n_orders = (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    # deltas are NET per month (same-month opens/closes cancel), so the
    # conservation laws are: everything closes (sum 0) and the peak
    # backlog is positive but bounded by the order count
    assert sum(r["delta"] for r in rows) == 0
    peak = max(r["backlog"] for r in rows)
    assert 0 < peak <= n_orders


def test_position_bias_planted_header(spark, tmp_path):
    """A token planted at position 0 of every doc must rank first with
    mean_pos 0 and sd 0; a mid-document token must not."""
    docs = spark.createDataFrame(
        [
            (i, "HEADER " + " ".join(f"w{j}_{i % 3}" for j in range(40)), "en", "s", 1)
            for i in range(40)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = mining.token_position_bias(spark, str(tmp_path)).collect()
    top = min(rows, key=lambda r: r["rnk"])
    assert top["t"] == "HEADER"
    assert top["mean_pos"] == 0.0 and top["sd_pos"] == 0.0


def test_benford_terms_sum_and_probabilities(spark, sf_dir):
    """Digits 1-9 all present, observed probabilities sum to 1, and
    Benford expectations sum to 1 (sanity of the formula)."""
    rows = mining.price_benford_audit(spark, sf_dir).collect()
    assert sorted(r["first_digit"] for r in rows) == list(range(1, 10))
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_p"] for r in rows) - 1.0) < 1e-4
    assert all(r["chi2_term"] >= 0 for r in rows)


def test_assortativity_bounded_and_star_is_disassortative(spark, tmp_path):
    """r ∈ [-1, 1]; a pure star graph (hub to leaves) is maximally
    disassortative — every edge joins degree-n to degree-1, and with
    symmetrized ends the correlation is exactly -1."""
    r = mining.copurchase_assortativity(spark, "/root/testdata/sf0.001").collect()[0]
    assert -1 <= r["assortativity"] <= 1

    rows = []
    okey = 0
    for leaf in range(2, 7):          # star: hub 1 - leaves 2..6
        for _ in range(2):            # support >= 2
            okey += 1
            rows.append((okey, 1))
            rows.append((okey, leaf))
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/lineitem.parquet")
    star = mining.copurchase_assortativity(spark, str(tmp_path)).collect()[0]
    assert star["assortativity"] == -1.0
    assert star["n_edge_ends"] == 10  # 5 edges, both orientations


def test_template_headers_planted_boilerplate(spark, tmp_path):
    """90% of a source's docs share a planted 5-token header: the op
    must surface exactly that prefix with doc_share 0.9."""
    hdr = "BREAKING NEWS FROM OUR WIRE"
    docs = [(i, f"{hdr} body text {i} words here now", "en", "feed", 1) for i in range(18)]
    docs += [(100 + i, f"organic opening {i} unique text here now", "en", "feed", 1) for i in range(2)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = mining.source_template_headers(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["prefix"] == hdr
    assert r["doc_share"] == 0.9


def test_fill_latency_ordered_quantiles_and_positive(spark, sf_dir):
    rows = mining.order_fill_latency_sla(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50"] <= r["p95"]
        assert 0 <= r["n_sla_breach"] <= r["n_orders"]


def test_dispersion_index_poisson_and_bursty(spark, tmp_path):
    """A deterministic constant-rate stream has variance 0 (index 0,
    not overdispersed); a stream that dumps everything into a few
    hours is overdispersed."""
    import datetime as dt

    base = dt.datetime(2026, 5, 1)
    rows, eid = [], 0
    # 'steady': exactly 5 events every hour for 48h
    for h in range(48):
        for k in range(5):
            eid += 1
            rows.append((eid, base + dt.timedelta(hours=h, minutes=k), 1, "steady", 1.0, "{}"))
    # 'bursty': 240 events in hour 0, then 1/hour for 47h
    for k in range(240):
        eid += 1
        rows.append((eid, base + dt.timedelta(minutes=k % 60), 2, "bursty", 1.0, "{}"))
    for h in range(1, 48):
        eid += 1
        rows.append((eid, base + dt.timedelta(hours=h), 2, "bursty", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["event_type"]: r for r in mining.events_dispersion_index(spark, str(tmp_path)).collect()}
    assert out["steady"]["dispersion_index"] == 0.0
    assert not out["steady"]["overdispersed"]
    assert out["bursty"]["overdispersed"]
    assert out["bursty"]["dispersion_index"] > 10


def test_autocorrelation_planted_structure(spark, tmp_path):
    """A strictly alternating hourly series has ACF(1) = -1 and
    ACF(2) = +1; ACF values are bounded by [-1, 1]."""
    import datetime as dt

    base = dt.datetime(2026, 6, 1)
    rows, eid = [], 0
    for h in range(48):
        v = 20.0 if h % 2 == 0 else 10.0
        eid += 1
        rows.append((eid, base + dt.timedelta(hours=h), 1, "alt", v, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = {x["event_type"]: x for x in mining.events_autocorrelation(spark, str(tmp_path)).collect()}["alt"]
    assert r["acf_1"] == -1.0
    assert r["acf_2"] == 1.0


def test_oov_rate_bounds_and_corpus_consistency(spark, sf_dir):
    """0 <= oov_rate <= 1; total OOV tokens = total tokens minus
    tokens covered by the top-1000 vocab (mass conservation)."""
    rows = mining.doc_oov_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["oov_rate"] <= 1
        assert r["n_oov"] <= r["n_tokens"]


def test_hhi_uniform_and_concentrated(spark, tmp_path):
    """N equal users -> HHI = 1/N and effective_users = N; one user
    owning everything -> HHI = 1."""
    import datetime as dt

    base = dt.datetime(2026, 7, 1)

    def write(rows):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    rows = [
        (i * 10 + k, base, i, "click", 1.0, "{}")
        for i in range(10)
        for k in range(5)
    ]
    write(rows)
    r = mining.user_concentration_hhi(spark, str(tmp_path)).collect()[0]
    assert r["n_users"] == 10
    assert abs(r["hhi"] - 0.1) < 1e-9
    assert abs(r["effective_users"] - 10.0) < 1e-6
    assert abs(r["top_share"] - 0.1) < 1e-9

    write([(k, base, 1, "click", 1.0, "{}") for k in range(50)])
    r = mining.user_concentration_hhi(spark, str(tmp_path)).collect()[0]
    assert r["hhi"] == 1.0 and r["top_share"] == 1.0


def test_heaps_fit_sane_exponent(spark, sf_dir):
    """β ∈ [0, 1] — the synthetic corpus draws from a small shared
    vocabulary that saturates in the first checkpoint, so its TRUE β
    is ≈ 0 (the op reporting that is the point: β forecasts vocab
    growth, and this corpus's vocab doesn't grow)."""
    r = mining.heaps_law_fit(spark, sf_dir).collect()[0]
    assert r["n_points"] >= 10
    assert 0 <= r["heaps_beta"] <= 1.001
    assert r["heaps_k"] > 0


def test_heaps_fit_linear_growth_corpus(spark, tmp_path):
    """Every doc contributes entirely fresh tokens -> V grows linearly
    with N -> β ≈ 1 with an essentially perfect log-log fit."""
    docs = [
        (i, " ".join(f"tok_{i}_{j}" for j in range(20)), "en", "s", 1)
        for i in range(100)
    ]

    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = mining.heaps_law_fit(spark, str(tmp_path)).collect()[0]
    assert abs(r["heaps_beta"] - 1.0) < 1e-6
    assert r["r2"] > 0.999


def test_dedup_quality_gain_consistency(spark, sf_dir):
    """n_removed matches the removals query; the post mean equals the
    mean over surviving docs recomputed independently."""
    from encodesrv_spark.plans.llm import quality_score
    from encodesrv_spark.plans.registry import all_queries

    r = mining.dedup_quality_gain(spark, sf_dir).collect()[0]
    removals = all_queries()["neardup_removals"].fn(spark, sf_dir)
    assert r["n_removed"] == removals.count()
    q = quality_score(spark, sf_dir).select("doc_id", "score")
    survivors = q.join(removals.select("doc_id"), "doc_id", "left_anti")
    post = survivors.agg(F.round(F.avg("score"), 6)).collect()[0][0]
    assert abs(post - r["mean_q_post"]) < 1e-9
    assert abs(r["quality_gain"] - round(r["mean_q_post"] - r["mean_q_pre"], 6)) < 1e-9


def test_intrinsic_dim_planted_manifolds(spark, tmp_path):
    """Vectors on a 1-D line embedded in 8-D must read id ≈ 1
    (ratios r2/r1 = 2 exactly for equally spaced points -> id =
    1/ln 2 ≈ 1.44 for the 2-spacing construction; use spacing that
    gives exact ratio 2: neighbors at d and 2d)."""
    # place queries at positions x=3i, neighbors at x=3i+1 and 3i-1?
    # simpler: equally spaced points on a line, step 1: each query's
    # r1=1, r2=2 (two sides) -> actually r2=1 too (other side). Use a
    # geometric line: x_j = 2^j so distances are distinct.
    rows = []
    for j in range(12):
        v = [float(2 ** j)] + [0.0] * 7
        rows.append((j, v, 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    r = mining.embedding_intrinsic_dim(spark, str(tmp_path)).collect()[0]
    # a 1-D manifold: TwoNN on a geometric line gives a small id
    # (exact value depends on the spacing law; the point is it reads
    # far below the ambient 8)
    assert r["n_queries"] > 0
    assert r["intrinsic_dim"] < 4


def test_dataset_card_planted_exact_dup(spark, tmp_path):
    """Card fields recompute from a hand-built corpus: 4 docs, one
    exact-dup pair -> n_exact_dup_docs = 1; token totals exact."""
    docs = [
        (1, "a b c", "en", "s1", 1),
        (2, "a b c", "en", "s1", 1),  # exact dup of 1
        (3, "d e", "fr", "s2", 1),
        (4, "f", "en", "s2", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = mining.corpus_dataset_card(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 4
    assert r["n_langs"] == 2 and r["n_sources"] == 2
    assert r["n_tokens"] == 9 and r["vocab_size"] == 6
    assert r["n_exact_dup_docs"] == 1
    assert r["mean_doc_tokens"] == 2.25


def test_skipgram_window_emits_expected_pairs(spark, tmp_path):
    """'w x y z' with window 2 emits exactly (w,x),(w,y),(x,y),(x,z),
    (y,z) — forward-ordered, no self-pairs, no out-of-window pairs."""
    spark.createDataFrame(
        [(i, "w x y z", "en", "s", 1) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = mining.token_skipgram_pmi(spark, str(tmp_path)).collect()
    got = {(r["a"], r["b"]): r["n_pair"] for r in rows}
    assert set(got) == {("w", "x"), ("w", "y"), ("x", "y"), ("x", "z"), ("y", "z")}
    assert all(n == 20 for n in got.values())


def test_distance_histogram_shares_sum_to_one(spark, sf_dir):
    rows = mining.embedding_distance_histogram(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert sum(r["n_pairs"] for r in rows) == 100 * 99 // 2
    assert all(0 <= r["bin"] <= 9 for r in rows)


def test_supplier_concentration_bounds(spark, sf_dir):
    """HHI ∈ (1/n_suppliers, 1]; ranked descending; only
    multi-supplier parts reported."""
    rows = mining.part_supplier_concentration(spark, sf_dir).collect()
    assert rows
    prev = None
    for r in sorted(rows, key=lambda r: r["rnk"]):
        assert r["n_suppliers"] >= 2
        assert 1.0 / r["n_suppliers"] - 1e-9 <= r["hhi"] <= 1.0
        if prev is not None:
            assert r["hhi"] <= prev + 1e-9
        prev = r["hhi"]


def test_weekend_effect_counts_partition_events(spark, sf_dir):
    """n_weekday + n_weekend = total events per type."""
    from encodesrv_spark.catalog import load_table

    rows = mining.events_weekend_effect(spark, sf_dir).collect()
    totals = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r["n_weekday"] + r["n_weekend"] == totals[r["event_type"]]
        assert r["weekend_ratio"] > 0


def test_numeric_density_planted_table_doc(spark, tmp_path):
    """A price-table doc reads high density; prose reads zero; tokens
    like '3.14' and '99,5%' count as numeric, 'v2' does not."""
    docs = [
        (1, "12 34.5 99,9% 1.000 7", "en", "s", 1),
        (2, "plain prose with no digits here", "en", "s", 1),
        (3, "v2 x3 3.14", "en", "s", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in mining.doc_numeric_density(spark, str(tmp_path)).collect()}
    assert out[1]["numeric_density"] == 1.0
    assert out[2]["numeric_density"] == 0.0
    assert out[3]["n_numeric"] == 1  # only '3.14'


def test_price_dispersion_nonneg_and_ranked(spark, sf_dir):
    rows = sorted(
        mining.part_price_dispersion(spark, sf_dir).collect(),
        key=lambda r: r["rnk"],
    )
    assert rows
    prev = None
    for r in rows:
        assert r["cv"] >= 0 and r["n_sales"] >= 5
        if prev is not None:
            assert r["cv"] <= prev + 1e-9
        prev = r["cv"]
