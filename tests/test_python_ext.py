"""Python extension surface (functions/python_ext.py): UDTF and
grouped-agg pandas UDF, each asserted equivalent to its built-in
declarative twin — the proof they're escape hatches, not the hot path."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sentence_splitter_udtf_matches_builtin_explode(spark):
    from encodesrv_spark.functions.python_ext import SentenceSplitter

    spark.udtf.register("split_sentences", SentenceSplitter)
    rows = spark.sql(
        "SELECT s.* FROM LATERAL split_sentences('One. Two two! Three?  ') s"
    ).collect()
    assert [(r.pos, r.sentence) for r in rows] == [
        (0, "One"),
        (1, "Two two"),
        (2, "Three"),
    ]
    # declarative twin: posexplode over a filtered split
    builtin = spark.sql(
        """
        SELECT posexplode(filter(
            transform(split('One. Two two! Three?  ', '[.!?]+'), x -> trim(x)),
            x -> x <> ''))
        """
    ).collect()
    assert [(r.pos, r.col) for r in builtin] == [(r.pos, r.sentence) for r in rows]


def test_geo_mean_grouped_agg_matches_builtin(spark, sf_dir):
    from encodesrv_spark.catalog import load_table
    from encodesrv_spark.functions.python_ext import geo_mean

    o = load_table(spark, sf_dir, "orders")
    got = (
        o.groupBy("o_orderpriority")
        .agg(F.round(geo_mean("o_totalprice"), 6).alias("gm"))
        .collect()
    )
    want = (
        o.groupBy("o_orderpriority")
        .agg(F.round(F.exp(F.avg(F.log("o_totalprice"))), 6).alias("gm"))
        .collect()
    )
    gm_got = {r.o_orderpriority: r.gm for r in got}
    gm_want = {r.o_orderpriority: r.gm for r in want}
    assert set(gm_got) == set(gm_want)
    for k in gm_want:
        assert abs(gm_got[k] - gm_want[k]) < 1e-4
