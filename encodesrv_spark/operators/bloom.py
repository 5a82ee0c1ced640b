"""Bloom-filter join pruning — cut a big probe side down to
might-match rows BEFORE the join shuffle.

The scale problem (SURVEY.md §7.3.4 posture): joining a 100 TB fact
table to a selectively-filtered dimension shuffles the entire fact side
even though only a few percent of its rows can match.  Spark's own
runtime row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.*`)
injects exactly this, but only past size thresholds tuned for clusters
(10 GB application-side scans); this module provides the same lever as
an explicit, composable DataFrame operator with no driver-side collect
and no Python UDFs:

* build: the filter side's join keys are hashed k ways (``xxhash64``
  with k distinct salt columns), bit positions OR-combined per 64-bit
  word with a distributed ``bit_or`` aggregate, and densified into ONE
  row holding an ``array<long>`` — bytes shipped = m/8 regardless of
  filter-side row count.
* probe: the built bit array — ONE row of m/8 bytes, independent of
  data size — is materialized like a ScalarSubquery (the exact
  mechanism Spark's own InjectRuntimeFilter uses to ship its runtime
  bloom filter) and embedded as a single array literal; each probe row
  checks all k bits with JVM-side ``element_at``/``shiftright``
  expressions inside whole-stage codegen, referencing that one
  constant.  Carrying the array as a joined COLUMN instead (the naive
  crossJoin-a-one-row-frame formulation) makes every probe row's
  UnsafeRow copy the full m/8 bytes — measured 10x slower at sf0.1
  (77 GB of memcpy for a 6M-row probe at m=2^20).

False positives only widen the pruned set; a Bloom filter has NO false
negatives, so `prune → exact join` returns exactly the plain join's
rows.  That makes the operator safe to wrap around any equi-join and
makes its correctness oracle the plain join itself.

Reference anchor: EncodeSrv's only join is a per-row point lookup
(`/root/reference/encodesrv/job.py:163-172`); this is the 100 TB-scale
generalization of "don't fetch rows that can't match".
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 5


def build_bloom_bits(
    small: DataFrame,
    key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """One-row DataFrame ``[__bloom_bits: array<long>]`` over ``small[key]``.

    Entirely distributed: hash → per-word ``bit_or`` → densify by
    unioning an all-zero word range and assembling the sorted
    ``(word, bits)`` structs into the positional array (the kmeans
    centroid-assembly pattern, O(n log n)).  A map-lookup densify
    (``element_at`` per position over a 16 K-entry map) is O(n²) —
    Spark's ArrayBasedMapData lookup is a linear scan — and measured
    ~17 s per build at m=2^20; this form is sub-second.  The array is
    ``num_bits/64`` longs regardless of the filter side's cardinality.
    """
    nwords = (num_bits + 63) // 64
    hashes = [
        F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(num_bits)).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    pos = small.select(F.explode(F.array(*hashes)).alias("pos"))
    words = pos.select(
        F.expr("CAST(pos DIV 64 AS INT)").alias("word"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
    ).groupBy("word").agg(F.bit_or("bit").alias("bits"))
    zeros = (
        small.sparkSession.range(nwords)
        .select(F.col("id").cast("int").alias("word"), F.lit(0).cast("long").alias("bits"))
    )
    dense = (
        words.unionByName(zeros)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    return (
        dense.agg(
            F.array_sort(F.collect_list(F.struct("word", "bits"))).alias("wb")
        )
        .select(F.expr("transform(wb, x -> x.bits)").alias("__bloom_bits"))
    )


def _might_contain(key: str, bits: Column, num_bits: int, num_hashes: int):
    """AND-of-k bit probes as a single JVM Column (codegen-friendly).
    ``bits`` is the scalar-subquery Column holding the filter array.
    All k probes reference the SAME subquery expression, so physical
    planning dedups them via ReuseSubquery — the build executes once
    (asserted in tests); a higher-order-function formulation that
    would syntactically reference it once is rejected by the analyzer
    (UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY.HIGHER_ORDER_FUNCTION)."""
    checks = []
    for s in range(num_hashes):
        h = F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(num_bits))
        word = F.element_at(bits, (h / 64).cast("int") + 1)
        checks.append(F.getbit(word, (h % 64).cast("int")) == 1)
    return reduce(lambda a, b: a & b, checks)


def bloom_prune(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Filter ``big`` to rows whose ``big_key`` might appear in
    ``small[small_key]`` — no false negatives, tunable false-positive
    rate via ``num_bits``/``num_hashes``.

    Plan shape: the distributed build collapses to ONE m/8-byte row
    consumed as a SCALAR SUBQUERY (`DataFrame.scalar()` — the same
    execute-once-embed-as-constant mechanism Spark's own
    InjectRuntimeFilter uses for its runtime bloom filter); the probe
    is then a pure codegen'd filter directly above the fact scan — no
    join operator at all, no driver collect, and the k probe
    expressions share the one subquery result (ReuseSubquery).  The
    downstream join's shuffle moves only surviving rows.
    """
    bits = build_bloom_bits(small, small_key, num_bits, num_hashes).scalar()
    return big.filter(_might_contain(big_key, bits, num_bits, num_hashes))
