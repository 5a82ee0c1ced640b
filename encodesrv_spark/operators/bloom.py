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
* probe: the one-row bit array is broadcast (BroadcastNestedLoopJoin of
  a single row = a free scalar broadcast) and each probe row checks all
  k bits with JVM-side ``element_at``/``shiftright`` expressions inside
  whole-stage codegen.

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

from pyspark.sql import DataFrame
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

    Entirely distributed: hash → per-word ``bit_or`` → densify with a
    ``transform(sequence(...))`` over a collected word→bits map.  The
    map is at most ``num_bits/64`` entries (8 B words), independent of
    the filter side's cardinality.
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
    return (
        words.agg(
            F.map_from_arrays(
                F.collect_list("word"), F.collect_list("bits")
            ).alias("wm")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(nwords - 1)),
                lambda w: F.coalesce(F.element_at(F.col("wm"), w), F.lit(0).cast("long")),
            ).alias("__bloom_bits")
        )
    )


def _might_contain(key: str, num_bits: int, num_hashes: int):
    """AND-of-k bit probes as a single JVM Column (codegen-friendly)."""
    checks = []
    for s in range(num_hashes):
        h = f"pmod(xxhash64({key}, {s}), {num_bits})"
        checks.append(
            F.expr(
                f"(shiftright(element_at(__bloom_bits, CAST({h} DIV 64 AS INT) + 1),"
                f" CAST({h} % 64 AS INT)) & 1) = 1"
            )
        )
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

    Plan shape: ``big ⨯ broadcast(1-row bits)`` (a scalar broadcast)
    followed by a codegen'd bit-probe filter; the downstream join's
    shuffle then moves only surviving rows.
    """
    bits = build_bloom_bits(small, small_key, num_bits, num_hashes)
    return (
        big.crossJoin(F.broadcast(bits))
        .filter(_might_contain(big_key, num_bits, num_hashes))
        .drop("__bloom_bits")
    )
