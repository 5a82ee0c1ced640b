"""Semantics tests for the round-3 curation operators — properties the
registry-wide oracle comparison cannot see (hand-built inputs, JL
concentration, flag algebra)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from encodesrv_spark.operators import similarity
from encodesrv_spark.plans import curation


def test_jl_projection_distortion_concentrates(spark, sf_dir):
    """The JL lemma: E[||p||²/||v||²] = 1 for a ±1 sign matrix scaled
    by 1/sqrt(k).  The per-vector ratio is noisy at k=16, but the
    corpus mean must sit near 1 — a sign-matrix or scaling bug shifts
    it far off."""
    out = curation.embedding_jl_projection(spark, sf_dir)
    row = out.agg(
        F.avg("distortion").alias("mean_d"),
        F.min("orig_nrm2").alias("min_o"),
    ).collect()[0]
    assert 0.8 < row["mean_d"] < 1.2
    assert row["min_o"] > 0


def test_jl_sign_matrix_is_balanced():
    """A usable JL sign matrix has ~half +1s per output dim; an
    all-same column collapses the projection to (±) a coordinate sum."""
    for j, col in enumerate(curation._JL_SIGNS):
        pos = sum(1 for s in col if s > 0)
        assert 16 <= pos <= 48, f"output dim {j} degenerate: {pos}/64 positive"


def test_gopher_keep_is_flag_conjunction(spark, sf_dir):
    out = curation.gopher_quality_flags(spark, sf_dir)
    bad = out.filter(
        F.col("keep")
        != (F.col("f_words") & F.col("f_wlen") & F.col("f_ttr") & F.col("f_stop"))
    )
    assert bad.count() == 0
    # the gate must actually discriminate on this corpus
    kept = out.filter("keep").count()
    total = out.count()
    assert 0 < kept < total


def test_semdedup_drops_exact_duplicate_keeps_lower_id(spark):
    """Hand-built corpus: vec 9 duplicates vec 0 exactly; everything
    else is axis-orthogonal.  The duplicate (higher id) must be the
    drop, and totals must reconcile."""
    rows = []
    for i in range(9):
        v = [0.0] * 4
        v[i % 4] = 1.0
        # unique wiggle large enough that same-axis non-duplicates
        # (i, i+4, i+8 share coordinates) stay below the threshold
        v[(i + 1) % 4] = 0.1 * (i + 1)
        rows.append((i, v))
    rows.append((9, rows[0][1]))  # exact duplicate of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats = similarity.semdedup(df, k=2, iters=1, threshold=0.999).collect()
    assert sum(r["n_members"] for r in stats) == 10
    assert sum(r["n_dropped"] for r in stats) == 1
    for r in stats:
        assert r["n_dropped"] <= r["n_members"]
        assert r["keep_rate"] == pytest.approx(
            1.0 - r["n_dropped"] / r["n_members"], abs=1e-4
        )


def test_derive_k_bounds_expected_cluster_size():
    """The k∝N rule (round-3 verdict fix): for any corpus size and
    target, n / derive_k(n, target) <= target — so the intra-cluster
    pair pass stays O(N·target), never O(N²/k_fixed)."""
    from hypothesis import given, strategies as st

    @given(
        n=st.integers(min_value=0, max_value=10**12),
        target=st.integers(min_value=1, max_value=10**6),
    )
    def check(n, target):
        k = similarity.derive_k(n, target)
        assert k >= 8
        assert n <= k * target  # expected cluster size <= target
        # and k never overshoots past one-cluster-per-target-chunk + floor
        assert k <= max(8, (n + target - 1) // target)

    check()


def test_semdedup_prune_uses_derived_k(spark, sf_dir):
    """The REGISTERED query must apply the k∝N rule: cluster count
    tracks derive_k(n, target) (a Lloyd round can empty a cluster, so
    the bound is <= k and > k/2), and membership reconciles to n —
    so the intra-cluster pair work is bounded per cluster."""
    from encodesrv_spark.catalog import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    expected_k = similarity.derive_k(n, curation._SEMDEDUP_TARGET)
    out = curation.semdedup_prune(spark, sf_dir).collect()
    n_clusters = len(out)
    assert expected_k // 2 < n_clusters <= expected_k
    assert sum(r["n_members"] for r in out) == n


def test_connected_components_matches_union_find(spark):
    """Randomized equivalence: the iterative min-label operator (whose
    per-round fixpoint check was restructured this round) must produce
    the same partition as a driver-side union-find reference on random
    graphs, including chains (multi-round propagation), duplicate
    edges, self-loops, and multiple components."""
    import random

    from encodesrv_spark.operators.dedup import connected_components

    rng = random.Random(20260814)
    cases = []
    for _ in range(4):
        n = rng.randint(2, 30)
        m = rng.randint(1, 40)
        cases.append([(rng.randrange(n), rng.randrange(n)) for _ in range(m)])
    cases.append([(i, i + 1) for i in range(12)])       # 13-node chain
    cases.append([(0, 0), (1, 2), (2, 1), (3, 4)])      # self-loop + dup edges

    for edges in cases:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}

        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["doc_id"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == want, (edges, got, want)


def test_bpe_pair_stats_top20_is_deterministic(spark, sf_dir):
    a = [tuple(r) for r in curation.bpe_pair_stats(spark, sf_dir).collect()]
    b = [tuple(r) for r in curation.bpe_pair_stats(spark, sf_dir).collect()]
    assert a == b
    assert len(a) == 20
    counts = [n for _, n in a]
    assert counts == sorted(counts, reverse=True)


def test_zipf_fit_single_row_schema(spark, sf_dir):
    out = curation.token_zipf_fit(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_types"] > 0 and r["n_tokens"] >= r["n_types"]
    # log-log regression of a frequency table always slopes down
    assert r["zipf_slope"] < 0


def test_jl_ann_finds_planted_near_duplicates(spark):
    """True near-duplicates (cos ≈ 1) must survive the JL projection:
    multiplicative distortion cannot reorder a ~1.0 cosine below the
    near-orthogonal noise floor.  Plant one duplicate per query among
    40 noise vectors; every query's rank-1 neighbor must be its dup."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(4):  # queries 0..3
        v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i, v))
        rows.append((100 + i, [x + 0.001 * (j % 3) for j, x in enumerate(v)]))
    for i in range(40):  # noise
        rows.append((200 + i, [rng.uniform(-1, 1) for _ in range(64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = curation.jl_ann(df, n_query_vecs=4, shortlist=10, k=1).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in out}
    assert got == {i: 100 + i for i in range(4)}


def test_containment_catches_subdocument_jaccard_misses(spark):
    """Plant doc 1 wholly inside doc 2 (which is 8x longer): the pair
    must surface with c_ab = 1.0 while its Jaccard stays far below
    any near-dup threshold — the asymmetric case containment exists
    for."""
    from encodesrv_spark.operators import dedup

    words = [f"w{i}" for i in range(200)]
    small = " ".join(words[:20])
    big = " ".join(words[:20] + words[40:180])
    other = " ".join(words[180:200] + ["z1", "z2", "z3"])
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, other)], "doc_id long, text string"
    )
    rows = {(r["doc_a"], r["doc_b"]): r for r in dedup.containment_pairs(df).collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r["c_ab"] == 1.0          # all of doc 1's shingles inside doc 2
    assert r["c_ba"] < 0.2           # doc 2 is mostly other content
    assert r["jaccard"] < 0.2        # jaccard_pairs at 0.5 would miss it
    assert (1, 3) not in rows and (2, 3) not in rows


def test_density_clusters_roles_on_planted_geometry(spark):
    """Planted geometry: three near-identical vectors form a dense
    cluster (all cores, one component); a point similar to exactly ONE
    of them is a border; far-away points are noise."""
    import random

    from encodesrv_spark.operators import similarity

    rng = random.Random(11)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    rows = []
    for i in range(3):  # dense cluster: pairwise cos ~ 1
        rows.append((i, [x + 0.001 * i for x in base]))
    # orthogonal-ish noise, far from everything
    for i in range(10, 16):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: (r["role"], r["cluster"]) for r in
           similarity.density_clusters(df, threshold=0.9, min_pts=2).collect()}
    assert out[0] == ("core", 0) and out[1] == ("core", 0) and out[2] == ("core", 0)
    for i in range(10, 16):
        assert out[i][0] == "noise" and out[i][1] is None
