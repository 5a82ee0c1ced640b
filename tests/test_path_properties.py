"""Property-based tests for the path scalar functions (F1-F4) —
SURVEY §5.4: arbitrary paths, Spark column semantics must match the
Python os.path reference behavior the original daemon relied on.

One Spark job per property: hypothesis generates a batch of examples,
the batch evaluates as a single DataFrame pass (per-example Spark
round trips would be ~100x slower).
"""

from __future__ import annotations

import os.path

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from encodesrv_spark.functions import scalars

# path segments: printable, no '/' (the separator is inserted by the
# strategy), no NUL; empty segments allowed (doubled slashes happen in
# real job rows)
_seg = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="/\x00", exclude_categories=("Cs",)
    ),
    max_size=12,
)
_paths = st.builds(
    lambda absolute, segs: ("/" if absolute else "") + "/".join(segs),
    st.booleans(),
    st.lists(_seg, min_size=1, max_size=6),
)


def _eval_batch(spark, paths: list[str], col):
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    return [r[0] for r in df.select(col.alias("out")).collect()]


@settings(max_examples=30, deadline=None)
@given(st.lists(_paths, min_size=1, max_size=40, unique=True))
def test_basename_matches_os_path(spark, paths):
    got = _eval_batch(spark, paths, scalars.basename("path"))
    want = [os.path.basename(p) for p in paths]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(st.lists(_paths, min_size=1, max_size=40, unique=True))
def test_splitext_matches_os_path(spark, paths):
    got = _eval_batch(spark, paths, scalars.splitext_ext("path"))
    want = [os.path.splitext(p)[1] for p in paths]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(st.lists(_paths, min_size=1, max_size=40, unique=True))
def test_mount_rewrite_strips_leading_slashes(spark, paths):
    """F1 reference semantics: mnt + path.lstrip('/')."""
    got = _eval_batch(
        spark, paths, scalars.mount_rewrite("path", "/mnt/media/")
    )
    want = ["/mnt/media/" + p.lstrip("/") for p in paths]
    assert got == want
