"""Python extension surface: UDTF and grouped-agg pandas UDF.

The reference has no UDF system — its analog is shelling out
(SURVEY.md §2.10, /root/reference/encodesrv/job.py:246-257), and the
engine's hot path is deliberately 100% JVM expressions (SCALE.md
"Python boundary policy").  This module supplies the two Python
extension points a COMPLETE engine still has to offer for logic that
genuinely can't be a Column expression, each in its Arrow-batched
form:

* ``SentenceSplitter`` — a Python UDTF (one row in, N typed rows out
  with ordinal position), the lateral-view escape hatch for per-row
  expansions with imperative logic.
* ``geo_mean`` — a grouped-agg pandas UDF (Series → scalar), the UDAF
  escape hatch; Arrow moves each group's column once, the Python body
  is vectorized numpy.

Both are demonstration-grade on purpose: anything expressible as
built-ins (including these two) should use built-ins — the tests
assert exactly that equivalence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@udtf(returnType="pos: int, sentence: string")
class SentenceSplitter:
    """Split a text into trimmed sentences on [.!?] runs, yielding
    (ordinal, sentence) rows — the table-function form of what a
    lateral posexplode(split(...)) does declaratively."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        import re

        pos = 0
        for raw in re.split(r"[.!?]+", text):
            s = raw.strip()
            if s:
                yield pos, s
                pos += 1


@pandas_udf(DoubleType())
def geo_mean(v: pd.Series) -> float:
    """Grouped-agg geometric mean over positive values (log-mean-exp,
    numerically stable for long products)."""
    x = v[v > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x.astype("float64")).mean()))
