"""Python UDAF surface (pandas grouped-aggregate UDFs).

Completes the user-defined trio (row UDF territory is deliberately
empty — built-ins only; UDTF in functions/udtfs.py; this module is the
aggregate form): a GROUPED_AGG pandas UDF executes Arrow-batched per
group and can appear in `groupBy().agg()` and window frames like any
built-in aggregate. Same engine rule as the UDTF: the slow path, for
aggregations Catalyst genuinely cannot express — and held to the same
oracle gate when the math is SQL-replayable.

The demonstrator is the geometric mean: exp(mean(ln x)). Values are
SORTED inside the UDAF before the log-sum so the float reduction is
deterministic under Spark's arbitrary within-group arrival order (the
engine-parity discipline every float aggregate here follows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geometric_mean(v: pd.Series) -> float:
    """Geometric mean over the POSITIVE domain: exp(mean(ln x)), computed
    over the SORTED values for a deterministic summation order. A zero
    input annihilates the product (ln 0 -> -inf -> exp -> 0.0) — that is
    the defined semantics, but callers should pre-filter to value > 0
    (the declared query does) because SQL engines hard-error on ln(0);
    errstate keeps the -inf branch from spraying RuntimeWarnings into
    stdout (the driver parses bench output from a ~2 KB tail)."""
    arr = np.sort(v.to_numpy(dtype="float64"))
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(np.exp(np.mean(np.log(arr))))
