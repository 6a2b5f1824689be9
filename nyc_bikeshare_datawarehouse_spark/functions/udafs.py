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
    """Geometric mean of positive values: exp(mean(ln x)), computed over
    the SORTED values for a deterministic summation order."""
    arr = np.sort(v.to_numpy(dtype="float64"))
    return float(np.exp(np.mean(np.log(arr))))
