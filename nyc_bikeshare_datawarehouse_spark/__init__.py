"""nyc_bikeshare_datawarehouse_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference warehouse (thuannt-se/nyc-bikeshare-datawarehouse,
surveyed in SURVEY.md): star-schema relational operators, time/date
bucketing, unpivot/pivot reshaping, sessionization, quality gates — plus
large-scale training-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal plumbing).

Everything is expressed through the DataFrame/SQL API so Catalyst owns the
physical plan (pushdown, pruning, join selection, AQE); Python UDFs appear
only behind Arrow-vectorized interfaces where built-ins cannot express the
semantics.
"""

from nyc_bikeshare_datawarehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
