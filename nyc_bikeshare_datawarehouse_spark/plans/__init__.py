from nyc_bikeshare_datawarehouse_spark.plans.queries import QUERIES, flagship
from nyc_bikeshare_datawarehouse_spark.plans.oracles import ORACLES

__all__ = ["QUERIES", "ORACLES", "flagship"]
