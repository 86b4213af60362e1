"""trollflow2_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of
pytroll/trollflow2 (a message-driven, YAML-configured batch ETL framework
for satellite imagery), re-expressed Spark-first:

- message stream       -> Structured Streaming DataFrame / batch DataFrame
- product list (YAML)  -> work-items DataFrame (explode + coalesce inheritance)
- plugin worker chain  -> composition of ``DataFrame -> DataFrame`` stages
- filter plugins       -> ``df.filter`` / join-back predicates
- resampling           -> bucketed spatial equi-join + window top-1
- multi-format sinks   -> persisted plan + N write actions + manifest DF
- publisher            -> ``to_json(struct(...))`` sink rows

Design notes (scale): everything is declarative DataFrame API so Catalyst
handles pushdown/pruning/join strategy; small dims are broadcast; data-path
code never collects to the driver; NaN is the in-data missing marker while
SQL NULL is the metadata missing marker.
"""

__version__ = "0.1.0"

from trollflow2_spark.session import get_spark, tune_for_oracle  # noqa: F401
from trollflow2_spark.tables import load_table, load_tables, TABLE_NAMES  # noqa: F401
