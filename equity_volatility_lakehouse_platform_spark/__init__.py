"""equity_volatility_lakehouse_platform_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference equity-volatility lakehouse
(Saldax17/Equity-Volatility-Lakehouse-Platform): Medallion batch pipeline
(bronze ingest -> SQL cleaning -> silver grid-fill -> daily roll-up -> gold
feature library -> ML prep), plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Design rules (see SURVEY.md):
  * DataFrame / Spark SQL first — declare the logical plan, let Catalyst
    pick the physical strategy.
  * No driver-side materialization: grids via ``explode(sequence(...))``,
    dimensions broadcast, everything else partitioned.
  * Pandas UDFs (Arrow) only where built-ins genuinely can't express the
    semantics (EWM, plugin grouped-map feature functions).
"""

from equity_volatility_lakehouse_platform_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
