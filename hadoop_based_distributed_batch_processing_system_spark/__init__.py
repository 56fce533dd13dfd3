"""PySpark-native batch analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system
``SoorajKumar35/Hadoop-based-distributed-batch-processing-system``
(a Hadoop-MapReduce-class batch engine; see SURVEY.md §0 for
provenance — the reference tree was empty at survey time, so parity
targets come from the system class's public, documented surface:
Dean & Ghemawat OSDI'04 + Apache Hadoop MapReduce docs) as an
idiomatic Apache Spark DataFrame/SQL engine, extended with the
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) mandated by BASELINE.json.

Design principles (see SURVEY.md §4):
- Declare plans with the DataFrame/SQL API; let Catalyst + AQE pick
  physical strategies (pushdown, pruning, broadcast, skew handling).
- Stay JVM-side: built-in ``pyspark.sql.functions`` in every hot
  path; Arrow-vectorized pandas UDFs only where semantics demand.
- Every operator is registered in :mod:`.registry` with its DuckDB
  oracle SQL so correctness is differentially checkable.
"""

from hadoop_based_distributed_batch_processing_system_spark.registry import REGISTRY, register  # noqa: F401
from hadoop_based_distributed_batch_processing_system_spark.session import get_spark  # noqa: F401
from hadoop_based_distributed_batch_processing_system_spark.sources.io import TABLES, Tables, load_table  # noqa: F401

__version__ = "0.1.0"
