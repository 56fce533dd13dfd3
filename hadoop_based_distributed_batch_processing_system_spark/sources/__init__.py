from hadoop_based_distributed_batch_processing_system_spark.sources.io import TABLES, Tables, load_table  # noqa: F401
