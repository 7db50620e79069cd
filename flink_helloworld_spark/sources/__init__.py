"""Sources: batch table loaders, streaming generators, Kafka wrappers."""

from flink_helloworld_spark.sources.tables import Tables, load_tables

__all__ = ["Tables", "load_tables"]
