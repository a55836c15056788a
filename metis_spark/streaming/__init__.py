from metis_spark.streaming.incremental import IncrementalIngest, streaming_edge_counts  # noqa: F401
