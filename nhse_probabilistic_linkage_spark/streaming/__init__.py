from nhse_probabilistic_linkage_spark.streaming.incremental import IncrementalDedup

__all__ = ["IncrementalDedup"]
