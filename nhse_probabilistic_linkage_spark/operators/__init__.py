from nhse_probabilistic_linkage_spark.operators.lsh import band_keys, candidate_pairs
from nhse_probabilistic_linkage_spark.operators.verify import verify_pairs
from nhse_probabilistic_linkage_spark.operators.connected_components import connected_components

__all__ = ["band_keys", "candidate_pairs", "verify_pairs", "connected_components"]
