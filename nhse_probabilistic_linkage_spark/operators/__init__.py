from nhse_probabilistic_linkage_spark.operators.lsh import band_keys, candidate_pairs
from nhse_probabilistic_linkage_spark.operators.verify import verify_pairs
from nhse_probabilistic_linkage_spark.operators.connected_components import connected_components
from nhse_probabilistic_linkage_spark.operators.fellegi_sunter import (
    estimate_mu,
    estimate_u_random_pairs,
    gamma_vectors,
    score_pairs,
    tf_adjusted_scores,
)

__all__ = [
    "band_keys",
    "candidate_pairs",
    "verify_pairs",
    "connected_components",
    "gamma_vectors",
    "estimate_mu",
    "estimate_u_random_pairs",
    "score_pairs",
    "tf_adjusted_scores",
]
