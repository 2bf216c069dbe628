from nhse_probabilistic_linkage_spark.plans.pipeline import DedupPipeline
from nhse_probabilistic_linkage_spark.plans.evaluate import (
    pair_recall_report,
    candidate_count_histogram,
    threshold_confusion,
)

__all__ = [
    "DedupPipeline",
    "pair_recall_report",
    "candidate_count_histogram",
    "threshold_confusion",
]
