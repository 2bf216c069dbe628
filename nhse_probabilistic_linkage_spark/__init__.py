"""PySpark-native near-duplicate detection + clustering engine.

A from-scratch re-architecture of the capabilities of
nhsengland/NHSE_probabilistic_linkage (block -> score -> cluster -> evaluate,
see SURVEY.md) for Common-Crawl-style web pages:

- candidate generation: MinHash-LSH band self-join (reference analog: the
  17-rule blocking UNION, /root/reference/parameters_dedupe.py:26-44),
  SimHash Hamming-ball lookup, exact-hash prepass;
- verification: exact Jaccard on 5-gram shingles via native array functions
  (reference analog: Splink comparison levels, utils/parameter_lists.py);
- clustering: distributed large-star/small-star connected components
  (reference analog: driver-side BFS find_connected_ids,
  utils/dataset_ingestion_utils.py:487-540);
- evaluation: pair recall/precision with candidate-miss accounting
  (reference analog: missed_duplicate flags, utils/eval_utils.py:451-520).

Everything is DataFrame-declarative so Catalyst/AQE handle pushdown, join
strategy and skew; Python appears only inside vectorized Arrow UDF kernels.
"""

from nhse_probabilistic_linkage_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
