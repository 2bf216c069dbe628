from nhse_probabilistic_linkage_spark.sources.pages import synth_pages, extract_text
from nhse_probabilistic_linkage_spark.sources.tables import load_table, write_table

__all__ = ["synth_pages", "extract_text", "load_table", "write_table"]
