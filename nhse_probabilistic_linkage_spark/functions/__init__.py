from nhse_probabilistic_linkage_spark.functions.text import (
    normalize_text,
    shingle_hashes,
    shingles,
    tokenize,
)
from nhse_probabilistic_linkage_spark.functions.minhash import make_minhash_udf
from nhse_probabilistic_linkage_spark.functions.simhash import make_simhash_udf
from nhse_probabilistic_linkage_spark.functions.phonetics import phonetic_key, soundex_key

__all__ = [
    "normalize_text",
    "tokenize",
    "shingles",
    "shingle_hashes",
    "make_minhash_udf",
    "make_simhash_udf",
    "phonetic_key",
    "soundex_key",
]
