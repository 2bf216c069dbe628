"""Phonetic blocking keys, JVM-side only.

Reference analog: the reference derives phonetic blocking columns with
``F.soundex`` and an abydos double-metaphone wrapped in a row-at-a-time
Python UDF (/root/reference/utils/preprocessing_utils.py:211,427-433).
We keep soundex as the same built-in (null/empty-safe wrapper) and replace
the Python-UDF metaphone with :func:`phonetic_key` — a fixed chain of
``regexp_replace`` expressions that stays inside whole-stage codegen, so
the phonetic blocking pass is a narrow map with zero Python in the hot
path. The exact same chain is rendered as ANSI SQL by
:func:`phonetic_key_sql`, which is what keeps the DuckDB oracle for
q89 in lockstep with the Spark plan (one spec, two renderers, one module).

``phonetic_key`` is a soundex-style key, not ANSI soundex: vowels/H/W/Y
are removed from the tail *before* run-collapsing (ANSI soundex treats
letters separated by H/W as adjacent), and the first letter never
suppresses a same-coded second letter. For blocking that distinction only
moves a handful of borderline names between blocks; in exchange the spec
is expressible identically in any engine with POSIX-class regexes and no
backreferences (RE2-safe), which is what makes cross-engine verification
possible at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# digit classes are ANSI soundex's: B F P V->1, C G J K Q S X Z->2,
# D T->3, L->4, M N->5, R->6
_CLASS_STEPS: tuple[tuple[str, str], ...] = (
    ("[AEIOUYHW]", ""),
    ("[BFPV]", "1"),
    ("[CGJKQSXZ]", "2"),
    ("[DT]", "3"),
    ("L", "4"),
    ("[MN]", "5"),
    ("R", "6"),
    # collapse runs without backreferences so the same patterns run on RE2
    ("11+", "1"),
    ("22+", "2"),
    ("33+", "3"),
    ("44+", "4"),
    ("55+", "5"),
    ("66+", "6"),
)

# generous fixed bound for "rest of string" so substring() needs no length()
_TAIL_CAP = 1_000_000


def phonetic_key(col: Column | str, length: int = 4) -> Column:
    """Soundex-style phonetic blocking key as a pure expression chain.

    NULL in, or no ASCII letters in, -> NULL out (the reference's soundex
    wrapper likewise refuses to emit keys for empty names,
    /root/reference/utils/preprocessing_utils.py:203-211).
    """
    c = F.col(col) if isinstance(col, str) else col
    letters = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    tail = F.substring(letters, 2, _TAIL_CAP)
    for pat, repl in _CLASS_STEPS:
        tail = F.regexp_replace(tail, pat, repl)
    key = F.substring(
        F.rpad(F.concat(F.substring(letters, 1, 1), tail), length, "0"), 1, length
    )
    return F.when(F.length(letters) > 0, key)


def phonetic_key_sql(expr: str, length: int = 4) -> str:
    """Render the identical key spec as DuckDB/ANSI SQL (oracle side).

    DuckDB's regexp_replace is first-match-only by default — every step
    passes the 'g' flag to match Spark's replace-all semantics.
    """
    letters = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    tail = f"substring({letters}, 2, {_TAIL_CAP})"
    for pat, repl in _CLASS_STEPS:
        tail = f"regexp_replace({tail}, '{pat}', '{repl}', 'g')"
    key = (
        f"substring(rpad(substring({letters}, 1, 1) || {tail}, {length}, '0'),"
        f" 1, {length})"
    )
    return f"CASE WHEN length({letters}) > 0 THEN {key} END"


def soundex_key(col: Column | str) -> Column:
    """ANSI soundex via the Spark built-in, with the reference's null/empty
    discipline (/root/reference/utils/preprocessing_utils.py:200-211):
    NULL or letterless input yields NULL, never a junk key.
    """
    c = F.col(col) if isinstance(col, str) else col
    letters = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    return F.when(F.length(letters) > 0, F.soundex(letters))
