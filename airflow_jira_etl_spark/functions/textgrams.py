"""Char-4-gram rolling hash over a text column — the ONE definition
shared by every consumer (ngram dedup blocking, document
fingerprinting), so the polynomial, the pad convention and the O(len)
access pattern can never drift between them.

The char codes are extracted ONCE into an array and indexed with O(1)
``element_at`` — reading inside the lambda with ``substring(text, i,
1)`` byte-scans a UTF8String to codepoint i on every call, making the
pass O(len²) per document. Three zero pads reproduce the out-of-range
``ascii('') = 0`` the DuckDB oracles compute with out-of-range slices,
keeping sub-gram-length (and empty) documents total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAM_P = 1048573  # 2^20 - 3, the shared portable hash modulus

# expression SOURCE strings (Columns are built lazily inside the
# function — F.expr at module import would require an active
# SparkContext, and this module is imported by oracle generators that
# run before any session exists)
_CODES_SQL = (
    "concat(transform(split(text, ''), c -> ascii(c)), array(0L, 0L, 0L))"
)
_HS_SQL = (
    f"transform(sequence(1, greatest(size(__c) - 6, 1)), i -> "
    f" (element_at(__c, i) * 29791"
    f"  + element_at(__c, i + 1) * 961"
    f"  + element_at(__c, i + 2) * 31"
    f"  + element_at(__c, i + 3)) % {GRAM_P})"
)


def with_char_gram_hashes(df: DataFrame, out: str = "hs") -> DataFrame:
    """Append column ``out`` = array of char-4-gram hashes of ``text``.
    Pure in-array map (no explode, no shuffle); requires a ``text``
    column and consumes a private ``__c`` intermediate."""
    return (
        df.withColumn("__c", F.expr(_CODES_SQL))
        .withColumn(out, F.expr(_HS_SQL))
        .drop("__c")
    )


def char_gram_sql(text: str = "text") -> str:
    """DuckDB list-comprehension snippet computing the SAME gram-hash
    array as :func:`with_char_gram_hashes` — generated here so the
    ngram-dedup and fingerprint oracles share one definition of the
    polynomial. The first term casts to BIGINT because DuckDB ascii()
    is INT32 and a non-ASCII codepoint × 29791 overflows; out-of-range
    slices give ascii('') = 0, matching the Spark side's zero pads."""
    return (
        f"[ (CAST(ascii({text}[i:i]) AS BIGINT) * 29791"
        f" + ascii({text}[i+1:i+1]) * 961"
        f" + ascii({text}[i+2:i+2]) * 31"
        f" + ascii({text}[i+3:i+3])) % {GRAM_P}"
        f" FOR i IN range(1, greatest(length({text}) - 2, 2)) ]"
    )
