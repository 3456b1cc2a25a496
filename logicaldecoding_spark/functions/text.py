"""Text primitives shared by the dedup / quality / language operators.

All built-in expressions (split/transform/substr) — vectorized JVM-side.
Semantics are deliberately simple and exactly reproducible in ANSI SQL so
every operator built on them can carry a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(col), r"\s+")


def char_shingles(col: Column, k: int = 3) -> Column:
    """Distinct character k-grams (shingles) of a string.

    For strings shorter than k, the single truncated prefix is the shingle —
    mirrored exactly in the SQL oracles.
    """
    n = F.greatest(F.length(col) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: col.substr(i, F.lit(k)))
    )


# a tiny multilingual stopword table for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
}


def stopword_hits(tok: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tok, lambda t: F.array_contains(words, t)))
