"""Text-analysis operators for training-data pipelines.

Each is a pure DataFrame transformation over a documents-shaped table
(doc_id, text, ...) and has an exact ANSI-SQL twin in __spark_entry__'s
oracles.  Designed for 100 TB corpora: row-local expressions only (no
shuffle), whole-stage-codegen friendly, column-pruned input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, stopword_hits, tokens


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate.

    The subword estimate counts runs of letters/digits of length<=4 as one
    unit each (ceil(len/4) per token) — a cheap deterministic proxy for BPE
    token counts that needs no vocabulary."""
    tok = tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.aggregate(
            tok,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
        ).alias("n_subwords"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, mean token length, stopword ratio,
    alpha ratio -> a [0,1] composite.  All row-local built-ins."""
    tok = tokens(F.col(text_col))
    n_tok = F.size(tok)
    n_chars = F.length(F.col(text_col))
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok  # chars net of single spaces
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", "")) / n_chars
    )
    stop_ratio = stopword_hits(tok, "en") / n_tok
    score = F.round(
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + alpha_ratio * 0.3,
        4,
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        score.alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword language-ID heuristic: argmax of per-language stopword
    hit counts; 'und' (undetermined) when nothing matches."""
    tok = tokens(F.col(text_col))
    hits = {lang: stopword_hits(tok, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    pred = F.when(best <= 0, F.lit("und"))
    # deterministic tie-break: language order en, de, es
    for lang in ("en", "de", "es"):
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return docs.select(
        "doc_id",
        *[hits[lang].alias(f"hits_{lang}") for lang in ("en", "de", "es")],
        pred.alias("lang_pred"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", prefix_tokens: int = 8
                ) -> DataFrame:
    """Document fingerprinting: md5 of the full text plus an md5 'prefix
    fingerprint' of the first N tokens (cheap near-dup prefilter)."""
    tok = tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("fp_full"),
        F.md5(F.array_join(F.slice(tok, 1, prefix_tokens), " ")).alias("fp_prefix"),
    )
