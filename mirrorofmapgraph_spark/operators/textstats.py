"""Text-analysis operators over the `documents` table: language ID,
quality scoring, token counting, fingerprinting. Thin DataFrame wrappers
over functions/text.py + functions/hashing.py (all JVM-side expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import gram_hashes, rolling_fingerprint
from ..functions.text import (
    bpe_ish_token_count,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_bpe_tokens, mean_word_len, stopword_ratio,
    punct_ratio, quality) — one pass, all whole-stage codegen."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(mean_word_length(t), 6).alias("mean_word_len"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        quality_score(t).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred) via the marker-word heuristic."""
    return docs.select(F.col(id_col), lang_id(F.col(text_col)).alias("lang_pred"))


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint): order-sensitive rolling hash of the token stream —
    cheap near-identity document identity at corpus scale."""
    toks = gram_hashes(tokens(F.lower(F.col(text_col))))
    return docs.select(F.col(id_col), rolling_fingerprint(toks).alias("fingerprint"))


def quality_filter(
    docs: DataFrame, *, min_quality: float = 0.5, min_tokens: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Training-data hygiene filter: keep docs above quality + length bars."""
    t = F.col(text_col)
    return docs.filter(
        (quality_score(t) >= F.lit(min_quality)) & (token_count(t) >= F.lit(min_tokens))
    )
