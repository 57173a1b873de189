"""Text-analysis operators for training-data pipelines over `documents`.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage codegen); no Python UDFs. These are the target-side generalization
of the reference's config-driven column selection + scalar feature block
(SURVEY.md §2.9) to text corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword sets for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pas"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "no"],
    "zh": ["de5", "shi4", "bu4", "le5", "wo3", "ni3", "ta1", "zai4", "you3", "he2"],
}


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(id_col, F.size(tokens(text_col)).alias("n_tokens"))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sub-word-ish token estimate: word-pieces + digits + punctuation as
    separate tokens (a BPE-flavored regex split, no tokenizer dependency)."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(r"(\p{L}{1,6}|\p{N}+|[^\s\p{L}\p{N}])"), 1)
    return df.select(id_col, F.size(pieces).alias("n_bpe_tokens"))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio quality scoring (pure columns)."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    stop = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])))
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars / n_tokens, 4).alias("avg_token_len"),
        punct.alias("n_punct"),
        F.round(punct / n_chars, 6).alias("punct_ratio"),
        F.round(stop / n_tokens, 6).alias("stopword_ratio"),
    )


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language heuristic: score = |tokens ∩ stopwords_lang|
    per language, argmax wins ('und' = undetermined on all-zero).

    Pure built-in array functions — the scoring is a static when/greatest
    cascade, no UDF, no shuffle beyond the scan.
    """
    toks = tokens(text_col)
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }
    out = df.select(id_col, *[s.alias(f"score_{g}") for g, s in scores.items()])
    best = F.greatest(*[F.col(f"score_{g}") for g in LANG_STOPWORDS])
    pred = F.lit("und")  # first language reaching the max wins (stable order)
    for lang in reversed(list(LANG_STOPWORDS)):
        pred = F.when((F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return out.select(id_col, pred.alias("lang_pred"))


def shingles_from_tokens(ts: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-PROJECTED token array
    column. Callers must project `split()` into a column first — referencing
    a split() expression here would re-evaluate it n× per element (Catalyst
    does not CSE through lambda bodies)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(ts) - n, F.lit(-1)))

    def make(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(ts, i + k + 1) for k in range(n)])

    return F.array_distinct(F.transform(idx, make))


def shingled(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, _sh) projection with the shingle array materialized exactly once."""
    return df.select(F.col(id_col).alias("id"), tokens(text_col).alias("_ts")).select(
        "id", shingles_from_tokens(F.col("_ts"), n).alias("_sh")
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: min of 64-bit hashes over word 3-gram shingles —
    a winnowing-style rolling-hash fingerprint using the built-in xxhash64."""
    base = shingled(df, text_col, id_col)
    return base.select(
        F.col("id").alias(id_col),
        F.array_min(F.transform(F.col("_sh"), lambda g: F.xxhash64(g))).alias("fingerprint"),
    )
