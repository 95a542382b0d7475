"""Text-analysis columns over a document corpus.

Language-ID, quality scoring, token counting, and document
fingerprinting — the per-document scalar battery a training-data
pipeline runs before filtering/dedup (reference analog: the audit
heuristics battery, ``src/socr/audit/heuristics.py:85-221``, applied to
corpus curation instead of OCR output).

All of these stay JVM-side (whole-stage codegen) except the winnowing
fingerprint, which needs a rolling hash and runs as an Arrow-batched
pandas UDF. At 100 TB these are embarrassingly parallel map columns:
no shuffle, filters push down to the parquet scan.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType

# CJK unified ideographs. Java regex syntax (Spark); the DuckDB/RE2
# equivalent is [\x{4e00}-\x{9fff}] — see __spark_entry__.oracle_sql.
_CJK_RE_JAVA = "[\\u4e00-\\u9fff]"

# Tiny high-frequency stopword sets per language: enough signal for a
# deterministic n-gram-style heuristic without model weights.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["los", "las", "datos", "de", "una"],
    "de": ["die", "der", "und", "das", "ein"],
    "fr": ["le", "la", "les", "des", "une"],
}

STOPWORDS_EN = ["the", "a", "an", "of", "to", "and", "in", "is", "it"]


def _word_bounded(word: str) -> str:
    # \b is identical in Java regex and RE2 for ASCII words.
    return f"\\b{word}\\b"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empties dropped (parity contract: the DuckDB
    oracle splits on the same explicit class; Java \\s and RE2 \\s
    disagree on vertical tab, so the class is pinned on all sides)."""
    return F.filter(
        F.split(F.lower(text), "[ \\t\\n\\x0B\\f\\r]+"),
        lambda t: t != F.lit(""),
    )


# GPT-2-style pre-tokenizer approximation: contractions, letter runs,
# digit runs, punctuation runs.  Every construct here (\p{L}, \p{N},
# alternation, explicit whitespace class) behaves identically in Java
# regex (Spark) and RE2 (DuckDB) — \s itself is NOT pinned (Java
# includes \x0B, RE2 does not), hence the explicit class.
BPE_TOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)"
    "|\\p{L}+"
    "|\\p{N}+"
    "|[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+"
)


def bpe_token_count_col(text: Column) -> Column:
    """Subword-ish token count (the cheap pre-pass a training pipeline
    uses to budget tokenizer costs before running a real BPE): count of
    GPT-2-style pre-token matches.  JVM-side regexp_extract_all — no
    Python, whole-stage codegen."""
    # idx=0 -> whole-match extraction (Spark defaults to group 1;
    # DuckDB's regexp_extract_all defaults to group 0)
    return F.size(
        F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))
    ).cast("bigint")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """token_count / bpe_token_count / char_count / avg_token_len
    columns (pure codegen)."""
    toks = tokens_col(F.col(text_col))
    return (
        df.withColumn("token_count", F.size(toks).cast("bigint"))
        .withColumn("bpe_token_count", bpe_token_count_col(F.col(text_col)))
        .withColumn("char_count", F.length(F.col(text_col)).cast("bigint"))
        .withColumn(
            "avg_token_len",
            F.round(
                F.when(
                    F.size(toks) > 0,
                    F.aggregate(
                        toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
                    )
                    / F.size(toks),
                ).otherwise(F.lit(0.0)),
                4,
            ),
        )
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit counts per language + CJK char count."""
    scores: dict[str, Column] = {}
    for lang, words in LANG_MARKERS.items():
        hits = None
        for w in words:
            c = F.regexp_count(F.lower(text), F.lit(_word_bounded(w)))
            hits = c if hits is None else hits + c
        # coalesce: regexp_count(NULL) is NULL; NULL text must score 0
        # so the argmax lands on 'und' identically in Spark and the oracle
        scores[lang] = F.coalesce(hits, F.lit(0)).cast("bigint")
    scores["zh"] = F.coalesce(
        F.regexp_count(text, F.lit(_CJK_RE_JAVA)), F.lit(0)
    ).cast("bigint")
    return scores


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic n-gram/stopword language-ID heuristic.

    argmax over marker-hit counts; ties broken by fixed language order
    (zh > en > es > de > fr) so the result is total-order deterministic.
    """
    s = lang_scores(F.col(text_col))
    order = ["zh", "en", "es", "de", "fr"]
    best = F.lit("und")
    best_score = F.lit(-1).cast("bigint")
    # Build a priority-ordered argmax: strictly-greater keeps the earlier
    # (higher-priority) language on ties.
    expr_lang, expr_score = best, best_score
    for lang in order:
        cond = s[lang] > expr_score
        expr_lang = F.when(cond, F.lit(lang)).otherwise(expr_lang)
        expr_score = F.when(cond, s[lang]).otherwise(expr_score)
    out = df
    for lang in order:
        out = out.withColumn(f"score_{lang}", s[lang])
    return out.withColumn(
        "predicted_lang",
        F.when(expr_score <= 0, F.lit("und")).otherwise(expr_lang),
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality composite.

    Mirrors the reference audit metrics repurposed for corpus curation:
    word-count floor (heuristics.py:142-151), garbage ceiling
    (heuristics.py:182-190), word-length band (heuristics.py:168-176).
    Score in [0,1]; all plain column algebra.
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop_hits = None
    for w in STOPWORDS_EN:
        c = F.regexp_count(F.lower(text), F.lit(_word_bounded(w)))
        stop_hits = c if stop_hits is None else stop_hits + c
    garbage = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(text, "[a-zA-Z0-9 \\t\\n\\x0B\\f\\r.,;:!?'\"()-]", ""))
        / n_chars.cast("double"),
    ).otherwise(F.lit(1.0))
    punct = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(text, "[^.,;:!?]", "")) / n_chars.cast("double"),
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok.cast("double")).otherwise(
        F.lit(0.0)
    )
    length_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * (F.lit(1.0) - F.least(garbage * 5, F.lit(1.0)))
        + F.lit(0.2) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct * 5, F.lit(1.0)))
    )
    return (
        df.withColumn("garbage_ratio", F.round(garbage, 4))
        .withColumn("punct_ratio", F.round(punct, 4))
        .withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("quality_score", F.round(score, 4))
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing) — all JVM regexp_replace.
# ---------------------------------------------------------------------------

# Deliberately conservative, high-precision patterns: a training-data
# scrub wants near-zero false positives on code/technical text.  Order
# matters: emails before phones (an email local part can look like
# digits), IPs before phones (dotted quads must not half-match).
PII_PATTERNS = [
    # (name, java-regex, replacement token)
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # octets restricted to 0-255 (ADVICE r3): 999.999.999.999 is a
    # version-ish string, not an address
    (
        "ipv4",
        r"\b(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|1?\d?\d)\b",
        "<IP>",
    ),
    (
        "phone",
        # +1-555-123-4567 / (555) 123-4567 / 555-123-4567 — needs the
        # full 3-3-4 shape with separators; bare digit runs are left
        # alone (dates, ids, quantities)
        r"(?:\+?\d{1,2}[ .\-])?\(?\d{3}\)?[ .\-]\d{3}[ .\-]\d{4}\b",
        "<PHONE>",
    ),
]


def redact_pii_col(text: Column) -> Column:
    """PII-scrubbed text: chained JVM ``regexp_replace`` — stays inside
    whole-stage codegen, no Python in the path.  At 100 TB this is a
    map-only column projection."""
    out = text
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``redacted`` text plus per-kind REPLACEMENT counts.

    Each count is computed on the text as of that stage of the
    replacement chain (ADVICE r3): a phone- or IP-shaped substring
    inside an already-redacted email match is neither counted nor
    replaced, so ``n_<kind>`` equals the number of ``<KIND>`` tokens
    actually substituted at that stage.  The counts feed the
    no-silent-caps rule: a corpus-level scrub must report how much it
    changed."""
    out = df
    cur = F.col(text_col)
    for name, pattern, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            # idx=0 = whole match (Spark defaults to capture group 1)
            F.size(F.regexp_extract_all(cur, F.lit(pattern), 0)),
        )
        cur = F.regexp_replace(cur, pattern, token)
    return out.withColumn("redacted", cur)


def with_bag_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token list. Cheap exact near-dup key robust to shuffling/word order."""
    toks = tokens_col(F.col(text_col))
    return df.withColumn(
        "bag_fingerprint",
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprint (rolling hash) — needs Python; Arrow-batched.
# ---------------------------------------------------------------------------

_WINNOW_K = 5  # k-gram length (chars)
_WINNOW_W = 4  # window size


# Gram hash = codepoint polynomial (base 257, exact in 64 bits: max
# codepoint 0x10FFFF x 257^4 x 5 terms ~ 2.4e16) followed by a
# splitmix64-style xorshift-multiply mixer for uniformity.  Multipliers
# are kept below 2^62 so the SQL mirror's HUGEINT products
# (z < 2^64 times M) stay inside HUGEINT range — mod-2^64 wraparound is
# then one `% 2^64`, matching numpy's native uint64 wrap.
_POLY_B = 257
_MIX_C0 = 0x9E3779B97F4A7C15  # additive offset (golden-ratio constant)
_MIX_M1 = 0x3F58476D1CE4E5B9  # < 2^62, odd -> bijective mod 2^64
_MIX_M2 = 0x14D049BB133111EB  # < 2^62, odd
_WS_STRIP_RE = re.compile(r"[ \t\n\x0b\f\r]+")

from numpy.lib.stride_tricks import sliding_window_view as _sliding_window_view

# precomputed uint64 scalars: keeps the per-document hot path free of
# Python int -> np.uint64 conversions (short web docs are overhead-bound)
_POWS = [np.uint64(_POLY_B ** (_WINNOW_K - 1 - j)) for j in range(_WINNOW_K)]
_POW0 = _POWS[0]
_MIX_C0_U = np.uint64(_MIX_C0)
_MIX_M1_U = np.uint64(_MIX_M1)
_MIX_M2_U = np.uint64(_MIX_M2)
_SH30, _SH27, _SH31 = np.uint64(30), np.uint64(27), np.uint64(31)


def _winnow_one(text: str) -> int:
    """Winnowing (Schleimer et al., SIGMOD'03): min hash per sliding
    window of k-gram hashes, XOR-folded to one 63-bit fingerprint.
    Whitespace stripping uses the pinned ASCII class (str.split() is
    Unicode-aware and would diverge from the tokenizer contract).

    The k-gram hash is a base-257 codepoint polynomial passed through a
    xorshift-multiply mixer — fully vectorized in numpy uint64 (one
    md5 call per CHARACTER in the previous version was the most
    expensive per-byte text kernel in the repo, VERDICT r2 #8) and
    exactly reproducible in SQL (ascii()/HUGEINT mod-2^64 arithmetic)
    for the DuckDB correctness oracle.  The fold stays a plain XOR of
    the distinct selected gram hashes (bit_xor aggregate in SQL)."""
    s = _WS_STRIP_RE.sub("", (text or "").lower())
    if len(s) < _WINNOW_K:
        h = hashlib.md5(s.encode("utf-8")).digest()
        return int.from_bytes(h[:8], "big") >> 1
    # one explicit upcast: numpy 1.x value-based casting would keep
    # uint32 for small-scalar products and silently truncate codepoints
    cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    ng = len(cp) - _WINNOW_K + 1
    z = cp[0:ng] * _POW0
    for j in range(1, _WINNOW_K):
        z += cp[j : j + ng] * _POWS[j]
    z += _MIX_C0_U
    z ^= z >> _SH30
    z *= _MIX_M1_U
    z ^= z >> _SH27
    z *= _MIX_M2_U
    z ^= z >> _SH31
    if ng >= _WINNOW_W:
        mins = _sliding_window_view(z, _WINNOW_W).min(axis=1)
    else:
        mins = z.min(keepdims=True)
    return int(np.bitwise_xor.reduce(np.unique(mins))) >> 1


@F.pandas_udf(LongType())
def winnow_fingerprint_udf(texts: pd.Series) -> pd.Series:
    return texts.map(_winnow_one).astype("int64")


def with_winnow_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("winnow_fp", winnow_fingerprint_udf(F.col(text_col)))


# ---------------------------------------------------------------------------
# Unigram language-model scoring (ccnet-style quality signal)
# ---------------------------------------------------------------------------


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
) -> DataFrame:
    """Per-doc unigram log-probability — the deterministic analog of
    ccnet's KenLM perplexity filter (Wenzek et al. 2019: docs scoring
    far from the reference LM are boilerplate/garbage/wrong-language).

    The model is derived FROM THE CORPUS ITSELF in one aggregation (the
    classic train-then-score shape): the ``vocab_size`` most frequent
    tokens (ties toward the lexicographically smaller token — fully
    deterministic) with add-one smoothing over N = corpus token count
    and V = vocabulary size; out-of-vocabulary tokens take the floor
    probability 1/(N+V).  Scale shape: one token aggregation for the
    model (the vocab is broadcast-sized by construction), one broadcast
    join to score, one doc-keyed aggregation — the corpus never joins
    itself.

    Output: (id, n_tokens, oov_rate, avg_logprob), avg_logprob in
    log10 (more negative = less LM-like; empty docs score 0.0).
    """
    toks = tokens_col(F.col(text_col))
    exploded = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    counts = exploded.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = counts.orderBy(F.desc("c"), F.asc("tok")).limit(vocab_size)
    totals = counts.agg(
        F.sum("c").alias("n_total")
    ).crossJoin(vocab.agg(F.count(F.lit(1)).alias("v_size")))
    model = F.broadcast(vocab.crossJoin(F.broadcast(totals)))

    scored = exploded.join(model, "tok", "left")
    # all rows carry the same totals via the model join EXCEPT OOV rows
    # (left-join misses): re-attach them once, broadcast
    scored = scored.drop("n_total", "v_size").crossJoin(F.broadcast(totals))
    logp = F.log10(
        (F.coalesce(F.col("c"), F.lit(0)) + 1)
        / (F.col("n_total") + F.col("v_size")).cast("double")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum(F.col("c").isNull().cast("long"))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("oov_rate"),
        (F.round(F.avg(logp), 4) + F.lit(0.0)).alias("avg_logprob"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("oov_rate", F.lit(0.0)).alias("oov_rate"),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
    bigram_size: int = 50_000,
    backoff: float = 0.4,
) -> DataFrame:
    """Per-doc bigram log-probability with STUPID BACKOFF (Brants et
    al. 2007, "Large Language Models in Machine Translation") — the
    next step up from :func:`unigram_lm_scores` toward ccnet's KenLM
    filter, still fully deterministic and oracle-mirrorable.

    Model (trained from the corpus itself, classic train-then-score):
      * the ``bigram_size`` most frequent bigrams (ties toward the
        lexicographically smaller pair), each row carrying its exact
        context count — score ``log10(c(w1 w2) / c(w1))``;
      * bigrams outside the model back off to ``backoff ×`` the
        add-one-smoothed unigram probability of ``w2`` over the
        ``vocab_size`` unigram vocabulary (OOV floor ``1/(N+V)``) —
        stupid backoff's unnormalized score, the published trade for
        distributed-scale LMs.

    Scale shape: two token-grain aggregations train the model (both
    results broadcast-sized BY CONSTRUCTION); scoring is two broadcast
    joins + one doc-keyed agg; the corpus never joins itself.

    Output: (id, n_bigrams, bigram_hit_rate, avg_logprob) — log10,
    more negative = less LM-like; docs with < 2 tokens score 0.0.
    """
    toks = tokens_col(F.col(text_col))
    tokd = df.select(F.col(id_col), toks.alias("t"))
    n = F.size("t")
    uni = tokd.select(F.explode("t").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_uni")
    )
    pairs = tokd.select(
        F.col(id_col),
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice("t", 1, n - 1),
                    F.slice("t", 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    bi_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_bi")
    )
    bi_model = (
        bi_counts.orderBy(F.desc("c_bi"), F.asc("w1"), F.asc("w2"))
        .limit(bigram_size)
        .join(uni.select(F.col("tok").alias("w1"), F.col("c_uni").alias("c_w1")), "w1")
    )
    vocab = uni.orderBy(F.desc("c_uni"), F.asc("tok")).limit(vocab_size)
    totals = uni.agg(F.sum("c_uni").alias("n_total")).crossJoin(
        vocab.agg(F.count(F.lit(1)).alias("v_size"))
    )

    scored = (
        pairs.join(F.broadcast(bi_model), ["w1", "w2"], "left")
        .join(
            F.broadcast(vocab.select(F.col("tok").alias("w2"), "c_uni")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
    )
    uni_logp = F.log10(F.lit(backoff)) + F.log10(
        (F.coalesce(F.col("c_uni"), F.lit(0)) + 1)
        / (F.col("n_total") + F.col("v_size")).cast("double")
    )
    logp = F.when(
        F.col("c_bi").isNotNull(),
        F.log10(F.col("c_bi") / F.col("c_w1").cast("double")),
    ).otherwise(uni_logp)
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(F.col("c_bi").isNotNull().cast("long"))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("bigram_hit_rate"),
        (F.round(F.avg(logp), 4) + F.lit(0.0)).alias("avg_logprob"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("bigram_hit_rate", F.lit(0.0)).alias(
                "bigram_hit_rate"
            ),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )


def trigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
    bigram_size: int = 50_000,
    trigram_size: int = 50_000,
    min_count: int = 2,
    backoff: float = 0.4,
) -> DataFrame:
    """Per-doc trigram log-probability with the full STUPID-BACKOFF
    chain trigram→bigram→unigram (Brants et al. 2007) — the
    KenLM-grade step past :func:`bigram_lm_scores` toward ccnet's
    actual filter (Wenzek et al. 2020 score with a 5-gram KenLM; the
    backoff chain is the same shape, deterministic and
    oracle-mirrorable here).

    Model (trained from the corpus itself, classic train-then-score):
      * trigram counts are COUNT-THRESHOLD PRUNED first (Brants 2007
        §4.2: drop n-grams seen fewer than ``min_count`` times — at
        corpus scale the overwhelming majority of distinct trigrams
        are singletons carrying no signal), then capped to the
        ``trigram_size`` most frequent (ties toward the
        lexicographically smaller triple); each kept trigram carries
        its exact bigram context count — score
        ``log10(c(w1 w2 w3) / c(w1 w2))``;
      * misses back off to ``backoff ×`` the bigram model (the
        ``bigram_size`` most frequent bigrams, scored
        ``c(w2 w3)/c(w2)``);
      * bigram misses back off again to ``backoff² ×`` the
        add-one-smoothed unigram probability of ``w3`` over the
        ``vocab_size`` unigram vocabulary (OOV floor ``1/(N+V)``).

    Scale shape: three token-grain aggregations train the model, each
    broadcast-sized BY CONSTRUCTION (pruning + cap); scoring is three
    broadcast joins + one doc-keyed agg — the corpus never joins
    itself and no per-token state leaves the mappers unaggregated.

    Output: (id, n_trigrams, trigram_hit_rate, bigram_hit_rate,
    avg_logprob) — log10, more negative = less LM-like; docs with
    < 3 tokens score 0.0 (filter the sentinel before bucketing, as
    with every scorer here).
    """
    toks = tokens_col(F.col(text_col))
    tokd = df.select(F.col(id_col), toks.alias("t"))
    n = F.size("t")
    uni = tokd.select(F.explode("t").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_uni")
    )
    pair_struct = "array<struct<w1:string,w2:string>>"
    pairs = tokd.select(
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice("t", 1, n - 1),
                    F.slice("t", 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast(pair_struct))
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    tri_struct = "array<struct<w1:string,w2:string,w3:string>>"
    triples = tokd.select(
        F.col(id_col),
        F.explode(
            F.when(
                n >= 3,
                F.zip_with(
                    F.zip_with(
                        F.slice("t", 1, n - 2),
                        F.slice("t", 2, n - 2),
                        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                    ),
                    F.slice("t", 3, n - 2),
                    lambda ab, c: F.struct(
                        ab["w1"].alias("w1"),
                        ab["w2"].alias("w2"),
                        c.alias("w3"),
                    ),
                ),
            ).otherwise(F.array().cast(tri_struct))
        ).alias("g"),
    ).select(
        id_col,
        F.col("g.w1").alias("w1"),
        F.col("g.w2").alias("w2"),
        F.col("g.w3").alias("w3"),
    )

    bi_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_bi")
    )
    tri_model = (
        triples.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c_tri"))
        .where(F.col("c_tri") >= min_count)  # Brants count pruning
        .orderBy(F.desc("c_tri"), F.asc("w1"), F.asc("w2"), F.asc("w3"))
        .limit(trigram_size)
        .join(
            bi_counts.select("w1", "w2", F.col("c_bi").alias("c_ctx12")),
            ["w1", "w2"],
        )
    )
    bi_model = (
        bi_counts.orderBy(F.desc("c_bi"), F.asc("w1"), F.asc("w2"))
        .limit(bigram_size)
        .join(
            uni.select(F.col("tok").alias("w1"), F.col("c_uni").alias("c_w1")),
            "w1",
        )
        # backoff looks bigrams up by the LAST TWO trigram slots
        .select(
            F.col("w1").alias("w2"),
            F.col("w2").alias("w3"),
            "c_bi",
            F.col("c_w1").alias("c_ctx2"),
        )
    )
    vocab = uni.orderBy(F.desc("c_uni"), F.asc("tok")).limit(vocab_size)
    totals = uni.agg(F.sum("c_uni").alias("n_total")).crossJoin(
        vocab.agg(F.count(F.lit(1)).alias("v_size"))
    )

    scored = (
        triples.join(F.broadcast(tri_model), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(bi_model), ["w2", "w3"], "left")
        .join(
            F.broadcast(vocab.select(F.col("tok").alias("w3"), "c_uni")),
            "w3",
            "left",
        )
        .crossJoin(F.broadcast(totals))
    )
    uni_logp = F.lit(2.0) * F.log10(F.lit(backoff)) + F.log10(
        (F.coalesce(F.col("c_uni"), F.lit(0)) + 1)
        / (F.col("n_total") + F.col("v_size")).cast("double")
    )
    bi_logp = F.log10(F.lit(backoff)) + F.log10(
        F.col("c_bi") / F.col("c_ctx2").cast("double")
    )
    logp = (
        F.when(
            F.col("c_tri").isNotNull(),
            F.log10(F.col("c_tri") / F.col("c_ctx12").cast("double")),
        )
        .when(F.col("c_bi").isNotNull(), bi_logp)
        .otherwise(uni_logp)
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(
            F.sum(F.col("c_tri").isNotNull().cast("long"))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("trigram_hit_rate"),
        F.round(
            F.sum(
                (F.col("c_tri").isNull() & F.col("c_bi").isNotNull())
                .cast("long")
            )
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("bigram_hit_rate"),
        (F.round(F.avg(logp), 4) + F.lit(0.0)).alias("avg_logprob"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            F.coalesce("trigram_hit_rate", F.lit(0.0)).alias(
                "trigram_hit_rate"
            ),
            F.coalesce("bigram_hit_rate", F.lit(0.0)).alias(
                "bigram_hit_rate"
            ),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` bigram collocations by pointwise mutual
    information (Church & Hanks 1990) — the phrase-mining pass a
    tokenizer/vocab build runs over the corpus ("new york", "machine
    learning" score high; "of the" scores low despite its raw count).

    PMI is computed over the BIGRAM distribution with self-consistent
    marginals: ``pmi = log10(c(w1,w2)·N / (c(w1,·)·c(·,w2)))`` where N
    is the total bigram count and the marginals are row sums of the
    bigram table itself (so the estimate never mixes token and bigram
    normalizations).  The top-k CUTOFF orders by the raw ratio —
    IEEE multiply/divide over exact integer counts, bit-identical in
    any engine — because ``log10`` itself is libm-dependent (JVM vs
    DuckDB differ by 1 ulp on some inputs); the reported ``pmi`` is
    the log rounded to 6 places (monotone transform, same order).

    Scale shape: one corpus pass builds the bigram counts (map-side
    partials absorb hot bigrams); the ``min_count`` floor prunes the
    long tail BEFORE the marginal joins (classic: most bigrams are
    hapax); marginals are two further aggregations of the counts
    table, joined back by vocab-keyed equi-joins (AQE picks broadcast
    when they fit); the top-k is a TakeOrderedAndProject, never a
    global sort materialization.  Deterministic tie-break: pmi desc,
    then (w1, w2) lexicographic.
    """
    toks = tokens_col(F.col(text_col))
    t = df.select(toks.alias("t"))
    n = F.size("t")
    pairs = t.select(
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice("t", 1, n - 1),
                    F.slice("t", 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    left = bi.groupBy("w1").agg(F.sum("c_bi").alias("c_left"))
    right = bi.groupBy("w2").agg(F.sum("c_bi").alias("c_right"))
    tot = bi.agg(F.sum("c_bi").alias("n_bi"))

    ratio = (
        F.col("c_bi").cast("double") * F.col("n_bi").cast("double")
    ) / (F.col("c_left").cast("double") * F.col("c_right").cast("double"))
    return (
        bi.where(F.col("c_bi") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c_bi", ratio.alias("_ratio"))
        .orderBy(F.desc("_ratio"), F.asc("w1"), F.asc("w2"))
        .limit(top_k)
        .select(
            "w1", "w2", "c_bi",
            F.round(F.log10("_ratio"), 6).alias("pmi"),
        )
    )


def lm_bucket_cutoffs(
    scored: DataFrame,
    score_col: str = "avg_logprob",
    lang_col: str = "lang",
    fracs: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    sample_fraction: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "ppl0",
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-language LM-score cutoffs at the given quantiles — the
    artifact behind ccnet's head/middle/tail split (Wenzek et al.
    2020 compute per-lang perplexity thresholds once, on a sample,
    then ship them).  Returns a tiny (lang, cut_lo, cut_hi) frame.

    Scale: the DEFAULT path is ``approx_percentile`` — a bounded
    Greenwald-Khanna sketch per language (size ~``accuracy``, NOT the
    group size), merged map-side like any partial agg, so the hottest
    language (English is ~half of Common Crawl — billions of rows per
    dump) never gathers onto one reducer.  Cutoffs are a threshold
    artifact; rank error ``1/accuracy`` (1e-4 at the default) moves
    the head/middle boundary by an invisible sliver of the
    distribution, which is why ccnet itself trains cutoffs on a
    sample.  ``sample_fraction`` (the md5-hash rule from
    :mod:`sampling` — engine-reproducible, partition-independent)
    composes with either path to cut the scan cost too.

    ``exact=True`` is the explicit fixture/oracle mode: EXACT
    linear-interpolated percentile (bit-identical to DuckDB
    ``quantile_cont``), which buffers each language's values on one
    reducer — pass it only at test/fixture scale, or pair it with a
    ``sample_fraction`` sized to the reducer."""
    from smart_ocr_spark.functions.sampling import deterministic_sample

    s = scored
    if sample_fraction < 1.0:
        s = deterministic_sample(
            scored, sample_fraction, id_col=id_col, salt=salt
        )
    if exact:
        pct = F.percentile(
            F.col(score_col), F.array(*[F.lit(float(f)) for f in fracs])
        )
    else:
        pct = F.percentile_approx(
            F.col(score_col),
            F.array(*[F.lit(float(f)) for f in fracs]),
            F.lit(int(accuracy)),
        )
    return s.groupBy(lang_col).agg(pct.alias("_cuts")).select(
        lang_col,
        F.col("_cuts")[0].alias("cut_lo"),
        F.col("_cuts")[1].alias("cut_hi"),
    )


def perplexity_buckets(
    scored: DataFrame,
    cutoffs: DataFrame | None = None,
    score_col: str = "avg_logprob",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    **cutoff_kwargs,
) -> DataFrame:
    """ccnet head/middle/tail bucketing: HIGHER score (log-prob) =
    more LM-like = ``head``; the middle third is what ccnet keeps by
    default and the tail is noise.  Pass a precomputed ``cutoffs``
    frame (the shipped-artifact workflow) or let it derive one via
    :func:`lm_bucket_cutoffs` — sketch-based (scale-safe) by default;
    forward ``exact=True`` for the interpolated fixture/oracle mode.

    Docs whose language is absent from the cutoffs table (possible
    under cutoff sampling) fall to ``tail`` — the conservative
    bucket; NULL comparisons fall through a CASE identically in SQL,
    so the oracle mirrors bit-for-bit.  The cutoff join broadcasts
    (one row per language).

    Filter out sentinel-scored rows FIRST: scorers that coalesce
    unscoreable docs to a fixed value (``unigram_lm_scores`` gives
    empty docs 0.0 — the maximum, since real log10 probs are
    negative) would otherwise inflate the cutoffs and bucket garbage
    as ``head``.  When deriving cutoffs, ``scored`` is consumed twice
    (cutoff aggregation + probe side) and is therefore :func:`pin`-ed
    — release it with a surrounding ``cache_scope()`` in sweep-shaped
    jobs, or pass precomputed ``cutoffs`` to skip the pin."""
    if cutoffs is None:
        from smart_ocr_spark.functions.cache import pin

        scored = pin(scored)
        cutoff_kwargs.setdefault("id_col", id_col)
        cutoffs = lm_bucket_cutoffs(
            scored, score_col, lang_col, **cutoff_kwargs
        )
    elif cutoff_kwargs:
        raise ValueError(
            "cutoff_kwargs have no effect when an explicit cutoffs "
            f"frame is passed: {sorted(cutoff_kwargs)}"
        )
    j = scored.join(F.broadcast(cutoffs), lang_col, "left")
    bucket = (
        F.when(F.col(score_col) >= F.col("cut_hi"), F.lit("head"))
        .when(F.col(score_col) >= F.col("cut_lo"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return j.select(
        F.col(id_col), F.col(lang_col), F.col(score_col),
        bucket.alias("bucket"),
    )
