"""Distributed BPE tokenizer training over the corpus word dictionary.

The training-data pipeline doesn't just FILTER text — it builds the
tokenizer that will consume it.  Classic BPE (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") trains
on the word-FREQUENCY dictionary, not the raw corpus: one corpus-wide
aggregation reduces 100 TB of text to a words×freq table (≤ ~10⁸ rows
for web text), and every merge iteration then runs on that dict alone.

Scale shape:
  * ONE corpus pass: ``explode(tokens) → groupBy(word) → sum`` with
    map-side partials — the only time the corpus is touched;
  * per merge iteration: adjacent-pair counts are a JVM ``zip_with``
    explode + keyed agg over the dict (partial aggs absorb frequency
    skew); the argmax is a tiny ``orderBy().first()`` driver action
    (deterministic tie-break: count desc, then pair lexicographic);
  * re-segmentation applies the ONE chosen merge to the dict in an
    Arrow-batched pandas pass — Python runs on the dictionary, never
    on the corpus;
  * the dict is re-pinned and MATERIALIZED per iteration before the
    previous pin is released (``cache_scope``-compatible), so each
    merge reads the cached dict instead of replaying the chain; every
    ``checkpoint_every`` rounds an EAGER ``localCheckpoint`` truncates
    the lineage (superseded snapshots are dereferenced and reclaimed
    by Spark's ContextCleaner).

Reference parity: `/root/reference/src` has no tokenizer-training
analog — this is part of the LLM-pipeline surface the reference lacks.
Pinned by a pure-python BPE reference implementation (same tie-break)
in tests; non-SQL-expressible (iterative), so the driver records the
rows-only check for the registry entry.
"""

from __future__ import annotations

import logging
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from smart_ocr_spark.functions.cache import pin
from smart_ocr_spark.functions.text_analysis import tokens_col

_log = logging.getLogger(__name__)

END_OF_WORD = "</w>"  # standard BPE end-of-word marker


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the one corpus-wide pass."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_segmentation(words: DataFrame) -> DataFrame:
    """word → array of single-character symbols + the end-of-word
    marker (pure JVM)."""
    return words.select(
        "word",
        "freq",
        F.concat(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            ),
            F.array(F.lit(END_OF_WORD)),
        ).alias("symbols"),
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    n = F.size("symbols")
    pairs = seg.select(
        "freq",
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice("symbols", 1, n - 1),
                    F.slice("symbols", 2, n - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy("p").agg(F.sum("freq").alias("c"))


def _apply_merge(seg: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) in each symbol array with a+b.
    Arrow-batched Python over the word DICT (not the corpus); a
    left-to-right single pass, the standard BPE application order."""
    merged = a + b

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["symbols"]:
                syms = list(syms)
                res = []
                i = 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "freq": pdf["freq"],
                    "symbols": out,
                }
            )

    return seg.mapInPandas(
        run, "word string, freq bigint, symbols array<string>"
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 10,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table as a DataFrame (rank, left, right, merged, pair_count) built
    on the driver (≤ ``n_merges`` rows) — the artifact a tokenizer
    loads.  Stops early when no pair reaches ``min_pair_count``."""
    spark = df.sparkSession
    seg = pin(_initial_segmentation(word_freq(df, text_col)))
    merges = []
    try:
        for rank in range(n_merges):
            best = (
                _pair_counts(seg)
                .orderBy(
                    F.desc("c"), F.asc("p.a"), F.asc("p.b")
                )
                .first()
            )
            if best is None or best["c"] < min_pair_count:
                _log.info(
                    "bpe_train: stopping at %d merges (no pair ≥ %d)",
                    rank, min_pair_count,
                )
                break
            a, b, c = best["p"]["a"], best["p"]["b"], int(best["c"])
            merges.append((rank, a, b, a + b, c))
            nxt = _apply_merge(seg, a, b)
            if (rank + 1) % checkpoint_every == 0:
                # eager: truncates lineage AND materializes in one pass.
                # Superseded snapshots become unreachable once `seg` is
                # reassigned and are reclaimed by the ContextCleaner.
                nxt = nxt.localCheckpoint(eager=True)
            else:
                # materialize the new pin BEFORE dropping the old one —
                # unpersist-first would discard every cache fill unread
                # and each iteration would recompute from the corpus
                nxt = pin(nxt)
                nxt.count()
            seg.unpersist()
            seg = nxt
    finally:
        seg.unpersist()
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, "
        "pair_count bigint",
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to a corpus: (id, n_tokens,
    n_subwords) per doc — the compression-ratio check a tokenizer
    build ends with.  Arrow-batched; merges applied in rank order to
    each word (standard greedy application)."""
    order = {pair: i for i, pair in enumerate(merges)}

    def encode_word(w: str) -> list[str]:
        syms = list(w) + [END_OF_WORD]
        while len(syms) >= 2:
            best_i, best_rank = -1, None
            for i in range(len(syms) - 1):
                r = order.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_i, best_rank = i, r
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        for pdf in batches:
            ids, n_toks, n_subs = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split((text or "").lower()) if t]
                subs = sum(len(encode_word(w)) for w in toks)
                ids.append(did)
                n_toks.append(len(toks))
                n_subs.append(subs)
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": n_toks, "n_subwords": n_subs}
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} bigint, n_tokens bigint, n_subwords bigint"
    )
