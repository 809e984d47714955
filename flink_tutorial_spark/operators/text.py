"""Text-analysis operators for training-data pipelines (SURVEY.md
Phase 6): token counting, quality scoring, language-ID heuristic,
document fingerprinting. All pure JVM-side expressions (regex +
string built-ins) — zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_tutorial_spark.operators.dedup import md5_long

#: tiny English-stopword marker set, shared verbatim with the oracle SQL
STOPWORDS = ("the", "a", "is", "of", "and")

#: BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens, BPE-ish tokens, char count, avg word length."""
    words = F.split(F.col(text_col), " ")
    return docs.withColumns(
        {
            "ws_tokens": F.size(words),
            "bpe_tokens": F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)),
            "n_chars_m": F.length(text_col),
            "avg_word_len": F.round(
                (F.length(text_col) - F.size(words) + 1) / F.size(words), 4
            ),
        }
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: stopword ratio, unique-word ratio,
    plus a composite keep/drop label (the C4/Gopher-style rule shape)."""
    words = F.split(F.col(text_col), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_cnt = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    uniq_ratio = F.size(F.array_distinct(words)) / F.size(words)
    stop_ratio = stop_cnt / F.size(words)
    return docs.withColumns(
        {
            "stop_ratio": F.round(stop_ratio, 4),
            "uniq_ratio": F.round(uniq_ratio, 4),
            "quality_keep": (F.size(words) >= 20) & (uniq_ratio >= 0.2),
        }
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword language-ID heuristic.

    The synthetic corpus draws from one vocabulary, so this predicts via
    English-marker density only — the operator shape (token-ratio
    scoring -> argmax label) is what matters; swap the marker tables for
    real per-language n-gram stats in production."""
    words = F.split(F.col(text_col), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    ratio = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))) / F.size(words)
    return docs.withColumns(
        {
            "en_score": F.round(ratio, 4),
            "lang_pred": F.when(ratio >= 0.05, "en").otherwise("unknown"),
        }
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit content fingerprint over normalized text (lowercase,
    collapsed whitespace) — the dedup/near-dup join key primitive."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), " +", " ")
    return docs.withColumn("fingerprint", md5_long(normalized))


def ngram_decontaminate(
    docs: DataFrame,
    bench_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=
    `min_overlap` distinct n-gram shingles with a held-out benchmark
    set (the eval-leakage check every training-data pipeline runs
    before a corpus ships).

    Scale shape: the benchmark side is small BY CONTRACT (an eval set),
    so its hashed shingle set broadcasts — the corpus-side shingle
    table is filtered map-side with NO corpus shuffle; the only shuffle
    is the per-doc overlap count on `id_col`. Shingles are distinct per
    (doc, shingle) on both sides, so a plain count(*) after the join
    equals the distinct-overlap count (and matches the oracle row-for-
    row even under 60-bit hash collisions, because both engines count
    the same joined rows).

    Returns (id_col, n_overlap) for contaminated docs only."""
    from flink_tutorial_spark.operators.dedup import md5_long, shingle_table

    sh = shingle_table(docs, id_col, text_col, n).select(
        F.col(id_col), md5_long(F.col("shingle")).alias("h")
    )
    bench = (
        shingle_table(bench_docs, id_col, text_col, n)
        .select(md5_long(F.col("shingle")).alias("h"))
        .distinct()
    )
    return (
        sh.join(F.broadcast(bench), "h")
        .groupBy(id_col)
        .agg(F.count("*").cast("int").alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )


def repetition_ratio(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Within-document repetition: fraction of duplicated n-gram
    shingles (the Gopher/C4-style repeated-n-gram quality rule; heavy
    repetition marks boilerplate/spam).

    Entirely map-side — the shingle list, its distinct count, and the
    ratio are array expressions per row, so the operator adds ZERO
    shuffle at any corpus size (the relational statement of the same
    quantity needs an explode + two-level aggregation).

    rep_ratio = 1 - distinct_shingles / total_shingles (0 for docs
    shorter than n words); rep_keep <= 0.2 is the composite rule."""
    with_words = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_words")
    )
    words = F.col("_words")
    shingle_arr = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(shingle_arr)
    nd = F.size(F.array_distinct(shingle_arr))
    ratio = F.when(total > 0, F.lit(1.0) - nd.cast("double") / total).otherwise(
        F.lit(0.0)
    )
    return with_words.select(
        F.col(id_col),
        F.round(ratio, 4).alias("rep_ratio"),
        (ratio <= 0.2).alias("rep_keep"),
    )
