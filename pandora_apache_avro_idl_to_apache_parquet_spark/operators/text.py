"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All pure built-in column expressions (split/filter/size/regexp/md5) — JVM-side,
whole-stage-codegen, exact DuckDB oracles — over a
``documents(doc_id, text, lang, source, n_chars)`` table. Scale: every operator
is map-only (no shuffle) except the final presentation sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import spark_md5_long

# Tiny per-language marker-word sets for the n-gram/stopword language heuristic.
# Deliberately small + ASCII so the SQL oracle states the identical lists.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que"),
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish pre-tokenizer: word pieces, digit runs, or single non-space symbols.
# ASCII-only classes so Java (Spark) and RE2 (DuckDB) regex agree.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def with_word_stats(docs: DataFrame) -> DataFrame:
    """Add n_words / avg_word_len / stopword_ratio / punct_ratio columns."""
    words = "filter(split(text, ' '), w -> w <> '')"
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return docs.select(
        "*",
        F.expr(f"size({words})").alias("n_words"),
        F.expr(
            f"round(aggregate({words}, 0L, (a, w) -> a + length(w)) / cast(greatest(size({words}), 1) as double), 4)"
        ).alias("avg_word_len"),
        F.expr(
            f"round(size(filter({words}, w -> array_contains(array({stop_list}), w))) / cast(greatest(size({words}), 1) as double), 4)"
        ).alias("stopword_ratio"),
        F.expr(
            "round(length(regexp_replace(text, '[A-Za-z0-9 ]', '')) / cast(greatest(length(text), 1) as double), 4)"
        ).alias("punct_ratio"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: rewards stopword presence and sane
    word lengths, penalizes punctuation soup — the classic cheap pre-filter
    before expensive pipeline stages."""
    d = with_word_stats(docs)
    return d.select(
        "doc_id",
        "n_words",
        "avg_word_len",
        "stopword_ratio",
        "punct_ratio",
        F.expr(
            "round(least(1.0, n_words / 64.0) * 0.25 "
            "+ (CASE WHEN avg_word_len BETWEEN 2.0 AND 10.0 THEN 0.25 ELSE 0.0 END) "
            "+ least(stopword_ratio * 2.0, 0.25) "
            "+ greatest(0.25 - punct_ratio, 0.0), 4)"
        ).alias("quality"),
    ).orderBy("doc_id")


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-word language heuristic: score = count of marker-word hits per
    language over the word multiset; argmax (ties alphabetical). Returns
    (doc_id, predicted_lang, score)."""
    words = "filter(split(text, ' '), w -> w <> '')"
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{w}'" for w in markers)
        scores.append(
            F.expr(
                f"size(filter({words}, w -> array_contains(array({lst}), lower(w))))"
            ).alias(f"score_{lang}")
        )
    scored = docs.select("doc_id", *scores)
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return scored.select(
        "doc_id",
        F.expr(pred).alias("predicted_lang"),
        F.expr(best).alias("score"),
    ).orderBy("doc_id")


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace and BPE-ish token counts per document."""
    return docs.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), w -> w <> ''))").alias("n_ws_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{TOKEN_REGEX}', 0))").alias("n_bpe_tokens"),
        F.length("text").alias("n_bytes"),
    ).orderBy("doc_id")


def document_fingerprint(docs: DataFrame, k: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: min and max hash over the rolling word
    ``k``-gram hashes (a 2-element sketch of the shingle set — equal sketches
    ⇒ near-certain containment overlap). Rolling hash = md5-long of the joined
    window, computed per window with array HOFs, no explode."""
    words = "filter(split(text, ' '), w -> w <> '')"
    grams = (
        f"transform(sequence(1, greatest(size({words}) - {k - 1}, 1)), "
        f"i -> concat_ws(' ', slice({words}, i, {k})))"
    )
    hashes = f"transform({grams}, g -> {spark_md5_long('g')})"
    return docs.select(
        "doc_id",
        F.expr(f"array_min({hashes})").alias("fp_min"),
        F.expr(f"array_max({hashes})").alias("fp_max"),
    ).orderBy("doc_id")


def repetition_stats(docs: DataFrame, top2_max: float = 0.20,
                     dup_word_max: float = 0.60) -> DataFrame:
    """Gopher-style repetition quality rules (Rae et al. 2021 §A1.1.3, the
    within-document repetition family): the duplicate-word fraction
    (1 - distinct/total) and the top-2-gram fraction (occurrences of the
    most frequent bigram / total bigrams). Pages dominated by one repeated
    phrase pass length/stopword filters (`quality_score`) but poison
    training data; these two rules catch exactly that.

    Scale shape: ZERO shuffles — everything is executor-local array HOFs.
    The bigram mode comes from a sorted-gram run-length fold (`array_sort`
    + `aggregate`: the longest run of equal neighbours in sorted order IS
    the max multiplicity), so the corpus-wide (doc_id, gram) exchange the
    obvious explode+groupBy formulation pays — shuffle width ∝ total
    bigrams, i.e. the whole corpus re-keyed — never happens. (Measured 3×
    end-to-end at sf0.1; at 100 TB the difference is a full-corpus shuffle
    vs none.)
    Output: ``(doc_id, n_words, dup_word_frac, top_2gram_frac, keep)`` with
    fractions rounded to 6 (cross-engine tie stability), keep = int 0/1.
    """
    words = "filter(split(text, ' '), w -> w <> '')"
    # guard: sequence(1, 0) runs DESCENDING in Spark — a <2-word doc would
    # fabricate bigrams from out-of-range slices
    docs = docs.filter(F.expr(f"size({words}) >= 2"))
    grams = (f"array_sort(transform(sequence(1, size({words}) - 1), "
             f"i -> concat_ws(' ', slice({words}, i, 2))))")
    hit = "acc.prev IS NOT NULL AND x = acc.prev"
    top_count = (
        f"aggregate({grams}, "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0), "
        "(acc, x) -> named_struct("
        f"  'prev', x, "
        f"  'run', IF({hit}, acc.run + 1, 1), "
        f"  'best', greatest(acc.best, IF({hit}, acc.run + 1, 1))), "
        "acc -> acc.best)"
    )
    return docs.select(
        "doc_id",
        F.expr(f"size({words})").alias("n_words"),
        F.expr(f"round(1.0 - size(array_distinct({words})) / size({words}), 6)")
        .alias("dup_word_frac"),
        F.expr(f"round({top_count} / (size({words}) - 1), 6)")
        .alias("top_2gram_frac"),
    ).withColumn(
        "keep",
        ((F.col("dup_word_frac") < dup_word_max)
         & (F.col("top_2gram_frac") < top2_max)).cast("int"),
    )
