"""Text-analysis operators over the ``documents`` table
(SURVEY.md §2.11 L5/L6 + the training-data-pipeline text suite:
language ID, quality scoring, token counting, fingerprinting).

Everything here is pure JVM-side expression work — ``split`` /
higher-order functions / ``md5`` — no Python UDFs, so the whole suite
stays inside whole-stage codegen and scales linearly with input
splits (no shuffle except the final aggregations, which are
partial-aggregated map-side first).

Wordcount (L5) is the canonical MapReduce demo — the reference
class's flagship program shape (map: tokenize/emit, reduce: sum) —
re-expressed as explode + groupBy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_based_distributed_batch_processing_system_spark.operators.sorts import bucketed_rank_cumsum
from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import (
    load_table,
    spread_small_scan,
)

_LN2 = __import__("math").log(2)

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID score. Deliberately literal so the DuckDB oracle can
# embed the identical lists; real pipelines would broadcast a larger
# dictionary (still a broadcast, never a shuffle).
_LANG_WORDS = {
    "en": ("the", "a", "of", "and", "fast", "slow", "key", "row", "scan", "table"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "schnell", "langsam"),
    "fr": ("le", "la", "les", "et", "est", "pas", "vite", "lent"),
    "es": ("el", "los", "las", "y", "es", "no", "rapido", "lento"),
}


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _score_expr(words: tuple[str, ...]) -> str:
    """Fraction of a doc's tokens found in ``words`` (Spark SQL)."""
    return (
        f"CAST(size(filter(split(text, ' '), t -> t IN ({_sql_list(words)}))) AS DOUBLE)"
        f" / size(split(text, ' '))"
    )


def _oracle_score(words: tuple[str, ...]) -> str:
    """Same fraction in DuckDB spelling (len/list_filter)."""
    return (
        f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_sql_list(words)}))) AS DOUBLE)"
        f" / len(string_split(text, ' '))"
    )


@register(
    "text_wordcount",
    oracle="""
        SELECT word, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
    """,
    tags=("L5",),
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 — wordcount, THE MapReduce demo: tokenize (map) → count per
    word (combine+reduce). Spark's groupBy does map-side partial
    aggregation automatically, so the shuffle carries one row per
    distinct word per partition — the combiner for free."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_stats",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               AVG(CAST(n_chars AS DOUBLE)) AS avg_chars,
               quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med_chars,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM documents
        GROUP BY lang
    """,
    tags=("L6",),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 — per-language corpus stats with an EXACT interpolated
    median (Spark ``percentile`` ≡ DuckDB ``quantile_cont``). The
    exact percentile needs the full value list per group — fine for
    ~thousands of groups; at 100 TB swap to ``percentile_approx``
    (t-digest sketch, mergeable map-side) and a rows-only check."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
        F.expr("percentile(CAST(n_chars AS DOUBLE), 0.5)").alias("med_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
    )


_LANG_ORACLE_SCORES = ",\n".join(
    f"               {_oracle_score(w)} AS score_{lang}" for lang, w in _LANG_WORDS.items()
)

@register(
    "text_lang_id",
    oracle=f"""
        SELECT doc_id, lang, score_en, score_de, score_fr, score_es,
               CASE
                 WHEN score_en = 0 AND score_de = 0 AND score_fr = 0 AND score_es = 0 THEN 'und'
                 WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
                 WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                 WHEN score_fr >= score_es THEN 'fr'
                 ELSE 'es'
               END AS pred_lang
        FROM (
          SELECT doc_id, lang,
{_LANG_ORACLE_SCORES}
          FROM documents
        )
    """,
    tags=("L6", "lang-id"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-hit ratio against fixed per-language
    wordlists, argmax with a deterministic priority order
    (en>de>fr>es) so ties break identically in both engines. Pure
    narrow map — no shuffle at all; the wordlists ride along in the
    plan (a real dictionary would be a broadcast variable)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        *[F.expr(_score_expr(w)).alias(f"score_{lang}") for lang, w in _LANG_WORDS.items()],
    )
    return scored.withColumn(
        "pred_lang",
        F.expr(
            """
            CASE
              WHEN score_en = 0 AND score_de = 0 AND score_fr = 0 AND score_es = 0 THEN 'und'
              WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
              WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
              WHEN score_fr >= score_es THEN 'fr'
              ELSE 'es'
            END
            """
        ),
    )


@register(
    "text_quality_score",
    oracle="""
        SELECT doc_id,
               n_tokens,
               uniq_ratio,
               avg_token_len,
               ROUND(least(1.0, n_tokens / 50.0) * 0.5 + uniq_ratio * 0.5, 6) AS quality,
               CASE
                 WHEN least(1.0, n_tokens / 50.0) * 0.5 + uniq_ratio * 0.5 >= 0.66 THEN 'high'
                 WHEN least(1.0, n_tokens / 50.0) * 0.5 + uniq_ratio * 0.5 >= 0.33 THEN 'medium'
                 ELSE 'low'
               END AS band
        FROM (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS uniq_ratio,
                 CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / len(string_split(text, ' ')) AS avg_token_len
          FROM documents
        )
    """,
    tags=("L6", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality score: length saturation (50+
    tokens = full marks) blended with unique-token ratio, banded
    high/medium/low. The formula is computed identically in both
    engines so even the band boundaries compare exactly. Narrow map,
    no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("uniq_ratio"),
        (
            (F.length("text") - (F.size(toks) - F.lit(1))).cast("double") / F.size(toks)
        ).alias("avg_token_len"),
    )
    quality = F.least(F.lit(1.0), F.col("n_tokens") / 50.0) * 0.5 + F.col("uniq_ratio") * 0.5
    return base.select(
        "doc_id",
        "n_tokens",
        "uniq_ratio",
        "avg_token_len",
        F.round(quality, 6).alias("quality"),
        F.when(quality >= 0.66, "high").when(quality >= 0.33, "medium").otherwise("low").alias("band"),
    )


@register(
    "text_token_count",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS re_tokens,
               length(text) AS n_chars_measured
        FROM documents
    """,
    tags=("L6", "tokens"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish
    pre-tokenizer regex (letter runs | digit runs | single other
    char — the GPT-2 pre-tokenizer shape without lookarounds, so the
    pattern means the same thing to Java regex and RE2). Narrow map;
    an estimated-token column like this is the unit of accounting in
    LLM data pipelines."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).alias("re_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


_FP_SEEDS = ("s0", "s1", "s2", "s3")

@register(
    "text_fingerprint",
    oracle=f"""
        SELECT doc_id,
{",".join(chr(10) + f"               list_aggregate(list_transform(string_split(text, ' '), t -> md5('{s}|' || t)), 'min') AS fp_{i}" for i, s in enumerate(_FP_SEEDS))}
        FROM documents
    """,
    tags=("L6", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: a 4-way MinHash over tokens (min of
    salted md5 per seed). Order-independent, locality-sensitive —
    two docs sharing most tokens share most fingerprint slots —
    and exactly reproducible in ANSI SQL, unlike a positional
    rolling hash. Narrow map, no shuffle; the same primitive the
    LSH near-dedup operator scales up with 16 hashes."""
    docs = load_table(spark, sf_dir, "documents")
    # NB: expression-built lambdas — a two-parameter Python lambda in
    # F.transform would be bound as (element, index), not a closure.
    return docs.select(
        "doc_id",
        *[
            F.expr(f"array_min(transform(split(text, ' '), t -> md5(concat('{s}|', t))))").alias(f"fp_{i}")
            for i, s in enumerate(_FP_SEEDS)
        ],
    )


_CHUNK_TOKENS = 32
_CHUNK_STRIDE = 24


@register(
    "doc_chunk_sliding",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, lang,
                 string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n
          FROM documents
        )
        SELECT doc_id, lang,
               CAST(s AS INTEGER) AS chunk_start,
               array_to_string(toks[s + 1 : s + {_CHUNK_TOKENS}], ' ') AS chunk_text,
               CAST(least(n - s, {_CHUNK_TOKENS}) AS INTEGER) AS chunk_len
        FROM t, LATERAL unnest(generate_series(0, n - 1, {_CHUNK_STRIDE})) AS u(s)
    """,
    tags=("L6", "X4", "pipeline"),
)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the transform that turns a
    raw corpus into training samples: each document becomes
    overlapping {_CHUNK_TOKENS}-token chunks every {_CHUNK_STRIDE}
    tokens. Entirely native expressions (split -> sequence ->
    explode -> slice -> array_join), so chunking is a zero-shuffle
    narrow map that whole-stage-codegens; output rows land in the
    same partitions as their source docs. At 100 TB this is the
    shape you want: no Python, no state, explode fan-out bounded by
    ceil(n_tokens/stride) per doc."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    )
    return (
        docs.withColumn("n", F.size("toks"))
        .withColumn(
            "chunk_start",
            F.explode(F.expr(f"sequence(0, greatest(n - 1, 0), {_CHUNK_STRIDE})")),
        )
        .select(
            "doc_id",
            "lang",
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.array_join(
                F.expr(f"slice(toks, chunk_start + 1, {_CHUNK_TOKENS})"), " "
            ).alias("chunk_text"),
            F.least(F.col("n") - F.col("chunk_start"), F.lit(_CHUNK_TOKENS))
            .cast("int")
            .alias("chunk_len"),
        )
    )


@register(
    "text_pii_scrub",
    oracle=r"""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'
               ) AS scrubbed,
               CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS INTEGER) AS n_ssn,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email
        FROM documents
    """,
    tags=("L6", "F1", "pipeline"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""PII scrubbing pass — redact SSN- and email-shaped substrings
    and count redactions per doc (the audit trail a compliance
    pipeline needs). Pure regexp_replace/regexp_count expressions:
    JVM-side, zero shuffle, linear scan. The corpus has no planted
    PII, so counts are zero and scrubbed == text — the operator still
    proves the rewrite semantics differentially (both engines agree
    on every byte of output)."""
    ssn = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace(F.regexp_replace("text", ssn, "<SSN>"), email, "<EMAIL>").alias("scrubbed"),
        F.regexp_count("text", F.lit(ssn)).cast("int").alias("n_ssn"),
        F.regexp_count("text", F.lit(email)).cast("int").alias("n_email"),
    )


@register(
    "text_inverted_index",
    oracle="""
        WITH tok AS (
          SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS term, doc_id
          FROM documents
        ),
        idx AS (
          SELECT term,
                 array_to_string(list_sort(list(doc_id)), ',') AS postings,
                 COUNT(*) AS doc_freq
          FROM tok GROUP BY term
        )
        SELECT term, postings, CAST(doc_freq AS BIGINT) AS doc_freq
        FROM idx WHERE doc_freq >= 50
    """,
    tags=("L5", "A6"),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index — with wordcount, THE canonical MapReduce
    program (map: emit (term, doc_id); reduce: collect the posting
    list). Spark shape: explode distinct (term, doc) pairs, one
    groupBy building sorted postings via collect_set. Restricted to
    terms appearing in >= 50 docs so posting lists stay demo-sized;
    at 100 TB you'd never materialize full postings through one
    reducer anyway — you'd bucket by term and write partitioned
    posting shards (the partitioned-sink operator shows that path)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("term"), "doc_id"
    )
    return (
        tok.groupBy("term")
        .agg(
            # serialized: the verify driver hashes scalar cells only
            F.array_join(F.sort_array(F.collect_set("doc_id")), ",").alias("postings"),
            F.count(F.lit(1)).alias("doc_freq"),
        )
        .filter(F.col("doc_freq") >= 50)
    )


@register(
    "text_tfidf_topterms",
    oracle="""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM tok GROUP BY doc_id, term
        ),
        df AS (
          SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
          FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        )
        SELECT doc_id, term, tfidf FROM (
          SELECT doc_id, term, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
          FROM scored
        ) WHERE rn <= 3
    """,
    tags=("L5", "L6", "W1"),
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the classic two-MR-job
    chain (job 1: term frequency per doc; job 2: document frequency
    + join + score) as one plan. df is tiny (vocabulary-sized) so it
    broadcasts into the tf stream; n_docs is a broadcast scalar;
    top-3 per doc is the window + filter rewrite. ln() on both
    engines is the natural log of the same double ratio."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3).drop("rn")


@register(
    "text_bigram_freq",
    oracle="""
        WITH toks AS (
          SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        ),
        bi AS (
          SELECT t[i] AS w1, t[i + 1] AS w2
          FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
        ),
        big AS (
          SELECT w1, w2, COUNT(*) AS n FROM bi GROUP BY w1, w2
        ),
        uni AS (
          SELECT w1, SUM(n) AS n1 FROM big GROUP BY w1
        )
        SELECT b.w1, b.w2, CAST(b.n AS BIGINT) AS n,
               ROUND(CAST(b.n AS DOUBLE) / u.n1, 6) AS p_cond
        FROM big b JOIN uni u ON b.w1 = u.w1
        WHERE b.n >= 50
    """,
    tags=("L5", "ngram"),
)
def text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram statistics with conditional probability P(w2|w1) —
    the count layer of an n-gram language model (the original
    large-scale MapReduce NLP workload). Adjacent-pair extraction is
    the same zero-shuffle sequence/transform shape as shingling; the
    unigram normalizer reuses the bigram aggregate (sum over w2)
    instead of re-scanning the corpus, and joins back on the tiny
    vocabulary-sized table. Filtered to frequent pairs for a bounded
    output."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), " ").alias("t"))
    bi = toks.select(
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")
        ).alias("b")
    ).select("b.w1", "b.w2")
    big = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    uni = big.groupBy("w1").agg(F.sum("n").alias("n1"))
    return (
        big.join(uni, "w1")
        .filter(F.col("n") >= 50)
        .select(
            "w1", "w2", "n",
            F.round(F.col("n").cast("double") / F.col("n1"), 6).alias("p_cond"),
        )
    )


_PACK_BUDGET = 512  # tokens per packed training sequence


@register(
    "pack_sequences_concat_chunk",
    oracle=f"""
        SELECT doc_id,
               source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS stream_offset,
               CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 // {_PACK_BUDGET} AS BIGINT) AS pack_id,
               CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 % {_PACK_BUDGET} AS BIGINT) AS pack_offset
        FROM documents
    """,
    tags=("L9'", "packing", "pipeline"),
)
def pack_sequences_concat_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for causal-LM pretraining, concat-and-chunk
    style: within each source stream, documents are concatenated in
    deterministic doc_id order and the token stream is cut every
    512 (=_PACK_BUDGET) tokens; each doc gets the pack it STARTS in and
    its offset within that pack (docs may straddle packs — standard
    pretraining behavior; the attention mask handles the seam).

    One window cumsum per source partition is the whole computation:
    stream_offset = running token total before the doc, pack_id =
    offset div budget, pack_offset = offset mod budget.

    Scale: partitioned by ``source``, so the sort-by-doc_id windows
    run per-partition in parallel — no global sort, one shuffle on
    source. Skew bound = largest single source; at 100 TB you'd
    sub-shard sources (salt the partition key per, say, 1M docs) and
    offset pack_ids by a per-shard base — same plan shape. Token
    counts here are whitespace counts (matching text_token_count);
    swapping in a real tokenizer changes only the n_tokens column
    (an Arrow-batched pandas_udf), not the packing plan."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(n_tok).over(w), F.lit(0)).cast("long")
    # integer `div`, not float `/`+cast: stream offsets are exact longs
    # and a petatoken-scale offset would lose exactness through double
    return docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        offset.alias("stream_offset"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        "stream_offset",
        F.expr(f"stream_offset div {_PACK_BUDGET}").alias("pack_id"),
        (F.col("stream_offset") % _PACK_BUDGET).alias("pack_offset"),
    )


@register(
    "text_unigram_logprob_score",
    oracle="""
        WITH tok AS (
          SELECT doc_id, u.w
          FROM documents, LATERAL unnest(string_split(text, ' ')) AS u(w)
        ),
        vocab AS (
          SELECT w,
                 CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM tok) AS p
          FROM tok GROUP BY w
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(-SUM(ln(v.p)) / COUNT(*) / ln(2), 4) AS bits_per_token
        FROM tok t JOIN vocab v ON t.w = v.w
        GROUP BY t.doc_id
    """,
    tags=("L6'", "quality", "pipeline"),
)
def text_unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical quality scoring, CCNet-style: per-document mean
    negative log2 unigram probability (bits/token) under the corpus's
    own unigram model — the language-model-perplexity filter that
    production corpus pipelines run beside heuristic scores (docs of
    rare-token soup score high, repetitive boilerplate scores low).

    Plan: one explode → one vocab aggregate → broadcast the vocab
    back onto the token stream → per-doc aggregate. The vocab is
    BROADCAST (word-type count grows ~O(corpus^0.5), Heaps' law — at
    100 TB still ~100M rows; if that outgrows broadcast, drop the
    hint and the same plan shuffle-joins on the token). Rounded to
    4 dp so double summation order (Spark partial aggs vs DuckDB
    serial) cannot flip the hash: bits/token values are O(10), and
    ~100-term float sums agree to well past 8 significant digits."""
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    total = tok.count()
    vocab = tok.groupBy("w").agg(
        (F.count(F.lit(1)).cast("double") / F.lit(float(total))).alias("p")
    )
    return (
        tok.join(broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round((-F.sum(F.log("p")) / F.count(F.lit(1)) / F.lit(__import__("math").log(2))), 4).alias(
                "bits_per_token"
            ),
        )
    )


_K_ANON = 25


@register(
    "privacy_k_anonymity_suppress",
    oracle=f"""
        SELECT doc_id, lang, source, group_size,
               group_size >= {_K_ANON} AS released
        FROM (
          SELECT doc_id, lang, source,
                 CAST(COUNT(*) OVER (PARTITION BY lang, source) AS BIGINT)
                   AS group_size
          FROM documents
        )
    """,
    tags=("L10'", "privacy", "pipeline"),
)
def privacy_k_anonymity_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate over the quasi-identifier (lang,
    source): a document is released only if at least 25 (=_K_ANON) docs
    share its quasi-identifier group — the suppression step privacy
    reviews require before corpus release, downstream of PII
    scrubbing (suppressing small groups kills linkage attacks that
    survive scrubbing). One window count per group — equivalently a
    groupBy+join; the window form keeps it a single shuffle and
    carries every doc's verdict, so the released/suppressed split is
    auditable. At 100 TB the same shape holds: group cardinality is
    the shuffle key, and heavy groups are exactly the releasable
    ones (skew is harmless — no per-group state beyond a count)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.count(F.lit(1)).over(w).alias("group_size"),
    ).withColumn("released", F.col("group_size") >= _K_ANON)


_DECON_BENCH_MOD = 97  # doc_id % 97 == 0 -> "benchmark" holdout set


@register(
    "decontaminate_against_benchmark",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> concat_ws(' ', string_split(text, ' ')[i],
                                       string_split(text, ' ')[i + 1],
                                       string_split(text, ' ')[i + 2])))) AS sh
          FROM documents
          WHERE len(string_split(text, ' ')) >= 3
        ),
        bench AS (
          SELECT DISTINCT sh FROM tok WHERE doc_id % {_DECON_BENCH_MOD} = 0
        ),
        hits AS (
          SELECT t.doc_id, CAST(COUNT(DISTINCT t.sh) AS BIGINT) AS n_shared
          FROM tok t JOIN bench b USING (sh)
          WHERE t.doc_id % {_DECON_BENCH_MOD} <> 0
          GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               COALESCE(h.n_shared, 0) AS n_shared,
               COALESCE(h.n_shared, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id % {_DECON_BENCH_MOD} <> 0
    """,
    tags=("L15", "decontamination", "pipeline"),
)
def decontaminate_against_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the check every pretraining corpus
    runs before release: flag training documents sharing any 3-word
    shingle with the held-out benchmark set (here: doc_id %
    {_DECON_BENCH_MOD} == 0 stands in for the benchmark). The
    mechanism is an EQUI-JOIN on shingle values — contamination
    detection at 100 TB is a shuffle on shingles, never a
    doc×benchmark product; benchmark shingle sets are typically small
    enough to broadcast outright (hinted here). Shingles go through
    ``_shingles_hashed`` (dedup.py): each token xxhash64'd ONCE, one
    3-long combine per shingle, so the join and the broadcast table
    carry 8-byte keys and nothing re-derives shingles from raw text
    (the string-keyed plain form measures ~4.3 s at sf0.1). The
    sf0.01 hash oracle pins the hashed path to the oracle's
    exact-string ground truth, so a collision would surface as a
    mismatch."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.dedup import (
        _shingles_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = _shingles_hashed(spark, sf_dir).select("doc_id", F.explode("sh").alias("sh"))
    bench = F.broadcast(
        tok.filter(F.col("doc_id") % _DECON_BENCH_MOD == 0).select("sh").distinct()
    )
    hits = (
        tok.filter(F.col("doc_id") % _DECON_BENCH_MOD != 0)
        .join(bench, "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_shared"))
    )
    corpus = docs.filter(F.col("doc_id") % _DECON_BENCH_MOD != 0).select("doc_id")
    return corpus.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
        (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
    )


@register(
    "text_repetition_score",
    # Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    # public): highly repetitive documents are low-quality training
    # text. Token-level fractions; both engines fold the same exact
    # integer counts, ratios rounded at 6dp.
    oracle="""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
          FROM documents
        ),
        tf AS (
          SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               ROUND(1.0 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS dup_ratio,
               ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_token_ratio
        FROM tf GROUP BY doc_id
    """,
    tags=("L6'", "quality", "repetition"),
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality scoring (the Gopher rules' repetition
    family): per document, the fraction of tokens that are repeats of
    an earlier token (dup_ratio) and the mass of the single most
    frequent token (top_token_ratio) — the cheap structural signals
    that catch boilerplate, keyword stuffing, and degenerate
    generation loops before any model-based filter.

    Scale: one explode + one (doc_id, token) hash agg + one doc_id
    re-agg — the wordcount cost class, entirely JVM-side. The
    (doc, token) intermediate is bounded by total token count;
    per-doc state is three integers."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(1.0 - F.count(F.lit(1)) / F.sum("c").cast("double"), 6).alias("dup_ratio"),
        F.round(F.max("c") / F.sum("c").cast("double"), 6).alias("top_token_ratio"),
    )


_BPE_TOP = 64


@register(
    "bpe_pair_counts",
    oracle=f"""
        WITH tok AS (
          SELECT u.t FROM documents,
                 LATERAL unnest(string_split(lower(text), ' ')) AS u(t)
          WHERE len(text) > 0
        ),
        pairs AS (
          SELECT substr(t, i, 2) AS pair
          FROM tok, LATERAL unnest(generate_series(1, len(t) - 1)) AS g(i)
          WHERE len(t) >= 2
        )
        SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs GROUP BY pair
        ORDER BY n DESC, pair LIMIT {_BPE_TOP}
    """,
    tags=("L18", "tokenizer", "bpe"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training primitive: corpus-wide adjacent
    character-pair frequencies inside lowercased word tokens — the
    statistic a BPE trainer computes at every merge step (its first
    iteration exactly; later iterations rerun the same plan over
    re-segmented symbols). Top-64 pairs, count-desc with the pair
    string as deterministic tiebreak.

    Scale: token explode + in-token pair explode are narrow maps
    (output ~= corpus character count); the single shuffle is the
    pair groupBy, whose key space is bounded by alphabet² — map-side
    partial aggregation collapses each task to at most that many
    rows, so the reduce side is tiny no matter the corpus. The top-k
    runs TakeOrderedAndProject on the aggregated pair table.

    r18: scan spread across cores when it arrives as one unsplittable
    task (``spread_small_scan``) — the two explodes + partial agg
    serialized on one core locally; interleaved A/B 0.46 vs 0.82 s
    median at sf0.1. Exact integer counts, partitioning-safe."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.filter(F.length("text") > 0).select(
        F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    pairs = tok.filter(F.length("t") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(_BPE_TOP)
    )


@register(
    "text_bigram_logprob_score",
    oracle="""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        bg AS (
          SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
          FROM toks, LATERAL unnest(generate_series(1, len(ts) - 1)) AS g(i)
          WHERE len(ts) >= 2
        ),
        bgc AS (
          SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c12 FROM bg GROUP BY w1, w2
        ),
        ctx AS (
          SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c1 FROM bg GROUP BY w1
        )
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(-SUM(ln(m.c12 / x.c1)) / COUNT(*) / ln(2), 4) AS bits_per_token
        FROM bg b
        JOIN bgc m ON b.w1 = m.w1 AND b.w2 = m.w2
        JOIN ctx x ON b.w1 = x.w1
        GROUP BY b.doc_id
    """,
    tags=("L6''", "quality", "pipeline"),
)
def text_bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order statistical quality score: per-document mean
    negative log2 P(w_i | w_{i-1}) under the corpus's own bigram MLE
    model — the step from text_unigram_logprob_score toward the
    KenLM-style n-gram perplexity filters (CCNet) that production
    corpus pipelines gate on. Word-salad that happens to reuse
    common words scores high here (improbable TRANSITIONS) where the
    unigram filter is blind.

    Plan: bigrams come from array indexing over the split tokens (a
    narrow map — no per-doc window sort needed for adjacency); the
    model is two aggregates over the bigram stream (pair counts +
    context counts), pre-joined model-side so the corpus stream is
    joined ONCE on (w1, w2). The model table is bigram-typed —
    larger than a unigram vocab but still sublinear in corpus size;
    it is NOT broadcast by default (unlike the unigram scorer) —
    the shuffle join on (w1, w2) is the 100 TB-safe default, and
    both sides of the join carry only hashed-width keys. Rounded to
    4 dp for cross-engine float-sum stability, like the unigram op.

    r18: scan spread across cores when it arrives as one unsplittable
    task (``spread_small_scan``) — the bigram explode + partial agg
    serialized on one core locally. 4-way interleaved A/B at sf0.1:
    window form + spread 0.77 s median, window stock 1.07, r16 join
    form 1.09 / 1.17 with spread — settles VERDICT r17's open
    question (the r17 window form stays, the r16 form is strictly
    worse both ways). The 4 dp ROUND absorbs partial-sum order as it
    already did under AQE-variable partitioning."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    bg = (
        docs.select("doc_id", F.split("text", " ").alias("ts"))
        .filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(ts[i - 1] AS w1, ts[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    # r17 (guide §2.3 "aggregate before you shuffle", and this file's
    # own text_pmi_collocations discipline): the context marginal
    # c1 = Σ_w2 c12 reads off the bigram model table itself — a
    # per-w1 window sum over the vocab-sized bgc — instead of
    # re-exploding and re-shuffling the whole corpus a third time
    # (a plain ctx re-aggregate still re-computed bgc from the scan:
    # no static exchange reuse across the two branches). Corpus-wide
    # work drops from 3 scans + 3 corpus exchanges to 2 + 2; the
    # added exchange is vocab-sized. Exact integer counts either way.
    from pyspark.sql.window import Window

    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    model = bgc.withColumn(
        "n1", F.sum("n12").over(Window.partitionBy("w1"))
    ).select(
        "w1",
        "w2",
        (F.col("n12").cast("double") / F.col("n1").cast("double")).alias("p"),
    )
    return (
        bg.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.sum(F.log("p")) / F.count(F.lit(1)) / F.lit(_LN2), 4
            ).alias("bits_per_token"),
        )
    )


@register(
    "corpus_mixing_weights",
    oracle="""
        WITH per_lang AS (
          SELECT lang,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY lang
        ),
        tot AS (SELECT SUM(n_tokens) AS total, COUNT(*) AS n_langs FROM per_lang)
        SELECT lang, n_docs, n_tokens,
               ROUND(CAST(n_tokens AS DOUBLE) / tot.total, 6) AS token_share,
               ROUND(LEAST(1.0, (tot.total / tot.n_langs) / n_tokens), 6)
                 AS sample_weight
        FROM per_lang, tot
    """,
    tags=("L19", "mixing", "pipeline"),
)
def corpus_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L19 — corpus mixing weights: per-language token counts and the
    downsampling weight that moves the mix toward a uniform
    token-per-language target (weights capped at 1 — downsample-only,
    the convention when upsampling means repeating data). This is the
    pre-training data-mixture computation (The Pile / Dolma style
    recipes): the weights feed sample_hash_deterministic as
    per-stratum keep rates.

    Scale: one token-count aggregate keyed by language (map-side
    partials make the shuffle |langs|-sized) and a 1-row totals
    broadcast. Token counting reuses the whitespace tokenizer, JVM
    size(split())."""
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    tot = per_lang.agg(
        F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n_langs")
    )
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("total"), 6).alias("token_share"),
        F.round(
            F.least(F.lit(1.0), (F.col("total") / F.col("n_langs")) / F.col("n_tokens")), 6
        ).alias("sample_weight"),
    )


_PAD_MULTIPLE = 64


@register(
    "doc_length_buckets",
    oracle=f"""
        WITH lens AS (
          SELECT n_tok,
                 CAST(((n_tok + {_PAD_MULTIPLE - 1}) // {_PAD_MULTIPLE})
                      * {_PAD_MULTIPLE} AS BIGINT) AS padded_len
          FROM (
            SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
          )
        )
        SELECT padded_len,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
               ROUND(1.0 - CAST(SUM(n_tok) AS DOUBLE)
                     / (COUNT(*) * padded_len), 6) AS pad_waste
        FROM lens
        GROUP BY padded_len
    """,
    tags=("L20", "batching", "pipeline"),
)
def doc_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L20 — length-bucketed batching audit: documents grouped by
    their padded sequence length (next multiple of 64 tokens) with
    the padding-waste fraction per bucket — the statistic that
    decides bucketed-batching vs packing for training throughput
    (pad_waste ≈ FLOPs burned on pad tokens if this bucket batches
    as-is; compare pack_sequences_concat_chunk, which drives waste
    to zero at the cost of document boundaries). All integer
    arithmetic (ceil-div via (n+63)//64 both engines), so the
    report is engine-exact.

    Scale: narrow token count + one bucket-keyed aggregate whose key
    space is bounded by max_len/64."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    padded = (
        F.floor((n_tok + (_PAD_MULTIPLE - 1)) / _PAD_MULTIPLE) * _PAD_MULTIPLE
    ).cast("long")
    lens = docs.select(n_tok.alias("n_tok"), padded.alias("padded_len"))
    return lens.groupBy("padded_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tokens"),
        F.round(
            1.0
            - F.sum("n_tok").cast("double")
            / (F.count(F.lit(1)) * F.first("padded_len")),
            6,
        ).alias("pad_waste"),
    )


@register(
    "lang_id_confusion_matrix",
    oracle=f"""
        WITH pred AS (
          SELECT lang,
                 CASE
                   WHEN score_en = 0 AND score_de = 0 AND score_fr = 0 AND score_es = 0 THEN 'und'
                   WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
                   WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                   WHEN score_fr >= score_es THEN 'fr'
                   ELSE 'es'
                 END AS pred_lang
          FROM (
            SELECT doc_id, lang,
{_LANG_ORACLE_SCORES}
            FROM documents
          )
        )
        SELECT lang AS true_lang, pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                     / SUM(COUNT(*)) OVER (PARTITION BY lang), 6) AS row_frac
        FROM pred GROUP BY lang, pred_lang
    """,
    tags=("L22", "eval", "confusion"),
)
def lang_id_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a table op: the confusion matrix of
    the heuristic language identifier against the labeled lang
    column, with per-true-class row fractions (recall lives on the
    diagonal) — the QA report any model-assisted curation step
    publishes next to its predictions. Composes text_lang_id's
    scorer unchanged.

    Scale: prediction is the same zero-shuffle narrow map as
    text_lang_id; the matrix is one |langs|²-bounded aggregate and
    the normalizing window runs on the matrix, not the corpus."""
    pred = text_lang_id(spark, sf_dir).select("lang", "pred_lang")
    m = pred.groupBy(
        F.col("lang").alias("true_lang"), "pred_lang"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("true_lang")
    return m.select(
        "true_lang",
        "pred_lang",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias("row_frac"),
    )


@register(
    "eval_auc_rank_sum",
    # Deterministic tie handling: ranks come from row_number over
    # (score, doc_id) — document-identical in both engines — rather
    # than average ranks, so the statistic is exactly reproducible.
    oracle="""
        WITH scored AS (
          SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                 CAST(n_chars AS DOUBLE) AS score,
                 doc_id
          FROM documents
        ),
        ranked AS (
          SELECT y, CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT) AS rn
          FROM scored
        )
        SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg,
               ROUND((SUM(CASE WHEN y = 1 THEN rn ELSE 0 END)
                      - SUM(y) * (SUM(y) + 1) / 2.0)
                     / (SUM(y) * (COUNT(*) - SUM(y))), 6) AS auc
        FROM ranked
    """,
    tags=("L23", "eval", "auc"),
)
def eval_auc_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank-sum identity
    (AUC = (R⁺ - n⁺(n⁺+1)/2) / (n⁺ n⁻)): does doc length separate
    English documents? — the score-quality evaluation a
    trained quality classifier gets before it gates a corpus, with
    no thresholds and no curve materialization. Ranks are
    deterministic (score, doc_id), so ties resolve identically in
    both engines.

    Scale: exact global ranks come from ``bucketed_rank_cumsum``
    (sorts.py) — score-range buckets, per-bucket windows, offsets
    from a bounded bucket-counts pass — never a single-partition
    window, so the eval set can be the whole corpus. Ranks are
    exact integers, so the distributed form is bit-identical to
    the global window; everything after is one aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.col("n_chars").cast("double").alias("score"),
        "doc_id",
    )
    numbered, _n, _tot = bucketed_rank_cumsum(scored, "score", ["doc_id"])
    ranked = numbered.select("y", F.col("__rn").alias("rn"))
    n_pos = F.sum("y")
    return ranked.agg(
        n_pos.cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - n_pos).cast("long").alias("n_neg"),
        F.round(
            (F.sum(F.when(F.col("y") == 1, F.col("rn")).otherwise(0)) - n_pos * (n_pos + 1) / 2.0)
            / (n_pos * (F.count(F.lit(1)) - n_pos)),
            6,
        ).alias("auc"),
    )


@register(
    "text_flesch_readability",
    oracle="""
        SELECT doc_id,
               n_words, n_sentences, n_syllables,
               ROUND(206.835
                     - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                     - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
                 AS flesch_score
        FROM (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                 CAST(GREATEST(len(regexp_extract_all(text, '[.!?]')), 1) AS BIGINT)
                   AS n_sentences,
                 CAST(GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                   AS BIGINT) AS n_syllables
          FROM documents
          WHERE len(string_split(text, ' ')) > 0
        )
    """,
    tags=("L24", "readability", "quality"),
)
def text_flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L24 — Flesch reading-ease scoring: 206.835 − 1.015·(words/
    sentence) − 84.6·(syllables/word), with sentences counted by
    terminal punctuation and syllables approximated as vowel groups
    (the standard cheap proxy) — the readability axis of corpus
    quality filtering, orthogonal to the statistical LM scores
    (textbook prose and word salad can share a perplexity band but
    not a readability one). Floors of 1 keep unpunctuated/vowel-less
    edge docs finite, identically in both engines.

    Scale: three regexp/split counts per document — a zero-shuffle
    JVM narrow map, the same cost class as text_quality_score."""
    docs = load_table(spark, sf_dir, "documents")
    counted = docs.filter(F.size(F.split("text", " ")) > 0).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.greatest(F.expr("regexp_count(text, '[.!?]')"), F.lit(1))
        .cast("long")
        .alias("n_sentences"),
        F.greatest(F.expr("regexp_count(lower(text), '[aeiouy]+')"), F.lit(1))
        .cast("long")
        .alias("n_syllables"),
    )
    return counted.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            206.835
            - 1.015 * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words")),
            4,
        ).alias("flesch_score"),
    )


@register(
    "eval_calibration_bins",
    # Score = (n_chars % 1000)/1000 — an exact dyadic-free construction
    # kept hash-safe by doing the BINNING on integers ((n_chars % 1000)
    # div 100) and rounding the float averages at 6 dp.
    oracle="""
        SELECT CAST((n_chars % 1000) // 100 AS INTEGER) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(AVG((n_chars % 1000) / 1000.0), 6) AS mean_score,
               ROUND(AVG(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 6)
                 AS frac_positive
        FROM documents
        GROUP BY 1
    """,
    tags=("L23", "eval", "calibration"),
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins — the calibration readout that pairs
    with eval_auc_rank_sum when a trained quality classifier gates a
    corpus: scores bucket into 10 equal-width bins; per bin, count,
    mean predicted score, and observed positive fraction (here the
    stand-in score is the n_chars fractional part, label = lang='en',
    same construction as the AUC op). A well-calibrated scorer has
    mean_score ≈ frac_positive per bin; systematic gaps say the gate
    threshold doesn't mean what it claims.

    Scale: ONE map-side-partial aggregate over the corpus into ≤10
    groups — no ranking, no window, no join; the cheapest eval op in
    the suite. Bin ids are computed in integer arithmetic so the
    bucketing is bit-identical across engines; only the two averages
    are floats, rounded at 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    frac = F.col("n_chars") % 1000
    return (
        docs.groupBy(F.floor(frac / 100).cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(frac / 1000.0), 6).alias("mean_score"),
            F.round(F.avg(F.when(F.col("lang") == "en", 1.0).otherwise(0.0)), 6).alias(
                "frac_positive"
            ),
        )
    )


@register(
    "text_zipf_fit",
    oracle="""
        WITH wc AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS n
          FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
          GROUP BY word
        ),
        ranked AS (
          SELECT n, CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT) AS rnk
          FROM wc
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
               ROUND(regr_slope(ln(n), ln(rnk)), 6) AS zipf_slope,
               ROUND(regr_intercept(ln(n), ln(rnk)), 6) AS zipf_intercept,
               ROUND(regr_r2(ln(n), ln(rnk)), 6) AS r2
        FROM ranked
    """,
    tags=("L5", "zipf", "eval"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus frequency spectrum: OLS of
    log(count) on log(rank) — natural text sits near slope −1;
    strong departures flag synthetic, boilerplate-heavy, or
    truncated corpora, which is why frequency-spectrum checks sit in
    corpus QA suites next to length and novelty distributions.

    Scale: vocabulary ranks come from ``bucketed_rank_cumsum``
    (sorts.py) — the two-phase bucketed numbering, so the vocab
    (which easily reaches 10⁸ tokens types at web scale) never
    funnels through a single sort partition; the regression is one
    commutative aggregate over (ln n, ln rank) pairs. Ranks are
    exact integers → identical log inputs both engines; the three
    regression outputs round at 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked, _nw, _tot = bucketed_rank_cumsum(wc, "n", ["word"], descending=True)
    ln_n, ln_r = F.log(F.col("n").cast("double")), F.log(F.col("__rn").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.regr_slope(ln_n, ln_r), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(ln_n, ln_r), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(ln_n, ln_r), 6).alias("r2"),
    )


_L_DIVERSE = 3  # distinct sensitive values required per released group


@register(
    "privacy_l_diversity",
    oracle=f"""
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS group_size,
               CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS BIGINT)
                 AS n_sensitive_values,
               COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= {_L_DIVERSE}
                 AS l_diverse
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    """,
    tags=("L10''", "privacy", "pipeline"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit — k-anonymity's necessary
    companion (Machanavajjhala et al. 2007): a quasi-identifier
    group can be large (k-anonymous) yet still leak if everyone in
    it shares the same SENSITIVE value, so each (nation, market
    segment) group must also contain ≥{_L_DIVERSE} distinct
    sensitive values (account-balance bands here) before release.
    privacy_k_anonymity_suppress gates on group SIZE; this gates on
    group ENTROPY floor — both run before any corpus/table release.

    Scale: one groupBy on the quasi-identifier with a COUNT DISTINCT
    over the banded sensitive attribute — partial-aggregated
    map-side; band ids are integer floor-division, bit-identical in
    both engines. Skewed quasi-groups are again harmless (a count
    and a distinct-count, no per-row state)."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.count_distinct(band).alias("n_sensitive_values"),
        (F.count_distinct(band) >= _L_DIVERSE).alias("l_diverse"),
    )


_T_CLOSE = 0.35  # max total-variation distance for release


@register(
    "privacy_t_closeness",
    oracle=f"""
        WITH base AS (
          SELECT c_nationkey, c_mktsegment,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
          FROM customer
        ),
        tot AS (SELECT COUNT(*) AS n FROM base),
        gdist AS (SELECT band, COUNT(*) AS c_s FROM base GROUP BY band),
        grp AS (
          SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_g
          FROM base GROUP BY 1, 2
        ),
        gb AS (
          SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS c_gs
          FROM base GROUP BY 1, 2, 3
        ),
        j AS (
          SELECT gb.c_nationkey, gb.c_mktsegment, gb.c_gs, gd.c_s,
                 g.n_g, t.n
          FROM gb
          JOIN grp g ON g.c_nationkey = gb.c_nationkey
                    AND g.c_mktsegment = gb.c_mktsegment
          JOIN gdist gd ON gd.band = gb.band
          CROSS JOIN tot t
        ),
        agg AS (
          SELECT c_nationkey, c_mktsegment,
                 MAX(n_g) AS n_g, MAX(n) AS n,
                 SUM(ABS(c_gs * n - c_s * n_g))
                   + (MAX(n) - SUM(c_s)) * MAX(n_g) AS numer
          FROM j GROUP BY 1, 2
        )
        SELECT c_nationkey, c_mktsegment,
               CAST(n_g AS BIGINT) AS group_size,
               ROUND(numer / (2.0 * n_g * n), 6) AS tvd,
               numer / (2.0 * n_g * n) <= {_T_CLOSE} AS t_close
        FROM agg
    """,
    tags=("L10'''", "privacy", "pipeline"),
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the release-gate ladder
    (Li, Li & Venkatasubramanian 2007): a group can be k-anonymous
    AND l-diverse yet still leak if its sensitive-value DISTRIBUTION
    differs sharply from the corpus-wide one (e.g. a group whose
    balances are "diverse" but all high). Each quasi-identifier
    group's band distribution must sit within total-variation
    distance t={_T_CLOSE} of the global distribution. TVD =
    ½·Σ|p_g(s) − p(s)|, computed here with an EXACT integer
    numerator — Σ|c_gs·N − c_s·n_g| over BIGINT counts, one double
    division at the end — so the 6-dp rounding sees the identical
    quotient in both engines (float p_g − p per term would
    accumulate engine-specific error). Bands a group lacks enter
    via the closed-form missing-mass term (N − Σ_present c_s)·n_g
    — the text_js_divergence_sources device — so no group×band grid
    is ever materialized.

    Scale: two map-side-combining groupBys (quasi-group × band, and
    band), then EQUI-joins only — the per-group band counts join the
    group sizes on the quasi-identifier and the broadcast band
    totals on band; the single cross join is the 1-row grand total.
    Same skew story as the k-anonymity gate: heavy groups are just
    counts."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    )
    tot = base.agg(F.count(F.lit(1)).alias("n"))
    gdist = base.groupBy("band").agg(F.count(F.lit(1)).alias("c_s"))
    grp = base.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_g")
    )
    gb = base.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("c_gs")
    )
    j = (
        gb.join(grp, ["c_nationkey", "c_mktsegment"])
        .join(F.broadcast(gdist), "band")
        .crossJoin(F.broadcast(tot))
    )
    numer = F.sum(
        F.abs(F.col("c_gs") * F.col("n") - F.col("c_s") * F.col("n_g"))
    ) + (F.max("n") - F.sum("c_s")) * F.max("n_g")
    denom = 2.0 * F.max("n_g") * F.max("n")
    return j.groupBy("c_nationkey", "c_mktsegment").agg(
        F.max("n_g").cast("long").alias("group_size"),
        F.round(numer / denom, 6).alias("tvd"),
        (numer / denom <= _T_CLOSE).alias("t_close"),
    )


@register(
    "eval_spearman_rank_corr",
    # row_number ranks with a deterministic doc_id tiebreak (NOT
    # tie-averaged fractional ranks — documented pseudo-Spearman, the
    # form whose ranks are exact integers in both engines).
    oracle="""
        WITH m AS (
          SELECT doc_id,
                 CAST(n_chars AS DOUBLE) AS a,
                 CAST(len(string_split(text, ' ')) AS DOUBLE) AS b
          FROM documents
        ),
        ranked AS (
          SELECT CAST(row_number() OVER (ORDER BY a, doc_id) AS BIGINT) AS ra,
                 CAST(row_number() OVER (ORDER BY b, doc_id) AS BIGINT) AS rb
          FROM m
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(1.0 - 6.0 * SUM((ra - rb) * (ra - rb))
                     / (COUNT(*) * (CAST(COUNT(*) AS DOUBLE) * COUNT(*) - 1)), 6)
                 AS spearman_rho
        FROM ranked
    """,
    tags=("L23", "eval", "correlation"),
)
def eval_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between two per-document metrics
    (char count vs token count here — in a real pipeline: two
    quality scorers being compared for agreement before one replaces
    the other). Ranks are deterministic row_number with a doc_id
    tiebreak (exact integers both engines; tie-averaged fractional
    ranks would be the textbook variant), so Σd² is exact integer
    arithmetic and only the final ratio is float, rounded at 6 dp.

    Scale: BOTH rankings run through ``bucketed_rank_cumsum``
    (sorts.py) — chained, so the second rank pass rides the frame the
    first produced; no single-partition window, one aggregate at the
    end. The same shape compares any two corpus-wide scores at any
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("a"),
        F.size(F.split("text", " ")).cast("double").alias("b"),
    )
    r1, _n, _t = bucketed_rank_cumsum(m, "a", ["doc_id"])
    r1 = r1.withColumnRenamed("__rn", "ra")
    r2, _n2, _t2 = bucketed_rank_cumsum(r1, "b", ["doc_id"])
    ranked = r2.withColumnRenamed("__rn", "rb")
    n = F.count(F.lit(1))
    d2 = F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")))
    return ranked.agg(
        n.cast("long").alias("n_docs"),
        F.round(1.0 - 6.0 * d2 / (n * (n.cast("double") * n - 1)), 6).alias(
            "spearman_rho"
        ),
    )


_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("fast", "table", "query")  # fixed probe query


@register(
    "doc_bm25_topk",
    oracle=f"""
        WITH docs AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM docs),
        stats AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl
        ),
        tf AS (
          SELECT d.doc_id, u.w AS term, CAST(COUNT(*) AS DOUBLE) AS tf
          FROM docs d, LATERAL unnest(d.t) AS u(w)
          WHERE u.w IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
          GROUP BY d.doc_id, u.w
        ),
        df AS (
          SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
        ),
        scored AS (
          SELECT tf.doc_id,
                 SUM(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1)
                     * tf.tf * ({_BM25_K1} + 1)
                     / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl)))
                   AS score
          FROM tf
          JOIN df ON tf.term = df.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN stats s
          GROUP BY tf.doc_id
        )
        SELECT doc_id, ROUND(score, 6) AS bm25
        FROM scored
        ORDER BY score DESC, doc_id
        LIMIT 10
    """,
    tags=("L12'", "bm25", "retrieval"),
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking (Robertson-Spärck Jones) for a fixed
    probe query — the lexical-retrieval scorer that still anchors
    hybrid search next to the embedding stack (sim_search_*):
    saturating tf (k1), length normalization (b), and the +1 IDF
    variant that never goes negative. Top-10 with a doc_id tiebreak.

    Scale: term postings come from ONE explode+filter aggregate
    (only query terms survive the filter, so the shuffle is
    query-sized × docs-containing-term, not corpus-sized); df and
    the (N, avgdl) stats are broadcast scalars; top-k is
    TakeOrderedAndProject. The same plan serves any query by
    swapping the literal term list — a served system precomputes the
    postings once (text_inverted_index) and probes them instead."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    dl = docs.select("doc_id", F.size("t").cast("double").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    contrib = idf * F.col("tf") * (_BM25_K1 + 1) / (
        F.col("tf") + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
        .select("doc_id", F.round("score", 6).alias("bm25"))
    )


_RAKE_TOP = 20
_RAKE_STOPWORDS = _LANG_WORDS["en"]  # delimiters, shared with lang-id


@register(
    "text_rake_keywords",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, u.w AS w, CAST(u.i AS BIGINT) AS pos,
                 u.w IN ({", ".join(f"'{w}'" for w in _RAKE_STOPWORDS)}) AS is_stop
          FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d,
               LATERAL (SELECT unnest(t) AS w,
                               generate_subscripts(t, 1) AS i) u
        ),
        isl AS (
          SELECT doc_id, w, pos,
                 SUM(CASE WHEN is_stop OR prev IS NULL OR pos - prev > 1
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
          FROM (
            SELECT doc_id, w, pos, is_stop,
                   LAG(CASE WHEN is_stop THEN NULL ELSE pos END)
                     OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM tok
          ) WHERE NOT is_stop
        ),
        phrases AS (
          SELECT doc_id, pid,
                 string_agg(w, ' ' ORDER BY pos) AS phrase,
                 CAST(COUNT(*) AS BIGINT) AS plen
          FROM isl GROUP BY doc_id, pid
        ),
        words AS (
          SELECT u.w, p.plen FROM phrases p, LATERAL unnest(string_split(p.phrase, ' ')) AS u(w)
        ),
        wstat AS (
          SELECT w, CAST(COUNT(*) AS DOUBLE) AS freq,
                 CAST(SUM(plen) AS DOUBLE) AS degree
          FROM words GROUP BY w
        ),
        pscore AS (
          SELECT p.phrase,
                 CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                 ROUND(MIN(sc.s), 6) AS rake_score
          FROM phrases p
          JOIN LATERAL (
            SELECT SUM(ws.degree / ws.freq) AS s
            FROM unnest(string_split(p.phrase, ' ')) AS u(w)
            JOIN wstat ws ON ws.w = u.w
          ) sc ON TRUE
          GROUP BY p.phrase
        )
        SELECT phrase, n_occurrences, rake_score
        FROM pscore
        ORDER BY rake_score DESC, phrase
        LIMIT {_RAKE_TOP}
    """,
    tags=("L12''", "rake", "keywords"),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-delimited token runs; each word scores
    degree/frequency (degree = summed length of phrases containing
    it); a phrase scores the sum of its words — top-{_RAKE_TOP}
    corpus keywords with occurrence counts. The unsupervised keyword
    baseline corpus exploration starts from (and the classic
    showcase for phrase segmentation as per-doc gaps-and-islands).

    Scale: tokenization+stopword flags are a narrow map; phrase
    segmentation is islands PARTITIONED BY doc (one doc-keyed
    window); word stats and phrase scores are two hash aggregates
    with a vocabulary-sized join; top-k is TakeOrderedAndProject.
    The stopword list rides in the plan (a real one broadcasts)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    tok = docs.withColumn("is_stop", F.col("w").isin(*_RAKE_STOPWORDS))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        tok.withColumn(
            "prev",
            F.lag(F.when(~F.col("is_stop"), F.col("pos"))).over(wd),
        )
        .filter(~F.col("is_stop"))
        .withColumn(
            "new_p",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > 1), 1
            ).otherwise(0),
        )
        .withColumn(
            "pid",
            F.sum("new_p").over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    phrases = (
        isl.groupBy("doc_id", "pid")
        .agg(
            F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("pos", "w"))).getField("w")).alias(
                "phrase"
            ),
            F.count(F.lit(1)).alias("plen"),
        )
        .cache()  # feeds word stats AND phrase scoring
    )
    words = phrases.select(F.explode(F.split("phrase", " ")).alias("w"), "plen")
    wstat = words.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("freq"),
        F.sum("plen").cast("double").alias("degree"),
    )
    pw = phrases.select("phrase", F.explode(F.split("phrase", " ")).alias("w"))
    pscore_per_occurrence = (
        pw.join(F.broadcast(wstat), "w")
        .groupBy("phrase")
        .agg(F.sum(F.col("degree") / F.col("freq")).alias("s_total"))
    )
    # s_total summed over ALL occurrences of the phrase; per-phrase
    # score = per-occurrence word-score sum, so divide by occurrences
    occ = phrases.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return (
        pscore_per_occurrence.join(occ, "phrase")
        .select(
            "phrase",
            "n_occurrences",
            F.round(F.col("s_total") / F.col("n_occurrences"), 6).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(_RAKE_TOP)
    )


@register(
    "text_js_divergence_sources",
    oracle="""
        WITH tok AS (
          SELECT source, u.w AS w
          FROM (SELECT source, string_split(text, ' ') AS t FROM documents) d,
               LATERAL unnest(t) AS u(w)
        ),
        src_tot AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n FROM tok GROUP BY source),
        all_tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok),
        p AS (
          SELECT t.source, t.w, CAST(COUNT(*) AS DOUBLE) / st.n AS p
          FROM tok t JOIN src_tot st ON t.source = st.source
          GROUP BY t.source, t.w, st.n
        ),
        q AS (
          SELECT w, CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM all_tot) AS q
          FROM tok GROUP BY w
        ),
        terms AS (
          SELECT p.source,
                 0.5 * p.p * ln(p.p / ((p.p + q.q) / 2))
                 + 0.5 * q.q * ln(q.q / ((p.p + q.q) / 2)) AS term,
                 q.q AS qw
          FROM p JOIN q ON p.w = q.w
        ),
        missing AS (
          -- corpus words ABSENT from a source contribute 0.5*q*ln(2)
          SELECT st.source,
                 0.5 * ln(2) * (1 - SUM(CASE WHEN p.w IS NOT NULL THEN q.q ELSE 0 END))
                   AS miss_term
          FROM src_tot st
          CROSS JOIN q
          LEFT JOIN p ON p.source = st.source AND p.w = q.w
          GROUP BY st.source
        )
        SELECT t.source,
               CAST(st.n AS BIGINT) AS n_tokens,
               ROUND((SUM(t.term) + ANY_VALUE(m.miss_term)) / ln(2), 6) AS jsd_bits
        FROM terms t
        JOIN src_tot st ON t.source = st.source
        JOIN missing m ON t.source = m.source
        GROUP BY t.source, st.n
    """,
    tags=("L19'", "divergence", "drift"),
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram
    distribution against the whole corpus (in bits, 0 = identical,
    1 = disjoint) — the domain-drift meter a mixture-weighting run
    (corpus_mixing_weights) reads first: sources that diverge hard
    deserve their own mixture bucket; sources near 0 are
    interchangeable. JSD is symmetric and bounded, unlike raw KL
    (which is infinite wherever a source lacks a corpus word —
    handled here by the closed-form 0.5·q·ln2 mass of
    source-missing words).

    Scale: token counts reduce map-side; the per-(source, word)
    table joins the vocab-sized corpus distribution (broadcast);
    everything after is source-keyed aggregation. Probabilities are
    exact rationals of identical integer counts, logs rounded at
    6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    src_tot = tok.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("n"))
    n_all = tok.count()
    p = (
        tok.groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .join(F.broadcast(src_tot), "source")
        .select("source", "w", (F.col("c") / F.col("n")).alias("p"))
    )
    q = tok.groupBy("w").agg(
        (F.count(F.lit(1)).cast("double") / F.lit(float(n_all))).alias("q")
    )
    m = (F.col("p") + F.col("q")) / 2
    terms = p.join(F.broadcast(q), "w").select(
        "source",
        (0.5 * F.col("p") * F.log(F.col("p") / m) + 0.5 * F.col("q") * F.log(F.col("q") / m)).alias(
            "term"
        ),
        "q",
    )
    present_q = terms.groupBy("source").agg(
        F.sum("term").alias("sum_term"), F.sum("q").alias("q_present")
    )
    import math

    return (
        present_q.join(F.broadcast(src_tot), "source")
        .select(
            "source",
            F.col("n").cast("long").alias("n_tokens"),
            F.round(
                (
                    F.col("sum_term")
                    + 0.5 * math.log(2) * (1 - F.col("q_present"))
                )
                / math.log(2),
                6,
            ).alias("jsd_bits"),
        )
    )


@register(
    "corpus_health_report",
    oracle=f"""
        WITH base AS (
          SELECT doc_id, text, lang,
                 len(string_split(text, ' ')) AS n_tokens,
                 CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS uniq_ratio
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 2),
                   i -> concat_ws(' ', string_split(text, ' ')[i],
                                       string_split(text, ' ')[i + 1],
                                       string_split(text, ' ')[i + 2])))) AS s
          FROM documents WHERE len(string_split(text, ' ')) >= 3
        ),
        bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {_DECON_BENCH_MOD} = 0),
        contaminated AS (
          SELECT DISTINCT t.doc_id FROM sh t JOIN bench USING (s)
          WHERE t.doc_id % {_DECON_BENCH_MOD} <> 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS exact_dup_docs,
               ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6)
                 AS exact_dup_rate,
               CAST((SELECT COUNT(*) FROM contaminated) AS BIGINT) AS contaminated_docs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               ROUND(AVG(least(1.0, n_tokens / 50.0) * 0.5 + uniq_ratio * 0.5), 6)
                 AS mean_quality,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM base
    """,
    tags=("L1", "report", "composite"),
)
def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health scorecard — the summary a data team
    posts after every ingest: doc and token counts, exact-duplicate
    mass (content-hash), benchmark-contamination count (shared
    3-shingles with the held-out slice, decontaminate_against_
    benchmark's rule), language count, and the mean heuristic
    quality score (text_quality_score's formula). Every column is a
    one-number readout of a full operator elsewhere in the engine —
    the report exists so the detailed runs only happen when a
    number here moves.

    Scale: one pass for the doc-level stats (md5 + token counts in
    the same aggregate), one hashed-shingle broadcast join for the
    contamination count — the same plans as the underlying
    operators, fused into two jobs."""
    from hadoop_based_distributed_batch_processing_system_spark.operators.dedup import (
        _shingles_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("uniq_ratio"),
    )
    sh = _shingles_hashed(spark, sf_dir).select("doc_id", F.explode("sh").alias("s"))
    bench = F.broadcast(
        sh.filter(F.col("doc_id") % _DECON_BENCH_MOD == 0).select("s").distinct()
    )
    n_contaminated = (
        sh.filter(F.col("doc_id") % _DECON_BENCH_MOD != 0)
        .join(bench, "s")
        .select("doc_id")
        .distinct()
        .count()
    )
    quality = F.least(F.lit(1.0), F.col("n_tokens") / 50.0) * 0.5 + F.col("uniq_ratio") * 0.5
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.count_distinct("h")).cast("long").alias("exact_dup_docs"),
        F.round(1.0 - F.count_distinct("h").cast("double") / F.count(F.lit(1)), 6).alias(
            "exact_dup_rate"
        ),
        F.lit(n_contaminated).cast("long").alias("contaminated_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.round(F.avg(quality), 6).alias("mean_quality"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


_NDCG_K = 10


@register(
    "eval_ndcg_at_k",
    # Counts and ranks are exact integers in both engines; the only
    # floats are the final ≤10-term DCG sums, rounded at 6 dp (the
    # text_unigram_logprob_score tolerance argument).
    oracle=f"""
        WITH scored AS (
          SELECT doc_id, lang,
                 len(list_filter(string_split(text, ' '), w -> w = 'table' OR w = 'scan'))
                   AS score,
                 least(3, len(list_filter(string_split(text, ' '), w -> w = 'query')))
                   AS rel
          FROM documents
        ),
        ranked AS (
          SELECT lang, rel,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS r_sys,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rel DESC, doc_id) AS r_ideal
          FROM scored
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(SUM(CASE WHEN r_sys <= {_NDCG_K}
                              THEN (pow(2, rel) - 1) / log2(r_sys + 1) ELSE 0 END), 6) AS dcg,
               ROUND(SUM(CASE WHEN r_ideal <= {_NDCG_K}
                              THEN (pow(2, rel) - 1) / log2(r_ideal + 1) ELSE 0 END), 6) AS idcg,
               ROUND(SUM(CASE WHEN r_sys <= {_NDCG_K}
                              THEN (pow(2, rel) - 1) / log2(r_sys + 1) ELSE 0 END)
                     / SUM(CASE WHEN r_ideal <= {_NDCG_K}
                                THEN (pow(2, rel) - 1) / log2(r_ideal + 1) ELSE 0 END), 6)
                 AS ndcg_at_k
        FROM ranked
        GROUP BY lang
    """,
    tags=("L23", "eval", "ndcg", "retrieval"),
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L23 — NDCG@{_NDCG_K} per query group: the graded-relevance
    ranking metric that completes the eval family (AUC = binary
    global, Spearman = correlation, calibration = probability;
    NDCG = position-discounted retrieval quality — what you grade a
    BM25/ANN ranker with). Each ``lang`` acts as one query: the
    "system" ranks docs by a lexical score (occurrences of
    'table'/'scan'), ground truth is a 0-3 graded relevance
    (capped occurrences of 'query'); NDCG@k = DCG of the system
    order / DCG of the ideal order over the top {_NDCG_K}.

    Scale: both rankings are per-GROUP row_number windows (the
    canonical top-k-per-group shape — each query's candidate list
    shuffles once on the group key; a production eval over millions
    of queries partitions identically). Token counts stay in one
    JVM higher-order filter — the text is scanned once, never
    exploded."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(F.filter(toks, lambda w: (w == "table") | (w == "scan"))).alias("score"),
        F.least(F.lit(3), F.size(F.filter(toks, lambda w: w == "query"))).alias("rel"),
    )
    by = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "rel",
        F.row_number().over(by.orderBy(F.desc("score"), "doc_id")).alias("r_sys"),
        F.row_number().over(by.orderBy(F.desc("rel"), "doc_id")).alias("r_ideal"),
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1
    dcg = F.sum(F.when(F.col("r_sys") <= _NDCG_K, gain / F.log2(F.col("r_sys") + 1)).otherwise(0.0))
    idcg = F.sum(
        F.when(F.col("r_ideal") <= _NDCG_K, gain / F.log2(F.col("r_ideal") + 1)).otherwise(0.0)
    )
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(dcg, 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
        F.round(dcg / idcg, 6).alias("ndcg_at_k"),
    )


_NB_TEST_MOD = 5  # doc_id % 5 == 0 → test split (20%)


@register(
    "text_naive_bayes_lang",
    # All counts are exact integers; ln() appears only with integer
    # arguments (c+1, T_l+V, class/doc counts) and enters ≤ few-hundred
    # term sums rounded at 4 dp before the argmax, so both engines pick
    # the same class (ties break on lang ASC via the rank order).
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, lang, u.w
          FROM documents, LATERAL unnest(string_split(text, ' ')) AS u(w)
        ),
        train AS (SELECT * FROM tok WHERE doc_id % {_NB_TEST_MOD} != 0),
        c AS (
          SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
          FROM train GROUP BY lang, w
        ),
        totals AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS t_l,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_l
          FROM train GROUP BY lang
        ),
        consts AS (
          SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_train
          FROM train
        ),
        test AS (
          SELECT doc_id, lang AS true_lang, w, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM tok WHERE doc_id % {_NB_TEST_MOD} = 0
          GROUP BY doc_id, lang, w
        ),
        doclen AS (
          SELECT doc_id, true_lang, SUM(cnt) AS n_tok FROM test GROUP BY doc_id, true_lang
        ),
        seen AS (
          SELECT t.doc_id, c.lang, SUM(t.cnt * ln(c.c + 1)) AS seen_part
          FROM test t JOIN c ON t.w = c.w
          GROUP BY t.doc_id, c.lang
        ),
        scoredall AS (
          SELECT d.doc_id, d.true_lang, tl.lang,
                 ROUND(ln(CAST(tl.n_docs_l AS DOUBLE) / k.n_train)
                       - d.n_tok * ln(CAST(tl.t_l + k.v AS DOUBLE))
                       + COALESCE(s.seen_part, 0), 4) AS score
          FROM doclen d
          CROSS JOIN totals tl
          CROSS JOIN consts k
          LEFT JOIN seen s ON s.doc_id = d.doc_id AND s.lang = tl.lang
        ),
        best AS (
          SELECT doc_id, true_lang, lang AS pred_lang, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
          FROM scoredall
        )
        SELECT doc_id, true_lang, pred_lang, score,
               pred_lang = true_lang AS correct
        FROM best WHERE rk = 1
    """,
    tags=("ML4", "naive-bayes", "classify", "text"),
)
def text_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML4 — multinomial Naive Bayes language classifier, trained and
    evaluated distributed: add-one-smoothed per-(lang, word) token
    model on the 80% train split (doc_id % {_NB_TEST_MOD} != 0),
    per-document class scores and argmax prediction on the 20% test
    split. The third trainer beside k-means and logistic regression,
    and the generative text classifier a curation pipeline uses for
    cheap source/language routing.

    The unseen-word decomposition keeps the plan sparse: score_l =
    ln(prior_l) - n_tok * ln(T_l + V) + Σ_seen cnt_w * ln(c_wl + 1),
    so only (word, lang) pairs that EXIST in the model produce join
    rows — no dense doc×vocab grid is ever materialized. Scale: the
    model (vocab × langs, Heaps-law-bounded like the unigram LM
    vocab) BROADCASTS onto the test token stream; the dense
    doc×class grid is |test docs| × |langs| via a broadcast
    nested-loop on the tiny per-class totals (5 rows); the argmax is
    a per-doc window over ≤|langs| rows. Drop the broadcast hints
    and the identical plan shuffle-joins if the model outgrows
    them."""
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    train = tok.filter(F.col("doc_id") % _NB_TEST_MOD != 0)
    c = train.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    totals = train.groupBy("lang").agg(
        F.count(F.lit(1)).alias("t_l"),
        F.count_distinct("doc_id").alias("n_docs_l"),
    )
    consts = train.agg(
        F.count_distinct("w").alias("v"),
        F.count_distinct("doc_id").alias("n_train"),
    )
    test = (
        tok.filter(F.col("doc_id") % _NB_TEST_MOD == 0)
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .cache()  # two consumers (doc lengths + model join) — one explode+shuffle, not two
    )
    doclen = test.groupBy("doc_id", "true_lang").agg(F.sum("cnt").alias("n_tok"))
    seen = (
        test.join(broadcast(c), "w")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("cnt") * F.log(F.col("c") + 1)).alias("seen_part"))
    )
    scoredall = (
        doclen.crossJoin(broadcast(totals))
        .crossJoin(broadcast(consts))
        .join(seen, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            F.round(
                F.log(F.col("n_docs_l").cast("double") / F.col("n_train"))
                - F.col("n_tok") * F.log((F.col("t_l") + F.col("v")).cast("double"))
                + F.coalesce(F.col("seen_part"), F.lit(0.0)),
                4,
            ).alias("score"),
        )
    )
    best = scoredall.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.desc("score"), "lang")
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        "doc_id",
        "true_lang",
        F.col("lang").alias("pred_lang"),
        "score",
        (F.col("lang") == F.col("true_lang")).alias("correct"),
    )


_BPE_MERGES = 10
# word -> '|a||b||c|' (each symbol wrapped in its own sentinels):
# greedy left-to-right non-overlapping pair merge is then ONE string
# replace('|a||b|' -> '|ab|') — replace() consumes matches left to
# right in both engines, which IS the BPE merge-application order
# ('|a||a||a|' -> '|aa||a|', verified both sides). Tokens are [a-z]+
# so '|' never collides with symbol text.


def _bpe_learn_chain() -> tuple[str, str]:
    """The merge loop unrolled as chained MATERIALIZED CTEs (the
    k-means/pagerank/k-core device): each rank's pair stats, argmax,
    and merge application are plain relational steps over the
    vocab-sized word table. Shared by the trainer's oracle (which
    reads the per-rank ``best{r}`` CTEs) and the tokenizer's oracle
    (which re-applies the same bests to new text). Returns
    ``(with_chain, bests_union)``: the full WITH body from the corpus
    wordcount through ``seg{_BPE_MERGES}``, and the UNION ALL of the
    ranked merge rows."""
    steps = []
    bests = []
    prev = "seg0"
    for r in range(1, _BPE_MERGES + 1):
        steps.append(
            f"""sym{r} AS (
          SELECT cnt, string_split(substr(seg, 2, len(seg) - 2), '||') AS s
          FROM {prev}
        ),
        pairs{r} AS MATERIALIZED (
          SELECT s[i] AS a, s[i + 1] AS b, SUM(cnt) AS n
          FROM sym{r}, LATERAL unnest(generate_series(1, len(s) - 1)) AS g(i)
          GROUP BY 1, 2
        ),
        best{r} AS MATERIALIZED (
          SELECT a, b, n FROM pairs{r} ORDER BY n DESC, a, b LIMIT 1
        ),
        seg{r} AS MATERIALIZED (
          SELECT w, cnt,
                 replace(seg, '|' || x.a || '||' || x.b || '|',
                              '|' || x.a || x.b || '|') AS seg
          FROM {prev}, best{r} x
        )"""
        )
        bests.append(
            f"SELECT {r} AS merge_rank, a AS sym_left, b AS sym_right, "
            f"a || b AS merged, CAST(n AS BIGINT) AS n FROM best{r}"
        )
        prev = f"seg{r}"
    chain = ",\n        ".join(steps)
    with_chain = f"""tok AS MATERIALIZED (
          SELECT t AS w, COUNT(*) AS cnt
          FROM (SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
          WHERE regexp_matches(t, '^[a-z]+$')
          GROUP BY t
        ),
        seg0 AS MATERIALIZED (
          SELECT w, cnt, regexp_replace(w, '(.)', '|\\1|', 'g') AS seg FROM tok
        ),
        {chain}"""
    union = "\n          UNION ALL ".join(bests)
    return with_chain, union


def _bpe_train_oracle() -> str:
    with_chain, union = _bpe_learn_chain()
    return f"""
        WITH {with_chain}
        SELECT CAST(merge_rank AS INT) AS merge_rank, sym_left, sym_right, merged, n
        FROM ({union})
    """


@register(
    "bpe_train_merges",
    oracle=_bpe_train_oracle(),
    tags=("L18'", "tokenizer", "bpe", "iterative"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINING (Sennrich et al. 2016) — the full merge loop, not
    just one step's statistic (`bpe_pair_counts` is iteration 1's
    count table): {_BPE_MERGES} ranked merges learned from the corpus,
    each iteration = count adjacent symbol pairs (weighted by word
    frequency) → argmax (count desc, pair lexicographic tiebreak) →
    greedy left-to-right merge application. The learned table IS a
    tokenizer model (apply merges in rank order to segment new text).
    Fourth iterative-ML flagship beside k-means / logreg / PCA, and
    like them fully hash-oracled: counts are exact integers, the
    argmax tiebreak is total, and merge application is a
    deterministic string replace in both engines.

    The textbook trainer trick decides the scale story: pair stats
    live on the WORD-FREQUENCY table, not the corpus — the corpus is
    scanned ONCE (one map-side-combining wordcount shuffle, the
    mr_wordcount shape) and every iteration after that touches only
    the Heaps-law-bounded vocab (cached here; at 100 TB it is a few
    GB against which 10 iterations of narrow maps + an
    alphabet²-bounded pair aggregate are trivial). Per iteration the
    only driver state is the 1-row argmax (the k-means
    bounded-model-state discipline). Segmentations ride as sentinel
    strings ('|a||b|'); one replace() applies a merge greedily left
    to right, exactly the fold a sequential trainer runs."""
    merges = _bpe_learn(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank int, sym_left string, sym_right string, merged string, n long"
    )


def _bpe_learn(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """The distributed merge loop shared by the trainer
    (``bpe_train_merges``) and the tokenizer (``bpe_apply_segment``):
    returns the ranked merge list
    ``[(rank, sym_left, sym_right, merged, n), ...]`` — the model.
    Driver state is one argmax row per round; all pair statistics
    stay on the cached vocab table."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("seg", F.regexp_replace("w", "(.)", r"|$1|"))
        .cache()  # vocab-sized; unpersisted after the training loop
    )
    # IF-guard: fully-merged single-symbol words have no pair, and
    # Spark's sequence(1, 0) DESCENDS ([1, 0]) rather than being empty.
    pair_expr = """
        aggregate(
          array(split(substring(seg, 2, length(seg) - 2), '\\\\|\\\\|')),
          CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>),
          (acc, s) -> IF(size(s) < 2, acc,
            transform(
              sequence(1, size(s) - 1),
              i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))))
    """
    merges = []
    try:
        cur = vocab.select("cnt", "seg")
        for r in range(1, _BPE_MERGES + 1):
            rows = (
                cur.select("cnt", F.explode(F.expr(pair_expr)).alias("p"))
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.desc("n"), "a", "b")
                .limit(1)
                .collect()
            )
            if not rows:
                # Pair exhaustion (every vocab word collapsed to one
                # symbol before _BPE_MERGES rounds — degenerate corpus).
                # Break rather than IndexError: the oracle's chain
                # CONVERGES on the same answer, because an empty
                # best{r} makes seg{r} = prev × ∅ = empty, so every
                # later pairs/best CTE is empty too and the UNION
                # returns exactly the merges learned before
                # exhaustion — the same ranks this loop kept.
                break
            best = rows[0]
            merges.append((r, best["a"], best["b"], best["a"] + best["b"], int(best["n"])))
            cur = cur.withColumn(
                "seg",
                F.expr(
                    "replace(seg, '|{a}||{b}|', '|{a}{b}|')".format(a=best["a"], b=best["b"])
                ),
            )
    finally:
        vocab.unpersist()
    return merges


def _bpe_apply_oracle() -> str:
    """Re-learn the merge table with the shared chain, then fold the
    ranked merges over the inference slice's distinct words with the
    SAME chained replace the trainer's seg{r} steps use — the oracle
    IS the sequential tokenizer."""
    with_chain, _union = _bpe_learn_chain()
    apply_steps = []
    prev = "aseg0"
    for r in range(1, _BPE_MERGES + 1):
        # LEFT JOIN + COALESCE, not a cross join: if the trainer chain
        # exhausts pairs before _BPE_MERGES rounds (degenerate corpus),
        # best{r} is EMPTY — a cross join would empty every later
        # aseg CTE and the oracle would return zero rows while the
        # operator still segments with the merges actually learned
        # (ADVICE r09: the apply-side twin of the trainer's
        # pair-exhaustion convergence fix). With an empty best{r} the
        # left join yields NULL x.a/x.b, replace() goes NULL, and
        # COALESCE keeps the segmentation unchanged — exactly the
        # no-op round the operator's fold performs.
        apply_steps.append(
            f"""aseg{r} AS MATERIALIZED (
          SELECT w, COALESCE(replace(seg, '|' || x.a || '||' || x.b || '|',
                                     '|' || x.a || x.b || '|'), seg) AS seg
          FROM {prev} LEFT JOIN best{r} x ON TRUE
        )"""
        )
        prev = f"aseg{r}"
    apply_chain = ",\n        ".join(apply_steps)
    return f"""
        WITH {with_chain},
        heldw AS MATERIALIZED (
          SELECT doc_id, t AS w
          FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                FROM documents WHERE doc_id % 10 = 7)
          WHERE regexp_matches(t, '^[a-z]+$')
        ),
        aseg0 AS MATERIALIZED (
          SELECT w, regexp_replace(w, '(.)', '|\\1|', 'g') AS seg
          FROM (SELECT DISTINCT w FROM heldw)
        ),
        {apply_chain},
        wordtok AS MATERIALIZED (
          SELECT w, len(string_split(substr(seg, 2, len(seg) - 2), '||')) AS n_sym
          FROM {prev}
        )
        SELECT h.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(t.n_sym) AS BIGINT) AS n_tokens,
               CAST((1000000 * SUM(t.n_sym)) // COUNT(*) AS BIGINT) AS tokens_per_word_ppm
        FROM heldw h JOIN wordtok t ON h.w = t.w
        GROUP BY h.doc_id
    """


@register(
    "bpe_apply_segment",
    oracle=_bpe_apply_oracle(),
    tags=("L18''", "tokenizer", "bpe", "inference"),
)
def bpe_apply_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TOKENIZATION (the trainer's inference half — round-8
    verdict item 1): learn the ranked merge table with the shared
    ``_bpe_learn`` loop, then SEGMENT a fresh slice of documents
    (doc_id % 10 = 7, the arriving-batch stand-in) by folding the
    merges over each word in RANK ORDER, greedy left-to-right — the
    exact fold a sequential BPE tokenizer runs, and the completion
    of trainer → tokenizer the way ``logreg_embeddings`` completed
    train → eval. Output per document: word count, BPE token count,
    and tokens-per-word in exact ppm (integer division — no float
    rounding ties between engines).

    Scale story (the same trick as training, applied at inference):
    segmentation is computed per DISTINCT WORD of the slice — the
    Heaps-law-bounded vocab — as {_BPE_MERGES} chained narrow
    ``replace()`` maps (no shuffle, no Python), then joined back to
    the (doc_id, word) occurrences on the word key: one equi-join
    whose build side is vocab-sized (broadcastable at moderate
    vocabs; AQE picks broadcast vs shuffle by measured size), one
    doc_id aggregate. Payload-free driver state: the 10-row merge
    model from training. Hash-oracled end to end because every
    quantity is an exact integer."""
    merges = _bpe_learn(spark, sf_dir)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 7)
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w").rlike("^[a-z]+$"))

    seg = (
        words.select("w")
        .distinct()
        .withColumn("seg", F.regexp_replace("w", "(.)", r"|$1|"))
    )
    for _rank, a, b, _merged, _n in merges:
        seg = seg.withColumn(
            "seg", F.expr("replace(seg, '|{a}||{b}|', '|{a}{b}|')".format(a=a, b=b))
        )
    wordtok = seg.select(
        "w",
        F.size(F.split(F.expr("substring(seg, 2, length(seg) - 2)"), r"\|\|")).alias("n_sym"),
    )
    return (
        words.join(wordtok, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            F.expr("CAST((1000000 * n_tokens) DIV n_words AS BIGINT)").alias(
                "tokens_per_word_ppm"
            ),
        )
    )


_PMI_MIN_COUNT = 25
_PMI_TOP = 50


@register(
    "text_pmi_collocations",
    oracle=f"""
        WITH toks AS (
          SELECT string_split(lower(text), ' ') AS t FROM documents
        ),
        bi AS (
          SELECT t[i] AS w1, t[i + 1] AS w2
          FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
        ),
        big AS (SELECT w1, w2, COUNT(*) AS n FROM bi GROUP BY w1, w2),
        m1 AS (SELECT w1, SUM(n) AS c1 FROM big GROUP BY w1),
        m2 AS (SELECT w2, SUM(n) AS c2 FROM big GROUP BY w2),
        tot AS (SELECT SUM(n) AS nn FROM big)
        SELECT w1, w2, n, pmi FROM (
          SELECT b.w1, b.w2, CAST(b.n AS BIGINT) AS n,
                 ROUND(ln(tot.nn) + ln(b.n) - ln(m1.c1) - ln(m2.c2), 6) AS pmi
          FROM big b
          JOIN m1 ON b.w1 = m1.w1
          JOIN m2 ON b.w2 = m2.w2
          CROSS JOIN tot
          WHERE b.n >= {_PMI_MIN_COUNT}
          ORDER BY pmi DESC, b.w1, b.w2
          LIMIT {_PMI_TOP}
        )
    """,
    tags=("L5", "pmi", "collocations"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 — PMI-ranked collocations (Church & Hanks 1990, public
    method): the top-{_PMI_TOP} adjacent word pairs by pointwise
    mutual information ``ln(N·c12 / (c1·c2))`` among pairs seen at
    least {_PMI_MIN_COUNT} times (PMI famously explodes on hapax
    pairs — the min-count gate is part of the method). This is the
    phrase-mining / multi-word-expression detector every corpus
    pipeline runs before tokenizer training: high-PMI pairs are the
    merge candidates BPE discovers statistically.

    Marginals come from the bigram table itself (c1 = Σ_w2 n,
    c2 = Σ_w1 n, N = Σ n), so the corpus is scanned ONCE; everything
    after the first groupBy is vocabulary-sized. PMI is computed as
    ``ln N + ln c12 − ln c1 − ln c2`` — four ``ln``s of INTEGER
    arguments (the engine-portable float discipline; also the
    scale-safe spelling: the product form ``N·c12`` overflows int64
    once N passes ~1e12 bigrams, the sum-of-logs form never does),
    rounded to 6 dp BEFORE the ordering so the LIMIT cut is
    engine-deterministic (tiebreak: word pair).

    Scale: one corpus scan → map-side-combining bigram groupBy; the
    two marginal joins are vocabulary-keyed equi-joins (the marginal
    tables are re-aggregations of the bigram table, never corpus
    re-scans); N is a broadcast 1-row scalar (allowlisted); the
    top-{_PMI_TOP} is orderBy+limit → TakeOrderedAndProject, a
    per-partition heap with no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), " ").alias("t"))
    bi = toks.select(
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")
        ).alias("b")
    ).select("b.w1", "b.w2")
    big = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    m1 = big.groupBy("w1").agg(F.sum("n").alias("c1"))
    m2 = big.groupBy("w2").agg(F.sum("n").alias("c2"))
    tot = big.agg(F.sum("n").alias("nn"))
    return (
        big.filter(F.col("n") >= _PMI_MIN_COUNT)
        .join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.log("nn") + F.log("n") - F.log("c1") - F.log("c2"), 6
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(_PMI_TOP)
    )


from hadoop_based_distributed_batch_processing_system_spark.registry import interpolate_docstrings

interpolate_docstrings(globals())
