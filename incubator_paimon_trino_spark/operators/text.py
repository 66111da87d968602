"""Text-analysis operators for large-scale training-data pipelines.

Beyond reference parity (north star in BASELINE.json): language ID, quality
scoring, token counting, document fingerprinting — all over the driver's
``documents`` table. Everything here is built from JVM-side
``pyspark.sql.functions`` (regexp/hash/string ops inside whole-stage codegen)
— zero Python in the hot path, so throughput scales with executors, and every
query is oracle-checkable in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.operators.registry import register
from incubator_paimon_trino_spark.sources import table

# Tiny high-frequency English stopword list for the heuristic scorer/lang-id.
# The regex is DERIVED from the tuple so the two can never drift (three
# oracles embed the regex text — editing the list regenerates it).
_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
_STOP_RE = r"\b(" + "|".join(_STOPWORDS) + r")\b"


@register(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_ish_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (alpha runs / digit runs / single punctuation = one token each)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


@register(
    "text_quality_score",
    oracle=rf"""
    SELECT doc_id, n_words, stop_hits, punct_chars, mean_word_len,
           CASE WHEN n_words >= 20
                 AND stop_hits * 1.0 / n_words >= 0.05
                 AND punct_chars * 1.0 / NULLIF(LENGTH(text), 0) <= 0.1
                THEN 1 ELSE 0 END AS passes_quality
    FROM (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(text, '{_STOP_RE}')) AS BIGINT) AS stop_hits,
             CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS BIGINT) AS punct_chars,
             CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
               / NULLIF(len(string_split(text, ' ')), 0) AS mean_word_len
      FROM documents
    )
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate (Gopher-rule-style): min length, stopword ratio
    floor, punctuation ratio ceiling, mean word length — all exact-arithmetic
    filters a C4/RefinedWeb-style cleaning pass would run at corpus scale."""
    d = table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("bigint")
    stop_hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(_STOP_RE), 0)).cast("bigint")
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^a-zA-Z0-9\s]"), 0)).cast("bigint")
    mean_wl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / F.nullif(
        F.size(F.split("text", " ")).cast("bigint"), F.lit(0)
    )
    passes = (
        F.when(
            (n_words >= 20)
            & (stop_hits * 1.0 / n_words >= 0.05)
            & (punct * 1.0 / F.nullif(F.length("text").cast("bigint"), F.lit(0)) <= 0.1),
            1,
        )
        .otherwise(0)
        .alias("passes_quality")
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        stop_hits.alias("stop_hits"),
        punct.alias("punct_chars"),
        mean_wl.alias("mean_word_len"),
        passes,
    )


@register(
    "text_langid",
    oracle=rf"""
    SELECT doc_id, lang AS declared_lang,
           CASE WHEN len(regexp_extract_all(text, '{_STOP_RE}')) * 1.0
                     / NULLIF(len(string_split(text, ' ')), 0) >= 0.08
                THEN 'en' ELSE 'und' END AS detected_lang
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language ID (n-gram-heuristic family): documents whose
    English-stopword density clears 8% are tagged 'en', else 'und'. A real
    deployment swaps the single regex for per-language stopword tables —
    the plan shape (one regexp_count per language, argmax) is unchanged."""
    d = table(spark, sf_dir, "documents")
    density = F.size(F.regexp_extract_all(F.col("text"), F.lit(_STOP_RE), 0)) * 1.0 / F.nullif(
        F.size(F.split("text", " ")), F.lit(0)
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        F.when(density >= 0.08, "en").otherwise("und").alias("detected_lang"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_md5,
           CAST(LENGTH(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization fingerprint: lowercase + whitespace-collapse, then MD5 —
    the canonical key for exact dedup across formatting variants."""
    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    return d.select(
        "doc_id", F.md5(norm).alias("norm_md5"), F.length("text").cast("bigint").alias("n_chars")
    )


@register(
    "text_rolling_hash_shingles",
    oracle="""
    SELECT doc_id, CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_distinct_shingles
    FROM (
      SELECT doc_id,
             words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
           UNNEST(range(1, GREATEST(len(words) - 1, 1))) AS t(i)
    )
    GROUP BY doc_id
    """,
)
def text_rolling_hash_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word 3-gram shingling (the MinHash front-end) with distinct counts.

    Uses the ONE sanctioned shingle producer (``dedup.shingles_from``,
    guarded array indexing — see ``dedup._raw_shingles`` for why the bare
    ``sequence(0, size-3)`` idiom needs its ``if(size >= 3)`` guard: Spark's
    ``sequence`` counts DOWN when stop < start). Short docs simply produce
    no row, exactly matching the oracle's empty UNNEST."""
    from incubator_paimon_trino_spark.operators.dedup import shingles_from

    d = table(spark, sf_dir, "documents")
    return (
        shingles_from(d)
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_distinct_shingles"))
    )


@register(
    "text_pii_scrub",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(enriched, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(enriched, '[0-9]{6,}')) AS BIGINT) AS n_long_numbers,
           md5(regexp_replace(regexp_replace(enriched, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
                              '[0-9]{6,}', '<NUM>', 'g')) AS scrubbed_md5
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@mail.example code ' || CAST(doc_id * 1234567 AS VARCHAR)
                  ELSE text END AS enriched
      FROM documents
    )
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails, long digit runs → typed placeholder tokens) —
    a standard pre-training redaction pass. The driver corpus is synthetic
    and PII-free, so PII-shaped suffixes are injected deterministically for
    every third doc first; the scrub itself is two chained JVM-side
    ``regexp_replace`` calls (no UDF), verified via counts + an md5 of the
    scrubbed text."""
    d = table(spark, sf_dir, "documents")
    enriched = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example code "),
            (F.col("doc_id") * 1234567).cast("string"),
        ),
    ).otherwise(F.col("text"))
    email_re = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+"
    num_re = r"[0-9]{6,}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(enriched, email_re, "<EMAIL>"), num_re, "<NUM>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(enriched, F.lit(email_re), 0)).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(enriched, F.lit(num_re), 0)).cast("bigint").alias("n_long_numbers"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "text_contamination_check",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
           UNNEST(range(1, GREATEST(len(words) - 1, 1))) AS t(i)
    ),
    bench AS (
      SELECT DISTINCT s FROM sh
      WHERE CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS UBIGINT) % 20 AS BIGINT) = 0
    ),
    train AS (
      SELECT * FROM sh
      WHERE CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS UBIGINT) % 20 AS BIGINT) <> 0
    ),
    scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      FROM train t LEFT JOIN bench b ON t.s = b.s
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_shingles, n_hit,
           n_hit * 1.0 / n_shingles AS contamination
    FROM scored
    WHERE n_hit * 1.0 / n_shingles >= 0.2
    """,
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents whose 3-gram
    shingles overlap an evaluation set above 20% — the standard guard
    against test-set leakage into a training corpus. The eval set here is
    simulated as the md5-bucket(doc_id) % 20 == 0 slice (deterministic, so
    the oracle sees the same split).

    Scale shape: the benchmark side collapses to its DISTINCT shingle set —
    normally tiny next to the corpus — and the check is one inverted-index
    left join keyed on the shingle (only shared shingles meet), then a
    per-doc count. No pair space, no UDFs; at 100 TB the benchmark shingle
    set broadcasts and the corpus never shuffles at all.
    """
    from incubator_paimon_trino_spark.operators.dedup import exploded_shingles

    sh = exploded_shingles(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % 20
    )
    sh = sh.withColumn("_b", bucket)
    bench = sh.filter(F.col("_b") == 0).select("s").distinct()
    train = sh.filter(F.col("_b") != 0).select("doc_id", "s")
    hit = bench.withColumn("_hit", F.lit(1))
    scored = (
        train.join(hit, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
    )
    contamination = F.col("n_hit") * 1.0 / F.col("n_shingles")
    return (
        scored.withColumn("contamination", contamination)
        .filter(F.col("contamination") >= 0.2)
        .select("doc_id", "n_shingles", "n_hit", "contamination")
    )


@register(
    "text_quality_funnel",
    oracle="""
    WITH f AS (
      SELECT n_chars >= 100 AS g2,
             lang = 'en' AS g3,
             len(string_split(text, ' ')) BETWEEN 20 AND 400 AS g4,
             len(list_distinct(string_split(text, ' '))) * 10
               >= len(string_split(text, ' ')) * 3 AS g5
      FROM documents
    )
    SELECT CAST(1 AS INT) AS stage, 'total' AS gate, COUNT(*) AS surviving FROM f
    UNION ALL SELECT 2, 'min_chars', COUNT(*) FILTER (WHERE g2) FROM f
    UNION ALL SELECT 3, 'lang_en', COUNT(*) FILTER (WHERE g2 AND g3) FROM f
    UNION ALL SELECT 4, 'token_range', COUNT(*) FILTER (WHERE g2 AND g3 AND g4) FROM f
    UNION ALL SELECT 5, 'type_token_ratio', COUNT(*) FILTER (WHERE g2 AND g3 AND g4 AND g5) FROM f
    """,
)
def text_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-cleaning funnel: cumulative survivor counts through the four
    standard quality gates (min length -> language -> token-count range ->
    type-token-ratio), the per-stage accounting every training-data
    pipeline reports before materializing a cut.

    One corpus pass: all gates are computed as boolean columns and folded
    into conditional counts in a single hash-agg (map-side partial), then
    unpivoted driver-side via ``stack`` over the 1-row aggregate — no
    repeated scans, no shuffle of document text. The TTR gate compares
    ``distinct_tokens * 10 >= tokens * 3`` in integers (no float ratio), so
    the funnel is exact in both engines.
    """
    w = F.split("text", " ")
    flags = table(spark, sf_dir, "documents").select(
        (F.col("n_chars") >= 100).alias("g2"),
        (F.col("lang") == "en").alias("g3"),
        F.size(w).between(20, 400).alias("g4"),
        (F.size(F.array_distinct(w)) * 10 >= F.size(w) * 3).alias("g5"),
    )
    c = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    aggd = flags.agg(
        F.count(F.lit(1)).alias("c1"),
        c(F.col("g2")).alias("c2"),
        c(F.col("g2") & F.col("g3")).alias("c3"),
        c(F.col("g2") & F.col("g3") & F.col("g4")).alias("c4"),
        c(F.col("g2") & F.col("g3") & F.col("g4") & F.col("g5")).alias("c5"),
    )
    return aggd.select(
        F.expr(
            "stack(5, 1, 'total', c1, 2, 'min_chars', c2, 3, 'lang_en', c3,"
            " 4, 'token_range', c4, 5, 'type_token_ratio', c5)"
            " AS (stage, gate, surviving)"
        )
    )


@register(
    "text_rare_word_ratio",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    total AS (SELECT COUNT(*) AS n_docs FROM documents),
    df AS (SELECT w, COUNT(DISTINCT doc_id) AS docfreq FROM tok GROUP BY w),
    scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             COUNT(*) FILTER (WHERE df.docfreq * 4 < total.n_docs) AS n_rare
      FROM tok t JOIN df ON df.w = t.w CROSS JOIN total
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, n_rare,
           ROUND(CAST(n_rare AS DOUBLE) / n_tokens, 4) AS rare_ratio
    FROM scored
    WHERE n_rare > 0
    """,
)
def text_rare_word_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model-free perplexity proxy (KenLM-style quality gate
    without the model): corpus document frequency per token, then per-doc
    rare-token counts, rare meaning docfreq below a quarter of the corpus —
    the gibberish/OCR-noise signal of a cleaning pipeline, kept
    integer-exact (counts and an end-rounded ratio, no float aggregation).

    Two-phase at scale: token->docfreq is a map-side-combinable aggregate
    over (token, doc) pairs; the scoring join is an equi-join on the token.
    Hot tokens (stopwords) are exactly the NON-rare ones, so at 100 TB the
    docfreq table splits: broadcast the head (by frequency), shuffle-join
    only the long tail. The corpus size reaches the filter as a 1-row
    broadcast, not a collected scalar.
    """
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    total = docs.agg(F.count("*").alias("n_docs"))
    df = tok.groupBy("w").agg(F.countDistinct("doc_id").alias("docfreq"))
    scored = (
        tok.join(df, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("docfreq") * 4 < F.col("n_docs"), 1).otherwise(0)
            ).alias("n_rare"),
        )
    )
    return scored.filter(F.col("n_rare") > 0).select(
        "doc_id",
        "n_tokens",
        "n_rare",
        F.round(F.col("n_rare") / F.col("n_tokens"), 4).alias("rare_ratio"),
    )


@register(
    "text_unigram_logprob",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, tok
      FROM (SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS tok
            FROM documents)
      WHERE tok <> ''
    ), freq AS (
      SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok
    ), tot AS (
      SELECT SUM(tf) AS n FROM freq
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(floor(log10(CAST(f.tf AS DOUBLE) / CAST(tot.n AS DOUBLE))
                               * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
             / CAST(1000000 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_logprob
    FROM toks t JOIN freq f ON t.tok = f.tok, tot
    GROUP BY t.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the cheap perplexity proxy data
    pipelines use to rank document quality: corpus unigram frequencies in a
    first pass, then each doc's mean log10 token probability.

    Two-pass shape that scales: pass 1 aggregates token counts (map-side
    partial combine, vocabulary-sized result); pass 2 joins the BROADCAST
    frequency table back to the exploded tokens — the corpus itself shuffles
    once on doc_id for the per-doc mean. Per-token log-probs are FLOOR-
    quantized to integer micro-units and summed as BIGINT so the mean is
    order-independent and bit-identical in both engines: ``floor(x * 1e6)``
    is pure IEEE arithmetic (identical everywhere), unlike ``round(x, 6)``
    whose HALF_UP tie-breaking differs between Spark's BigDecimal path and
    DuckDB's multiply-and-round on boundary values (registry.py rule 2)."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    tot = freq.agg(F.sum("tf").alias("n"))
    logp_micro = F.floor(
        F.log10(F.col("tf").cast("double") / F.col("n").cast("double")) * F.lit(1000000.0)
    ).cast("bigint")
    return (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            (
                F.sum(logp_micro).cast("double")
                / F.lit(1000000.0)
                / F.count("*").cast("double")
            ).alias("avg_logprob"),
        )
    )


@register(
    "text_ngram_topk",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), bg AS (
      SELECT words[i] || ' ' || words[i+1] AS bigram
      FROM w, UNNEST(range(1, GREATEST(len(words), 1))) AS t(i)
    ), counted AS (
      SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
    )
    SELECT bigram, n FROM counted
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary mining: the top-50 bigrams by frequency — the
    n-gram statistics pass every tokenizer/LM data pipeline runs before
    training. Ties break on the bigram text so the top-K cut is a total
    order (deterministic across engines).

    Scale shape: bigrams explode map-side (transform over the split array,
    no shuffle), one count aggregation with map-side partial combine on the
    bigram key, then ``orderBy().limit(50)`` plans as TakeOrderedAndProject
    — per-partition top-50 heaps merged on the driver, never a global sort.
    At 100 TB the only full shuffle is the vocabulary-sized count exchange.
    """
    d = table(spark, sf_dir, "documents")
    bigrams = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN "
                "transform(sequence(0, size(split(text, ' ')) - 2), "
                "  i -> concat(element_at(split(text, ' '), i + 1), ' ', "
                "              element_at(split(text, ' '), i + 2))) "
                "ELSE array() END"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )
