"""Sequence packing + shard layout for LLM training-data pipelines (beyond
reference parity — north star in BASELINE.json).

Training consumes fixed-length token sequences, not documents. The standard
preparation is: concatenate documents (per language / per source stream) into
one token stream, split it at exact ``budget``-token boundaries, and lay the
result out in shuffled shards. Both steps are modeled here as pure
window/aggregate arithmetic — no Python in the row path, exact integer math,
and a textually-mirrored DuckDB oracle:

- ``pack_concat_offsets``: each doc's [start, end) offset interval in its
  group's concatenated token stream, and which fixed-size sequences it spans.
  The "concat then split at boundaries" model (GPT-style pretraining packing)
  is prefix-sum arithmetic, so unlike greedy first-fit bin packing it needs
  no sequential state — one window shuffle per group key, fully codegen.
- ``pack_sequence_stats``: per-group sequence counts + tail waste, the
  planning numbers a packing job reports.
- ``train_shuffle_shard``: deterministic pseudo-random shuffle into shards
  (WebDataset-style layout): shard = md5-bucket(doc_id), within-shard order =
  an independently-salted md5 — reproducible across engines and re-runs,
  unlike ``ORDER BY random()``.

Scale notes (100 TB): the packing window shuffles once on the group key; skew
is bounded by choosing group keys with bounded size (lang × date-shard in
production — lang alone here matches the fixture). The shard count is a
parameter: production uses O(corpus / shard-size) shards (thousands), so the
per-shard sort is the standard bounded shuffle-sort; 8 here only mirrors the
small fixture. No driver collects, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_paimon_trino_spark.operators.registry import register
from incubator_paimon_trino_spark.operators.sampling import _bucket, _bucket_sql
from incubator_paimon_trino_spark.sources import table

#: fixed token budget per packed training sequence
SEQ_BUDGET = 512

#: shard count for the shuffle layout (fixture-sized; a parameter at scale)
N_SHARDS = 8


@register(
    "pack_concat_offsets",
    oracle=f"""
    SELECT lang, doc_id, n_tokens, start_off,
           start_off // {SEQ_BUDGET} AS first_seq,
           (start_off + n_tokens - 1) // {SEQ_BUDGET} AS last_seq,
           (start_off + n_tokens - 1) // {SEQ_BUDGET}
             - start_off // {SEQ_BUDGET} + 1 AS n_seqs
    FROM (
      -- COALESCE: the first doc per group has an empty frame (NULL sum)
      SELECT lang, doc_id, n_tokens, COALESCE(raw_start, 0) AS start_off
      FROM (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(SUM(len(string_split(text, ' '))) OVER (
                 PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS BIGINT) AS raw_start
        FROM documents
      )
    )
    """,
)
def pack_concat_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing: per language, documents are laid
    end-to-end in doc_id order into one token stream that is cut every
    ``SEQ_BUDGET`` tokens; emit each doc's offset interval and the range of
    fixed-size sequences it lands in (``n_seqs > 1`` = doc straddles a
    boundary).

    Whitespace tokens (same definition as ``text_token_count``). All integer
    arithmetic — ``div``/``//`` floor division, no float rounding — so the
    result is exact at any corpus size. One window shuffle keyed on lang;
    the running sum is the only state and it is Spark's native prefix-sum
    frame, not Python.
    """
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    tok = F.size(F.split("text", " ")).cast("bigint")
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    base = d.select(
        "lang",
        "doc_id",
        tok.alias("n_tokens"),
        F.coalesce(F.sum(tok).over(w), F.lit(0)).cast("bigint").alias("start_off"),
    )
    first = F.expr(f"start_off div {SEQ_BUDGET}")
    last = F.expr(f"(start_off + n_tokens - 1) div {SEQ_BUDGET}")
    return base.select(
        "lang",
        "doc_id",
        "n_tokens",
        "start_off",
        first.alias("first_seq"),
        last.alias("last_seq"),
        (last - first + 1).alias("n_seqs"),
    )


@register(
    "pack_sequence_stats",
    oracle=f"""
    SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           (CAST(SUM(len(string_split(text, ' '))) AS BIGINT) + {SEQ_BUDGET - 1})
             // {SEQ_BUDGET} AS n_seqs,
           (CAST(SUM(len(string_split(text, ' '))) AS BIGINT) + {SEQ_BUDGET - 1})
             // {SEQ_BUDGET} * {SEQ_BUDGET}
             - CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tail_waste
    FROM documents
    GROUP BY lang
    """,
)
def pack_sequence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing plan summary per group: total tokens, number of
    ``SEQ_BUDGET``-token sequences the concat-split layout produces
    (``ceil`` via integer arithmetic), and padding wasted in the final
    partial sequence. One map-side-combinable aggregation — the job-level
    report a packing run logs before writing shards."""
    d = table(spark, sf_dir, "documents")
    tok = F.size(F.split("text", " ")).cast("bigint")
    total = F.sum(tok).cast("bigint")
    n_seqs = F.expr(f"(total_tokens + {SEQ_BUDGET - 1}) div {SEQ_BUDGET}")
    return (
        d.groupBy("lang")
        .agg(total.alias("total_tokens"))
        .select(
            "lang",
            "total_tokens",
            n_seqs.alias("n_seqs"),
            (n_seqs * SEQ_BUDGET - F.col("total_tokens")).alias("tail_waste"),
        )
    )


@register(
    "train_shuffle_shard",
    oracle=f"""
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard ORDER BY order_key, doc_id
           ) AS BIGINT) AS pos
    FROM (
      SELECT doc_id,
             {_bucket_sql('doc_id', N_SHARDS)} AS shard,
             {_bucket_sql("'shuf:' || CAST(doc_id AS VARCHAR)", 1000000007)} AS order_key
      FROM documents
    )
    """,
)
def train_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: shard assignment
    and within-shard position are both pure functions of doc_id (md5 buckets
    with independent salts), so the layout is reproducible across re-runs,
    engines, and partitionings — the property ``ORDER BY random()`` lacks —
    and appending new documents never reorders existing shard prefixes'
    relative order.

    Scale shape: one hash shuffle on shard, then a per-shard sort on the
    order key — the bounded shuffle-sort every shard-writer (WebDataset,
    TFRecord sharding) performs. No global total order is ever materialized.
    """
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    salted = F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))
    base = d.select(
        "doc_id",
        _bucket(F.col("doc_id"), N_SHARDS).alias("shard"),
        _bucket(salted, 1000000007).alias("order_key"),
    )
    w = W.partitionBy("shard").orderBy("order_key", "doc_id")
    return base.select(
        "doc_id", "shard", F.row_number().over(w).cast("bigint").alias("pos")
    )


#: independent BFD packers per language — bounds any single packer's state
#: (production sizes this so one packer's items fit comfortably in memory)
PACK_SHARDS = 4

_BFD_FIT = (
    "list_sort(list_filter(list_zip(p.rem, range(1, len(p.rem)+1)), "
    "z2 -> z2[1] >= i.sz))[1][2]"
)


@register(
    "pack_best_fit_decreasing",
    oracle=f"""
    WITH RECURSIVE items AS (
      SELECT lang, shard, doc_id, sz,
             ROW_NUMBER() OVER (PARTITION BY lang, shard
                                ORDER BY sz DESC, doc_id) AS r
      FROM (
        SELECT lang, {_bucket_sql('doc_id', 'PACK_SHARDS_N')} AS shard, doc_id,
               LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), {SEQ_BUDGET}) AS sz
        FROM documents
      )
    ),
    n AS (SELECT lang, shard, COUNT(*) AS cnt FROM items GROUP BY lang, shard),
    pack AS (
      SELECT lang, shard, CAST(0 AS BIGINT) AS r,
             CAST([] AS BIGINT[]) AS rem, CAST([] AS BIGINT[]) AS bins
      FROM n
      UNION ALL
      SELECT p.lang, p.shard, p.r + 1,
             CASE WHEN {_BFD_FIT} IS NULL
                  THEN list_append(p.rem, {SEQ_BUDGET} - i.sz)
                  ELSE list_transform(list_zip(p.rem, range(1, len(p.rem)+1)),
                         z -> CASE WHEN z[2] = {_BFD_FIT}
                              THEN z[1] - i.sz ELSE z[1] END)
             END,
             list_append(p.bins, COALESCE({_BFD_FIT}, len(p.rem) + 1))
      FROM pack p
      JOIN items i ON i.lang = p.lang AND i.shard = p.shard AND i.r = p.r + 1
    ),
    final AS (
      SELECT p.lang AS flang, p.shard AS fshard, p.bins
      FROM pack p JOIN n ON n.lang = p.lang AND n.shard = p.shard AND p.r = n.cnt
    )
    SELECT i.lang, CAST(i.shard AS BIGINT) AS pack_shard, i.doc_id,
           i.sz AS n_tokens, CAST(f.bins[i.r] AS BIGINT) AS bin_id
    FROM items i JOIN final f ON f.flang = i.lang AND f.fshard = i.shard
    """.replace("PACK_SHARDS_N", "4"),
)
def pack_best_fit_decreasing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing bin packing — the packing real training pipelines
    prefer over concat-split (``pack_concat_offsets``): documents never
    straddle sequence boundaries, and BFD's sorted greedy keeps waste within
    11/9·OPT+1 of optimal. Each (lang, pack_shard) group is packed
    independently: items sorted by (tokens DESC, doc_id), each placed in the
    open bin with the SMALLEST remaining capacity that fits (tie → lowest
    bin id), else a new bin. Oversized docs are truncated to the budget
    (standard practice). The DuckDB oracle replays the identical fold as a
    recursive CTE over list state, so every assignment is value-checked.

    Scale shape: bin packing is inherently sequential PER PACKER, so the
    corpus is split into independent packers by the deterministic md5 shard
    (the same bounded-packer model production uses — shard count chosen so
    one packer's (size, id) pairs fit in memory; only those pairs are held,
    never text). One hash shuffle on (lang, pack_shard), then an
    Arrow-batched ``applyInPandas`` running the O(n·bins) fold per group.
    The prefix-sum twin stays the zero-Python path when boundary-straddling
    is acceptable.
    """
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    sized = d.select(
        "lang",
        _bucket(F.col("doc_id"), PACK_SHARDS).alias("pack_shard"),
        "doc_id",
        F.least(
            F.size(F.split("text", " ")).cast("bigint"), F.lit(SEQ_BUDGET).cast("bigint")
        ).alias("n_tokens"),
    )

    def _bfd(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        rem: list[int] = []
        bins: list[int] = []
        for s in pdf["n_tokens"]:
            best_idx, best_rem = -1, None
            for idx, r in enumerate(rem):
                if r >= s and (best_rem is None or r < best_rem):
                    best_rem, best_idx = r, idx
            if best_idx < 0:
                rem.append(SEQ_BUDGET - int(s))
                bins.append(len(rem))
            else:
                rem[best_idx] -= int(s)
                bins.append(best_idx + 1)
        return pdf.assign(bin_id=pd.Series(bins, index=pdf.index, dtype="int64"))

    return sized.groupBy("lang", "pack_shard").applyInPandas(
        _bfd,
        "lang string, pack_shard bigint, doc_id bigint, n_tokens bigint, bin_id bigint",
    )
