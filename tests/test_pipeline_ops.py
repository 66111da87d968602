"""Cross-validation of the sketch-based pipeline ops against exact baselines.

The sketch ops (MinHash-LSH, SimHash, LSH-ANN) have no SQL oracle; their
correctness argument is recall/precision against the exact operator on the
same data — mirroring how the reference validates merge semantics with
golden scenarios rather than string compares.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_ORACLE, SF_SMOKE


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    from incubator_paimon_trino_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    exact = _pairs(dedup_ngram_jaccard(spark, SF_ORACLE))  # jaccard >= 0.6
    approx = _pairs(dedup_minhash_lsh(spark, SF_ORACLE))  # est >= 0.5
    assert exact, "driver data is expected to contain planted near-dup pairs"
    # band-collision prob 1-(1-J^4)^8 is ~0.67 at J=0.6 but >=0.97 at J>=0.77;
    # the planted near-dups sit well above the threshold, hence the 0.9 floor
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall} vs exact pairs {len(exact)}"


def test_simhash_finds_planted_neardups(spark):
    from incubator_paimon_trino_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_simhash,
    )

    exact = _pairs(dedup_ngram_jaccard(spark, SF_ORACLE))
    sim = _pairs(dedup_simhash(spark, SF_ORACLE))
    # simhash(hamming<=3) is a different similarity notion; require substantial
    # overlap with the planted near-dups, not equality
    assert len(exact & sim) >= len(exact) * 0.5


def test_ann_lsh_recall_vs_bruteforce(spark):
    from incubator_paimon_trino_spark.operators.similarity import (
        ann_cosine_topk,
        ann_lsh_bucketed,
    )

    exact = {
        (r["query_id"], r["neighbor_id"]) for r in ann_cosine_topk(spark, SF_ORACLE).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in ann_lsh_bucketed(spark, SF_ORACLE).collect()
    }
    # near-orthogonal random embeddings are LSH's worst case; 6 planes with
    # <=2-bit multiprobe measured ~0.6 recall offline — require a floor of 0.4
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"lsh recall {recall}"
    # and every returned neighbor must be ranked consistently (k per query)
    from collections import Counter

    per_q = Counter(q for q, _ in approx)
    assert all(n <= 10 for n in per_q.values())


def test_feature_extract_deterministic(spark):
    from incubator_paimon_trino_spark.operators.multimodal import multimodal_feature_extract

    a = multimodal_feature_extract(spark, SF_ORACLE).orderBy("asset_id").limit(5).collect()
    b = multimodal_feature_extract(spark, SF_ORACLE).orderBy("asset_id").limit(5).collect()
    assert a == b
    # features render as scalar f0..f7 columns (driver canonicalizer cannot
    # hash list cells), all populated
    assert all(all(r[f"f{j}"] is not None for j in range(8)) for r in a)


def test_cluster_components_transitive_closure(spark):
    """Every near-dup pair lands in one component, components are closed
    under the edge relation, and labels are the min doc_id of the cluster."""
    from incubator_paimon_trino_spark.operators.dedup import (
        dedup_cluster_components,
        dedup_ngram_jaccard,
    )

    comp = {r.doc_id: r.component for r in dedup_cluster_components(spark, SF_ORACLE).collect()}
    pairs = _pairs(dedup_ngram_jaccard(spark, SF_ORACLE))
    assert pairs, "fixture should contain near-dup pairs"
    for a, b in pairs:
        assert comp[a] == comp[b], f"edge ({a},{b}) split across components"
    # label = min member id, and non-members keep their own id as label
    members: dict[int, set[int]] = {}
    for d, c in comp.items():
        members.setdefault(c, set()).add(d)
    for c, ds in members.items():
        assert c == min(ds)
    linked = {d for p in pairs for d in p}
    for d, c in comp.items():
        if d not in linked:
            assert c == d


def test_ann_ivf_recall_vs_bruteforce(spark):
    from incubator_paimon_trino_spark.operators.similarity import (
        ann_cosine_topk,
        ann_ivf_probe,
    )

    exact = {
        (r["query_id"], r["neighbor_id"]) for r in ann_cosine_topk(spark, SF_ORACLE).collect()
    }
    approx_rows = ann_ivf_probe(spark, SF_ORACLE).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    # random near-orthogonal embeddings make cells near-uniform: scanning
    # 4/16 cells covers ~1/4 of the corpus, so recall floor is modest; real
    # clustered embeddings concentrate neighbors in the probed cells
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"ivf recall {recall}"
    # k results per query, ranks contiguous from 1
    from collections import Counter

    per_q = Counter(r["query_id"] for r in approx_rows)
    assert all(n == 10 for n in per_q.values()) and len(per_q) == 5
    for q in per_q:
        ranks = sorted(r["rnk"] for r in approx_rows if r["query_id"] == q)
        assert ranks == list(range(1, 11))


def test_deterministic_sampling_reproducible(spark):
    """Same rows on every run and ~correct rates per stratum."""
    import incubator_paimon_trino_spark.operators as ops
    from incubator_paimon_trino_spark.operators.registry import QUERIES

    ops.load_all()

    a = {r.doc_id for r in QUERIES["sample_deterministic_hash"](spark, SF_ORACLE).collect()}
    b = {r.doc_id for r in QUERIES["sample_deterministic_hash"](spark, SF_ORACLE).collect()}
    assert a == b and len(a) > 0
    strat = {r.lang: r.sampled for r in QUERIES["sample_stratified_by_lang"](spark, SF_ORACLE).collect()}
    total = {r.lang: r.n for r in
             __import__("incubator_paimon_trino_spark.sources", fromlist=["table"])
             .table(spark, SF_ORACLE, "documents").groupBy("lang").count()
             .withColumnRenamed("count", "n").collect()}
    # en upsampled at 50%, rest at 10% — loose binomial bounds
    assert strat["en"] / total["en"] > 0.25
    for lang, n in strat.items():
        if lang != "en":
            assert n / total[lang] < 0.35


def test_pii_scrub_removes_all_pii(spark):
    import incubator_paimon_trino_spark.operators as ops
    from incubator_paimon_trino_spark.operators.registry import QUERIES

    ops.load_all()

    rows = QUERIES["text_pii_scrub"](spark, SF_ORACLE).collect()
    injected = [r for r in rows if r.doc_id % 3 == 0]
    # doc_id*1234567 is 0 for doc 0 — one digit, below the {6,} threshold
    assert injected and all(r.n_emails >= 1 for r in injected)
    assert all(r.n_long_numbers >= 1 for r in injected if r.doc_id > 0)
    clean = [r for r in rows if r.doc_id % 3 != 0]
    assert all(r.n_emails == 0 for r in clean)


def test_stop_shingle_cap_bounds_skew(spark):
    """Pathological repeated-text corpus: shingles from shared boilerplate
    exceed the document-frequency cap and are dropped BEFORE the
    inverted-index self-join, so (a) the hottest join bucket is bounded and
    (b) documents related only through boilerplate produce no pairs, while a
    genuine near-dup pair (unique shared content) is still found."""
    from incubator_paimon_trino_spark.operators.dedup import (
        drop_stop_shingles,
        ngram_jaccard_pairs,
        shingles_from,
    )

    boiler = "all rights reserved by the example corporation of example city"
    rows = [(i, f"{boiler} unique tail number {i} alpha beta") for i in range(10)]
    # one genuine near-dup pair sharing unique (non-boilerplate) content
    dup = "completely original sentence about spark partition skew mitigation"
    rows += [(100, dup + " first"), (101, dup + " second")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    sh = shingles_from(docs)
    capped = drop_stop_shingles(sh, max_doc_freq=5)
    # every boilerplate-only shingle (df=10 > 5) is gone; per-shingle doc
    # frequency in the join input is bounded by the cap
    max_df = capped.groupBy("s").count().agg({"count": "max"}).collect()[0][0]
    assert max_df <= 5

    pairs = ngram_jaccard_pairs(docs, threshold=0.6, max_doc_freq=5)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (100, 101) in got
    # boilerplate-only relatives don't survive: their informative shingles
    # (unique tails) are disjoint
    assert all(a >= 100 for a, _ in got)


def test_kmeans_partitions_corpus_and_converges_sanely(spark):
    """Every vector assigned exactly once; clusters are used; a vector's
    final centroid is at least as close as the worst seed distance bound."""
    from incubator_paimon_trino_spark.operators.clustering import (
        _K,
        embedding_kmeans_assign,
    )

    out = embedding_kmeans_assign(spark, SF_ORACLE)
    rows = out.collect()
    assert len(rows) == len({r.vec_id for r in rows})  # one assignment each
    clusters = {r.cluster for r in rows}
    assert clusters <= set(range(_K)) and len(clusters) >= 2
    # seeds end at distance ~0 only if their centroid never moved; the real
    # invariant: distances are finite, non-negative, deterministic
    again = {(r.vec_id, r.cluster, r.dist_r) for r in embedding_kmeans_assign(spark, SF_ORACLE).collect()}
    assert {(r.vec_id, r.cluster, r.dist_r) for r in rows} == again
    assert all(r.dist_r >= 0 for r in rows)


def test_kmeans_beats_random_assignment(spark):
    """2 Lloyd rounds must give lower total distance than the seed-only
    (iteration-0) assignment — i.e. the update step actually improves."""
    from incubator_paimon_trino_spark.operators import clustering as km

    e = km._quantized(spark, SF_ORACLE)
    from pyspark.sql import functions as F

    seeds = e.filter(F.col("vec_id") < km._K).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("q").alias("c")
    )
    d0 = km._assign(e, seeds).agg(F.sum("d")).collect()[0][0]
    trained = km._update(km._assign(e, km._update(km._assign(e, seeds))))
    d2 = km._assign(e, trained).agg(F.sum("d")).collect()[0][0]
    assert d2 < d0


def test_chunk_repetition_counts_are_consistent(spark):
    from incubator_paimon_trino_spark.operators.dedup import dedup_chunk_repetition

    rows = dedup_chunk_repetition(spark, SF_ORACLE).collect()
    assert rows, "synthetic vocab should produce cross-doc repeated blocks"
    for r in rows:
        assert 0 < r.dup_chunks <= r.total_chunks
        assert 0 < r.dup_ratio <= 1.0


def test_quality_funnel_is_monotone(spark):
    from incubator_paimon_trino_spark.operators.text import text_quality_funnel

    rows = sorted(text_quality_funnel(spark, SF_ORACLE).collect(), key=lambda r: r.stage)
    counts = [r.surviving for r in rows]
    assert counts == sorted(counts, reverse=True)  # each gate only removes
    assert counts[0] > 0 and counts[-1] >= 0


def test_blocked_embedding_dedup_subset_and_recall(spark):
    """Blocked pairs must be a subset of the exact O(n^2) pair set with
    non-trivial recall. The driver embeddings are near-orthogonal random
    vectors (max pairwise cosine ~0.51) — the worst case for any blocking
    scheme, so the floor is modest; clustered real embeddings recall far
    more. The single most-similar pair must always co-cluster."""
    from incubator_paimon_trino_spark.operators.clustering import (
        dedup_embedding_cosine_blocked,
    )
    from incubator_paimon_trino_spark.operators.dedup import dedup_embedding_cosine

    exact = {(r.vec_a, r.vec_b): r.cosine_r for r in dedup_embedding_cosine(spark, SF_ORACLE).collect()}
    blocked = {(r.vec_a, r.vec_b) for r in dedup_embedding_cosine_blocked(spark, SF_ORACLE).collect()}
    assert exact and blocked
    assert blocked <= set(exact)
    assert len(blocked) / len(exact) >= 0.3
    top_pair = max(exact, key=exact.get)
    assert top_pair in blocked


def test_semantic_ivf_dedup_dominates_single_probe(spark):
    """Multi-probe semantic dedup must (a) stay a subset of the exact
    O(n^2) pair set, (b) contain EVERY pair the single-probe blocked dedup
    finds (probe 1 is the blocked cell, so multi-probe candidates are a
    superset by construction), and (c) with near-orthogonal driver
    embeddings — the blocking worst case — recall at least as much."""
    from incubator_paimon_trino_spark.operators.clustering import (
        dedup_embedding_cosine_blocked,
        dedup_semantic_ivf,
    )
    from incubator_paimon_trino_spark.operators.dedup import dedup_embedding_cosine

    exact = {(r.vec_a, r.vec_b) for r in dedup_embedding_cosine(spark, SF_ORACLE).collect()}
    blocked = {(r.vec_a, r.vec_b) for r in dedup_embedding_cosine_blocked(spark, SF_ORACLE).collect()}
    multi = {(r.vec_a, r.vec_b) for r in dedup_semantic_ivf(spark, SF_ORACLE).collect()}
    assert multi <= exact
    assert blocked <= multi
    assert len(multi) >= len(blocked)


def test_streaming_incremental_minhash_matches_batch_probe(spark):
    """The stream-fed near-dup pipeline must produce the exact verdicts of
    the batch probe over the same split (they share one oracle), and leave
    the consumer checkpointed past the processed tip."""
    from incubator_paimon_trino_spark.operators.dedup import (
        dedup_incremental_minhash_md5,
    )
    from incubator_paimon_trino_spark.operators.lake import (
        streaming_incremental_minhash,
    )

    streamed = {
        (r.doc_id, r.best_match, r.best_est, r.n_matches)
        for r in streaming_incremental_minhash(spark, SF_SMOKE).collect()
    }
    batch = {
        (r.doc_id, r.best_match, r.best_est, r.n_matches)
        for r in dedup_incremental_minhash_md5(spark, SF_SMOKE).collect()
    }
    assert streamed == batch and streamed


def test_pq_adc_ranks_sanely_vs_exact_l2(spark):
    """PQ/ADC top-10 must (a) be a dense self-excluding ranking and (b)
    recall far more of the exact integer-L2 top-10 than chance. Random
    near-orthogonal embeddings are PQ's worst case (measured ~13/50 here;
    chance is ~1/50), so the floor is modest."""
    import numpy as np
    import pandas as pd

    from incubator_paimon_trino_spark.operators.clustering import _SCALE, ann_pq_adc

    pq = ann_pq_adc(spark, SF_ORACLE).toPandas()
    assert set(pq.query_id) == set(range(5))
    for q in range(5):
        part = pq[pq.query_id == q]
        assert sorted(part.rnk) == list(range(1, 11))
        assert (part.neighbor_id != q).all()
        # ADC ascending with the ranking
        assert part.sort_values("rnk").adc.is_monotonic_increasing

    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    V = np.round(np.stack(emb.embedding.values).astype(np.float64) * _SCALE).astype(np.int64)
    ids = emb.vec_id.values
    total = 0
    for q in range(5):
        qi = np.where(ids == q)[0][0]
        d = ((V - V[qi]) ** 2).sum(axis=1)
        order = sorted(range(len(ids)), key=lambda i: (d[i], ids[i]))
        exact = {ids[i] for i in order if ids[i] != q}
        exact = set(list(sorted(exact, key=lambda v: (d[np.where(ids == v)[0][0]], v)))[:10])
        total += len(exact & set(pq[pq.query_id == q].neighbor_id))
    assert total >= 5


def test_ivfpq_consistent_with_pq_and_cell_restricted(spark):
    """IVF-PQ shares its codes with ann_pq_adc, so wherever both rank the
    same (query, neighbor) the ADC distances must be IDENTICAL; and every
    IVF-PQ neighbor must be coarse-assigned to one of the query's probed
    cells (the restriction is real, not cosmetic)."""
    from incubator_paimon_trino_spark.operators.clustering import (
        ann_ivfpq_probe,
        ann_pq_adc,
    )

    ivfpq = {(r.query_id, r.neighbor_id): r.adc for r in ann_ivfpq_probe(spark, SF_ORACLE).collect()}
    pq = {(r.query_id, r.neighbor_id): r.adc for r in ann_pq_adc(spark, SF_ORACLE).collect()}
    shared = set(ivfpq) & set(pq)
    assert shared, "top lists should overlap on at least one pair"
    assert all(ivfpq[k] == pq[k] for k in shared)
    # the cell restriction is real: every returned neighbor is coarse-
    # assigned to one of its query's probed cells (independent recompute of
    # the probes from the trained centroids)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from incubator_paimon_trino_spark.operators.clustering import _trained_cells

    e, cents, final = _trained_cells(spark, SF_ORACLE)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    dist = F.expr(
        "aggregate(zip_with(qq, c, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    w = W.partitionBy("query_id").orderBy("d", "cell")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("d", dist)
        .withColumn("r", F.row_number().over(w))
        .filter("r <= 2")
    )
    probed: dict[int, set[int]] = {}
    for r in probes.collect():
        probed.setdefault(r.query_id, set()).add(r.cell)
    cell_of = {r.vec_id: r.cell for r in final.select("vec_id", "cell").collect()}
    for qid, n in ivfpq:
        assert cell_of[n] in probed[qid], f"neighbor {n} outside query {qid}'s probes"


def test_incremental_semantic_consistent_with_multiprobe_pairs(spark):
    """The incremental semantic verdicts must agree with dedup_semantic_ivf
    on the same split: a new vector's matches are exactly its multi-probe
    pairs whose other side is a corpus (non-batch) vector."""
    from incubator_paimon_trino_spark.operators.clustering import (
        dedup_incremental_semantic,
        dedup_semantic_ivf,
    )

    pairs = {(r.vec_a, r.vec_b) for r in dedup_semantic_ivf(spark, SF_ORACLE).collect()}
    cross = {}
    for a, b in pairs:
        for new, cand in ((a, b), (b, a)):
            if new % 10 == 0 and cand % 10 != 0:
                cross.setdefault(new, set()).add(cand)
    inc = {r.vec_id: r for r in dedup_incremental_semantic(spark, SF_ORACLE).collect()}
    for vec, r in inc.items():
        expected = cross.get(vec, set())
        assert r.n_matches == len(expected)
        assert (r.best_match in expected) if expected else r.best_match == -1


def test_residual_ivfpq_beats_direct_coding(spark):
    """Residual coding is IVF-PQ's reason to exist: quantizing each
    vector's residual against its coarse centroid recalls MORE of the exact
    within-probed-cells L2 top-10 than coding raw vectors with the same
    codebook budget. Integer-exact arithmetic makes both values
    deterministic (measured 22 vs 18 of 50 on the driver embeddings)."""
    import numpy as np
    import pandas as pd

    from incubator_paimon_trino_spark.operators.clustering import (
        _SCALE,
        _trained_cells,
        ann_ivfpq_probe,
        ann_ivfpq_residual,
    )

    direct = ann_ivfpq_probe(spark, SF_ORACLE).toPandas()
    resid = ann_ivfpq_residual(spark, SF_ORACLE).toPandas()
    _, cents, final = _trained_cells(spark, SF_ORACLE)
    cell_of = {r.vec_id: r.cell for r in final.select("vec_id", "cell").collect()}
    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    V = np.round(np.stack(emb.embedding.values).astype(np.float64) * _SCALE).astype(np.int64)
    ids = emb.vec_id.values
    pos = {v: i for i, v in enumerate(ids)}
    codebook = {r.cell: np.array(r.c) for r in cents.collect()}

    def probed(qv):
        d = sorted((int(((V[pos[qv]] - c) ** 2).sum()), cell) for cell, c in codebook.items())
        return {cell for _, cell in d[:2]}

    tot_d = tot_r = 0
    for qv in range(5):
        cells = probed(qv)
        cand = [v for v in ids if v != qv and cell_of[v] in cells]
        exact = sorted(cand, key=lambda v: (int(((V[pos[v]] - V[pos[qv]]) ** 2).sum()), v))[:10]
        tot_d += len(set(exact) & set(direct[direct.query_id == qv].neighbor_id))
        tot_r += len(set(exact) & set(resid[resid.query_id == qv].neighbor_id))
    assert tot_r > tot_d, f"residual {tot_r} should beat direct {tot_d}"
    # both return dense self-excluding rankings
    for df in (direct, resid):
        for qv in range(5):
            part = df[df.query_id == qv]
            assert sorted(part.rnk) == list(range(1, 11))
            assert (part.neighbor_id != qv).all()


def test_kmeans_invariant_under_repartitioning(spark):
    """The scale claim made concrete: because every k-means step is
    integer-exact and order-independent, re-laying-out the corpus (as a
    different cluster size would) cannot change a single assignment."""
    from pyspark.sql import functions as F

    from incubator_paimon_trino_spark.operators import clustering as km

    e = km._quantized(spark, SF_ORACLE)
    seeds = e.filter(F.col("vec_id") < km._K).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("q").alias("c")
    )

    def run(parts):
        ep = e.repartition(parts)
        cents = seeds
        for _ in range(km._ITERS):
            cents = km._update(km._assign(ep, cents))
        return {(r.vec_id, r.cell, r.d) for r in km._assign(ep, cents).collect()}

    assert run(3) == run(17)


def test_packing_offsets_contiguous_and_straddle_consistent(spark):
    """Concat-offset packing invariants: per language the offset intervals
    tile the token stream exactly (no gaps/overlaps in doc_id order), and
    n_seqs equals the number of budget-sized sequences the interval touches."""
    from incubator_paimon_trino_spark.operators.packing import (
        SEQ_BUDGET,
        pack_concat_offsets,
        pack_sequence_stats,
    )

    rows = pack_concat_offsets(spark, SF_ORACLE).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for lang, docs in by_lang.items():
        docs.sort(key=lambda r: r.doc_id)
        expected_start = 0
        for r in docs:
            assert r.start_off == expected_start, (lang, r.doc_id)
            end = r.start_off + r.n_tokens
            assert r.first_seq == r.start_off // SEQ_BUDGET
            assert r.last_seq == (end - 1) // SEQ_BUDGET
            assert r.n_seqs == r.last_seq - r.first_seq + 1 >= 1
            expected_start = end

    # stats agree with the per-doc view
    stats = {r.lang: r for r in pack_sequence_stats(spark, SF_ORACLE).collect()}
    for lang, docs in by_lang.items():
        total = sum(r.n_tokens for r in docs)
        s = stats[lang]
        assert s.total_tokens == total
        assert s.n_seqs == (total + SEQ_BUDGET - 1) // SEQ_BUDGET
        assert s.tail_waste == s.n_seqs * SEQ_BUDGET - total


def test_shuffle_shard_deterministic_and_dense(spark):
    """Shard layout invariants: every doc gets exactly one (shard, pos);
    positions are dense 1..n per shard; a re-run (and a repartitioned input)
    produces the identical layout."""
    from incubator_paimon_trino_spark.operators.packing import N_SHARDS, train_shuffle_shard

    a = {r.doc_id: (r.shard, r.pos) for r in train_shuffle_shard(spark, SF_ORACLE).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in train_shuffle_shard(spark, SF_ORACLE).collect()}
    assert a == b and a
    shards = {}
    for shard, pos in a.values():
        assert 0 <= shard < N_SHARDS
        shards.setdefault(shard, []).append(pos)
    for shard, poss in shards.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_mix_domain_weights_invariants(spark):
    """Domain-mix invariants: deterministic across reruns/partitionings, a
    strict subset of the corpus, never upsamples a stratum past its size,
    and under-target strata (rate clamped to 1) keep EVERY row."""
    from incubator_paimon_trino_spark.operators.sampling import mix_domain_weights
    from incubator_paimon_trino_spark.sources import table

    got1 = {tuple(r) for r in mix_domain_weights(spark, SF_ORACLE).collect()}
    got2 = {tuple(r) for r in mix_domain_weights(spark, SF_ORACLE).collect()}
    assert got1 == got2  # md5 acceptance: rerun-stable

    docs = table(spark, SF_ORACLE, "documents")
    corpus = {
        (r.doc_id, r.lang, r.source) for r in docs.select("doc_id", "lang", "source").collect()
    }
    assert got1 <= corpus

    import collections

    kept = collections.Counter(lang for _, lang, _ in got1)
    have = collections.Counter(lang for _, lang, _ in corpus)
    total = sum(have.values())
    weights = {"en": 0.5, "de": 0.2, "fr": 0.15, "es": 0.1, "zh": 0.05}
    for lang, n_kept in kept.items():
        assert n_kept <= have[lang]
        rate = min(1.0, weights[lang] * total * 0.5 / have[lang])
        if rate == 1.0:  # under-target stratum: sampling must not drop rows
            assert n_kept == have[lang]
        else:  # md5 fraction is ~uniform: kept count near rate * stratum
            assert abs(n_kept - rate * have[lang]) <= 4 * (rate * have[lang]) ** 0.5 + 3


def test_unigram_logprob_invariants(spark):
    """Unigram-LM scoring invariants: probabilities are <= 1 so every score
    is negative; token counts reconcile with an independent tokenizer; docs
    made of rarer tokens score lower than pure-stopword docs."""
    from pyspark.sql import functions as F

    from incubator_paimon_trino_spark.operators.text import text_unigram_logprob
    from incubator_paimon_trino_spark.sources import table

    scored = text_unigram_logprob(spark, SF_ORACLE)
    rows = scored.collect()
    assert rows and all(r.avg_logprob < 0 for r in rows)

    # n_tokens must equal the straightforward count of alpha runs
    docs = table(spark, SF_ORACLE, "documents")
    expect = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
            ).alias("n"),
        ).collect()
    }
    got = {r.doc_id: r.n_tokens for r in rows}
    assert got == {k: v for k, v in expect.items() if v > 0} or got == expect
