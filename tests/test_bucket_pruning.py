"""Hash-bucket file skipping for point lookups: an equality/IN predicate on
the bucket key plans only the file(s) of ``pmod(murmur3(v), n)`` — the
bucket id is recorded per manifest entry at commit time, so pruning stays
sound across bucket-count changes and mixed layouts.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from incubator_paimon_trino_spark.catalog import WarehouseCatalog
from incubator_paimon_trino_spark.functions.predicates import ColumnDomain


@pytest.fixture()
def cat(spark, tmp_path):
    return WarehouseCatalog(str(tmp_path / "wh"), spark)


def _rows(spark, keys):
    return spark.createDataFrame([(k, f"v{k}") for k in keys], "k int, v string")


def test_point_lookup_plans_one_bucket(cat, spark):
    cat.create_database("d")
    cat.create_table("d", "b", [("k", "int"), ("v", "string")],
                     options={"bucket": "8", "bucket_key": "k"})
    cat.insert_into("d", "b", _rows(spark, range(200)))
    all_files = cat.scan_plan("d.b")
    assert len(all_files) == 8
    assert all("bucket" in e and e["bucket_n"] == 8 for e in all_files)

    pred = [ColumnDomain("k", op="=", value=42)]
    hit = cat.scan_plan("d.b", predicate=pred)
    assert len(hit) == 1
    got = cat.read_table("d.b", predicate=pred).collect()
    assert [(r.k, r.v) for r in got] == [(42, "v42")]

    # IN over a few values: at most len(values) buckets
    pred_in = [ColumnDomain("k", in_values=[1, 2, 3])]
    assert len(cat.scan_plan("d.b", predicate=pred_in)) <= 3
    assert cat.read_table("d.b", predicate=pred_in).count() == 3


def test_bucket_count_change_stays_sound(cat, spark):
    cat.create_database("d")
    cat.create_table("d", "bc", [("k", "int"), ("v", "string")],
                     options={"bucket": "4", "bucket_key": "k"})
    cat.insert_into("d", "bc", _rows(spark, range(100)))
    cat.set_options("d", "bc", {"bucket": "8"})
    cat.insert_into("d", "bc", _rows(spark, range(100, 200)))

    pred = [ColumnDomain("k", op="=", value=7)]
    # one bucket from EACH layout generation may survive
    assert len(cat.scan_plan("d.bc", predicate=pred)) <= 2
    got = cat.read_table("d.bc", predicate=pred).collect()
    assert [(r.k, r.v) for r in got] == [(7, "v7")]


def test_pk_table_prunes_on_pk_only(cat, spark):
    cat.create_database("d")
    cat.create_table("d", "pk", [("k", "int"), ("v", "string")],
                     primary_key=["k"], options={"bucket": "4"})
    cat.insert_into("d", "pk", _rows(spark, range(50)))
    cat.insert_into("d", "pk",
                    spark.createDataFrame([(7, "updated")], "k int, v string"))

    pred = [ColumnDomain("k", op="=", value=7)]
    hit = cat.scan_plan("d.pk", predicate=pred)
    assert len(hit) < len(cat.scan_plan("d.pk"))
    rows = cat.read_table("d.pk", predicate=pred).collect()
    assert [(r.k, r.v) for r in rows] == [(7, "updated")]

    # value-column predicate must NOT bucket-prune a PK table
    vpred = [ColumnDomain("v", op="=", value="updated")]
    assert len(cat.scan_plan("d.pk", predicate=vpred)) == len(cat.scan_plan("d.pk"))


def test_range_and_null_predicates_do_not_bucket_prune(cat, spark):
    """Only exact equality/IN may bucket-prune; ranges and null-allowed
    domains must fall through to (sound) stats pruning alone."""
    cat.create_database("d")
    cat.create_table("d", "nb", [("k", "int"), ("v", "string")],
                     options={"bucket": "4", "bucket_key": "k"})
    cat.insert_into("d", "nb", _rows(spark, range(40)))
    from incubator_paimon_trino_spark.catalog.warehouse import _bucket_prune_values

    schema = cat.schema_of("d", "nb")
    from incubator_paimon_trino_spark.functions.predicates import Range

    rng = [ColumnDomain("k", ranges=[Range(0, 100, True, True)])]
    nullable = [ColumnDomain("k", op="=", value=3, null_allowed=True)]
    isnull = [ColumnDomain("k", is_null=True)]
    assert _bucket_prune_values(rng, schema) is None
    assert _bucket_prune_values(nullable, schema) is None
    assert _bucket_prune_values(isnull, schema) is None
    # a wide range (no bucket pruning possible) still reads everything
    assert cat.read_table("d.nb", predicate=rng).count() == 40


def test_bucket_rescale_via_set_options_and_compact(spark, tmp_path):
    """Paimon's offline bucket rescaling (change the bucket option, rewrite):
    expressible here as set_options + compact — the rewrite re-buckets the
    live set under the new count and point lookups prune to 1/new_n files,
    while pre-rescale snapshots keep their old layout for time travel."""
    from incubator_paimon_trino_spark.catalog import WarehouseCatalog
    from incubator_paimon_trino_spark.functions.predicates import ColumnDomain

    cat = WarehouseCatalog(str(tmp_path / "wh"), spark)
    cat.create_database("d")
    cat.create_table(
        "d", "t", [("k", "bigint"), ("v", "string")], options={"bucket": "2", "bucket_key": "k"}
    )
    df = spark.createDataFrame([(i, f"v{i}") for i in range(2000)], "k bigint, v string")
    cat.insert_into("d", "t", df)
    pred = [ColumnDomain("k", op="=", value=77)]
    assert len(cat.scan_plan("d.t")) == 2
    cat.set_options("d", "t", {"bucket": "8"})
    cat.compact("d", "t")
    assert len(cat.scan_plan("d.t")) == 8
    assert len(cat.scan_plan("d.t", predicate=pred)) == 1
    assert cat.read_table("d.t", predicate=pred).count() == 1
    assert cat.read_table("d.t").count() == 2000
    # the pre-rescale snapshot still reads (old layout untouched)
    assert cat.read_table("d.t", version_as_of=1).count() == 2000
