"""Plan-shape regression guards: the physical plans Catalyst produces for
the headline queries must keep the properties the engine is designed
around — pushdown into scans, no accidental nested-loop joins, top-k via
TakeOrderedAndProject. A refactor that silently loses one of these
regresses 100 TB behavior long before it changes local results."""

from __future__ import annotations

import contextlib
import io

import pytest

from ror_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMALL

load_all()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# every query here must plan without cartesian/nested-loop joins
NO_NESTED_LOOP = [
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q17_small_quantity",
    "q22_global_sales_opportunity",
    "q4_order_priority",
    "events_band_self_join",
    "dedup_ngram_jaccard",
    "join_theta",
]


@pytest.mark.parametrize("name", NO_NESTED_LOOP)
def test_no_nested_loop_join(spark, name):
    p = plan_of(spark, name)
    assert "CartesianProduct" not in p, name
    assert "BroadcastNestedLoop" not in p, name


def test_q1_pushdown_and_pruning(spark):
    p = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    # column pruning: the scan must not read join keys it doesn't need
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q6_all_filters_pushed(spark):
    p = plan_of(spark, "q6_forecast_revenue")
    pushed = next(l for l in p.splitlines() if "PushedFilters" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed


def test_global_topk_avoids_full_sort(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "topk_global")
    assert "TakeOrderedAndProject" in plan_of(spark, "q3_shipping_priority")


def test_rollup_fixpoint_truncates_lineage(spark):
    # after the fixpoint, the mapping's plan must hang off checkpointed
    # RDD scans, not re-derive the whole iteration chain
    p = plan_of(spark, "ultimate_parent_rollup")
    assert "Scan ExistingRDD" in p
