"""Property-based tests (hypothesis): the distributed operators must agree
with trivially-correct single-process reference implementations on random
inputs — the strongest guard against fixpoint/window edge cases."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ror_etl_spark.operators.asof import asof_join
from ror_etl_spark.operators.rollup import ultimate_parent


# Acyclic forests: parent[i] <= i guarantees chains terminate at self-loops,
# so the expected mapping is a simple chase.
@st.composite
def forests(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    parents = [draw(st.integers(min_value=0, max_value=i)) for i in range(n)]
    return parents


def _chase(parents: list[int], i: int) -> int:
    while parents[i] != i:
        i = parents[i]
    return i


@given(forests())
@settings(max_examples=15, deadline=None)
def test_rollup_matches_reference_chase(spark, parents):
    edges = spark.createDataFrame(
        [(i, p) for i, p in enumerate(parents)], "id long, parent long"
    )
    got = {
        r["id"]: r["ultimate_parent"]
        for r in ultimate_parent(edges, max_depth=64).mapping.collect()
    }
    want = {i: _chase(parents, i) for i in range(len(parents))}
    assert got == want


@st.composite
def asof_inputs(draw):
    ts = st.integers(min_value=0, max_value=50)
    n_left = draw(st.integers(min_value=1, max_value=12))
    n_right = draw(st.integers(min_value=0, max_value=12))
    left = [(draw(st.integers(0, 2)), draw(ts), i) for i in range(n_left)]
    right = [
        (draw(st.integers(0, 2)), draw(ts), 100 + i, float(i)) for i in range(n_right)
    ]
    return left, right


@given(asof_inputs())
@settings(max_examples=15, deadline=None)
def test_asof_matches_reference_scan(spark, data):
    left_rows, right_rows = data
    left = spark.createDataFrame(left_rows, "k long, t long, lid long")
    right = spark.createDataFrame(right_rows, "k long, rt long, rid long, rv double")
    out = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="rt",
        right_values=["rv"],
        right_order=["rid"],
    )
    got = {r["lid"]: r["rv"] for r in out.collect()}

    def expected(k, t):
        # latest right at/before t for key k; ties broken by the operator's
        # sort order (last in (time, rid) order); rid increases with insert
        cands = [(rt, rid, rv) for (rk, rt, rid, rv) in right_rows if rk == k and rt <= t]
        if not cands:
            return None
        return max(cands)[2]

    want = {lid: expected(k, t) for (k, t, lid) in left_rows}
    assert got == want
