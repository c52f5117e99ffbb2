"""neardup_clusters: connected-component cluster assignment over near-dup
pairs (alternating large-star / small-star). Verified against a pure-Python
union-find on hand graphs and hypothesis-random graphs, plus determinism
under partition layout and the singleton-docs join path."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from colly_spark.functions.dedup import neardup_clusters


def _uf_labels(n_nodes: set[int], pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Independent oracle: textbook union-find, min id as the label."""
    parent = {x: x for x in n_nodes}
    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


def _run(spark, pairs, docs_ids=None):
    pdf = spark.createDataFrame(
        [(a, b, 0.9) for a, b in pairs] or [(None, None, None)],
        "a long, b long, est_jaccard double",
    )
    if not pairs:
        pdf = pdf.where(F.col("a").isNotNull())
    docs = (
        spark.createDataFrame([(i,) for i in docs_ids], "doc_id long")
        if docs_ids is not None
        else None
    )
    out = neardup_clusters(pdf, docs=docs)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_chain_collapses_transitively(spark):
    # a~b, b~c, ... never directly compared ends still share a cluster
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_cycle(spark):
    got = _run(spark, [(10, 20), (20, 30), (30, 10), (7, 9)])
    assert got == {10: 10, 20: 10, 30: 10, 7: 7, 9: 7}


def test_singletons_via_docs_join(spark):
    got = _run(spark, [(2, 4)], docs_ids=[1, 2, 3, 4])
    assert got == {1: 1, 2: 2, 3: 3, 4: 2}


def test_empty_pairs_all_singletons(spark):
    got = _run(spark, [], docs_ids=[5, 6])
    assert got == {5: 5, 6: 6}


def test_long_chain_converges_in_log_rounds(spark):
    # 48-node path: the worst case for naive label propagation (needs 47
    # rounds); star alternation must finish well inside max_iter=64 and
    # the loud non-convergence raise must not fire
    n = 48
    got = _run(spark, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_deterministic_under_partition_layout(spark):
    pairs = [(1, 2), (2, 3), (9, 8), (5, 6), (6, 7), (7, 5), (3, 9)]
    pdf = spark.createDataFrame(pairs, "a long, b long")
    expected = _uf_labels({x for p in pairs for x in p}, pairs)
    for parts in (1, 7):
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in neardup_clusters(pdf.repartition(parts)).collect()
        }
        assert got == expected


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=40,
    )
)
def test_matches_union_find(spark_session_holder, edges):
    spark = spark_session_holder
    pairs = [(a, b) for a, b in edges if a != b]
    nodes = {x for p in pairs for x in p}
    got = _run(spark, pairs)
    assert got == _uf_labels(nodes, pairs)


# hypothesis can't take a pytest fixture through @given; bridge it
import pytest  # noqa: E402


@pytest.fixture(name="spark_session_holder", scope="session")
def _spark_session_holder(spark):
    return spark


def test_string_ids_reject_loudly(spark):
    # cast('long') on string keys would null every edge — a silent
    # wrong-answer; the function must reject non-integral id columns
    import pytest

    p = spark.createDataFrame([("a", "b")], "a string, b string")
    with pytest.raises(TypeError, match="integral"):
        neardup_clusters(p)
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    docs = spark.createDataFrame([("d1",)], "doc_id string")
    with pytest.raises(TypeError, match="integral"):
        neardup_clusters(pairs, docs=docs)
