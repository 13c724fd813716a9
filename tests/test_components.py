"""Connected-components dedup resolution: transitivity on path graphs,
multiple components, convergence early-exit, and the drop materialization."""

import pandas as pd

from series_correction_project_updated_spark.operators.components import (
    connected_components,
    dedup_groups,
    drop_duplicates_by_pairs,
)


def _pairs(spark, edges):
    return spark.createDataFrame(pd.DataFrame(edges, columns=["doc_a", "doc_b"]))


def test_path_graph_requires_transitivity(spark):
    # 1-2-3-4-5 chain: naive pairwise grouping would give 4 groups of 2;
    # correct CC gives one component rooted at 1
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    comp = connected_components(pairs).toPandas().set_index("id")["component"]
    assert comp.to_dict() == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_multiple_components_and_star(spark):
    pairs = _pairs(spark, [(10, 11), (10, 12), (10, 13), (20, 21), (31, 30)])
    groups = (
        dedup_groups(_pairs(spark, [(10, 11), (10, 12), (10, 13), (20, 21), (31, 30)]))
        .toPandas()
        .set_index("rep_doc_id")["group_size"]
        .to_dict()
    )
    assert groups == {10: 4, 20: 2, 30: 2}
    comp = connected_components(pairs).toPandas()
    assert comp[comp.id == 30]["component"].iloc[0] == 30  # undirected edge


def test_drop_duplicates_by_pairs(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 99], "text": list("abcdef")})
    )
    out = drop_duplicates_by_pairs(docs, _pairs(spark, [(1, 2), (2, 3)]))
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 4, 5, 99]  # 2,3 dropped; isolated docs kept


def test_edge_pipeline_executes_once(spark):
    """The upstream pair-generation pipeline must run ONCE, not once per
    iteration (r2 verdict #3): edges are localCheckpoint'ed before the loop.
    A long chain forces many label-propagation iterations; an accumulator in
    a UDF on the pair source counts upstream executions."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    acc = spark.sparkContext.accumulator(0)

    @F.udf(T.LongType())
    def tick(x):
        acc.add(1)
        return x

    n = 12
    raw = _pairs(spark, [(i, i + 1) for i in range(n)])
    pairs = raw.select(tick("doc_a").alias("doc_a"), "doc_b")
    comp = connected_components(pairs, max_iter=30).toPandas()
    assert set(comp["component"]) == {0}  # one chain, rooted at 0
    # chain of 13 vertices needs ~log-to-linear iterations; without the edge
    # checkpoint the source would re-run per iteration (acc >> 2n). The union
    # evaluates the source twice (both edge directions), hence the 2n bound.
    assert acc.value <= 2 * n
