"""Near-duplicate cluster consolidation (dedup_clusters): the LSH
verified-pair graph closed into components, every doc assigned a
cluster, one canonical survivor elected per cluster — checked EXACTLY
against a driver-side union-find + election over the same pair set
(reference: canonical_data.py's duplicate-group consolidation)."""

from pyspark.sql import functions as F

from horizon_etl_spark.queries.text import dedup_clusters, minhash_dedup

SF_DIR = "/root/testdata/sf0.01"


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def test_dedup_clusters_match_union_find(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup(spark, SF_DIR).select("doc_a", "doc_b").collect()
    ]
    assert pairs, "fixture invariant: sf0.01 must yield verified near-dup pairs"
    roots = _union_find(pairs)
    expect_multi = {}
    for node, root in roots.items():
        expect_multi.setdefault(root, set()).add(node)

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .collect()
    )
    quality = {r["doc_id"]: len(r["text"]) for r in docs}

    rows = dedup_clusters(spark, SF_DIR).collect()
    # exactly one row per document
    assert sorted(r["doc_id"] for r in rows) == sorted(quality)

    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    multi = {
        frozenset(x["doc_id"] for x in rs)
        for rs in by_cluster.values()
        if len(rs) > 1
    }
    # paired docs form EXACTLY the union-find components
    assert multi == {frozenset(s) for s in expect_multi.values()}
    # every unpaired doc is its own singleton cluster
    paired = set(roots)
    for rs in by_cluster.values():
        if len(rs) == 1:
            (r,) = rs
            assert r["doc_id"] not in paired
            assert r["cluster_id"] == r["doc_id"]
            assert r["canonical_doc"] == r["doc_id"]
            assert not r["is_duplicate"]

    # election: longest text wins, smallest doc_id breaks ties; the
    # dedup drop-set is exactly the non-canonical members
    for rs in by_cluster.values():
        members = [x["doc_id"] for x in rs]
        want = min(members, key=lambda d: (-quality[d], d))
        for r in rs:
            assert r["canonical_doc"] == want
            assert r["cluster_size"] == len(members)
            assert r["is_duplicate"] == (r["doc_id"] != want)
