"""Multi-relationship graph (reference: people_relationship_graph_
generator.py — three relationship families merged into one weighted
multigraph with per-type edge counters and degree rollups)."""

import json
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def families(spark):
    from horizon_etl_spark.queries.graph import relationship_families

    return relationship_families(spark, SF_DIR).persist()


def test_cosupply_family_matches_single_family_generator(spark, families):
    """The 'cosupply' family must equal the standalone cosupply edge
    generator (namespaced) — the multi-family path changes breadth,
    never single-family semantics."""
    from horizon_etl_spark.queries.relational import cosupply_edges

    fam = {
        (r["src"], r["dst"], r["w"])
        for r in families.filter(F.col("rel_type") == "cosupply").collect()
    }
    single = {
        (f"S{r['sa']}", f"S{r['sb']}", r["w"])
        for r in cosupply_edges(spark, SF_DIR).collect()
    }
    assert fam == single and fam


def test_merged_edges_carry_types_and_conserve_weight(spark, families):
    from horizon_etl_spark.queries.graph import (
        RELATION_TYPES,
        relationship_edges,
    )

    e = relationship_edges(spark, SF_DIR).persist()
    try:
        # weight conservation: merged total == sum of family weights
        fam_w = families.agg(F.sum("w")).collect()[0][0]
        assert e.agg(F.sum("weight")).collect()[0][0] == fam_w
        # per-type counters sum to the total weight on every edge, and
        # relation_types lists exactly the types with a nonzero counter
        bad = e.filter(
            sum(F.col(f"{t}_count") for t in RELATION_TYPES) != F.col("weight")
        ).count()
        assert bad == 0
        for r in e.sample(0.05, seed=7).collect():
            expect = sorted(
                t for t in RELATION_TYPES if r[f"{t}_count"] > 0
            )
            assert sorted(r["relation_types"]) == expect
            assert len(r["relation_types"]) == r["n_types"]
        # the breadth exists: some supplier pair carries >= 2 relation
        # types (co-supplying an order AND a part)
        assert e.filter(F.col("n_types") >= 2).count() > 0
        # trade edges are bipartite C->S
        trade = e.filter(F.col("trade_count") > 0)
        assert trade.filter(
            ~(F.col("src").startswith("C") & F.col("dst").startswith("S"))
        ).count() == 0
    finally:
        e.unpersist()


def test_degree_rollup_invariants(spark):
    from horizon_etl_spark.queries.graph import (
        relationship_degrees,
        relationship_edges,
    )

    e = relationship_edges(spark, SF_DIR)
    deg = relationship_degrees(spark, SF_DIR).persist()
    try:
        n_edges = e.count()
        total_w = e.agg(F.sum("weight")).collect()[0][0]
        sums = deg.agg(
            F.sum("degree").alias("d"), F.sum("weighted_degree").alias("wd")
        ).collect()[0]
        # handshake lemma on the merged simple graph
        assert sums["d"] == 2 * n_edges
        assert sums["wd"] == 2 * total_w
        kinds = {r["kind"] for r in deg.select("kind").distinct().collect()}
        assert kinds == {"supplier", "customer"}
    finally:
        deg.unpersist()


def test_summary_row_consistency(spark):
    """The driver row's 'all' entry must reconcile with the families:
    merged edges <= sum of family edges (pairs collapse), identical
    total weight, and a multi-type edge count matching the merged
    frame."""
    from horizon_etl_spark.queries import QUERIES
    from horizon_etl_spark.queries.graph import relationship_edges

    rows = {
        r["rel_type"]: r
        for r in QUERIES["relationship_graph_summary"](spark, SF_DIR).collect()
    }
    assert set(rows) == {"cosupply", "copart", "trade", "all"}
    fam_edges = sum(rows[t]["n_edges"] for t in ("cosupply", "copart", "trade"))
    fam_w = sum(rows[t]["total_weight"] for t in ("cosupply", "copart", "trade"))
    assert rows["all"]["n_edges"] <= fam_edges
    assert rows["all"]["total_weight"] == fam_w
    assert rows["all"]["multi_type_edges"] == fam_edges - rows["all"]["n_edges"]
    merged = relationship_edges(spark, SF_DIR)
    assert rows["all"]["multi_type_edges"] == merged.filter(
        F.col("n_types") >= 2
    ).count()
    for t in ("cosupply", "copart", "trade"):
        assert rows[t]["multi_type_edges"] == 0
        assert rows[t]["degree_md5"] and len(rows[t]["degree_md5"]) == 32


def test_relationship_graph_export_artifact(spark, tmp_path):
    """The published nodes/edges artifact carries the edge `type`
    payload (relation_types + per-family counters) — the reference's
    graph JSON edge attrs — behind the atomic symlink publish."""
    from horizon_etl_spark.exports import export_manifest
    from horizon_etl_spark.queries.graph import export_relationship_graph

    out = os.path.join(tmp_path, "exports")
    res = export_relationship_graph(spark, SF_DIR, out, source_version=3)
    link = os.path.join(out, "relationship_graph")
    assert os.path.islink(link)
    edges = spark.read.parquet(os.path.join(link, "edges"))
    nodes = spark.read.parquet(os.path.join(link, "nodes"))
    for col in ("cosupply_count", "copart_count", "trade_count",
                "weight", "relation_types"):
        assert col in edges.columns
    assert {"node", "kind", "degree", "weighted_degree"} <= set(nodes.columns)
    man = export_manifest(out, "relationship_graph")
    assert man["kind"] == "graph" and man["source_version"] == 3
    assert man["n_nodes"] == res["n_nodes"] == nodes.count()
    assert man["n_edges"] == res["n_edges"] == edges.count()
    # multi-type breadth survives the round trip
    assert edges.filter(F.size("relation_types") >= 2).count() > 0


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
    # canonical: every node -> min id of its component
    out = {}
    for x in list(parent):
        r = find(x)
        # min-id root is guaranteed by always hanging max under min
        out[x] = r
    return out


def test_connected_components_synthetic(spark):
    """Alternating large-star/small-star vs driver union-find on a
    graph with known structure: two chains, a clique, a 2-node island,
    adversarial id ordering."""
    from horizon_etl_spark.queries.graph import connected_components

    pairs = (
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(0, 40)]        # chain A
        + [(f"m{i:03d}", f"m{i + 1:03d}") for i in range(50, 90)]     # chain B
        + [(f"k{a}", f"k{b}") for a in range(5) for b in range(a)]    # clique
        + [("zz1", "zz0")]                                            # island
        + [("n000", "n020")]                                          # chord
    )
    expect = _union_find(pairs)
    df = spark.createDataFrame(pairs, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(spark, df).collect()
    }
    assert got == expect
    assert len(set(expect.values())) == 4  # chainA, chainB, clique, island


def test_connected_components_on_relationship_graph(spark):
    from horizon_etl_spark.queries.graph import (
        connected_components,
        relationship_edges,
    )

    e = relationship_edges(spark, SF_DIR)
    pairs = [(r["src"], r["dst"]) for r in e.select("src", "dst").collect()]
    expect = _union_find(pairs)
    got = {
        r["node"]: r["component"]
        for r in connected_components(spark, e).collect()
    }
    assert got == expect


def test_graph_stats_reconcile(spark):
    from horizon_etl_spark.queries.graph import (
        RELATION_TYPES,
        graph_stats,
        relationship_degrees,
        relationship_edges,
    )

    stats = graph_stats(spark, SF_DIR)
    e = relationship_edges(spark, SF_DIR).persist()
    try:
        assert stats["edges"] == e.count()
        assert stats["nodes"] == relationship_degrees(
            spark, SF_DIR, edges=e
        ).count()
        for t in RELATION_TYPES:
            assert (
                stats["relation_event_totals"][t]
                == e.agg(F.sum(f"{t}_count")).collect()[0][0]
            )
            assert (
                stats["edge_relation_presence"][t]
                == e.filter(F.col(f"{t}_count") > 0).count()
            )
        assert sum(stats["kind_distribution"].values()) == stats["nodes"]
        assert 1 <= stats["largest_component_size"] <= stats["nodes"]
        assert stats["connected_components"] >= 1
        top = stats["top_nodes_by_weighted_degree"]
        assert len(top) == min(20, stats["nodes"])
        wds = [t["weighted_degree"] for t in top]
        assert wds == sorted(wds, reverse=True)
    finally:
        e.unpersist()


def test_kind_subgraph_export_and_stats_manifest(spark, tmp_path):
    """Per-kind induced subgraph (the reference's per-classification
    graph exports) + graph_stats folded into the full graph's
    manifest."""
    from horizon_etl_spark.exports import export_manifest
    from horizon_etl_spark.queries.graph import export_relationship_graph

    out = os.path.join(tmp_path, "exports")
    export_relationship_graph(
        spark, SF_DIR, out, name="graph_full", with_stats=True
    )
    man = export_manifest(out, "graph_full")
    assert man["graph_stats"]["nodes"] == man["n_nodes"]
    assert man["graph_stats"]["edges"] == man["n_edges"]
    assert man["graph_stats"]["connected_components"] >= 1

    export_relationship_graph(spark, SF_DIR, out, name="graph_s", kind="supplier")
    edges = spark.read.parquet(os.path.join(out, "graph_s", "edges"))
    nodes = spark.read.parquet(os.path.join(out, "graph_s", "nodes"))
    bad = edges.filter(
        ~(F.col("src").startswith("S") & F.col("dst").startswith("S"))
    ).count()
    assert bad == 0 and edges.count() > 0
    assert nodes.filter(F.col("kind") != "supplier").count() == 0
    # induced: trade (C-S) edges are gone, so supplier degrees shrink
    assert export_manifest(out, "graph_s")["node_kind"] == "supplier"
    with pytest.raises(ValueError, match="full graph"):
        export_relationship_graph(
            spark, SF_DIR, out, name="x", kind="supplier", with_stats=True
        )


def test_job_graph_entrypoint(spark, tmp_path, capsys):
    """The deployable graph bundle (reference generate_all: full graph
    + one export per classification): evidence line reconciles with
    the published manifests."""
    import sys

    from horizon_etl_spark.exports import export_manifest

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import job_graph

    out = os.path.join(tmp_path, "exports")
    rc = job_graph.main(["--sf-dir", SF_DIR, "--out", out])
    assert rc == 0
    ev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    full = export_manifest(out, "relationship_graph")
    assert ev["full"]["n_edges"] == full["n_edges"]
    assert full["graph_stats"]["connected_components"] >= 1
    for kind, prefix in (("supplier", "S"), ("customer", "C")):
        assert kind in ev["kinds"]
        man = export_manifest(out, f"relationship_graph_{kind}")
        assert man["node_kind"] == kind
        edges = spark.read.parquet(
            os.path.join(out, f"relationship_graph_{kind}", "edges")
        )
        bad = edges.filter(
            ~(F.col("src").startswith(prefix) & F.col("dst").startswith(prefix))
        ).count()
        assert bad == 0
    # customer-only induced graph has no edges at all (every family is
    # S-S or C-S) -> publishes an empty-but-valid artifact
    assert ev["kinds"]["customer"]["n_edges"] == 0


def test_group_subgraph_bundle(spark, tmp_path):
    """Per-group bundle (reference research-group graph bundle +
    manifest): member nodes expand one trade-hop, roles annotated,
    induced edges only, atomic bundle manifest reconciles."""
    from horizon_etl_spark.exports import export_manifest
    from horizon_etl_spark.queries.graph import (
        export_group_subgraphs,
        relationship_edges,
    )

    sf = "/root/testdata/sf0.01"  # sf0.001 has only 10 suppliers total
    nat = spark.read.parquet(f"{sf}/nation.parquet")
    pick = sorted(r["n_name"] for r in nat.select("n_name").collect())[:3]
    out = os.path.join(tmp_path, "exports")
    bundle = export_group_subgraphs(
        spark, sf, out, groups=pick, max_groups=10
    )
    assert [g["group"] for g in bundle["graphs"]] == pick
    with open(os.path.join(out, "relationship_graph_nation_manifest.json")) as fh:
        assert json.load(fh) == bundle

    edges_all = relationship_edges(spark, sf).persist()
    try:
        for g in bundle["graphs"]:
            slug = g["group"].strip().lower().replace(" ", "_")
            name = f"relationship_graph_nation_{slug}"
            man = export_manifest(out, name)
            assert man["scope"]["group"] == g["group"]
            assert man["n_nodes"] == g["nodes"] and man["n_edges"] == g["edges"]
            nodes = spark.read.parquet(os.path.join(out, name, "nodes"))
            roles = {r["role"] for r in nodes.select("role").distinct().collect()}
            assert roles <= {"member", "trade_neighbor"}
            n_members = nodes.filter(F.col("role") == "member").count()
            # every member is exported (edgeless ones at degree 0), so
            # the artifact reconciles exactly with its manifest scope
            assert n_members == g["member_count"]
            assert g["nodes"] == g["expanded_node_count"]
            assert g["expanded_node_count"] >= g["member_count"]
            assert nodes.filter(F.col("degree").isNull()).count() == 0
            # induced: every artifact edge exists in the full graph and
            # joins two exported nodes
            sub_edges = spark.read.parquet(os.path.join(out, name, "edges"))
            ids = {r["node"] for r in nodes.select("node").collect()}
            for r in sub_edges.select("src", "dst").collect():
                assert r["src"] in ids and r["dst"] in ids
    finally:
        edges_all.unpersist()

    with pytest.raises(ValueError, match="max_groups"):
        export_group_subgraphs(spark, sf, out, max_groups=1)


def test_group_subgraphs_unknown_group_errors(spark, tmp_path):
    """A typo'd group name must raise, not silently export an empty
    bundle that reads as success."""
    from horizon_etl_spark.queries.graph import export_group_subgraphs

    with pytest.raises(ValueError, match="unknown group"):
        export_group_subgraphs(
            spark, "/root/testdata/sf0.01", os.path.join(tmp_path, "x"),
            groups=["BRAZIL ", "JAPPAN"],
        )


def test_group_subgraphs_zero_member_group_skipped(spark, tmp_path):
    """A REAL nation with no suppliers is a valid group, not a typo:
    requesting it yields a manifest entry marked skipped (no artifact,
    no error), so the bundle accounts for every group it was asked
    for.  sf0.001 has 10 suppliers across 25 nations, so zero-member
    nations are guaranteed to exist."""
    from horizon_etl_spark.queries.graph import export_group_subgraphs

    sf = "/root/testdata/sf0.001"
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    nat = spark.read.parquet(f"{sf}/nation.parquet")
    with_members = {
        r["n_nationkey"]
        for r in sup.select(F.col("s_nationkey").alias("n_nationkey"))
        .distinct()
        .collect()
    }
    empty = sorted(
        r["n_name"]
        for r in nat.collect()
        if r["n_nationkey"] not in with_members
    )
    assert empty, "fixture invariant: some nation has no suppliers"
    out = os.path.join(tmp_path, "exports")
    bundle = export_group_subgraphs(spark, sf, out, groups=[empty[0]])
    (entry,) = bundle["graphs"]
    assert entry["group"] == empty[0]
    assert entry["member_count"] == 0
    assert entry["skipped"] == "no member nodes"
    assert "path" not in entry
    slug = empty[0].strip().lower().replace(" ", "_")
    assert not os.path.exists(
        os.path.join(out, f"relationship_graph_nation_{slug}")
    )
