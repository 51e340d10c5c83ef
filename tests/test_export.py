"""Round-trip tests for the DOT/GML/JSON export sinks (S4-S6,
CodePropertyGraph.java:84-381 analog) and the production dictionary
reader (S3, JavacpgDDGBuilder.java:163-256 analog)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from jcpg_spark import export
from jcpg_spark.pipeline import build_graph
from jcpg_spark.synth import synth_transcripts

DOT_EDGE = re.compile(
    r'^  "((?:[^"\\]|\\.)*)" -> "((?:[^"\\]|\\.)*)" '
    r'\[((?:\w+=\w+, )*)label="((?:[^"\\]|\\.)*)"\];$'
)
DOT_NODE = re.compile(r'^  "((?:[^"\\]|\\.)*)" \[label="((?:[^"\\]|\\.)*)"\];$')

# per-layer Graphviz styling parity with the reference
# (CodePropertyGraph.java:120-156); keyed on predicate family
DOT_STYLE_BY_FAMILY = {
    "cdg.": "arrowhead=empty, color=purple, style=dashed, ",
    "ast.": "arrowhead=empty, color=red, style=dashed, ",
    "flow.": "arrowhead=empty, color=green, style=dashed, ",
    "call": "arrowhead=empty, color=blue, style=dashed, ",
    "return": "arrowhead=empty, color=blue, style=dashed, ",
    "ref.use": "style=bold, ",
    "ref.redef": "style=bold, color=brown, ",
    "ref.self": "style=bold, color=brown, ",
}


def _want_style(pred: str) -> str:
    for fam, style in DOT_STYLE_BY_FAMILY.items():
        if pred == fam or (fam.endswith(".") and pred.startswith(fam)):
            return style
    return ""


def _unesc(s: str) -> str:
    return s.replace('\\"', '"').replace("\\\\", "\\")


@pytest.fixture(scope="module")
def graph3(spark, dictionary):
    t = synth_transcripts(spark, 3, skew=False).persist()
    t.count()
    res = build_graph(spark, t, dictionary)
    for df in (res.nodes, res.edges):
        df.persist().count()
    return res


def test_dot_roundtrip_three_conversations(spark, graph3):
    res = graph3
    per_conv = {r.conv_id: r.dot for r in export.dot_per_conversation(res.nodes, res.edges).collect()}
    assert len(per_conv) == 3

    want_edges = {
        (r.src, r.dst, r.pred, r.var, r.conv_id)
        for r in res.edges.filter(F.col("conv_id").isNotNull()).collect()
    }
    got_edges = set()
    for conv, dot in per_conv.items():
        assert dot.startswith(f'digraph "{conv}" {{') and dot.rstrip().endswith("}")
        for line in dot.splitlines():
            m = DOT_EDGE.match(line)
            if m:
                label = _unesc(m.group(4))
                pm = re.match(r"^(.*?)(?: \((.*)\))?$", label)
                got_edges.add((_unesc(m.group(1)), _unesc(m.group(2)), pm.group(1), pm.group(2), conv))
                # layer styling parity (CodePropertyGraph.java:120-156)
                assert m.group(3) == _want_style(pm.group(1)), line
    assert got_edges == want_edges

    # node statements cover exactly the conversation-owned nodes
    want_nodes = {
        r.node_id for r in res.nodes.filter(F.col("conv_id").isNotNull()).collect()
    }
    got_nodes = {
        _unesc(m.group(1))
        for dot in per_conv.values()
        for line in dot.splitlines()
        if (m := DOT_NODE.match(line))
    }
    assert got_nodes == want_nodes


def test_to_dot_single_conversation_matches_batch(spark, graph3):
    res = graph3
    conv = res.edges.filter(F.col("conv_id").isNotNull()).select("conv_id").first()[0]
    single = export.to_dot(res.nodes, res.edges, conv)
    batch = {r.conv_id: r.dot for r in export.dot_per_conversation(res.nodes, res.edges).collect()}
    assert single == batch[conv]


def test_gml_roundtrip_ids_consistent(spark, graph3):
    res = graph3
    out = {r.conv_id: r.gml for r in export.gml_per_conversation(res.nodes, res.edges).collect()}
    node_rx = re.compile(r'^  node \[ id (\d+) name "((?:[^"\\]|\\.)*)" kind "')
    edge_rx = re.compile(r'^  edge \[ source (-?\d+) target (-?\d+) sname "((?:[^"\\]|\\.)*)" tname "((?:[^"\\]|\\.)*)"')
    for conv, gml in out.items():
        assert gml.startswith("graph [\n  directed 1")
        ids = {}
        for line in gml.splitlines():
            if (m := node_rx.match(line)):
                ids[int(m.group(1))] = _unesc(m.group(2))
        assert sorted(ids) == list(range(len(ids)))  # dense 0..n-1
        for line in gml.splitlines():
            if (m := edge_rx.match(line)):
                s, t = int(m.group(1)), int(m.group(2))
                # every endpoint — including global tool:/role:/e:/ns: nodes —
                # must be DECLARED in this conversation's node section (no
                # undeclared -1 sentinels; strict-GML validity)
                assert s >= 0 and t >= 0
                assert ids[s] == _unesc(m.group(3))
                assert ids[t] == _unesc(m.group(4))
        # the graph references global nodes, so some must have been declared
        assert any(name.split(":")[0] in ("tool", "role", "e", "ns") for name in ids.values())


def test_json_graph_roundtrip(spark, graph3, tmp_path):
    res = graph3
    out = str(tmp_path / "graph")
    manifest = export.write_json_graph(res.nodes, res.edges, out)
    n2, e2 = export.read_json_graph(spark, out)
    assert manifest["nodes"] == res.nodes.count() == n2.count()
    assert manifest["edges"] == res.edges.count() == e2.count()
    want = {(r.src, r.pred, r.dst, r.var, r.conv_id) for r in res.edges.collect()}
    got = {
        (r.src, r.pred, r.dst, getattr(r, "var", None), getattr(r, "conv_id", None))
        for r in e2.collect()
    }
    assert got == want


def test_read_dictionary_roundtrip_and_defaults(spark, tmp_path):
    from jcpg_spark.sources.transcripts import read_dictionary

    path = str(tmp_path / "dict")
    spark.createDataFrame(
        [
            ("db", "tool_db", "db", "tool", 0.9, True),
            ("db", "tool_db", "db", "tool", 0.4, None),  # dup, lower prior, null bit
            ("alpha", "ent_a", None, None, None, None),
        ],
        "surface string, canonical string, namespace string, kind string, prior double, defs_state boolean",
    ).write.parquet(path)
    d = read_dictionary(spark, path)
    rows = {r.surface: r for r in d.collect()}
    assert rows["db"].prior == 0.9 and rows["db"].defs_state is True
    assert rows["alpha"].defs_state is False
    # usable by the linking stage end-to-end
    from jcpg_spark.operators import linking, mentions

    t = spark.createDataFrame(
        [("c1", 0, "user", "alpha and db", None, None)],
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    m = mentions.detect_mentions(spark, t, ["alpha", "db"])
    linked = linking.link_mentions(m, d)
    assert {r.canonical for r in linked.collect()} == {"ent_a", "tool_db"}


def test_nquads_lines_escaping_and_default_graph(spark):
    """IRI-unsafe characters percent-encode (with % first so it round-trips),
    null conv_id lands in the default graph as a plain triple, and a var
    qualifier rides the predicate IRI as a fragment."""
    from jcpg_spark import export

    edges = spark.createDataFrame(
        [
            ('a b<c>"d\\e%f', "flow.next", "t2", None, "conv 1"),
            ("t1", "flow.branch_true", "t2", "db", None),
        ],
        "src string, pred string, dst string, var string, conv_id string",
    )
    lines = {r["line"] for r in export.nquads_lines(edges).collect()}
    assert (
        '<urn:jcpg:a%20b%3Cc%3E%22d%5Ce%25f> <urn:jcpg:pred:flow.next> '
        "<urn:jcpg:t2> <urn:jcpg:conv:conv%201> ." in lines
    )
    # default graph: exactly three terms, var as predicate fragment
    assert (
        "<urn:jcpg:t1> <urn:jcpg:pred:flow.branch_true#db> <urn:jcpg:t2> ."
        in lines
    )


def test_nquads_per_conversation_sorted_deterministic(spark, graph3):
    from jcpg_spark import export

    edges = graph3.edges
    docs = {r["conv_id"]: r["nquads"]
            for r in export.nquads_per_conversation(edges).collect()}
    assert docs, "no documents"
    for conv, doc in docs.items():
        body = doc.rstrip("\n").split("\n")
        assert body == sorted(body)
        assert all(line.endswith(" .") for line in body)
        assert all(f"<urn:jcpg:conv:{conv}>" in line for line in body)
    docs2 = {r["conv_id"]: r["nquads"]
             for r in export.nquads_per_conversation(edges.repartition(5)).collect()}
    assert docs == docs2


def test_nquads_roundtrip_read_nquads(spark, graph3):
    """read_nquads(nquads_lines(e)) == e, including percent-encoded terms,
    default-graph statements (conv_id null), and var-less edges."""
    from jcpg_spark import export

    edges = graph3.edges.select("src", "pred", "dst", "var", "conv_id")
    back = export.read_nquads(export.nquads_lines(edges))
    a = sorted(map(tuple, edges.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    hostile = spark.createDataFrame(
        [('a b<c>"d\\e%f', "p p", "t 2", "v#1x", None),
         ("s", "q#frag", "o", None, "conv 9"),     # '#' in pred must not
         ("s2", "q#frag", "o2", "v2", "conv 9")],  # alias into a var
        "src string, pred string, dst string, var string, conv_id string",
    )
    back2 = sorted(map(tuple, export.read_nquads(export.nquads_lines(hostile)).collect()))
    assert back2 == sorted(map(tuple, hostile.collect()))


def test_graphml_roundtrip_parses_and_declares_globals(spark, graph3):
    """Every per-conversation GraphML document must parse as XML, declare
    every edge endpoint (including referenced globals) as a node, and
    carry the kind/label data keys."""
    import xml.etree.ElementTree as ET

    res = graph3
    out = {r.conv_id: r.graphml
           for r in export.graphml_per_conversation(res.nodes, res.edges).collect()}
    assert out
    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    for conv, doc in out.items():
        root = ET.fromstring(doc)
        graph = root.find("g:graph", ns)
        assert graph is not None and graph.get("edgedefault") == "directed"
        node_ids = {n.get("id") for n in graph.findall("g:node", ns)}
        kinds = {n.get("id"): n.find("g:data", ns).text
                 for n in graph.findall("g:node", ns)}
        assert all(kinds.values())
        edges = graph.findall("g:edge", ns)
        assert edges
        for e in edges:
            assert e.get("source") in node_ids, e.get("source")
            assert e.get("target") in node_ids, e.get("target")
            assert e.find("g:data", ns).text  # label
        # globals (tool:/role:/e:/ns:) referenced by edges are declared
        assert any(i.split(":")[0] in ("tool", "role", "e", "ns")
                   for i in node_ids)


def test_graphml_escapes_hostile_labels(spark):
    """XML-reserved characters in node ids / kinds / predicates must be
    entity-escaped so the document still parses and round-trips the raw
    strings."""
    import xml.etree.ElementTree as ET

    hostile = 'a<b>&"\'c'
    nodes = spark.createDataFrame(
        [("c1", hostile, "k<&>", None), ("c1", "plain", "turn", None)],
        "conv_id string, node_id string, kind string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [("c1", hostile, "plain", 'p&<"x')],
        "conv_id string, src string, dst string, pred string",
    )
    doc = export.to_graphml(nodes, edges, "c1")
    root = ET.fromstring(doc)
    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    graph = root.find("g:graph", ns)
    ids = {n.get("id") for n in graph.findall("g:node", ns)}
    assert hostile in ids
    e = graph.find("g:edge", ns)
    assert e.get("source") == hostile and e.get("target") == "plain"
    assert e.find("g:data", ns).text == 'p&<"x'


def test_graphml_empty_conversation_is_valid_xml(spark):
    import xml.etree.ElementTree as ET

    nodes = spark.createDataFrame(
        [], "conv_id string, node_id string, kind string, props map<string,string>")
    edges = spark.createDataFrame(
        [], "conv_id string, src string, dst string, pred string")
    doc = export.to_graphml(nodes, edges, "nope")
    root = ET.fromstring(doc)
    assert root.tag.endswith("graphml")


def test_reify_qualified_roundtrip(spark):
    """Qualified edges lower to 4 statement triples with a deterministic
    content-keyed stmt node; plain edges pass through; the original
    qualified assertion is reconstructible by re-joining the 4 rows."""
    from pyspark.sql import functions as F

    from jcpg_spark.export import reify_qualified

    rows = [
        ("t:c:0", "call", "tool:db", "db", "c"),
        ("t:c:1", "flow.next", "t:c:2", None, "c"),
    ]
    edges = spark.createDataFrame(rows, ["src", "pred", "dst", "var", "conv_id"])
    out = reify_qualified(edges)
    got = [tuple(r) for r in out.collect()]
    plain = [g for g in got if not g[0].startswith("stmt:")]
    assert plain == [("t:c:1", "flow.next", "t:c:2", None, "c")]
    stmts = [g for g in got if g[0].startswith("stmt:")]
    assert len(stmts) == 4 and len({g[0] for g in stmts}) == 1
    by_pred = {g[1]: g[2] for g in stmts}
    assert by_pred == {
        "rdf.subject": "t:c:0",
        "rdf.predicate": "pred:call",
        "rdf.object": "tool:db",
        "qual.var": "v:db",
    }
    assert all(g[3] is None for g in stmts)
    # determinism: a second run emits the identical stmt id
    again = {g[0] for g in reify_qualified(edges).collect() if g[0].startswith("stmt:")}
    assert again == {stmts[0][0]}


def test_jsonld_parses_and_escapes(spark):
    """The JSON-LD document is valid JSON with the @context/@graph shape;
    hostile quotes/backslashes in ids and a '#' in a predicate escape
    without aliasing into a qualifier; qualifiers ride the pred key."""
    import json

    from jcpg_spark.export import jsonld_per_conversation

    rows = [
        ('t:"q":0', "flow.next", "t:c:1", None, "c"),
        ("t:c:1", "we#ird", "t:c:2", None, "c"),
        ("t:c:0", "call", "tool:db", "db", "c"),
        ("t:c:0", "call", "tool:s\\ash", "db", "c"),
    ]
    e = spark.createDataFrame(rows, ["src", "pred", "dst", "var", "conv_id"])
    doc = jsonld_per_conversation(e).first()["jsonld"]
    parsed = json.loads(doc)
    assert parsed["@context"] == {"@vocab": "urn:jcpg:pred:"}
    assert parsed["@id"] == "urn:jcpg:conv:c"
    by_id = {n["@id"]: n for n in parsed["@graph"]}
    assert 'urn:jcpg:t:"q":0' in by_id
    assert by_id["urn:jcpg:t:c:1"]["we%23ird"] == [{"@id": "urn:jcpg:t:c:2"}]
    call = by_id["urn:jcpg:t:c:0"]["call#db"]
    assert {o["@id"] for o in call} == {"urn:jcpg:tool:db", "urn:jcpg:tool:s\\ash"}
