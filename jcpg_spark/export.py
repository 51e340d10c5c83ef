"""Graph export sinks — DOT / GML / JSON (S4-S6).

Reference analog: ``CodePropertyGraph.java:84-381`` — the reference's only
user-facing output is writeDot/writeGml/writeJson over the in-memory
graph, numbering nodes by insertion order at export time (:95-113). Here
node ids are already stable content keys (schema.py), so exports are
deterministic under any partitioning, and the formats split by scale:

- ``write_json_graph``: the 100 TB path — nodes/edges as JSON Lines via
  the distributed writer (one file per partition, no driver collect),
  committed with the same manifest contract as ``io.write_table``.
- ``dot_per_conversation`` / ``gml_per_conversation``: a DataFrame
  (conv_id, dot|gml) with one self-contained document per conversation —
  a groupBy(conv_id) string aggregation, distributed, sinkable anywhere.
- ``to_dot`` / ``to_gml``: driver-side convenience for ONE conversation
  (debugging aid; bounded by the conversation's own size).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _esc(col):
    """Escape backslashes and double quotes for DOT/GML string literals."""
    return F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"), r'"', r'\\"')


def _dot_node_line():
    label = F.concat(
        F.col("kind"), F.lit(":"), F.coalesce(F.col("label"), F.lit(""))
    )
    return F.concat(
        F.lit('  "'), _esc(F.col("node_id")), F.lit('" [label="'), _esc(label), F.lit('"];')
    )


def _dot_edge_style():
    """Per-layer Graphviz attributes, mirroring the reference's edge-family
    styling (CodePropertyGraph.java:120-156): CDG purple-dashed, AST
    red-dashed, CFG green-dashed, call/return blue-dashed (each with
    arrowhead=empty), data-dependence use bold, def/redef bold brown —
    so a Graphviz user keeps the at-a-glance layer separation. Families
    are keyed on the predicate prefix (the pred vocabulary is this repo's
    layer naming; the mapping to the reference's CDG/AST/CFG/Call/DDG_U/
    DDG_D buckets is 1:1)."""
    p = F.col("pred")
    return (
        F.when(p.startswith("cdg."), F.lit("arrowhead=empty, color=purple, style=dashed, "))
        .when(p.startswith("ast."), F.lit("arrowhead=empty, color=red, style=dashed, "))
        .when(p.startswith("flow."), F.lit("arrowhead=empty, color=green, style=dashed, "))
        .when(p.isin("call", "return"), F.lit("arrowhead=empty, color=blue, style=dashed, "))
        .when(p == "ref.use", F.lit("style=bold, "))
        .when(p.isin("ref.redef", "ref.self"), F.lit("style=bold, color=brown, "))
        .otherwise(F.lit(""))
    )


def _dot_edge_line():
    label = F.concat(
        F.col("pred"),
        F.when(F.col("var").isNotNull(), F.concat(F.lit(" ("), F.col("var"), F.lit(")"))).otherwise(
            F.lit("")
        ),
    )
    return F.concat(
        F.lit('  "'), _esc(F.col("src")), F.lit('" -> "'), _esc(F.col("dst")),
        F.lit('" ['), _dot_edge_style(), F.lit('label="'), _esc(label), F.lit('"];'),
    )


def dot_per_conversation(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """-> (conv_id, dot): one self-contained digraph per conversation.

    Node statements cover the conversation-owned nodes; edges may reference
    global nodes (tool:/role:/e:), which DOT declares implicitly. Lines are
    sorted for determinism (the reference's insertion-order numbering is
    not reproducible in parallel; sorted content keys are).
    """
    n = nodes.filter(F.col("conv_id").isNotNull()).select(
        "conv_id", _dot_node_line().alias("line")
    )
    e = edges.filter(F.col("conv_id").isNotNull()).select(
        "conv_id", _dot_edge_line().alias("line")
    )
    lines = n.unionByName(e).groupBy("conv_id").agg(
        F.concat_ws("\n", F.sort_array(F.collect_list("line"))).alias("body")
    )
    return lines.select(
        "conv_id",
        F.concat(
            F.lit("digraph \""), _esc(F.col("conv_id")), F.lit("\" {\n"),
            F.col("body"), F.lit("\n}\n"),
        ).alias("dot"),
    )


def to_dot(nodes: DataFrame, edges: DataFrame, conv_id: str) -> str:
    """Driver-side DOT for a single conversation (debug aid)."""
    row = (
        dot_per_conversation(
            nodes.filter(F.col("conv_id") == conv_id), edges.filter(F.col("conv_id") == conv_id)
        )
        .collect()
    )
    return row[0]["dot"] if row else f'digraph "{conv_id}" {{\n\n}}\n'


def gml_per_conversation(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """-> (conv_id, gml). GML wants integer node ids: each node's id is its
    rank among the conversation's sorted node_ids (deterministic, computed
    with a window INSIDE the conversation — no global ordering pass);
    edges reference endpoints by quoted name via the GML 'name' attribute
    convention and carry source/target ranks for strict parsers.

    Global nodes (tool:/role:/e:/ns:, conv_id null) reached by a
    conversation's edges are DECLARED in that conversation's node section,
    ranked after the owned nodes — no undeclared sentinel ids, so the
    document parses standalone under strict GML (each conversation gets its
    own copy of the globals it references, exactly like the reference's
    per-graph export of shared type nodes).

    Per-node ``defs``/``uses`` attributes are emitted when present in the
    props bag (CodePropertyGraph.java:202-203,308-309 analog).
    """
    from pyspark.sql import Window

    owned = nodes.filter(F.col("conv_id").isNotNull()).select(
        "conv_id", "node_id", "kind", "props", F.lit(0).alias("is_global")
    )
    # globals referenced by this conversation's edges: endpoint ids joined
    # back against the global-node catalog (conv_id null)
    glob_catalog = nodes.filter(F.col("conv_id").isNull()).select(
        "node_id", "kind", "props"
    )
    endpoints = (
        edges.filter(F.col("conv_id").isNotNull())
        .select("conv_id", F.explode(F.array("src", "dst")).alias("node_id"))
        .distinct()
    )
    referenced_globals = endpoints.join(glob_catalog, "node_id").select(
        "conv_id", "node_id", "kind", "props", F.lit(1).alias("is_global")
    )
    w = Window.partitionBy("conv_id").orderBy("is_global", "node_id")
    n = owned.unionByName(referenced_globals).select(
        "conv_id", "node_id", "kind", "props", (F.row_number().over(w) - 1).alias("gid")
    )

    def _attr(key):
        v = F.col("props").getItem(key)
        return F.when(
            v.isNotNull(), F.concat(F.lit(f' {key} "'), _esc(v), F.lit('"'))
        ).otherwise(F.lit(""))

    node_lines = n.select(
        "conv_id",
        F.lit(0).alias("section"),
        F.concat(
            F.lit("  node [ id "), F.col("gid"), F.lit(' name "'), _esc(F.col("node_id")),
            F.lit('" kind "'), _esc(F.col("kind")), F.lit('"'),
            _attr("defs"), _attr("uses"), F.lit(" ]"),
        ).alias("line"),
        F.col("gid").alias("ord"),
    )
    ids = n.select("conv_id", "node_id", "gid")
    e = (
        edges.filter(F.col("conv_id").isNotNull())
        .join(ids.withColumnRenamed("node_id", "src").withColumnRenamed("gid", "sgid"),
              ["conv_id", "src"], "left")
        .join(ids.withColumnRenamed("node_id", "dst").withColumnRenamed("gid", "tgid"),
              ["conv_id", "dst"], "left")
    )
    edge_lines = e.select(
        "conv_id",
        F.lit(1).alias("section"),
        F.concat(
            F.lit("  edge [ source "), F.coalesce(F.col("sgid"), F.lit(-1)),
            F.lit(" target "), F.coalesce(F.col("tgid"), F.lit(-1)),
            F.lit(' sname "'), _esc(F.col("src")), F.lit('" tname "'), _esc(F.col("dst")),
            F.lit('" label "'), _esc(F.col("pred")), F.lit('" ]'),
        ).alias("line"),
        F.lit(0).alias("ord"),
    )
    lines = node_lines.unionByName(edge_lines)
    body = lines.groupBy("conv_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("section", "ord", "line"))),
                lambda s: s["line"],
            ),
        ).alias("body")
    )
    return body.select(
        "conv_id",
        F.concat(F.lit("graph [\n  directed 1\n"), F.col("body"), F.lit("\n]\n")).alias("gml"),
    )


def _xml_esc(col):
    """Escape the five XML-reserved characters for GraphML content and
    attribute values (& first so the encoding round-trips)."""
    out = F.regexp_replace(col, r"&", "&amp;")
    out = F.regexp_replace(out, r"<", "&lt;")
    out = F.regexp_replace(out, r">", "&gt;")
    out = F.regexp_replace(out, r'"', "&quot;")
    return F.regexp_replace(out, r"'", "&apos;")


_GRAPHML_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
    '  <key id="kind" for="node" attr.name="kind" attr.type="string"/>\n'
    '  <key id="label" for="edge" attr.name="label" attr.type="string"/>\n'
)


def graphml_per_conversation(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """-> (conv_id, graphml): one standalone GraphML document per
    conversation — the lingua-franca XML graph interchange (NetworkX /
    igraph / Gephi / yEd all read it), completing the sink family next to
    DOT/GML/JSON/N-Quads (reference: CodePropertyGraph.java exports
    DOT/GML/JSON; GraphML is the format its users convert to for graph
    IDEs). Same distributed shape as ``gml_per_conversation``: nodes keyed
    by their content node_id (GraphML ids are strings, so no integer-rank
    window is needed), globals referenced by the conversation's edges
    declared per document, node/edge lines assembled with one
    array_sort(collect_list) per conversation. All ids and values pass
    through ``_xml_esc`` — pytest-gated on hostile labels."""
    owned = nodes.filter(F.col("conv_id").isNotNull()).select(
        "conv_id", "node_id", "kind", F.lit(0).alias("is_global")
    )
    glob_catalog = nodes.filter(F.col("conv_id").isNull()).select("node_id", "kind")
    endpoints = (
        edges.filter(F.col("conv_id").isNotNull())
        .select("conv_id", F.explode(F.array("src", "dst")).alias("node_id"))
        .distinct()
    )
    referenced_globals = endpoints.join(glob_catalog, "node_id").select(
        "conv_id", "node_id", "kind", F.lit(1).alias("is_global")
    )
    n = owned.unionByName(referenced_globals)
    node_lines = n.select(
        "conv_id",
        F.lit(0).alias("section"),
        F.concat(
            F.lit('    <node id="'), _xml_esc(F.col("node_id")),
            F.lit('"><data key="kind">'), _xml_esc(F.col("kind")),
            F.lit("</data></node>"),
        ).alias("line"),
        F.concat(F.col("is_global").cast("string"), F.lit("|"), F.col("node_id")).alias("ord"),
    )
    edge_lines = edges.filter(F.col("conv_id").isNotNull()).select(
        "conv_id",
        F.lit(1).alias("section"),
        F.concat(
            F.lit('    <edge source="'), _xml_esc(F.col("src")),
            F.lit('" target="'), _xml_esc(F.col("dst")),
            F.lit('"><data key="label">'), _xml_esc(F.col("pred")),
            F.lit("</data></edge>"),
        ).alias("line"),
        F.lit("").alias("ord"),
    )
    lines = node_lines.unionByName(edge_lines)
    body = lines.groupBy("conv_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("section", "ord", "line"))),
                lambda s: s["line"],
            ),
        ).alias("body")
    )
    return body.select(
        "conv_id",
        F.concat(
            F.lit(_GRAPHML_HEADER),
            F.lit('  <graph id="'), _xml_esc(F.col("conv_id")),
            F.lit('" edgedefault="directed">\n'),
            F.col("body"),
            F.lit("\n  </graph>\n</graphml>\n"),
        ).alias("graphml"),
    )


def to_graphml(nodes: DataFrame, edges: DataFrame, conv_id: str) -> str:
    row = graphml_per_conversation(
        nodes.filter(F.col("conv_id") == conv_id),
        edges.filter(F.col("conv_id") == conv_id),
    ).collect()
    if row:
        return row[0]["graphml"]
    return (
        _GRAPHML_HEADER
        + f'  <graph id="{conv_id}" edgedefault="directed">\n'
        + "\n  </graph>\n</graphml>\n"
    )


def to_gml(nodes: DataFrame, edges: DataFrame, conv_id: str) -> str:
    row = (
        gml_per_conversation(
            nodes.filter(F.col("conv_id") == conv_id), edges.filter(F.col("conv_id") == conv_id)
        )
        .collect()
    )
    return row[0]["gml"] if row else "graph [\n  directed 1\n\n]\n"


def write_json_graph(nodes: DataFrame, edges: DataFrame, out_dir: str) -> dict:
    """Distributed JSON Lines export (S6, the scale path): ``nodes/`` and
    ``edges/`` JSONL directories + an atomic top-level manifest. No driver
    collect; one output file per partition."""
    nodes_path = os.path.join(out_dir, "nodes")
    edges_path = os.path.join(out_dir, "edges")
    nodes.write.mode("overwrite").json(nodes_path)
    edges.write.mode("overwrite").json(edges_path)
    spark = nodes.sparkSession
    manifest = {
        "format": "jsonl-graph/v1",
        "nodes": spark.read.json(nodes_path).count(),
        "edges": spark.read.json(edges_path).count(),
        "node_schema": [f.name for f in nodes.schema.fields],
        "edge_schema": [f.name for f in edges.schema.fields],
    }
    tmp = os.path.join(out_dir, "_GRAPH_MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, os.path.join(out_dir, "_GRAPH_MANIFEST.json"))
    return manifest


def read_json_graph(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.json(os.path.join(out_dir, "nodes")),
        spark.read.json(os.path.join(out_dir, "edges")),
    )


def _iri_esc(col):
    """Percent-encode the characters RDF 1.1 N-Triples/N-Quads forbids
    inside an IRIREF (space, angle brackets, double quote, backslash, and
    the escape character % itself first so the encoding round-trips).
    Node ids here are content keys over [a-z0-9:._-] so this is usually an
    identity map — the chain exists for hostile labels and is pytest-gated
    on crafted input."""
    out = F.regexp_replace(col, r"%", "%25")
    for ch, code in ((" ", "%20"), ("<", "%3C"), (">", "%3E"),
                     ('"', "%22"), (r"\\", "%5C")):
        out = F.regexp_replace(out, ("\\" + ch) if ch in '<>"' else ch, code)
    return out


def nquads_lines(edges: DataFrame) -> DataFrame:
    """-> (conv_id, line): one RDF 1.1 N-Quads statement per edge — the
    KG-native serialization of the triple tables (the reference's graph is
    consumed via DOT/GML/JSON exports, CodePropertyGraph.java:84-381; an
    RDF sink is the transcript-KG analog a downstream triple store loads
    directly). Terms live under the ``urn:jcpg:`` namespace; the edge's
    conversation is the statement's GRAPH LABEL (named-graph provenance,
    the per-conversation lineage the north rule requires), and global
    edges (conv_id null) land in the default graph as plain triples. A
    var-qualified edge keeps its qualifier as a ``#<var>`` fragment on the
    predicate IRI — deterministic, parsable, and lossless for the one
    qualifier the schema carries.

    Map-side only — ZERO exchanges on the edge scan: the 100 TB sink form
    is ``nquads_lines(e).select("line").write.text(path)``, one file per
    partition. ``nquads_per_conversation`` builds the grouped debug form
    on top.
    """
    # '#' is IRI-legal but delimits the var fragment here, so the PRED term
    # additionally encodes it (%23) — a hostile predicate must not alias
    # into a qualifier on read-back (read_nquads round-trip gate)
    pred_term = F.regexp_replace(_iri_esc(F.col("pred")), "#", "%23")
    pred_iri = F.concat(
        F.lit("urn:jcpg:pred:"),
        pred_term,
        F.when(
            F.col("var").isNotNull(), F.concat(F.lit("#"), _iri_esc(F.col("var")))
        ).otherwise(F.lit("")),
    ) if "var" in edges.columns else F.concat(
        F.lit("urn:jcpg:pred:"), pred_term
    )
    line = F.concat(
        F.lit("<urn:jcpg:"), _iri_esc(F.col("src")), F.lit("> <"),
        pred_iri, F.lit("> <urn:jcpg:"), _iri_esc(F.col("dst")), F.lit(">"),
        F.when(
            F.col("conv_id").isNotNull(),
            F.concat(F.lit(" <urn:jcpg:conv:"), _iri_esc(F.col("conv_id")), F.lit(">")),
        ).otherwise(F.lit("")),
        F.lit(" ."),
    )
    return edges.select("conv_id", line.alias("line"))


def nquads_per_conversation(edges: DataFrame) -> DataFrame:
    """-> (conv_id, nquads): one sorted, self-contained N-Quads document
    per conversation (the DOT/GML-family grouped form; sorted lines make
    the document deterministic under any partitioning)."""
    return (
        nquads_lines(edges.filter(F.col("conv_id").isNotNull()))
        .groupBy("conv_id")
        .agg(
            F.concat(
                F.concat_ws("\n", F.sort_array(F.collect_list("line"))),
                F.lit("\n"),
            ).alias("nquads")
        )
    )


def read_nquads(lines: DataFrame, col: str = "line") -> DataFrame:
    """-> (src, pred, dst, var, conv_id): parse ``nquads_lines`` output back
    into the edge relation (sink round-trip, like ``read_json_graph``).
    Percent-encoding reverses via ``url_decode`` (the encoder never emits
    '+', so the form-decoding caveat is moot); a statement without a graph
    label (default graph) yields conv_id null, one without a predicate
    fragment yields var null. Map-side only."""
    rx = (
        r"^<urn:jcpg:(.*?)> <urn:jcpg:pred:([^#>]*?)(?:#(.*?))?> "
        r"<urn:jcpg:(.*?)>(?: <urn:jcpg:conv:(.*?)>)? \.$"
    )

    def grp(i, name):
        v = F.regexp_extract(F.col(col), rx, i)
        v = F.when(v != "", F.url_decode(v))
        return v.alias(name)

    return lines.select(
        grp(1, "src"), grp(2, "pred"), grp(3, "var"), grp(4, "dst"),
        grp(5, "conv_id"),
    ).select("src", "pred", "dst", "var", "conv_id")


def reify_qualified(edges: DataFrame) -> DataFrame:
    """Standard RDF reification of var-QUALIFIED edges: plain triples pass
    through; each (s, p, o, var, conv) with a qualifier becomes a
    content-keyed statement node ``stmt:<md5>`` carrying four triples —
    rdf.subject / rdf.predicate / rdf.object plus ``qual.var`` with the
    qualifier payload. Downstream triple stores have no edge properties,
    so the N-Quads sink folds the qualifier into a predicate-IRI fragment
    (``nquads_lines``); this is the lossless alternative when the
    consumer needs the qualifier QUERYABLE as a first-class node (the
    RDF-star ``<< s p o >> qual v`` pattern lowered to RDF 1.1).

    Map-side only — ZERO exchanges: one filter + one 4-struct explode per
    qualified edge. Statement ids are md5 over the full (s, p, o, var,
    conv) content key, so re-runs, retries, and duplicate emissions of
    the same qualified assertion converge on the same node id (the
    content-key id rule the whole schema uses; reference keeps
    insertion-order ids, CodePropertyGraph.java:95-113, which no
    distributed or resumable run can reproduce).
    """
    sep = F.lit("\x1f")
    key = F.md5(
        F.concat(
            F.col("src"), sep, F.col("pred"), sep, F.col("dst"), sep,
            F.col("var"), sep, F.coalesce(F.col("conv_id"), F.lit("")),
        )
    )
    stmt = F.concat(F.lit("stmt:"), key)
    nul = F.lit(None).cast("string")
    q = edges.filter(F.col("var").isNotNull())
    plain = edges.filter(F.col("var").isNull()).select("src", "pred", "dst", "var", "conv_id")

    def t(pred_lit: str, dst_col):
        return F.struct(
            stmt.alias("src"), F.lit(pred_lit).alias("pred"), dst_col.alias("dst")
        )

    quads = q.select(
        F.explode(
            F.array(
                t("rdf.subject", F.col("src")),
                t("rdf.predicate", F.concat(F.lit("pred:"), F.col("pred"))),
                t("rdf.object", F.col("dst")),
                t("qual.var", F.concat(F.lit("v:"), F.col("var"))),
            )
        ).alias("r"),
        F.col("conv_id"),
    ).select(
        F.col("r.src").alias("src"),
        F.col("r.pred").alias("pred"),
        F.col("r.dst").alias("dst"),
        nul.alias("var"),
        "conv_id",
    )
    return plain.unionByName(quads)


def _json_esc(col):
    """JSON string-literal escaping for the id/pred vocabulary: backslash
    first, then quote (the only two that occur in IRIs this KG emits —
    control characters cannot appear in its content-keyed ids)."""
    return F.regexp_replace(
        F.regexp_replace(col, r"\\", r"\\\\"), '"', r"\\\""
    )


def jsonld_per_conversation(edges: DataFrame) -> DataFrame:
    """-> (conv_id, jsonld): one compacted JSON-LD document per
    conversation — ``@context`` maps the default vocabulary to the
    ``urn:jcpg:pred:`` namespace, ``@graph`` lists each subject node
    with its predicates as keys and ``{"@id": ...}`` object arrays
    (var qualifiers ride the predicate key as a ``#<var>`` fragment,
    the N-Quads convention, with literal '#' in a predicate
    %23-encoded so it cannot alias into a qualifier). Everything is
    SORTED (objects per predicate, predicates per node, nodes per
    graph), so the document is byte-deterministic under any
    partitioning — same grammar discipline as the DOT/GML/GraphML/
    N-Quads sinks, hand-assembled so the exact-string oracle mirrors
    it clause by clause.

    Three conversation-co-partitioned aggregations (object lists,
    predicate maps, node lists) — one exchange chain keyed by conv_id.
    """
    e = edges.filter(F.col("conv_id").isNotNull())
    pred_term = F.regexp_replace(_json_esc(F.col("pred")), "#", "%23")
    pred_key = F.concat(
        pred_term,
        F.when(
            F.col("var").isNotNull(), F.concat(F.lit("#"), _json_esc(F.col("var")))
        ).otherwise(F.lit("")),
    ) if "var" in e.columns else pred_term
    d1 = (
        e.select("conv_id", "src", pred_key.alias("pk"), "dst")
        .groupBy("conv_id", "src", "pk")
        .agg(F.sort_array(F.collect_list("dst")).alias("ds"))
    )
    prop = F.concat(
        F.lit('"'), F.col("pk"), F.lit('":['),
        F.concat_ws(
            ",",
            F.transform(
                F.col("ds"),
                lambda x: F.concat(F.lit('{"@id":"urn:jcpg:'), _json_esc(x), F.lit('"}')),
            ),
        ),
        F.lit("]"),
    )
    nodes = (
        d1.select("conv_id", "src", prop.alias("prop"))
        .groupBy("conv_id", "src")
        .agg(
            F.concat(
                F.lit('{"@id":"urn:jcpg:'), _json_esc(F.first("src")), F.lit('",'),
                F.concat_ws(",", F.sort_array(F.collect_list("prop"))),
                F.lit("}"),
            ).alias("node")
        )
    )
    return nodes.groupBy("conv_id").agg(
        F.concat(
            F.lit('{"@context":{"@vocab":"urn:jcpg:pred:"},"@id":"urn:jcpg:conv:'),
            _json_esc(F.first("conv_id")),
            F.lit('","@graph":['),
            F.concat_ws(",", F.sort_array(F.collect_list("node"))),
            F.lit("]}"),
        ).alias("jsonld")
    )
