"""Graph query operators — the fn::* graph functions re-expressed.

The reference stores explicit ``edges(from, to, edge_type, weight)``
(schema/codegraph.surql:833-841).  The driver testdata has no edges
table, so two deterministic edge views are derived:

* ``lineitem`` edges: from = l_orderkey, to = l_partkey,
  edge_type = l_returnflag  (bipartite, high fan-out — degree/hub ops);
* ``part`` functional graph: from = p_partkey,
  to = (p_partkey * 37 + 11) mod (max(p_partkey)+1)  (has cycles —
  BFS / cycle ops).  Both definitions are replayed identically in the
  DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import max_key, t


def _lineitem_edges(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("from_id"),
        F.col("l_partkey").alias("to_id"),
        F.col("l_returnflag").alias("edge_type"),
    )


def degree_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree hash-agg: out/in counts merged per node, analog of
    fn::get_hub_nodes' two GROUP BYs + math::sum merge
    (schema/codegraph.surql:182-201)."""
    e = _lineitem_edges(spark, sf_dir)
    out_d = e.groupBy(F.col("from_id").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = e.groupBy(F.col("to_id").alias("node_id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "node_id", "full_outer")
        .select(
            "node_id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            (F.coalesce("out_degree", F.lit(0)) + F.coalesce("in_degree", F.lit(0))).alias(
                "degree"
            ),
        )
    )


DEGREE_COUNTS_SQL = """
WITH e AS (SELECT l_orderkey AS from_id, l_partkey AS to_id FROM lineitem),
     o AS (SELECT from_id AS node_id, count(*) AS out_degree FROM e GROUP BY 1),
     i AS (SELECT to_id AS node_id, count(*) AS in_degree FROM e GROUP BY 1)
SELECT coalesce(o.node_id, i.node_id) AS node_id,
       coalesce(out_degree, 0) AS out_degree,
       coalesce(in_degree, 0) AS in_degree,
       coalesce(out_degree, 0) + coalesce(in_degree, 0) AS degree
FROM o FULL OUTER JOIN i ON o.node_id = i.node_id
"""


def hub_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold + top-50 by degree, analog of fn::get_hub_nodes'
    ``WHERE total >= $min ORDER BY total DESC LIMIT 50``
    (schema/codegraph.surql:204-210)."""
    return (
        degree_counts(spark, sf_dir)
        .filter(F.col("degree") >= 2)
        .orderBy(F.desc("degree"), F.asc("node_id"))
        .limit(50)
    )


HUB_NODES_SQL = f"""
WITH d AS ({DEGREE_COUNTS_SQL})
SELECT * FROM d WHERE degree >= 2 ORDER BY degree DESC, node_id LIMIT 50
"""


def edge_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count by (node, edge_type), analog of fn::edge_types
    (schema/codegraph.surql:215-216)."""
    return (
        _lineitem_edges(spark, sf_dir)
        .groupBy(F.col("from_id").alias("node_id"), "edge_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


EDGE_TYPE_COUNTS_SQL = """
SELECT l_orderkey AS node_id, l_returnflag AS edge_type, count(*) AS n
FROM lineitem GROUP BY 1, 2
"""


def _part_edges(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    mx = max_key(spark, sf_dir, "part", "p_partkey") + 1
    return p.select(
        F.col("p_partkey").alias("from_id"),
        ((F.col("p_partkey") * 37 + 11) % F.lit(mx)).alias("to_id"),
    )


_PART_EDGES_SQL = """
SELECT p_partkey AS from_id,
       (p_partkey * 37 + 11) % (SELECT max(p_partkey) + 1 FROM part) AS to_id
FROM part
"""


def _involution_edges(spark, sf_dir):
    """Edges guaranteed to contain 2-cycles: to = (M - p) mod M is an
    involution, so (a, M-a) and (M-a, a) both exist."""
    p = t(spark, sf_dir, "part")
    mx = max_key(spark, sf_dir, "part", "p_partkey") + 1
    return p.select(
        F.col("p_partkey").alias("from_id"),
        ((F.lit(mx) - F.col("p_partkey")) % F.lit(mx)).alias("to_id"),
    )


_INVOLUTION_EDGES_SQL = """
SELECT p_partkey AS from_id,
       ((SELECT max(p_partkey) + 1 FROM part) - p_partkey)
         % (SELECT max(p_partkey) + 1 FROM part) AS to_id
FROM part
"""


def cycle_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-edge cycle detection: keep (a,b) where (b,a) also exists,
    a < b to dedup — the O(E) set-membership rewrite of
    fn::detect_circular_dependencies (schema/codegraph.surql:105-158)."""
    e = _involution_edges(spark, sf_dir)
    rev = e.select(
        F.col("to_id").alias("from_id"), F.col("from_id").alias("to_id")
    )
    return (
        e.join(rev, ["from_id", "to_id"], "left_semi")
        .filter(F.col("from_id") < F.col("to_id"))
        .select(F.col("from_id").alias("a"), F.col("to_id").alias("b"))
    )


CYCLE_DETECT_SQL = f"""
WITH e AS ({_INVOLUTION_EDGES_SQL})
SELECT e.from_id AS a, e.to_id AS b
FROM e
WHERE EXISTS (SELECT 1 FROM e r WHERE r.from_id = e.to_id AND r.to_id = e.from_id)
  AND e.from_id < e.to_id
"""


BFS_MAX_DEPTH = 5  # the reference's depth cap (schema/codegraph.surql:254-276)


def transitive_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS (depth ≤ 5, matching the reference cap) with
    min-depth dedup, analog of fn::get_transitive_dependencies' iterated
    self-join + math::min GROUP BY (schema/codegraph.surql:254-276).
    Start node = 1.  Frontiers are level DataFrames — each level is one
    shuffle join; min-depth dedup happens once at the end (cheaper than
    per-level distinct at this depth)."""
    e = _part_edges(spark, sf_dir).persist()
    try:
        levels = []
        frontier = e.filter(F.col("from_id") == 1).select(
            F.col("to_id").alias("node_id"), F.lit(1).alias("depth")
        )
        levels.append(frontier)
        for depth in range(2, BFS_MAX_DEPTH + 1):
            frontier = (
                e.join(frontier.select(F.col("node_id").alias("from_id")).distinct(),
                       "from_id")
                .select(F.col("to_id").alias("node_id"), F.lit(depth).alias("depth"))
            )
            levels.append(frontier)
        out = levels[0]
        for lvl in levels[1:]:
            out = out.unionByName(lvl)
        return (
            out.filter(F.col("node_id") != 1)
            .groupBy("node_id")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=True)
        )
    finally:
        e.unpersist()


def reverse_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse-direction bounded BFS (depth ≤ 5) with min-depth dedup —
    fn::get_reverse_dependencies (schema/codegraph.surql:231-253): the
    level-by-level "which nodes can REACH me" walk, i.e.
    ``transitive_deps`` with the join direction swapped (edges are
    traversed to→from).  Target node = 1."""
    e = _part_edges(spark, sf_dir)
    rev = e.select(
        F.col("to_id").alias("from_id"), F.col("from_id").alias("to_id")
    ).persist()
    try:
        levels = []
        frontier = rev.filter(F.col("from_id") == 1).select(
            F.col("to_id").alias("node_id"), F.lit(1).alias("depth")
        )
        levels.append(frontier)
        for depth in range(2, BFS_MAX_DEPTH + 1):
            frontier = (
                rev.join(
                    frontier.select(F.col("node_id").alias("from_id")).distinct(),
                    "from_id",
                )
                .select(F.col("to_id").alias("node_id"), F.lit(depth).alias("depth"))
            )
            levels.append(frontier)
        out = levels[0]
        for lvl in levels[1:]:
            out = out.unionByName(lvl)
        return (
            out.filter(F.col("node_id") != 1)
            .groupBy("node_id")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=True)
        )
    finally:
        rev.unpersist()


REVERSE_DEPS_SQL = f"""
WITH e AS (SELECT to_id AS from_id, from_id AS to_id FROM ({_PART_EDGES_SQL})),
     l1 AS (SELECT to_id AS node_id, 1 AS depth FROM e WHERE from_id = 1),
     f1 AS (SELECT DISTINCT node_id FROM l1),
     l2 AS (SELECT e.to_id AS node_id, 2 AS depth FROM e JOIN f1 ON e.from_id = f1.node_id),
     f2 AS (SELECT DISTINCT node_id FROM l2),
     l3 AS (SELECT e.to_id AS node_id, 3 AS depth FROM e JOIN f2 ON e.from_id = f2.node_id),
     f3 AS (SELECT DISTINCT node_id FROM l3),
     l4 AS (SELECT e.to_id AS node_id, 4 AS depth FROM e JOIN f3 ON e.from_id = f3.node_id),
     f4 AS (SELECT DISTINCT node_id FROM l4),
     l5 AS (SELECT e.to_id AS node_id, 5 AS depth FROM e JOIN f4 ON e.from_id = f4.node_id)
SELECT node_id, min(depth) AS depth
FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
      UNION ALL SELECT * FROM l4 UNION ALL SELECT * FROM l5)
WHERE node_id != 1
GROUP BY node_id
"""


def trace_call_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-RECONSTRUCTING bounded BFS — fn::trace_call_chain
    (schema/codegraph.surql:708-720): not just which nodes are
    reachable but the call chain that reaches them.  Frontier rows
    carry the path array; each level is one join that appends the next
    hop and drops cycles via array_contains (simple paths only).
    Edges = functional ⊕ involution part graphs (out-degree 2, so
    branching is real: ≤ 2^5 chains).  Start node = 1, depth ≤ 5.

    The path is emitted as an '->'-joined STRING — driver-hashable and
    the shape a user reads; the array form exists only inside the
    loop."""
    fwd = _part_edges(spark, sf_dir)
    inv = _involution_edges(spark, sf_dir)
    e = fwd.unionByName(inv).distinct().persist()
    try:
        frontier = (
            e.filter((F.col("from_id") == 1) & (F.col("to_id") != 1))
            .select(
                F.col("to_id").alias("node_id"),
                F.lit(1).alias("depth"),
                F.array(F.lit(1).cast("long"), F.col("to_id")).alias("path"),
            )
        )
        levels = [frontier]
        for depth in range(2, BFS_MAX_DEPTH + 1):
            frontier = (
                e.join(frontier.withColumnRenamed("node_id", "from_id"), "from_id")
                .filter(~F.array_contains("path", F.col("to_id")))
                .select(
                    F.col("to_id").alias("node_id"),
                    F.lit(depth).alias("depth"),
                    F.concat("path", F.array("to_id")).alias("path"),
                )
            )
            levels.append(frontier)
        out = levels[0]
        for lvl in levels[1:]:
            out = out.unionByName(lvl)
        return out.select(
            "node_id",
            "depth",
            F.array_join("path", "->").alias("path"),
        ).localCheckpoint(eager=True)
    finally:
        e.unpersist()


TRACE_CALL_CHAIN_SQL = f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT from_id, to_id FROM (
    SELECT from_id, to_id FROM ({_PART_EDGES_SQL})
    UNION ALL
    SELECT from_id, to_id FROM ({_INVOLUTION_EDGES_SQL})
  )
),
chain(node_id, depth, path) AS (
  SELECT to_id AS node_id, 1 AS depth, [1::BIGINT, to_id] AS path
  FROM e WHERE from_id = 1 AND to_id != 1
  UNION ALL
  SELECT e.to_id, c.depth + 1, list_append(c.path, e.to_id)
  FROM chain c JOIN e ON e.from_id = c.node_id
  WHERE c.depth < {BFS_MAX_DEPTH} AND NOT list_contains(c.path, e.to_id)
)
SELECT node_id, depth, array_to_string(path, '->') AS path FROM chain
"""


HOTSPOT_THRESHOLD = 2.0
HOTSPOT_LIMIT = 20


def complexity_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fn::get_complexity_hotspots (schema/codegraph.surql:723-770)
    ported shape-for-shape: threshold filter on a per-entity complexity
    metric → overfetch 2×limit by complexity → join afferent/efferent
    coupling counts → instability = floor(eff/(eff+aff)·10⁴)/10⁴ and
    risk_score = complexity·(afferent+1) → final top-limit by risk.

    Webtext mapping: complexity(doc) = distinct-token ratio ×
    ln(1 + n_tokens) (lexical complexity — the analog of cyclomatic
    complexity for prose); the coupling graph is a deterministic
    doc-id functional ⊕ involution edge set (same CONSTRUCTION as the
    part-table graph trace_call_chain walks, but over doc ids).  The
    2×limit overfetch joins only ~40 rows against the degree
    aggregates (broadcast the overfetch side); the corpus-wide degree
    aggregation is one shuffle."""
    from .textops import _TOKS

    d = t(spark, sf_dir, "documents")
    mx = max_key(spark, sf_dir, "documents", "doc_id") + 1
    toks = _TOKS()
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    scored = (
        # n > 0 BEFORE the ratio: ANSI mode raises DIVIDE_BY_ZERO on
        # empty/whitespace docs (the oracle's len(a) > 0 twin)
        d.filter(n > 0)
        .select(
            "doc_id",
            F.round(
                nd.cast("double") / n.cast("double") * F.log(F.lit(1.0) + n),
                6,
            ).alias("complexity"),
        )
        .filter(F.col("complexity") >= HOTSPOT_THRESHOLD)
        .orderBy(F.desc("complexity"), F.asc("doc_id"))
        .limit(HOTSPOT_LIMIT * 2)
    )
    e = (
        d.select(
            F.col("doc_id").alias("from_id"),
            ((F.col("doc_id") * 37 + 11) % F.lit(mx)).alias("to_id"),
        )
        .unionByName(
            d.select(
                F.col("doc_id").alias("from_id"),
                ((F.lit(mx) - F.col("doc_id")) % F.lit(mx)).alias("to_id"),
            )
        )
        .distinct()
    )
    aff = e.groupBy(F.col("to_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("afferent")
    )
    eff = e.groupBy(F.col("from_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("efferent")
    )
    joined = (
        scored.join(aff, "doc_id", "left")
        .join(eff, "doc_id", "left")
        .select(
            "doc_id",
            "complexity",
            F.coalesce("afferent", F.lit(0)).alias("afferent"),
            F.coalesce("efferent", F.lit(0)).alias("efferent"),
        )
        .withColumn(
            "instability",
            F.when(
                (F.col("afferent") + F.col("efferent")) > 0,
                F.floor(
                    F.col("efferent").cast("double")
                    / (F.col("afferent") + F.col("efferent")).cast("double")
                    * 10000
                )
                / 10000.0,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "risk_score",
            F.round(F.col("complexity") * (F.col("afferent") + 1), 6),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("risk_score"), F.asc("doc_id"))
    return (
        joined.orderBy(F.desc("risk_score"), F.asc("doc_id"))
        .limit(HOTSPOT_LIMIT)
        .withColumn("rank", F.row_number().over(w))
    )


COMPLEXITY_HOTSPOTS_SQL = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS a
  FROM documents
),
mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
scored AS (
  SELECT doc_id, complexity FROM (
    SELECT doc_id,
           round(cast(len(list_distinct(a)) AS double) / cast(len(a) AS double)
                 * ln(1.0 + len(a)), 6) AS complexity
    FROM d WHERE len(a) > 0
  )
  WHERE complexity >= {HOTSPOT_THRESHOLD}
  ORDER BY complexity DESC, doc_id LIMIT {HOTSPOT_LIMIT * 2}
),
e AS (
  SELECT DISTINCT from_id, to_id FROM (
    SELECT doc_id AS from_id, (doc_id * 37 + 11) % (SELECT m FROM mx) AS to_id
    FROM documents
    UNION ALL
    SELECT doc_id AS from_id, ((SELECT m FROM mx) - doc_id) % (SELECT m FROM mx) AS to_id
    FROM documents
  )
),
aff AS (SELECT to_id AS doc_id, count(*) AS afferent FROM e GROUP BY 1),
eff AS (SELECT from_id AS doc_id, count(*) AS efferent FROM e GROUP BY 1),
joined AS (
  SELECT s.doc_id, s.complexity,
         coalesce(a.afferent, 0) AS afferent,
         coalesce(f.efferent, 0) AS efferent,
         CASE WHEN coalesce(a.afferent, 0) + coalesce(f.efferent, 0) > 0
              THEN floor(cast(coalesce(f.efferent, 0) AS double)
                         / cast(coalesce(a.afferent, 0) + coalesce(f.efferent, 0) AS double)
                         * 10000) / 10000.0
              ELSE 0.0 END AS instability,
         round(s.complexity * (coalesce(a.afferent, 0) + 1), 6) AS risk_score
  FROM scored s
  LEFT JOIN aff a ON a.doc_id = s.doc_id
  LEFT JOIN eff f ON f.doc_id = s.doc_id
)
SELECT doc_id, complexity, afferent, efferent, instability, risk_score,
       cast(row_number() OVER (ORDER BY risk_score DESC, doc_id) AS int) AS rank
FROM joined ORDER BY risk_score DESC, doc_id LIMIT {HOTSPOT_LIMIT}
"""


TRANSITIVE_DEPS_SQL = f"""
WITH e AS ({_PART_EDGES_SQL}),
     l1 AS (SELECT to_id AS node_id, 1 AS depth FROM e WHERE from_id = 1),
     f1 AS (SELECT DISTINCT node_id FROM l1),
     l2 AS (SELECT e.to_id AS node_id, 2 AS depth FROM e JOIN f1 ON e.from_id = f1.node_id),
     f2 AS (SELECT DISTINCT node_id FROM l2),
     l3 AS (SELECT e.to_id AS node_id, 3 AS depth FROM e JOIN f2 ON e.from_id = f2.node_id),
     f3 AS (SELECT DISTINCT node_id FROM l3),
     l4 AS (SELECT e.to_id AS node_id, 4 AS depth FROM e JOIN f3 ON e.from_id = f3.node_id),
     f4 AS (SELECT DISTINCT node_id FROM l4),
     l5 AS (SELECT e.to_id AS node_id, 5 AS depth FROM e JOIN f4 ON e.from_id = f4.node_id)
SELECT node_id, min(depth) AS depth
FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
      UNION ALL SELECT * FROM l4 UNION ALL SELECT * FROM l5)
WHERE node_id != 1
GROUP BY node_id
"""
