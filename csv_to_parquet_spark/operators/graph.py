"""Graph operators over a derived co-purchase graph.

The reference has no graph surface (it is a file converter —
converter/converter.go:66-420); these extend the SURVEY §7 analytics
surface with the two classic distributed-graph shapes a data platform
actually runs: exact triangle counting and PageRank. Both run over the
part co-purchase graph derived from ``lineitem`` (two parts are
adjacent when they appear in the same order at least twice — the
support threshold prunes incidental co-occurrence).

Cross-engine exactness is the design constraint:

- Triangle counting is pure integer joins/counts — exact anywhere.
- PageRank is normally a float fixed-point iteration whose per-vertex
  sums are accumulation-order dependent; here every quantity is
  integer fixed-point (micro-rank units, scale 10⁶): contributions are
  ``rank div degree``, damping is ``(85 · s) div 100``. Floor division
  on non-negative BIGINTs is deterministic in any engine and any
  partition order, so a fixed iteration count gives bit-identical
  results in Spark and the DuckDB oracle's unrolled CTEs.

Scale posture: the pair-generation self-join is per-order (bounded
fan-out — an order's line count is small and fixed by the schema, so
the blow-up is C(lines,2) per order, not quadratic in the table);
edges/adjacency/degrees are persisted once and reused across the
fixed 3 PageRank iterations; the triangle join is degree-ordered
(each edge directed low→high degree), the standard trick that bounds
wedge fan-out by O(m^1.5) instead of Σdeg² on skewed graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.operators.cache import persist_tracked
from csv_to_parquet_spark.sources.tables import load_table

CAT = Catalog()

#: Minimum number of distinct orders two parts must share for an edge.
_SUPPORT = 2

#: PageRank fixed-point: rank scale, damping numerator/denominator,
#: iteration count. (1-0.85) * 1e6 = 150000 is the teleport term.
_PR_SCALE = 1_000_000
_PR_TELEPORT = 150_000
_PR_ITERS = 3

_EDGES_SQL = f"""
    li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b, l1.l_orderkey
      FROM li l1 JOIN li l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
    e AS (SELECT a, b FROM pairs GROUP BY a, b HAVING count(*) >= {_SUPPORT})
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (a < b) co-purchase edges with support ≥ _SUPPORT."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("b")
    )
    pairs = (
        li.join(l2, (li.l_orderkey == l2.o2) & (li.l_partkey < l2.b))
        .select(F.col("l_partkey").alias("a"), "b", "l_orderkey")
        .distinct()
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _SUPPORT)
        .select("a", "b")
    )


@CAT.query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL}
    SELECT
      (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM
        (SELECT a AS v FROM e UNION ALL SELECT b FROM e)) AS n_vertices,
      (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
      (SELECT CAST(count(*) AS BIGINT)
       FROM e e1
       JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
       JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the co-purchase graph, plus its vertex
    and edge counts.

    The oracle counts triangles on canonical a<b edges (x<y<z ⇒ edges
    (x,y),(x,z),(y,z)) — correct, but its wedge step fans out by the
    square of the highest KEY-ordered degree. The Spark plan instead
    orients each edge from its lower-(degree, key) endpoint to the
    higher one — every triangle is counted exactly once from its
    lowest-degree corner, and wedge fan-out is bounded by O(m^1.5)
    regardless of skew (the power-law hub that breaks key-ordered
    counting at 100 TB has near-zero OUT-degree here). Three hash
    joins, all on ids; counts are exact integers."""
    e = persist_tracked(_edges(spark, sf_dir))
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    ed = e.join(da, "a").join(db, "b")
    # orient low (deg, key) → high (deg, key); ties impossible beyond
    # key equality because (deg, key) pairs are distinct per vertex
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = persist_tracked(
        ed.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias(
                "dst_deg"
            ),
        )
    )
    e1 = oriented.select(
        F.col("src"), F.col("dst").alias("v"), F.col("dst_deg").alias("v_deg")
    )
    e2 = oriented.select(
        F.col("src"), F.col("dst").alias("w"), F.col("dst_deg").alias("w_deg")
    )
    wedges = e1.join(e2, "src").filter(
        (F.col("v_deg") < F.col("w_deg"))
        | ((F.col("v_deg") == F.col("w_deg")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
    )
    verts = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .agg(F.count_distinct("v").alias("n_vertices"))
    )
    return (
        verts.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(tri))
        .select("n_vertices", "n_edges", "n_triangles")
    )


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT d.u,
             CAST({_PR_TELEPORT} + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT)
               AS r
      FROM deg d LEFT JOIN (
        SELECT adj.v AS u, SUM({prev}.r // dg.deg) AS c
        FROM adj
        JOIN {prev} ON {prev}.u = adj.u
        JOIN deg dg ON dg.u = adj.u
        GROUP BY adj.v) s ON s.u = d.u)
    """


@CAT.query(
    "graph_pagerank_copurchase",
    oracle=f"""
    WITH {_EDGES_SQL},
    adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY u),
    r0 AS (SELECT u, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg),
    {_pr_iter_sql("r0", "r1")},
    {_pr_iter_sql("r1", "r2")},
    {_pr_iter_sql("r2", "r3")}
    SELECT u AS part, r AS rank_fp FROM r3
    """,
)
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 iterations) over the co-purchase
    graph, in integer fixed-point micro-rank units — bit-identical
    across engines and partition orders, which float PageRank can
    never be (its per-vertex sums are accumulation-order dependent).

    Iterative join-agg shape: adjacency and degrees are computed and
    persisted ONCE; each iteration is one join of the current rank
    vector (|V| rows) with the adjacency on u, one groupBy(v) with
    map-side partial sums, and one left join back onto the vertex set
    — all hash-partitioned on the vertex id, so consecutive iterations
    reuse the same partitioning. The iteration count is fixed, so
    lineage depth is bounded and no checkpoint is needed (the
    open-ended sibling of this loop, connected components, truncates
    lineage per round — dedup.py)."""
    e = _edges(spark, sf_dir)
    adj = persist_tracked(
        e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
    )
    deg = persist_tracked(
        adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    )
    ranks = deg.select("u", F.lit(_PR_SCALE).cast("bigint").alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            adj.join(ranks, "u")
            .join(deg, "u")
            .groupBy(F.col("v").alias("cu"))
            .agg(F.sum(F.expr("r div deg")).alias("c"))
        )
        ranks = deg.select("u").join(
            contrib, F.col("u") == F.col("cu"), "left"
        ).select(
            "u",
            (
                F.lit(_PR_TELEPORT)
                + F.expr("(85 * coalesce(c, 0L)) div 100")
            )
            .cast("bigint")
            .alias("r"),
        )
    return ranks.select(F.col("u").alias("part"), F.col("r").alias("rank_fp"))


@CAT.query(
    "basket_association_rules",
    oracle=f"""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM li),
    n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM li),
    item AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
      FROM baskets GROUP BY l_partkey),
    pair AS (
      SELECT a.l_partkey AS ante, b.l_partkey AS cons,
             CAST(count(*) AS BIGINT) AS n_pair
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY ante, cons HAVING count(*) >= {_SUPPORT})
    SELECT p.ante, p.cons, p.n_pair,
           round(CAST(p.n_pair AS DOUBLE) / ia.n_item, 6) AS confidence,
           round(CAST(p.n_pair AS DOUBLE) * no.n / (ia.n_item * ic.n_item), 6)
             AS lift
    FROM pair p
    JOIN item ia ON ia.l_partkey = p.ante
    JOIN item ic ON ic.l_partkey = p.cons
    CROSS JOIN n_orders no
    """,
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: for every
    directed part pair (antecedent → consequent) co-occurring in at
    least ``_SUPPORT`` orders, the pair support, the rule confidence
    P(cons|ante), and the lift vs independence — the classic
    recommender/affinity mining operator (Apriori's pair level, which
    dominates its cost at scale).

    Baskets are deduped to distinct (order, part) FIRST (map-side
    partial distinct); pair counting is the same bounded per-order
    self-join as the co-purchase graph (C(lines,2) per order, never
    corpus-quadratic); item counts join back onto the surviving pairs
    on the part key (shuffle — the part dimension is not broadcastable
    at scale), and only the 1-row basket total broadcasts. All counts
    are exact BIGINTs; confidence/lift are one double division each,
    rounded."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.distinct()
    n_orders = li.agg(
        F.count_distinct("l_orderkey").alias("n")
    )
    item = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    b2 = baskets.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("cons")
    )
    pair = (
        baskets.join(
            b2,
            (baskets.l_orderkey == b2.o2)
            & (baskets.l_partkey != b2.cons),
        )
        .groupBy(F.col("l_partkey").alias("ante"), "cons")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _SUPPORT)
    )
    ia = item.select(
        F.col("l_partkey").alias("ante"), F.col("n_item").alias("n_ante")
    )
    ic = item.select(
        F.col("l_partkey").alias("cons"), F.col("n_item").alias("n_cons")
    )
    # ia/ic are part-dimension-cardinality frames — billions of rows at
    # the 100 TB posture, NOT broadcastable; the joins shuffle on the
    # part key (AQE still picks broadcast when the dimension is small,
    # as at driver scale). Only the 1-row basket total broadcasts.
    return (
        pair.join(ia, "ante")
        .join(ic, "cons")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "ante",
            "cons",
            "n_pair",
            F.round(
                F.col("n_pair").cast("double") / F.col("n_ante"), 6
            ).alias("confidence"),
            F.round(
                F.col("n_pair").cast("double")
                * F.col("n")
                / (F.col("n_ante") * F.col("n_cons")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Round 5: bounded multi-hop BFS (the recursive-CTE shape Spark lacks)
# ---------------------------------------------------------------------------

#: BFS seed set: part keys < _BFS_SEED_MAX.
_BFS_SEED_MAX = 5
#: Maximum hop distance explored.
_BFS_HOPS = 3


@CAT.query(
    "graph_bfs_reachability",
    oracle=f"""
    WITH {_EDGES_SQL},
    adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    h0 AS (SELECT DISTINCT u AS node FROM adj WHERE u < {_BFS_SEED_MAX}),
    h1 AS (
      SELECT DISTINCT adj.v AS node FROM adj JOIN h0 ON adj.u = h0.node
      WHERE adj.v NOT IN (SELECT node FROM h0)),
    h2 AS (
      SELECT DISTINCT adj.v AS node FROM adj JOIN h1 ON adj.u = h1.node
      WHERE adj.v NOT IN (SELECT node FROM h0)
        AND adj.v NOT IN (SELECT node FROM h1)),
    h3 AS (
      SELECT DISTINCT adj.v AS node FROM adj JOIN h2 ON adj.u = h2.node
      WHERE adj.v NOT IN (SELECT node FROM h0)
        AND adj.v NOT IN (SELECT node FROM h1)
        AND adj.v NOT IN (SELECT node FROM h2))
    SELECT node AS part_key, CAST(hop AS BIGINT) AS hop FROM (
      SELECT node, 0 AS hop FROM h0
      UNION ALL SELECT node, 1 FROM h1
      UNION ALL SELECT node, 2 FROM h2
      UNION ALL SELECT node, 3 FROM h3)
    """,
)
def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first reachability over the co-purchase graph:
    minimum hop distance (≤ {_BFS_HOPS}) from the seed part set — the
    "related products within N hops" / blast-radius query that needs a
    RECURSIVE CTE in SQL engines. Spark has no recursive CTE; the
    Spark-native shape is this driver-side loop of frontier-expansion
    joins with lineage truncation per hop — each hop is one join of
    the (shrinking) frontier against the adjacency list plus an
    anti-join against visited, exactly the work a recursive CTE's
    semi-naive evaluation performs, with the iteration bound explicit.

    The oracle unrolls the same {_BFS_HOPS} hops as chained CTEs, so
    hop ASSIGNMENTS (min-distance correctness), not just reach counts,
    are verified cross-engine. Visited stays (node, hop) longs —
    frontier joins ship ids only; at 100 TB the adjacency list is the
    only large operand and it partitions by source vertex (the same
    hash partitioning every hop, so AQE reuses the exchange). BFS from
    a seed SET (not per-seed) is the production form: one traversal
    labels the whole neighborhood union."""
    edges = persist_tracked(_edges(spark, sf_dir))
    adj = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    frontier = (
        adj.filter(F.col("u") < _BFS_SEED_MAX)
        .select(F.col("u").alias("node"))
        .distinct()
    )
    visited = frontier.withColumn("hop", F.lit(0))
    for hop in range(1, _BFS_HOPS + 1):
        nxt = (
            adj.join(frontier, adj.u == frontier.node)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        # lineage truncation: without it each hop's plan re-derives
        # every earlier frontier (the recursive-CTE blowup in DAG form).
        # EAGER: measured faster than riding the final action — a lazy
        # checkpoint defers ALL hops' materialization into one job
        # whose stages serialize anyway, while eager hops overlap the
        # (tiny) frontier jobs with plan compilation of the next hop.
        frontier = nxt.localCheckpoint(eager=True)
        visited = visited.unionAll(frontier.withColumn("hop", F.lit(hop)))
    return visited.select(
        F.col("node").alias("part_key"), F.col("hop").cast("bigint").alias("hop")
    )


@CAT.query(
    "graph_degree_histogram",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
      GROUP BY v)
    SELECT CAST(FLOOR(LOG2(deg)) AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(MIN(deg) AS BIGINT) AS min_deg,
           CAST(MAX(deg) AS BIGINT) AS max_deg
    FROM deg GROUP BY log2_bucket
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree distribution of the co-purchase graph —
    the scale-free/power-law diagnostic read before choosing a graph
    algorithm's partitioning: a straight line across log buckets
    means hub vertices exist and key-partitioned wedge/message joins
    will skew (exactly why ``graph_triangle_count`` orients edges by
    degree). Bucket = floor(log2(deg)) on exact integer degrees —
    deg ≥ 1 by construction, and both engines take log2 of the same
    BIGINT so bucket membership is exact.

    Plan: the shared canonical-edge frame, one union-explode to
    vertex incidences, a degree groupBy, and a 2nd tiny groupBy over
    ~60 possible buckets. At 100 TB the degree aggregation is the
    only real exchange; map-side partials absorb the hub keys'
    incidence mass before the shuffle."""
    e = persist_tracked(_edges(spark, sf_dir))
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        deg.select(F.floor(F.log2("deg")).cast("bigint").alias("log2_bucket"), "deg")
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.min("deg").cast("bigint").alias("min_deg"),
            F.max("deg").cast("bigint").alias("max_deg"),
        )
    )


@CAT.query(
    "graph_common_neighbors",
    oracle="""
    WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM sp GROUP BY s),
    c AS (SELECT a.s AS supp_a, b.s AS supp_b, CAST(count(*) AS BIGINT) AS common
          FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
          GROUP BY a.s, b.s)
    SELECT supp_a, supp_b, common,
           ROUND(CAST(common AS DOUBLE) / (da.d + db.d - common), 6) AS jaccard
    FROM c
    JOIN deg da ON da.s = supp_a
    JOIN deg db ON db.s = supp_b
    ORDER BY CAST(common AS DOUBLE) / (da.d + db.d - common) DESC,
             supp_a, supp_b
    LIMIT 100
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 supplier pairs by neighborhood Jaccard over the
    bipartite supplier→part graph (the link-prediction / entity-
    resolution primitive: "how alike are two nodes' neighbor sets").

    Plan: distinct (supplier, part) edges → self-join on the PART key
    (only suppliers sharing a part ever meet — never all supplier
    pairs) → pair-count = |N(a) ∩ N(b)| → join per-supplier degrees →
    exact integer Jaccard numerator/denominator, double only at the
    final ratio. Top-100 with key tiebreakers compiles to
    TakeOrderedAndProject — no global sort.

    Scale: fan-out per part is (suppliers-per-part)², bounded by the
    schema's fixed part→supplier multiplicity (4 in TPC-H) — the
    quadratic hub risk of common-neighbor joins does not exist on this
    graph. On a power-law graph the mitigation is the same df-cap used
    by the shingle index (drop parts supplied by more than K
    suppliers; each dropped hub contributes <= deg² pairs all of
    near-zero Jaccard).
    """
    sp = persist_tracked(
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    deg = sp.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    a = sp.select(F.col("s").alias("supp_a"), "p")
    b = sp.select(F.col("s").alias("supp_b"), F.col("p").alias("p2"))
    common = (
        a.join(b, (F.col("p") == F.col("p2")) & (F.col("supp_a") < F.col("supp_b")))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    da = deg.select(F.col("s").alias("supp_a"), F.col("d").alias("da"))
    db = deg.select(F.col("s").alias("supp_b"), F.col("d").alias("db"))
    j = F.col("common").cast("double") / (F.col("da") + F.col("db") - F.col("common"))
    return (
        common.join(da, "supp_a")
        .join(db, "supp_b")
        .orderBy(j.desc(), "supp_a", "supp_b")
        .limit(100)
        .select("supp_a", "supp_b", "common", F.round(j, 6).alias("jaccard"))
    )


#: k-core threshold and fixed peeling rounds (unrolled in the oracle
#: exactly like PageRank's iterations).
_KCORE_K = 3
_KCORE_ROUNDS = 3


def _kcore_round_sql(prev_e: str, out_e: str) -> str:
    """One peeling round: drop vertices whose degree in ``prev_e``
    is < k, keep only edges between survivors."""
    return f"""
    d_{out_e} AS (
      SELECT u, count(*) AS deg FROM
        (SELECT a AS u FROM {prev_e} UNION ALL SELECT b FROM {prev_e})
      GROUP BY u),
    s_{out_e} AS (SELECT u FROM d_{out_e} WHERE deg >= {_KCORE_K}),
    {out_e} AS (
      SELECT a, b FROM {prev_e}
      WHERE a IN (SELECT u FROM s_{out_e})
        AND b IN (SELECT u FROM s_{out_e}))
    """


@CAT.query(
    "graph_kcore_peeling",
    oracle=f"""
    WITH {_EDGES_SQL},
    {_kcore_round_sql("e", "e1")},
    {_kcore_round_sql("e1", "e2")},
    {_kcore_round_sql("e2", "e3")},
    df AS (
      SELECT u, CAST(count(*) AS BIGINT) AS deg FROM
        (SELECT a AS u FROM e3 UNION ALL SELECT b FROM e3)
      GROUP BY u)
    SELECT u AS part, deg FROM df WHERE deg >= {_KCORE_K}
    """,
)
def graph_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KCORE_K}-core of the co-purchase graph by iterative peeling:
    repeatedly delete vertices of degree < k (and their edges), a
    fixed {_KCORE_ROUNDS} rounds — the dense-subgraph primitive
    behind spam-cluster mining and graph sparsification.

    The fixed round count keeps the operator oracle-exact: the DuckDB
    side unrolls the identical rounds as CTEs (the PageRank
    convention), so both engines compute the same partially-peeled
    state. The final deg >= k filter is round R+1's REMOVAL step, not
    a certificate: if peeling has not converged by then, a survivor
    may count edges to vertices that same filter drops, so the output
    equals the true k-core exactly when round R+1 removes no edges
    needed by another survivor — which holds once peeling converges,
    and is asserted against a run-to-fixpoint recompute in
    tests/test_round5c.py on the fixture graphs.

    Scale: each round is one degree aggregation plus one semi-join of
    the edge list against the survivor set — hash-partitioned on the
    vertex id throughout, edges only shrink. An open-ended production
    variant loops to convergence with the connected-components
    checkpoint cadence (dedup.py); the per-round plan is identical.
    """
    e = persist_tracked(_edges(spark, sf_dir))
    for _ in range(_KCORE_ROUNDS):
        deg = (
            e.select(F.col("a").alias("u"))
            .unionAll(e.select(F.col("b").alias("u")))
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        surv = deg.filter(F.col("deg") >= _KCORE_K).select("u")
        e = persist_tracked(
            e.join(surv.withColumnRenamed("u", "a"), "a", "left_semi").join(
                surv.withColumnRenamed("u", "b"), "b", "left_semi"
            )
        )
    final_deg = (
        e.select(F.col("a").alias("u"))
        .unionAll(e.select(F.col("b").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return final_deg.filter(F.col("deg") >= _KCORE_K).select(
        F.col("u").alias("part"), "deg"
    )


_LPA_ITERS = 3


def _lpa_round_sql(prev: str, out: str) -> str:
    """One synchronous LPA round: each vertex adopts the most frequent
    label among its neighbors (ties -> smallest label); isolated or
    tie-free logic is pure integer/rank arithmetic, so the round is
    deterministic in any engine."""
    return f"""
    cand_{out} AS (
      SELECT adj.v, l.lab, CAST(count(*) AS BIGINT) AS c
      FROM adj JOIN {prev} l ON l.v = adj.u
      GROUP BY adj.v, l.lab),
    best_{out} AS (
      SELECT v, lab,
             ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lab) AS rn
      FROM cand_{out}),
    {out} AS (
      SELECT p.v, COALESCE(b.lab, p.lab) AS lab
      FROM {prev} p LEFT JOIN (
        SELECT v, lab FROM best_{out} WHERE rn = 1) b ON b.v = p.v)
    """


@CAT.query(
    "graph_label_propagation",
    oracle=f"""
    WITH {_EDGES_SQL},
    adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    l0 AS (SELECT DISTINCT u AS v, u AS lab FROM adj),
    {_lpa_round_sql("l0", "l1")},
    {_lpa_round_sql("l1", "l2")},
    {_lpa_round_sql("l2", "l3")}
    SELECT lab AS community,
           CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(MIN(v) AS BIGINT) AS min_vertex
    FROM l3 GROUP BY lab
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the co-purchase graph: every vertex starts as
    its own label and repeatedly adopts the most frequent label among
    its neighbors. Async LPA is run-order dependent (useless for a
    reproducible pipeline); this is the SYNCHRONOUS variant with a
    total tie order (count DESC, label ASC via ROW_NUMBER), so a
    fixed iteration count gives bit-identical communities in any
    engine at any parallelism — the same determinism contract as the
    fixed-point PageRank above. Output is the community roster
    (label, size, smallest member).

    Iterative join-agg shape, one exchange key: each round joins the
    |V|-row label vector to the persisted adjacency on u, aggregates
    label counts per (v, lab), takes the per-v argmax with ONE window
    over the (v)-partitioned count frame, and left-joins back to
    carry isolated vertices unchanged. Rounds are fixed (3), so
    lineage stays bounded without checkpoints; at larger diameters
    the CC-style checkpoint-per-round loop applies (dedup.py:926)."""
    e = _edges(spark, sf_dir)
    adj = persist_tracked(
        e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
    )
    labels = persist_tracked(
        adj.select(F.col("u").alias("v")).distinct().select(
            "v", F.col("v").alias("lab")
        )
    )
    for _ in range(_LPA_ITERS):
        cand = (
            adj.join(
                labels.select(
                    F.col("v").alias("lu"), F.col("lab")
                ),
                F.col("u") == F.col("lu"),
            )
            .groupBy("v", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            cand.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("v").orderBy(
                        F.desc("c"), F.asc("lab")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select(F.col("v").alias("bv"), F.col("lab").alias("blab"))
        )
        labels = persist_tracked(
            labels.join(best, labels.v == best.bv, "left").select(
                "v", F.coalesce("blab", "lab").alias("lab")
            )
        )
    return labels.groupBy(F.col("lab").alias("community")).agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.min("v").cast("bigint").alias("min_vertex"),
    )
