package graft

/** Programmatic DuckDB oracle SQL for iterative algorithms: the fixpoint
  * loops are UNROLLED to a fixed round count (chosen ≥ the convergence round
  * count on the test graphs), because recursive CTEs cannot carry
  * aggregations. The Spark side runs the same fixed round count (PageRank)
  * or to fixpoint (WCC — identical once converged).
  */
object OracleSql {
  import Fixtures._

  /** Unweighted PageRank on the symmetrized supplier graph, `iters` rounds,
    * uniform reset, no dangling (every vertex of `verts` has an edge).
    * Mirrors graft.algos.PageRank.runFixed term-for-term. */
  def pagerankSupplier(iters: Int, alpha: Double = 0.85): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= "nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),\n"
    b ++= "outdeg AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d FROM und GROUP BY 1),\n"
    b ++= "pr0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nv) AS pr FROM verts),\n"
    for (i <- 1 to iters) {
      b ++= s"""pr$i AS MATERIALIZED (
        |  SELECT v.id,
        |         $alpha * coalesce(s.in_sum, 0) + ${1.0 - alpha} / (SELECT n FROM nv) AS pr
        |  FROM verts v LEFT JOIN (
        |    SELECT u.dst AS id, sum(p.pr / o.d) AS in_sum
        |    FROM und u JOIN pr${i - 1} p ON p.id = u.src JOIN outdeg o ON o.id = u.src
        |    GROUP BY 1
        |  ) s ON s.id = v.id
        |)""".stripMargin
      b ++= (if (i < iters) ",\n" else "\n")
    }
    b ++= s"SELECT id, round(pr, 6) AS pagerank FROM pr$iters"
    b.toString
  }

  /** Min-label propagation WCC on the supplier graph, unrolled. */
  def wccSupplier(rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= "l0 AS MATERIALIZED (SELECT id, id AS component FROM verts),\n"
    for (i <- 1 to rounds) {
      b ++= s"""l$i AS MATERIALIZED (
        |  SELECT v.id, least(v.component, coalesce(m.nbr_min, v.component)) AS component
        |  FROM l${i - 1} v LEFT JOIN (
        |    SELECT u.dst AS id, min(p.component) AS nbr_min
        |    FROM und u JOIN l${i - 1} p ON p.id = u.src GROUP BY 1
        |  ) m ON m.id = v.id
        |)""".stripMargin
      b ++= (if (i < rounds) ",\n" else "\n")
    }
    b ++= s"SELECT id, component FROM l$rounds"
    b.toString
  }

  /** BFS distances from the smallest supplier vertex — recursive CTE with a
    * depth bound; min(dist) per vertex = BFS level. */
  def bfsSupplier(maxDepth: Int): String =
    s"""WITH RECURSIVE $SUPP_EDGES_SQL,
       |$SUPP_UND_SQL,
       |bfs(id, dist) AS (
       |  SELECT (SELECT min(src) FROM supp_edges), 0
       |  UNION
       |  SELECT u.dst, b.dist + 1 FROM bfs b JOIN und u ON u.src = b.id
       |  WHERE b.dist < $maxDepth
       |)
       |SELECT id, CAST(min(dist) AS BIGINT) AS distance FROM bfs GROUP BY id""".stripMargin
}
