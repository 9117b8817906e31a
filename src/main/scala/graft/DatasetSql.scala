package graft

/** DuckDB oracle SQL over the inline curated datasets ([[graft.sources
  * .Datasets]]): the edge list arrives as a VALUES CTE built from the same
  * in-source data the Spark side reads, so both sides compute from
  * identical inputs (the karate-triangles pattern, generalized). */
object DatasetSql {

  /** Canonical pairs → `und` CTE with both directions materialized. */
  private def undCte(pairs: Seq[(Long, Long)]): String = {
    val vals = pairs.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    s"""e0(s0, d0) AS (VALUES $vals),
       |canon AS MATERIALIZED (SELECT CAST(s0 AS BIGINT) AS src, CAST(d0 AS BIGINT) AS dst FROM e0),
       |und AS MATERIALIZED (SELECT src, dst FROM canon UNION ALL SELECT dst, src FROM canon),
       |verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)""".stripMargin
  }

  /** Weighted triples → stored-direction edge CTE `ed` + `verts`. */
  private def wCte(edges: Seq[(Long, Long, Double)]): String = {
    val vals = edges.map { case (a, b, w) => s"($a, $b, $w)" }.mkString(", ")
    s"""e0(s0, d0, w0) AS (VALUES $vals),
       |ed AS MATERIALIZED (SELECT CAST(s0 AS BIGINT) AS src, CAST(d0 AS BIGINT) AS dst,
       |                           CAST(w0 AS DOUBLE) AS weight FROM e0),
       |verts AS MATERIALIZED (
       |  SELECT DISTINCT id FROM (SELECT src AS id FROM ed UNION ALL SELECT dst AS id FROM ed))""".stripMargin
  }

  /** Weighted SSSP from `source` over the symmetrized edge list, min-plus
    * unrolled `rounds` times (the q_sssp oracle shape over VALUES). */
  def sssp(edges: Seq[(Long, Long, Double)], rounds: Int, source: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH ${wCte(edges)},\n"
    b ++= "und AS MATERIALIZED (SELECT src, dst, weight FROM ed UNION ALL SELECT dst, src, weight FROM ed),\n"
    b ++= s"d0 AS MATERIALIZED (SELECT CAST($source AS BIGINT) AS id, 0.0 AS d),\n"
    for (i <- 1 to rounds) {
      b ++= s"""d$i AS MATERIALIZED (
        |  SELECT id, min(d) AS d FROM (
        |    SELECT id, d FROM d${i - 1}
        |    UNION ALL
        |    SELECT u.dst AS id, p.d + u.weight AS d
        |    FROM und u JOIN d${i - 1} p ON p.id = u.src
        |  ) GROUP BY id
        |)""".stripMargin
      b ++= (if (i < rounds) ",\n" else "\n")
    }
    b ++= s"SELECT id, round(d, 6) AS distance FROM d$rounds"
    b.toString
  }

  /** Topological levels of a DAG: level(v) = longest path from any source,
    * max-plus unrolled `rounds` ≥ depth times — identical to the
    * zero-in-degree peel round number TreeDag.topologicalLevels emits. */
  def topoLevels(edges: Seq[(Long, Long, Double)], rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH ${wCte(edges)},\n"
    b ++= "l0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS level FROM verts),\n"
    for (i <- 1 to rounds) {
      b ++= s"""l$i AS MATERIALIZED (
        |  SELECT id, max(level) AS level FROM (
        |    SELECT id, level FROM l${i - 1}
        |    UNION ALL
        |    SELECT e.dst AS id, p.level + 1 AS level
        |    FROM ed e JOIN l${i - 1} p ON p.id = e.src
        |  ) GROUP BY id
        |)""".stripMargin
      b ++= (if (i < rounds) ",\n" else "\n")
    }
    b ++= s"SELECT id, level FROM l$rounds"
    b.toString
  }

  /** Eigenvector centrality over the STORED directed weighted edges
    * (toy_graph keeps both directions in-data): power iteration with
    * per-round L2 normalization, unrolled (OracleSql.eigenvectorSupplier
    * over a VALUES edge list). */
  def eigenvector(edges: Seq[(Long, Long, Double)], iters: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH ${wCte(edges)},\n"
    b ++= "nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),\n"
    b ++= "e0c AS MATERIALIZED (SELECT id, 1.0 / sqrt((SELECT n FROM nv)) AS c FROM verts),\n"
    for (i <- 1 to iters) {
      val prev = if (i == 1) "e0c" else s"e${i - 1}c"
      b ++= s"""e${i}r AS MATERIALIZED (
        |  SELECT v.id, coalesce(s.in_sum, 0) AS c
        |  FROM verts v LEFT JOIN (
        |    SELECT u.dst AS id, sum(p.c * u.weight) AS in_sum
        |    FROM ed u JOIN $prev p ON p.id = u.src GROUP BY 1
        |  ) s ON s.id = v.id
        |),
        |e${i}c AS MATERIALIZED (
        |  SELECT id, c / (SELECT CASE WHEN sqrt(sum(c*c)) = 0 THEN 1 ELSE sqrt(sum(c*c)) END FROM e${i}r) AS c
        |  FROM e${i}r
        |)""".stripMargin
      b ++= (if (i < iters) ",\n" else "\n")
    }
    b ++= s"SELECT id, round(c, 6) AS ec FROM e${iters}c"
    b.toString
  }

  /** Weighted directed PageRank with dangling-mass redistribution over the
    * stored edges (OracleSql.pagerankCustSupp over a VALUES edge list —
    * karate-asymmetric's one-direction storage leaves sink vertices). */
  def pagerank(edges: Seq[(Long, Long, Double)], iters: Int,
               alpha: Double = 0.85): String = {
    val b = new StringBuilder
    b ++= s"WITH ${wCte(edges)},\n"
    b ++= "nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),\n"
    b ++= "outw AS MATERIALIZED (SELECT src AS id, sum(weight) AS w FROM ed GROUP BY 1),\n"
    b ++= "dang AS MATERIALIZED (SELECT v.id FROM verts v LEFT JOIN outw o ON o.id = v.id WHERE o.id IS NULL),\n"
    b ++= "p0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nv) AS pr FROM verts),\n"
    for (i <- 1 to iters) {
      b ++= s"""dm$i AS MATERIALIZED (
        |  SELECT coalesce(sum(p.pr), 0) AS m FROM p${i - 1} p JOIN dang d ON d.id = p.id
        |),
        |p$i AS MATERIALIZED (
        |  SELECT v.id,
        |    $alpha * (coalesce(s.in_sum, 0) + (SELECT m FROM dm$i) / (SELECT n FROM nv))
        |      + ${1.0 - alpha} / (SELECT n FROM nv) AS pr
        |  FROM verts v LEFT JOIN (
        |    SELECT e.dst AS id, sum(p.pr * e.weight / o.w) AS in_sum
        |    FROM ed e JOIN p${i - 1} p ON p.id = e.src JOIN outw o ON o.id = e.src
        |    GROUP BY 1
        |  ) s ON s.id = v.id
        |)""".stripMargin
      b ++= (if (i < iters) ",\n" else "\n")
    }
    b ++= s"SELECT id, round(pr, 6) AS pagerank FROM p$iters"
    b.toString
  }

  /** Per-vertex triangle counts (the q_karate_triangles oracle shape). */
  def triangles(pairs: Seq[(Long, Long)]): String =
    s"""WITH ${undCte(pairs)},
       |tri AS MATERIALIZED (
       |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |  FROM canon e1 JOIN canon e2 ON e1.dst = e2.src
       |  WHERE EXISTS (SELECT 1 FROM canon e3 WHERE e3.src = e1.src AND e3.dst = e2.dst)
       |),
       |cnt AS MATERIALIZED (
       |  SELECT id, count(*) AS triangle_count FROM (
       |    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
       |  ) GROUP BY id
       |)
       |SELECT v.id, coalesce(c.triangle_count, 0) AS triangle_count
       |FROM verts v LEFT JOIN cnt c ON c.id = v.id""".stripMargin

  /** Global top-k Jaccard over 2-hop candidate pairs (a<b): rank by the
    * unrounded coefficient with (src, dst) tie-break — exactly the Spark
    * side's `allPairs(topK=Some(k))` ordering — and round only the
    * reported value. */
  def jaccardTopK(pairs: Seq[(Long, Long)], k: Int): String =
    s"""WITH ${undCte(pairs)},
       |deg AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM und GROUP BY 1),
       |inter AS MATERIALIZED (
       |  SELECT n1.src AS a, n2.src AS b, count(*) AS i
       |  FROM und n1 JOIN und n2 ON n1.dst = n2.dst AND n1.src < n2.src
       |  GROUP BY 1, 2
       |),
       |scored AS MATERIALIZED (
       |  SELECT i.a AS src, i.b AS dst,
       |         CAST(i.i AS DOUBLE) / (da.d + db.d - i.i) AS jc_raw
       |  FROM inter i JOIN deg da ON da.id = i.a JOIN deg db ON db.id = i.b
       |)
       |SELECT src, dst, round(jc_raw, 6) AS jaccard_coeff
       |FROM scored ORDER BY jc_raw DESC, src, dst LIMIT $k""".stripMargin

  /** Min-label propagation WCC, unrolled `rounds` times (OracleSql
    * .wccSupplier over a VALUES edge list — weights irrelevant). */
  def wcc(pairs: Seq[(Long, Long)], rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH ${undCte(pairs)},\n"
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
}
