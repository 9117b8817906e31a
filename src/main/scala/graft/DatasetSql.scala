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
