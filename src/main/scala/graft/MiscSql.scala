package graft

/** DuckDB oracles for the Luby-round algorithms (MIS, matching) and the
  * lookup/summary structure queries. Same hash60 priorities as the Spark
  * side, rounds unrolled. */
object MiscSql {
  import Fixtures._

  private def h60(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** Tree fixture (hierarchyDag, symmetrized) shared prelude. */
  private val DAG_PRELUDE =
    """dagu AS MATERIALIZED (
      |  SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(n_nationkey + 100 AS BIGINT) AS dst FROM nation
      |  UNION ALL
      |  SELECT CAST(s_nationkey + 100 AS BIGINT), CAST(s_suppkey + 1000 AS BIGINT) FROM supplier
      |),
      |dund AS MATERIALIZED (SELECT src, dst FROM dagu UNION ALL SELECT dst, src FROM dagu),
      |dverts AS MATERIALIZED (SELECT src AS id FROM dagu UNION SELECT dst FROM dagu)""".stripMargin

  /** Luby MIS on the tree fixture, `rounds` unrolled rounds: a vertex wins
    * when no remaining neighbor has smaller (priority, id). */
  def misTree(rounds: Int, seed: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH $DAG_PRELUDE,\n"
    b ++= s"pri AS MATERIALIZED (SELECT id, ${h60(s"concat_ws('|', 'mis', id, $seed)")} AS p FROM dverts),\n"
    b ++= "rem1 AS MATERIALIZED (SELECT id FROM dverts),\n"
    for (r <- 1 to rounds) {
      b ++= s"""mis$r AS MATERIALIZED (
        |  SELECT v.id FROM rem$r v JOIN pri pv ON pv.id = v.id
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM dund e JOIN rem$r u ON u.id = e.dst JOIN pri pu ON pu.id = u.id
        |    WHERE e.src = v.id AND (pu.p < pv.p OR (pu.p = pv.p AND u.id < v.id))
        |  )
        |),
        |kill$r AS MATERIALIZED (
        |  SELECT id FROM mis$r
        |  UNION SELECT e.dst FROM dund e JOIN mis$r m ON m.id = e.src
        |),
        |rem${r + 1} AS MATERIALIZED (
        |  SELECT id FROM rem$r WHERE NOT EXISTS (SELECT 1 FROM kill$r k WHERE k.id = rem$r.id)
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "allmis AS (" + (1 to rounds).map(r => s"SELECT id FROM mis$r").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT id FROM allmis"
    b.toString
  }

  /** Greedy repeated-MIS coloring on the tree fixture, nested unroll:
    * color c = Luby MIS (seed+c priorities) over the still-uncolored
    * vertices, `misRounds` unrolled per color, `colors` colors. Extra
    * colors/rounds past convergence are no-ops (empty CTEs). */
  def coloringTree(colors: Int, misRounds: Int, seed: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH $DAG_PRELUDE,\n"
    b ++= "remc0 AS MATERIALIZED (SELECT id FROM dverts),\n"
    for (c <- 0 until colors) {
      b ++= s"pri$c AS MATERIALIZED (SELECT id, ${h60(s"concat_ws('|', 'mis', id, ${seed + c})")} AS p FROM dverts),\n"
      b ++= s"rem${c}_1 AS MATERIALIZED (SELECT id FROM remc$c),\n"
      for (r <- 1 to misRounds) {
        b ++= s"""mis${c}_$r AS MATERIALIZED (
          |  SELECT v.id FROM rem${c}_$r v JOIN pri$c pv ON pv.id = v.id
          |  WHERE NOT EXISTS (
          |    SELECT 1 FROM dund e JOIN rem${c}_$r u ON u.id = e.dst JOIN pri$c pu ON pu.id = u.id
          |    WHERE e.src = v.id AND (pu.p < pv.p OR (pu.p = pv.p AND u.id < v.id))
          |  )
          |),
          |kill${c}_$r AS MATERIALIZED (
          |  SELECT id FROM mis${c}_$r
          |  UNION SELECT e.dst FROM dund e JOIN mis${c}_$r m ON m.id = e.src
          |),
          |rem${c}_${r + 1} AS MATERIALIZED (
          |  SELECT id FROM rem${c}_$r WHERE NOT EXISTS (SELECT 1 FROM kill${c}_$r k WHERE k.id = rem${c}_$r.id)
          |)""".stripMargin
        b ++= ",\n"
      }
      b ++= s"col$c AS MATERIALIZED (" + (1 to misRounds).map(r =>
        s"SELECT id FROM mis${c}_$r").mkString(" UNION ALL ") + "),\n"
      b ++= s"""remc${c + 1} AS MATERIALIZED (
        |  SELECT id FROM remc$c WHERE NOT EXISTS (SELECT 1 FROM col$c k WHERE k.id = remc$c.id)
        |)""".stripMargin
      b ++= (if (c < colors - 1) ",\n" else "\n")
    }
    b ++= "SELECT id, CAST(color AS BIGINT) AS color FROM (" +
      (0 until colors).map(c => s"SELECT id, $c AS color FROM col$c").mkString(" UNION ALL ") + ")"
    b.toString
  }

  /** k-core of the supplier graph: cascade peel at level k, unrolled. */
  def kcoreSupplier(k: Int, rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n"
    b ++= "t0 AS MATERIALIZED (SELECT src, dst FROM supp_edges),\n"
    for (r <- 1 to rounds) {
      b ++= s"""dg$r AS MATERIALIZED (
        |  SELECT id, count(*) AS d FROM (
        |    SELECT src AS id FROM t${r - 1} UNION ALL SELECT dst FROM t${r - 1}
        |  ) GROUP BY id
        |),
        |wk$r AS MATERIALIZED (SELECT id FROM dg$r WHERE d < $k),
        |t$r AS MATERIALIZED (
        |  SELECT e.src, e.dst FROM t${r - 1} e
        |  WHERE NOT EXISTS (SELECT 1 FROM wk$r w WHERE w.id = e.src)
        |    AND NOT EXISTS (SELECT 1 FROM wk$r w WHERE w.id = e.dst)
        |)""".stripMargin
      b ++= (if (r < rounds) ",\n" else "\n")
    }
    b ++= s"SELECT src, dst FROM t$rounds"
    b.toString
  }

  /** Handshake weighted matching on the supplier graph, `rounds` unrolled:
    * per round each vertex points at arg_max(weight·1e6 − dst); mutual
    * pairs retire. */
  def matchingSupplier(rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n"
    b ++= "re0 AS MATERIALIZED (SELECT src, dst, weight FROM und WHERE src <> dst),\n"
    for (r <- 1 to rounds) {
      b ++= s"""b$r AS MATERIALIZED (
        |  SELECT src, arg_max(dst, weight * 1000000.0 - dst) AS m FROM re${r - 1} GROUP BY src
        |),
        |p$r AS MATERIALIZED (
        |  SELECT a.src, a.m AS dst FROM b$r a JOIN b$r b ON b.src = a.m AND b.m = a.src
        |  WHERE a.src < a.m
        |),
        |pall$r AS MATERIALIZED (${(1 to r).map(i => s"SELECT src, dst FROM p$i").mkString(" UNION ALL ")}),
        |mv$r AS MATERIALIZED (SELECT src AS id FROM pall$r UNION SELECT dst FROM pall$r),
        |re$r AS MATERIALIZED (
        |  SELECT e.src, e.dst, e.weight FROM re${r - 1} e
        |  WHERE NOT EXISTS (SELECT 1 FROM mv$r k WHERE k.id = e.src)
        |    AND NOT EXISTS (SELECT 1 FROM mv$r k WHERE k.id = e.dst)
        |)""".stripMargin
      b ++= (if (r < rounds) ",\n" else "\n")
    }
    b ++= s"SELECT src, dst FROM pall$rounds"
    b.toString
  }

  /** Borůvka MST on the supplier graph, `rounds` unrolled merge rounds:
    * per round each component picks its min cross-component edge by the
    * scalar key weight·1e10 + src·1e5 + dst (exact in double for integral
    * weights and ids < 1e5 — same total order as the Spark side's
    * struct(weight, src, dst) min), then components merge by min-label
    * closure (recursive CTE). Extra rounds past convergence are no-ops. */
  def mstSupplier(rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH RECURSIVE $SUPP_EDGES_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= "ek AS MATERIALIZED (SELECT src, dst, weight, weight * 1e10 + src * 1e5 + dst AS k FROM supp_edges),\n"
    b ++= "comp0 AS MATERIALIZED (SELECT id, id AS comp FROM verts),\n"
    for (r <- 1 to rounds) {
      b ++= s"""cr$r AS MATERIALIZED (
        |  SELECT e.src, e.dst, e.weight, e.k, ca.comp AS c1, cb.comp AS c2
        |  FROM ek e JOIN comp${r - 1} ca ON ca.id = e.src JOIN comp${r - 1} cb ON cb.id = e.dst
        |  WHERE ca.comp <> cb.comp
        |),
        |mk$r AS MATERIALIZED (
        |  SELECT comp, min(k) AS k FROM (
        |    SELECT c1 AS comp, k FROM cr$r UNION ALL SELECT c2, k FROM cr$r
        |  ) GROUP BY comp
        |),
        |ch$r AS MATERIALIZED (
        |  SELECT DISTINCT c.src, c.dst, c.weight, c.c1, c.c2 FROM cr$r c
        |  JOIN mk$r m ON c.k = m.k AND (m.comp = c.c1 OR m.comp = c.c2)
        |),
        |cg$r AS MATERIALIZED (SELECT c1 AS a, c2 AS b FROM ch$r UNION SELECT c2, c1 FROM ch$r),
        |reach$r(a, b) AS (
        |  SELECT comp, comp FROM (SELECT DISTINCT comp FROM comp${r - 1})
        |  UNION
        |  SELECT rr.a, g.b FROM reach$r rr JOIN cg$r g ON g.a = rr.b
        |),
        |newl$r AS MATERIALIZED (SELECT a AS comp, min(b) AS newc FROM reach$r GROUP BY a),
        |comp$r AS MATERIALIZED (
        |  SELECT c.id, n.newc AS comp FROM comp${r - 1} c JOIN newl$r n ON n.comp = c.comp
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "mst AS (" + (1 to rounds).map(r =>
      s"SELECT src, dst, weight FROM ch$r").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT DISTINCT src, dst, weight FROM mst"
    b.toString
  }

  /** Edge-id lookup: dense canonical ids, probe every 7th id. */
  def edgeLookup: String =
    s"""WITH $SUPP_EDGES_SQL,
       |etab AS MATERIALIZED (
       |  SELECT src, dst,
       |         CAST(row_number() OVER (ORDER BY src, dst) AS BIGINT) AS edge_id,
       |         CAST((src + dst) % 3 AS INT) AS edge_type
       |  FROM supp_edges
       |)
       |SELECT edge_id, edge_type, src, dst FROM etab WHERE edge_id % 7 = 0""".stripMargin

  /** One-row structural summary of the supplier graph. */
  def graphSummary: String =
    s"""WITH $SUPP_EDGES_SQL,
       |$SUPP_VERTS_SQL,
       |nv AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS v FROM verts),
       |ne AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS e FROM supp_edges)
       |SELECT (SELECT v FROM nv) AS num_vertices,
       |       (SELECT e FROM ne) AS num_edges,
       |       CAST((SELECT count(*) FROM supp_edges WHERE src = dst) AS BIGINT) AS self_loops,
       |       (SELECT e FROM ne) - CAST((SELECT count(*) FROM (SELECT DISTINCT src, dst FROM supp_edges)) AS BIGINT) AS multi_edges,
       |       round(CAST((SELECT e FROM ne) AS DOUBLE) / ((SELECT v FROM nv) * ((SELECT v FROM nv) - 1)), 6) AS density""".stripMargin
}
