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

  /** Speculative coloring on the tree fixture: hash-mod-k initial colors,
    * then `rounds` unrolled conflict-repair rounds — the lower-priority
    * endpoint of each monochromatic edge picks a HASH-JITTERED color among
    * those absent from its neighborhood (candidates
    * 0..2·#distinct-neighbor-colors+1 ranked ascending — the doubled range
    * that keeps the free set ≥ n+2 in dense cores; index = hash60(id,
    * round) mod #free — the jitter that makes simultaneous adjacent
    * repairs decay geometrically instead of re-colliding on the shared
    * smallest value; see the r11 scale-20 finding on
    * `Misc.fastColoringWithStats`). Mirrors it exactly; rounds past
    * convergence are no-ops (empty conflict CTEs). */
  def fastColoringTree(initColors: Int, rounds: Int, seed: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH $DAG_PRELUDE,\n"
    b ++= s"fpri AS MATERIALIZED (SELECT id, ${h60(s"concat_ws('|', 'colp', id, $seed)")} AS p FROM dverts),\n"
    b ++= s"fcol0 AS MATERIALIZED (SELECT id, ${h60(s"concat_ws('|', 'color', id, $seed)")} % $initColors AS color FROM dverts)"
    for (r <- 1 to rounds) {
      b ++= ",\n"
      b ++= s"""fconf$r AS MATERIALIZED (
        |  SELECT DISTINCT CASE WHEN (ps.p > pd.p OR (ps.p = pd.p AND e.src > e.dst))
        |    THEN e.src ELSE e.dst END AS id
        |  FROM dund e
        |  JOIN fcol${r - 1} cs ON cs.id = e.src
        |  JOIN fcol${r - 1} cd ON cd.id = e.dst
        |  JOIN fpri ps ON ps.id = e.src
        |  JOIN fpri pd ON pd.id = e.dst
        |  WHERE cs.color = cd.color AND e.src <> e.dst
        |),
        |fnbr$r AS MATERIALIZED (
        |  SELECT DISTINCT e.src AS id, cd.color AS nc
        |  FROM dund e JOIN fconf$r l ON l.id = e.src
        |  JOIN fcol${r - 1} cd ON cd.id = e.dst
        |  WHERE e.src <> e.dst
        |),
        |ffree$r AS MATERIALIZED (
        |  SELECT c.id, c.c,
        |         row_number() OVER (PARTITION BY c.id ORDER BY c.c) AS rk,
        |         count(*) OVER (PARTITION BY c.id) AS nf
        |  FROM (
        |    SELECT id, unnest(generate_series(0, 2 * n + 1)) AS c
        |    FROM (SELECT id, count(*) AS n FROM fnbr$r GROUP BY id)
        |  ) c
        |  WHERE NOT EXISTS (SELECT 1 FROM fnbr$r x WHERE x.id = c.id AND x.nc = c.c)
        |),
        |fpick$r AS MATERIALIZED (
        |  SELECT id, c AS newc FROM ffree$r
        |  WHERE rk = 1 + ${h60(s"concat_ws('|', 'coljit', id, $r, $seed)")} % nf
        |),
        |fcol$r AS MATERIALIZED (
        |  SELECT c.id, COALESCE(p.newc, c.color) AS color
        |  FROM fcol${r - 1} c LEFT JOIN fpick$r p ON p.id = c.id
        |)""".stripMargin
    }
    b ++= s"\nSELECT id, CAST(color AS BIGINT) AS color FROM fcol$rounds"
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

  /** k-truss of the deterministic RMAT(scale 8, 1024 edges) fixture:
    * `rounds` unrolled full-recompute peels (support via triangle count →
    * filter ≥ k−2) over the canonical simple undirected edges. Unlike
    * ktrussSupplier's fixture (the near-complete supplier co-order graph,
    * where the degree lower bound proves round 1 deletes nothing), the
    * RMAT graph actually peels for several rounds — this is the driver
    * gate for the round LOOP itself, in both its maintenance regimes
    * (incremental seeded-wedge and the r11 bulk recompute). Spark asserts
    * fixpoint within `rounds`. */
  def ktrussRmat(k: Int, rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH raw AS MATERIALIZED (\n  ${GenSql.rmat(scale = 8, numEdges = 1024).replace("\n", "\n  ")}\n),\n"
    b ++= "t0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM raw WHERE src <> dst),\n"
    for (i <- 1 to rounds) {
      b ++= s"""tri$i AS MATERIALIZED (
        |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |  FROM t${i - 1} e1 JOIN t${i - 1} e2 ON e1.dst = e2.src
        |  WHERE EXISTS (SELECT 1 FROM t${i - 1} e3 WHERE e3.src = e1.src AND e3.dst = e2.dst)
        |),
        |sup$i AS MATERIALIZED (
        |  SELECT src, dst, count(*) AS s FROM (
        |    SELECT a AS src, b AS dst FROM tri$i
        |    UNION ALL SELECT b, c FROM tri$i
        |    UNION ALL SELECT a, c FROM tri$i
        |  ) GROUP BY 1, 2
        |),
        |t$i AS MATERIALIZED (
        |  SELECT e.src, e.dst FROM t${i - 1} e JOIN sup$i s ON s.src = e.src AND s.dst = e.dst
        |  WHERE s.s >= ${k - 2}
        |)""".stripMargin
      b ++= (if (i < rounds) ",\n" else "\n")
    }
    b ++= s"SELECT src, dst FROM t$rounds"
    b.toString
  }

  /** Core numbers of the deterministic RMAT(scale 8, 1024 edges) fixture —
    * SF-independent, so the Spark-side budget asserts hold at every scale
    * factor. core(v) = max k such that v survives the k-core cascade peel;
    * each k-level is unrolled `rounds` delete-rounds starting from the
    * (k-1)-core (monotone), vertices with only self-loops get core 0.
    * Matches `Components.coreNumber` over `canonicalize(symmetrize(e))`. */
  def coreNumberRmat(maxK: Int, rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH raw AS MATERIALIZED (\n  ${GenSql.rmat(scale = 8, numEdges = 1024).replace("\n", "\n  ")}\n),\n"
    b ++= "allv AS MATERIALIZED (SELECT src AS id FROM raw UNION SELECT dst FROM raw),\n"
    // canonical undirected simple graph = the 1-core start state (t1):
    // every endpoint has degree >= 1, so peel at k=1 deletes nothing.
    b ++= "c1_f AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM raw WHERE src <> dst),\n"
    var prev = "c1_f"
    for (k <- 2 to maxK) {
      for (r <- 1 to rounds) {
        val cur = s"c${k}_$r"
        b ++= s"""dg${k}_$r AS MATERIALIZED (
          |  SELECT id, count(*) AS d FROM (
          |    SELECT src AS id FROM $prev UNION ALL SELECT dst FROM $prev
          |  ) GROUP BY id
          |),
          |wk${k}_$r AS MATERIALIZED (SELECT id FROM dg${k}_$r WHERE d < $k),
          |$cur AS MATERIALIZED (
          |  SELECT e.src, e.dst FROM $prev e
          |  WHERE NOT EXISTS (SELECT 1 FROM wk${k}_$r w WHERE w.id = e.src)
          |    AND NOT EXISTS (SELECT 1 FROM wk${k}_$r w WHERE w.id = e.dst)
          |)""".stripMargin
        b ++= ",\n"
        prev = cur
      }
      b ++= s"c${k}_f AS MATERIALIZED (SELECT src, dst FROM $prev),\n"
      prev = s"c${k}_f"
    }
    b ++= "pres AS MATERIALIZED (\n  " + (1 to maxK).map { k =>
      s"SELECT src AS id, $k AS k FROM c${k}_f UNION ALL SELECT dst, $k FROM c${k}_f"
    }.mkString("\n  UNION ALL ") + "\n)\n"
    b ++= """SELECT v.id, CAST(coalesce(max(p.k), 0) AS BIGINT) AS core_number
      |FROM allv v LEFT JOIN pres p ON p.id = v.id GROUP BY v.id""".stripMargin
    b.toString
  }

  /** Directed-degree core numbers of the RMAT fixture
    * (`degree_type=incoming/outgoing`): same per-k cascade unroll as the
    * bidirectional oracle, but peeling the DIRECTED simple graph by
    * in-/out-degree — a vertex absent from the degree table counts 0, so
    * every stage tracks the alive endpoint set explicitly. */
  def coreNumberRmatDirected(mode: String, maxK: Int, rounds: Int): String = {
    val degCol = if (mode == "incoming") "dst" else "src"
    val b = new StringBuilder
    b ++= s"WITH raw AS MATERIALIZED (\n  ${GenSql.rmat(scale = 8, numEdges = 1024).replace("\n", "\n  ")}\n),\n"
    b ++= "allv AS MATERIALIZED (SELECT src AS id FROM raw UNION SELECT dst FROM raw),\n"
    b ++= "c0_f AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),\n"
    var prev = "c0_f"
    for (k <- 1 to maxK) {
      for (r <- 1 to rounds) {
        val cur = s"c${k}_$r"
        b ++= s"""av${k}_$r AS MATERIALIZED (SELECT src AS id FROM $prev UNION SELECT dst FROM $prev),
          |dg${k}_$r AS MATERIALIZED (SELECT $degCol AS id, count(*) AS d FROM $prev GROUP BY 1),
          |wk${k}_$r AS MATERIALIZED (
          |  SELECT a.id FROM av${k}_$r a LEFT JOIN dg${k}_$r g ON g.id = a.id
          |  WHERE coalesce(g.d, 0) < $k
          |),
          |$cur AS MATERIALIZED (
          |  SELECT e.src, e.dst FROM $prev e
          |  WHERE NOT EXISTS (SELECT 1 FROM wk${k}_$r w WHERE w.id = e.src)
          |    AND NOT EXISTS (SELECT 1 FROM wk${k}_$r w WHERE w.id = e.dst)
          |)""".stripMargin
        b ++= ",\n"
        prev = cur
      }
      b ++= s"c${k}_f AS MATERIALIZED (SELECT src, dst FROM $prev),\n"
      prev = s"c${k}_f"
    }
    b ++= "pres AS MATERIALIZED (\n  " + (1 to maxK).map { k =>
      s"SELECT src AS id, $k AS k FROM c${k}_f UNION ALL SELECT dst, $k FROM c${k}_f"
    }.mkString("\n  UNION ALL ") + "\n)\n"
    b ++= """SELECT v.id, CAST(coalesce(max(p.k), 0) AS BIGINT) AS core_number
      |FROM allv v LEFT JOIN pres p ON p.id = v.id GROUP BY v.id""".stripMargin
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
    * struct(weight, src, dst) min), then components merge by a FIXED
    * `jumpSteps`-step pointer-doubling closure over the chosen-edge graph
    * (g_{k+1} = g_k ∘ g_k with identity seeded, so g_k holds all paths of
    * length ≤ 2^k; 2^jumpSteps must exceed the merge-tree diameter, which
    * is bounded by the vertex count — 8 covers 256 ≫ the ~100-supplier
    * fixture). Plain MATERIALIZED CTEs only: the r4 WITH RECURSIVE
    * transitive closure never terminated in DuckDB 1.0 (re-inlined per
    * reference, compounding across unrolled rounds) and zeroed the round's
    * gate. Extra rounds past convergence are no-ops.
    * `maximum` negates the weight term of the key — the Spark side's
    * maximum_spanning_tree runs min-Borůvka on negated weights, so the
    * scalar key −w·1e10 + src·1e5 + dst reproduces its total order
    * exactly (tie-break unchanged). */
  def mstSupplier(rounds: Int, maximum: Boolean = false, jumpSteps: Int = 8): String = {
    val wKey = if (maximum) "-weight" else "weight"
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= s"ek AS MATERIALIZED (SELECT src, dst, weight, $wKey * 1e10 + src * 1e5 + dst AS k FROM supp_edges),\n"
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
        |g${r}_0 AS MATERIALIZED (
        |  SELECT comp AS a, comp AS b FROM (SELECT DISTINCT comp FROM comp${r - 1})
        |  UNION SELECT c1, c2 FROM ch$r UNION SELECT c2, c1 FROM ch$r
        |)""".stripMargin
      b ++= ",\n"
      for (j <- 1 to jumpSteps) {
        b ++= s"g${r}_$j AS MATERIALIZED (SELECT DISTINCT x.a, y.b FROM g${r}_${j - 1} x JOIN g${r}_${j - 1} y ON y.a = x.b),\n"
      }
      b ++= s"""newl$r AS MATERIALIZED (SELECT a AS comp, min(b) AS newc FROM g${r}_$jumpSteps GROUP BY a),
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

  /** ForceAtlas2 layout on the supplier graph, `iters` unrolled force
    * rounds. Same hash60 init, same grid-binned repulsion, same force
    * expression shapes, and the same per-round 1e-8 position snap as
    * `Misc.forceAtlas2` — the snap is what makes the float iteration
    * reproducible across engines. */
  def fa2Supplier(iters: Int, gridSize: Int = 16, step: Double = 0.05,
                  seed: Long = 42): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= "u2 AS MATERIALIZED (SELECT src, dst FROM supp_edges UNION ALL SELECT dst, src FROM supp_edges),\n"
    b ++= s"""pos0 AS MATERIALIZED (
      |  SELECT id,
      |    CAST(${h60(s"concat_ws('|', 'fa2x', id, $seed)")} AS DOUBLE) / 1152921504606846976.0 AS x,
      |    CAST(${h60(s"concat_ws('|', 'fa2y', id, $seed)")} AS DOUBLE) / 1152921504606846976.0 AS y
      |  FROM verts
      |)""".stripMargin
    b ++= ",\n"
    // two-level quadtree repulsion, mirroring Misc.forceAtlas2(quadtree):
    // near field (parent coarse cell within Chebyshev 1 of the vertex's
    // coarse cell) at fine gridSize resolution, far field from coarse
    // gridSize/4 weighted centroids derived FROM the fine table
    val coarseN = math.max(gridSize / 4, 1)
    def krn(v: String) =
      s"(p.$v - c.m$v) * c.cnt / (pow(p.x - c.mx, 2) + pow(p.y - c.my, 2) + 1e-4)"
    for (i <- 1 to iters) {
      val p = s"pos${i - 1}"
      b ++= s"""att$i AS MATERIALIZED (
        |  SELECT e.src AS id, sum(pd.x - ps.x) AS ax, sum(pd.y - ps.y) AS ay
        |  FROM u2 e JOIN $p ps ON ps.id = e.src JOIN $p pd ON pd.id = e.dst
        |  GROUP BY e.src
        |),
        |fcells$i AS MATERIALIZED (
        |  SELECT floor(x * $gridSize) AS cx, floor(y * $gridSize) AS cy,
        |         count(*) AS cnt, avg(x) AS mx, avg(y) AS my
        |  FROM $p GROUP BY 1, 2
        |),
        |fpar$i AS MATERIALIZED (
        |  SELECT cnt, mx, my, CAST(floor(cx / 4) AS BIGINT) AS px,
        |         CAST(floor(cy / 4) AS BIGINT) AS py
        |  FROM fcells$i
        |),
        |ccells$i AS MATERIALIZED (
        |  SELECT px, py, sum(cnt) AS cnt,
        |         sum(mx * cnt) / sum(cnt) AS mx, sum(my * cnt) / sum(cnt) AS my
        |  FROM fpar$i GROUP BY 1, 2
        |),
        |rep$i AS MATERIALIZED (
        |  SELECT id, x, y, sum(rx) AS rx, sum(ry) AS ry FROM (
        |    SELECT p.id, p.x, p.y, ${krn("x")} AS rx, ${krn("y")} AS ry
        |    FROM $p p CROSS JOIN fpar$i c
        |    WHERE abs(c.px - floor(p.x * $coarseN)) <= 1
        |      AND abs(c.py - floor(p.y * $coarseN)) <= 1
        |    UNION ALL
        |    SELECT p.id, p.x, p.y, ${krn("x")} AS rx, ${krn("y")} AS ry
        |    FROM $p p CROSS JOIN ccells$i c
        |    WHERE abs(c.px - floor(p.x * $coarseN)) > 1
        |       OR abs(c.py - floor(p.y * $coarseN)) > 1
        |  ) GROUP BY 1, 2, 3
        |),
        |pos$i AS MATERIALIZED (
        |  SELECT r.id,
        |    round(least(greatest(r.x + $step * (coalesce(a.ax, 0) * 0.1 + r.rx * 0.01), 0), 1), 8) AS x,
        |    round(least(greatest(r.y + $step * (coalesce(a.ay, 0) * 0.1 + r.ry * 0.01), 0), 1), 8) AS y
        |  FROM rep$i r LEFT JOIN att$i a ON a.id = r.id
        |)""".stripMargin
      b ++= (if (i < iters) ",\n" else "\n")
    }
    b ++= s"SELECT id, round(x, 6) AS x, round(y, 6) AS y FROM pos$iters"
    b.toString
  }

  /** Spectral num_eigen_vects clustering on the supplier graph — the full
    * `Spectral.balancedCutEigen` pipeline unrolled: p=4 orthogonal
    * iteration on D^{-1/2} A D^{-1/2} (matvec → Gram → Cholesky → back-
    * substituted inverse → re-projection, all as scalar SQL with the SAME
    * left-associative operation order as the Scala driver math), then
    * deterministic k-means. Engine-reproducible because both sides snap
    * the embedding and the centroids to 1e-8 each round (the ForceAtlas2
    * oracle trick); everything between snaps is IEEE double arithmetic in
    * matching order, so the 1e-8 quantization absorbs the only divergence
    * source (distributed-sum association in matvec/Gram/avg). */
  def spectralEigenSupplier(iters: Int = 12, k: Int = 4, kmeansIters: Int = 5,
                            seed: Long = 42): String = {
    val xs = 0 until 4
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n"
    b ++= "wdeg AS MATERIALIZED (SELECT src AS id, sum(weight) AS d FROM und GROUP BY 1),\n"
    b ++= """anorm AS MATERIALIZED (
      |  SELECT e.src, e.dst, e.weight / sqrt(ds.d * dd.d) AS w
      |  FROM und e JOIN wdeg ds ON ds.id = e.src JOIN wdeg dd ON dd.id = e.dst
      |),
      |""".stripMargin
    b ++= "x0 AS MATERIALIZED (\n  SELECT id,\n" +
      xs.map(j => s"    CAST(${h60(s"concat_ws('|', 'eig', id, $j, $seed)")} AS DOUBLE)" +
        s" / 1152921504606846976.0 - 0.5 AS x$j").mkString(",\n") +
      "\n  FROM (SELECT DISTINCT src AS id FROM und)\n),\n"
    for (i <- 1 to iters) {
      val p = s"x${i - 1}"
      b ++= s"y$i AS MATERIALIZED (\n  SELECT a.src AS id,\n" +
        xs.map(j => s"    sum(a.w * x.x$j) AS x$j").mkString(",\n") +
        s"\n  FROM anorm a JOIN $p x ON x.id = a.dst GROUP BY a.src\n),\n"
      b ++= s"g$i AS MATERIALIZED (\n  SELECT " +
        (for (a <- xs; c <- xs if a <= c) yield s"sum(x$a * x$c) AS g$a$c").mkString(", ") +
        s"\n  FROM y$i\n),\n"
      // Cholesky RᵀR = G, row by row — subtraction order matches the
      // Scala loop's sequential s -= r(i)(j)² accumulation
      b ++= s"""r$i AS MATERIALIZED (
        |  SELECT
        |    sqrt(greatest(g00, 1e-300)) AS r00,
        |    g01 / r00 AS r01, g02 / r00 AS r02, g03 / r00 AS r03,
        |    sqrt(greatest(g11 - r01*r01, 1e-300)) AS r11,
        |    (g12 - r01*r02) / r11 AS r12, (g13 - r01*r03) / r11 AS r13,
        |    sqrt(greatest(g22 - r02*r02 - r12*r12, 1e-300)) AS r22,
        |    (g23 - r02*r03 - r12*r13) / r22 AS r23,
        |    sqrt(greatest(g33 - r03*r03 - r13*r13 - r23*r23, 1e-300)) AS r33
        |  FROM g$i
        |),
        |inv$i AS MATERIALIZED (
        |  SELECT
        |    1.0/r00 AS u00, 1.0/r11 AS u11, 1.0/r22 AS u22, 1.0/r33 AS u33,
        |    -(r01*u11)/r00 AS u01,
        |    -(r12*u22)/r11 AS u12,
        |    -(r01*u12 + r02*u22)/r00 AS u02,
        |    -(r23*u33)/r22 AS u23,
        |    -(r12*u23 + r13*u33)/r11 AS u13,
        |    -(r01*u13 + r02*u23 + r03*u33)/r00 AS u03
        |  FROM r$i
        |),
        |""".stripMargin
      b ++= s"x$i AS MATERIALIZED (\n  SELECT id,\n" +
        xs.map(j => "    round(" +
          (0 to j).map(a => s"x$a*u$a$j").mkString(" + ") + s", 8) AS x$j").mkString(",\n") +
        s"\n  FROM y$i CROSS JOIN inv$i\n),\n"
    }
    val xf = s"x$iters"
    b ++= s"cent0 AS MATERIALIZED (\n" +
      s"  SELECT row_number() OVER (ORDER BY id) - 1 AS cid, " +
      xs.map(j => s"x$j").mkString(", ") +
      s"\n  FROM $xf ORDER BY id LIMIT $k\n),\n"
    val d2 = xs.map(j => s"(p.x$j - c.x$j)*(p.x$j - c.x$j)").mkString(" + ")
    for (r <- 1 to kmeansIters + 1) {
      b ++= s"""as$r AS MATERIALIZED (
        |  SELECT id, ${xs.map(j => s"x$j").mkString(", ")}, cid AS cluster FROM (
        |    SELECT p.*, c.cid,
        |      row_number() OVER (PARTITION BY p.id ORDER BY $d2, c.cid) AS rn
        |    FROM $xf p CROSS JOIN cent${r - 1} c
        |  ) WHERE rn = 1
        |)""".stripMargin
      if (r <= kmeansIters)
        b ++= s",\ncent$r AS MATERIALIZED (\n  SELECT cluster AS cid, " +
          xs.map(j => s"round(avg(x$j), 8) AS x$j").mkString(", ") +
          s"\n  FROM as$r GROUP BY 1\n),\n"
      else b ++= "\n"
    }
    b ++= s"SELECT id, CAST(cluster AS BIGINT) AS cluster FROM as${kmeansIters + 1}"
    b.toString
  }

  /** Spectral PIC clustering on the supplier graph — `Spectral.balancedCut`
    * (degreeInit) / `modularityMaximization` (hash init) unrolled: the
    * constant-deflated power iteration v ← (Wv − mean)/max|·| on W = D⁻¹A
    * (the Fiedler embedding of the random-walk Laplacian), embedding
    * snapped to 1e-8 per round, then the deterministic 1-D k-means
    * (evenly spaced seed centroids over [min,max], Lloyd rounds with
    * (distance, cid) arg-min, centroids snapped to 1e-8). Every scalar
    * (n, Σv, min, max) is recomputed here from the same snapped state, and
    * everything between snaps is IEEE double arithmetic in matching
    * operation order, so the 1e-8 quantization absorbs the only divergence
    * source (distributed-sum association). */
  def spectralPicSupplier(iters: Int = 10, k: Int = 4, kmeansIters: Int = 5,
                          degreeInit: Boolean = true, seed: Long = 42): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n"
    b ++= "wdeg AS MATERIALIZED (SELECT src AS id, sum(weight) AS d FROM und GROUP BY 1),\n"
    b ++= "nn AS MATERIALIZED (SELECT count(*) AS n FROM wdeg),\n"
    b ++= "trans AS MATERIALIZED (\n" +
      "  SELECT e.src, e.dst, e.weight / d.d AS w FROM und e JOIN wdeg d ON d.id = e.src\n),\n"
    if (degreeInit)
      b ++= "tt AS MATERIALIZED (SELECT sum(d) AS t FROM wdeg),\n" +
        "v0 AS MATERIALIZED (SELECT id, round(d * nn.n / tt.t + CAST(" +
        h60(s"concat_ws('|', 'pic', id, $seed)") +
        " AS DOUBLE) / 1152921504606846976.0 * 0.01, 8) AS v " +
        "FROM wdeg CROSS JOIN nn CROSS JOIN tt),\n"
    else
      b ++= s"v0 AS MATERIALIZED (SELECT id, round(CAST(" +
        h60(s"concat_ws('|', 'pic', id, $seed)") +
        " AS DOUBLE) / 1152921504606846976.0, 8) AS v FROM wdeg),\n"
    for (i <- 1 to iters) {
      b ++= s"y$i AS MATERIALIZED (SELECT t.src AS id, sum(t.w * v.v) AS v " +
        s"FROM trans t JOIN v${i - 1} v ON v.id = t.dst GROUP BY 1),\n"
      b ++= s"s$i AS MATERIALIZED (SELECT sum(v) / (SELECT n FROM nn) AS c, " +
        s"max(v) AS mx, min(v) AS mn FROM y$i),\n"
      b ++= s"m$i AS MATERIALIZED (SELECT c, " +
        s"greatest(greatest(mx - c, c - mn), 1e-300) AS m FROM s$i),\n"
      b ++= s"v$i AS MATERIALIZED (SELECT id, round((v - c) / m, 8) AS v " +
        s"FROM y$i CROSS JOIN m$i),\n"
    }
    val vf = s"v$iters"
    b ++= s"mm AS MATERIALIZED (SELECT min(v) AS vmin, max(v) AS vmax FROM $vf),\n"
    b ++= s"cent0 AS MATERIALIZED (SELECT j AS cid, " +
      s"vmin + ((2*j+1) * (vmax - vmin)) / ${2 * k} AS c " +
      s"FROM range(0, $k) r(j) CROSS JOIN mm),\n"
    for (r <- 1 to kmeansIters + 1) {
      b ++= s"""as$r AS MATERIALIZED (
        |  SELECT id, v, cid AS cluster FROM (
        |    SELECT p.id, p.v, c.cid,
        |      row_number() OVER (PARTITION BY p.id ORDER BY (p.v - c.c)*(p.v - c.c), c.cid) AS rn
        |    FROM $vf p CROSS JOIN cent${r - 1} c
        |  ) WHERE rn = 1
        |)""".stripMargin
      if (r <= kmeansIters)
        b ++= s",\ncent$r AS MATERIALIZED (SELECT cluster AS cid, " +
          s"round(avg(v), 8) AS c FROM as$r GROUP BY 1),\n"
      else b ++= "\n"
    }
    b ++= s"SELECT id, CAST(cluster AS BIGINT) AS cluster FROM as${kmeansIters + 1}"
    b.toString
  }

  /** get_traversed_cost on the supplier graph (`path_retrieval.py:12`):
    * BFS tree from the min vertex (min-predecessor rule, matching
    * `Traversal.bfs`) unrolled level by level, info = running weight sum
    * down the tree in the same per-level addition order as the Spark loop
    * (integral co-order weights — sums exact). */
  def traversedCostSupplier(rounds: Int = 12): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n"
    b ++= "b0 AS MATERIALIZED (SELECT (SELECT min(src) FROM und) AS id, 0.0 AS info),\n"
    b ++= "all0 AS MATERIALIZED (SELECT id, info FROM b0),\n"
    for (d <- 1 to rounds) {
      b ++= s"""fr$d AS MATERIALIZED (
        |  SELECT e.dst AS id, min(e.src) AS pred FROM und e JOIN b${d - 1} f ON f.id = e.src
        |  WHERE NOT EXISTS (SELECT 1 FROM all${d - 1} a WHERE a.id = e.dst)
        |  GROUP BY e.dst
        |),
        |b$d AS MATERIALIZED (
        |  SELECT f.id, p.info + w.weight AS info
        |  FROM fr$d f JOIN all${d - 1} p ON p.id = f.pred
        |  JOIN und w ON w.src = f.pred AND w.dst = f.id
        |),
        |all$d AS MATERIALIZED (SELECT id, info FROM all${d - 1} UNION ALL SELECT id, info FROM b$d)""".stripMargin
      b ++= ",\n"
    }
    b.setLength(b.length - 2)
    b ++= s"\nSELECT id, round(info, 6) AS info FROM all$rounds"
    b.toString
  }

  /** 8×8 linear assignment on the customer→supplier bipartite graph:
    * enumerate all 8! permutations via an 8-way join over a dense
    * rank-indexed cost table (integer cents — exact arithmetic), maximize
    * total matched weight, tie-break by lexicographically smallest supplier
    * sequence. Mirrors the Spark side's enumerated optimum exactly. */
  def assignmentCustSupp: String = assignmentCustSuppSql(costOnly = false)

  /** Optimal total (whole dollars — the auction gate's coarser unit; see
    * Misc.auctionAssignment on price-war round counts) of the same 8×8
    * problem — the gate for the distributed auction path, whose
    * arg-assignment may differ among cost-equal optima while the optimal
    * total is unique. */
  def assignmentCustSuppCost: String = assignmentCustSuppSql(costOnly = true)

  private def assignmentCustSuppSql(costOnly: Boolean): String = {
    val n = 8
    val unit = if (costOnly) "round(e.weight)" else "round(e.weight * 100)"
    val joins = (2 to n).map { i =>
      val neq = (1 until i).map(k => s"a$i.j <> a$k.j").mkString(" AND ")
      s"JOIN wm a$i ON a$i.i = $i AND $neq"
    }.mkString("\n  ")
    val tot = (1 to n).map(i => s"a$i.units").mkString(" + ")
    val scols = (1 to n).map(i => s"a$i.supp AS s$i").mkString(", ")
    val sorder = (1 to n).map(i => s"s$i").mkString(", ")
    val unpivot = (1 to n).map(i =>
      s"SELECT (SELECT cust FROM custs WHERE i = $i) AS customer, s$i AS supplier FROM best").mkString("\nUNION ALL ")
    s"""WITH $CUSTSUPP_EDGES_SQL,
       |custs AS MATERIALIZED (
       |  SELECT cust, row_number() OVER (ORDER BY cust) AS i
       |  FROM (SELECT DISTINCT src AS cust FROM cs_edges ORDER BY 1 LIMIT $n)
       |),
       |supps AS MATERIALIZED (
       |  SELECT supp, row_number() OVER (ORDER BY supp) AS j
       |  FROM (SELECT DISTINCT dst AS supp FROM cs_edges ORDER BY 1 LIMIT $n)
       |),
       |wm AS MATERIALIZED (
       |  SELECT c.i, s.j, c.cust, s.supp,
       |         -- whole dollars when costOnly (auction gate), cents otherwise
       |         coalesce(CAST($unit AS BIGINT), 0) AS units
       |  FROM custs c CROSS JOIN supps s
       |  LEFT JOIN cs_edges e ON e.src = c.cust AND e.dst = s.supp
       |),
       |best AS MATERIALIZED (
       |  SELECT $scols, $tot AS tot
       |  FROM (SELECT * FROM wm WHERE i = 1) a1
       |  $joins
       |  ORDER BY tot DESC, $sorder
       |  LIMIT 1
       |)
       |${if (costOnly) "SELECT CAST(tot AS BIGINT) AS total_dollars FROM best" else unpivot}""".stripMargin
  }

  /** n=64 mid-size LAP oracle with a CLOSED-FORM optimum — the gate for the
    * O(n³) shortest-augmenting-path Hungarian (Misc.assignmentJV), which no
    * SQL engine could solve by enumeration at this size. The cost matrix is
    * cost(i,j) = cust_i·supp_j + r_i + h_j: row/column constants (r, h =
    * rounded per-key weight sums) never change the argmin assignment, and
    * by the rearrangement inequality Σ cust·supp over a permutation is
    * minimized UNIQUELY (all ids distinct, positive) by pairing ascending
    * cust ids with descending supp ids — so a rank-join computes the exact
    * assignment the solver must earn through general machinery. */
  def assignmentJv(n: Int = 64): String =
    s"""WITH $CUSTSUPP_EDGES_SQL,
       |custs AS MATERIALIZED (
       |  SELECT cust, r, row_number() OVER (ORDER BY cust) AS rk
       |  FROM (SELECT src AS cust, CAST(round(sum(weight)) AS BIGINT) AS r
       |        FROM cs_edges GROUP BY 1 ORDER BY 1 LIMIT $n)
       |),
       |supps AS MATERIALIZED (
       |  SELECT supp, h, row_number() OVER (ORDER BY supp DESC) AS rk
       |  FROM (SELECT dst AS supp, CAST(round(sum(weight)) AS BIGINT) AS h
       |        FROM cs_edges GROUP BY 1 ORDER BY 1 LIMIT $n)
       |)
       |SELECT c.cust AS customer, s.supp AS supplier,
       |       c.cust * s.supp + c.r + s.h AS cost
       |FROM custs c JOIN supps s ON s.rk = c.rk
       |ORDER BY customer""".stripMargin

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

  /** Exact level-1 Louvain on the supplier graph, `rounds` unrolled move
    * rounds mirroring Community.oneLevelKeyed's deterministic schedule:
    * round 1 everyone may move, rounds ≥ 2 only (id + round) % 2 == 0 (the
    * parity escalation after the opening mass-move round). Gain
    * arithmetic is exactly reproducible across engines: supplier weights
    * are integral counts, so w_in / k / tot / m2 are exact and the single
    * division is computed pointwise from identical operands. The Spark
    * side asserts convergence within `rounds`; extra unrolled rounds on a
    * converged state are no-ops (no strictly-positive gain remains). */
  def louvainL1Supplier(rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n"
    louvainRoundCtes(b, "l", "und", rounds)
    b ++= s"fin AS MATERIALIZED (SELECT id, c AS community FROM l$rounds)\n"
    b ++= "SELECT id, community FROM fin"
    b.toString
  }

  /** Emits the unrolled one-level Louvain move-round CTEs over edge CTE
    * `edges` (src, dst, weight; both directions present, self-loops
    * allowed — they count toward k_i but are excluded from candidate
    * moves, as in Community.oneLevelKeyed). CTE names are prefixed with
    * `pfx`; final labels land in `${pfx}$rounds` (id, c). Leaves a
    * trailing comma so callers can chain further CTEs. */
  private def louvainRoundCtes(b: StringBuilder, pfx: String, edges: String,
                               rounds: Int): Unit = {
    b ++= s"${pfx}m2 AS MATERIALIZED (SELECT sum(weight) AS w FROM $edges),\n"
    b ++= s"${pfx}ki AS MATERIALIZED (SELECT src AS id, sum(weight) AS k FROM $edges GROUP BY 1),\n"
    b ++= s"${pfx}0 AS MATERIALIZED (SELECT id, id AS c FROM ${pfx}ki),\n"
    for (i <- 1 to rounds) {
      val p = i - 1
      val mask = if (i == 1) "TRUE" else s"(l.id + $i) % 2 = 0"
      b ++= s"""${pfx}tot$i AS MATERIALIZED (
        |  SELECT l.c, sum(k.k) AS tot FROM ${pfx}$p l JOIN ${pfx}ki k ON k.id = l.id GROUP BY 1
        |),
        |${pfx}nbr$i AS MATERIALIZED (
        |  SELECT id, nc, sum(w_in) AS w_in FROM (
        |    SELECT u.src AS id, l.c AS nc, u.weight AS w_in
        |    FROM $edges u JOIN ${pfx}$p l ON l.id = u.dst WHERE u.src <> u.dst
        |    UNION ALL
        |    SELECT id, c AS nc, CAST(0 AS DOUBLE) FROM ${pfx}$p
        |  ) GROUP BY 1, 2
        |),
        |${pfx}cand$i AS MATERIALIZED (
        |  SELECT n.id, n.nc, cur.c AS c_cur,
        |         n.w_in - k.k * (CASE WHEN n.nc = cur.c THEN t.tot - k.k ELSE t.tot END)
        |                  / (SELECT w FROM ${pfx}m2) AS gain
        |  FROM ${pfx}nbr$i n
        |  JOIN ${pfx}$p cur ON cur.id = n.id
        |  JOIN ${pfx}ki k ON k.id = n.id
        |  JOIN ${pfx}tot$i t ON t.c = n.nc
        |),
        |${pfx}best$i AS MATERIALIZED (
        |  SELECT id, nc, gain, stay_gain FROM (
        |    SELECT id, nc, gain,
        |           row_number() OVER (PARTITION BY id ORDER BY gain DESC, nc ASC) AS rn,
        |           max(CASE WHEN nc = c_cur THEN gain END) OVER (PARTITION BY id) AS stay_gain
        |    FROM ${pfx}cand$i
        |  ) WHERE rn = 1
        |),
        |${pfx}$i AS MATERIALIZED (
        |  SELECT l.id,
        |         CASE WHEN b.nc IS NOT NULL AND $mask
        |                   AND b.gain > coalesce(b.stay_gain, 0) + 1e-12
        |              THEN b.nc ELSE l.c END AS c
        |  FROM ${pfx}$p l LEFT JOIN ${pfx}best$i b ON b.id = l.id
        |)""".stripMargin
      b ++= ",\n"
    }
  }

  /** FULL two-level Louvain on the part co-order graph: level-1 unroll,
    * graph contraction (Structure.coarsen as one groupBy-sum — coarsened
    * weights stay integral, so the exactness argument survives the
    * level boundary), level-2 unroll on the contracted graph, then the
    * dendrogram flatten join. The Spark side asserts exactly 2 levels ran
    * (the modularity-improvement branch the SQL does not model). */
  def louvainFullPart(iters: Int = 5): String = {
    val b = new StringBuilder
    b ++= s"WITH $PART_EDGES_SQL,\n"
    b ++= "pund AS MATERIALIZED (SELECT src, dst, weight FROM part_edges UNION ALL SELECT dst, src, weight FROM part_edges),\n"
    louvainRoundCtes(b, "a", "pund", iters)
    b ++= s"""cund AS MATERIALIZED (
      |  SELECT la.c AS src, lb.c AS dst, sum(e.weight) AS weight
      |  FROM pund e JOIN a$iters la ON la.id = e.src JOIN a$iters lb ON lb.id = e.dst
      |  GROUP BY 1, 2
      |),
      |""".stripMargin
    louvainRoundCtes(b, "b", "cund", iters)
    b ++= s"fin AS MATERIALIZED (SELECT a.id, b.c AS louvain FROM a$iters a JOIN b$iters b ON b.id = a.c)\n"
    b ++= "SELECT id, louvain FROM fin"
    b.toString
  }

  /** Exact Leiden-refinement gate: level-1 Louvain labels (the
    * louvainL1Supplier schedule), then the Leiden connectivity refinement
    * — WCC over intra-community edges — unrolled as `wccRounds` min-label
    * propagation steps (the same step wccSupplier unrolls). The move
    * phase is already exactness-argued (integral weights); the refinement
    * adds only joins + min aggregates, so the whole composition is
    * bit-reproducible. Spark asserts convergence within both budgets. */
  def leidenRefineSupplier(l1Rounds: Int, wccRounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n"
    louvainRoundCtes(b, "l", "und", l1Rounds)
    b ++= s"""lab AS MATERIALIZED (SELECT id, c FROM l$l1Rounds),
      |intra AS MATERIALIZED (
      |  SELECT u.src, u.dst FROM und u
      |  JOIN lab la ON la.id = u.src JOIN lab lb ON lb.id = u.dst
      |  WHERE la.c = lb.c
      |),
      |w0 AS MATERIALIZED (SELECT id, id AS component FROM lab),
      |""".stripMargin
    for (i <- 1 to wccRounds) {
      b ++= s"""w$i AS MATERIALIZED (
        |  SELECT v.id, least(v.component, coalesce(m.nbr_min, v.component)) AS component
        |  FROM w${i - 1} v LEFT JOIN (
        |    SELECT u.dst AS id, min(p.component) AS nbr_min
        |    FROM intra u JOIN w${i - 1} p ON p.id = u.src GROUP BY 1
        |  ) m ON m.id = v.id
        |)""".stripMargin
      b ++= (if (i < wccRounds) ",\n" else "\n")
    }
    b ++= s"SELECT id, component AS leiden FROM w$wccRounds"
    b.toString
  }

  /** FULL exact Leiden on the supplier graph: two-level Louvain (the
    * louvainFullPart unroll shape — level-1 rounds, contraction by
    * groupBy-sum, level-2 rounds, dendrogram flatten) followed by the
    * connectivity refinement (WCC over intra-community edges, unrolled
    * min-label propagation). Exactness: supplier weights are integral so
    * every Louvain sum is exact and contraction keeps integrality across
    * the level boundary; the refinement adds only joins and min
    * aggregates. The Spark side asserts 2 levels ran and WCC converged
    * within `wccRounds`. */
  def leidenFullSupplier(iters: Int, wccRounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n"
    louvainRoundCtes(b, "a", "und", iters)
    b ++= s"""cund AS MATERIALIZED (
      |  SELECT la.c AS src, lb.c AS dst, sum(e.weight) AS weight
      |  FROM und e JOIN a$iters la ON la.id = e.src JOIN a$iters lb ON lb.id = e.dst
      |  GROUP BY 1, 2
      |),
      |""".stripMargin
    louvainRoundCtes(b, "b", "cund", iters)
    b ++= s"""fl AS MATERIALIZED (SELECT a.id, b.c AS c FROM a$iters a JOIN b$iters b ON b.id = a.c),
      |intra AS MATERIALIZED (
      |  SELECT u.src, u.dst FROM und u
      |  JOIN fl la ON la.id = u.src JOIN fl lb ON lb.id = u.dst
      |  WHERE la.c = lb.c
      |),
      |w0 AS MATERIALIZED (SELECT id, id AS component FROM fl),
      |""".stripMargin
    for (i <- 1 to wccRounds) {
      b ++= s"""w$i AS MATERIALIZED (
        |  SELECT v.id, least(v.component, coalesce(m.nbr_min, v.component)) AS component
        |  FROM w${i - 1} v LEFT JOIN (
        |    SELECT u.dst AS id, min(p.component) AS nbr_min
        |    FROM intra u JOIN w${i - 1} p ON p.id = u.src GROUP BY 1
        |  ) m ON m.id = v.id
        |)""".stripMargin
      b ++= (if (i < wccRounds) ",\n" else "\n")
    }
    b ++= s"SELECT id, component AS leiden FROM w$wccRounds"
    b.toString
  }

  /** ECG co-clustering votes on the supplier graph: the full batched
    * ensemble of Community.ecgVotes unrolled — `ensembleSize` runs with
    * integral md5-perturbed weights through `rounds` run-keyed Louvain
    * move rounds (the louvainL1Supplier schedule with a `run` column in
    * every key), then votes per canonical edge. Exactness argument as in
    * louvainL1Supplier: all sums integral, inexact ops pointwise. */
  def ecgVotesSupplier(ensembleSize: Int, rounds: Int, seed: Long = 42): String = {
    val b = new StringBuilder
    ecgVotesCtes(b, ensembleSize, rounds, seed)
    b ++= "\nSELECT src, dst, votes FROM votes WHERE src < dst"
    b.toString
  }

  /** FULL exact ECG on the supplier graph: the batched ensemble-vote unroll
    * (ecgVotesSupplier's CTE chain), the integral vote reweighting
    * (Community.ecgReweight — uniform scaling keeps Louvain's decisions
    * while every sum stays an exact integer-valued double), and the final
    * two-level Louvain + contraction + flatten (the louvainFullPart shape).
    * The Spark side asserts 2 levels ran. */
  def ecgFullSupplier(ensembleSize: Int, voteRounds: Int, iters: Int,
                      minWeight: Double = 0.05, seed: Long = 42): String = {
    val cMin = math.round(1000.0 * minWeight * ensembleSize)
    val cVote = math.round(1000.0 * (1.0 - minWeight))
    val b = new StringBuilder
    ecgVotesCtes(b, ensembleSize, voteRounds, seed)
    b ++= s",\nund2 AS MATERIALIZED (SELECT src, dst, CAST($cMin + $cVote * votes AS DOUBLE) AS weight FROM votes),\n"
    louvainRoundCtes(b, "x", "und2", iters)
    b ++= s"""cund2 AS MATERIALIZED (
      |  SELECT la.c AS src, lb.c AS dst, sum(e.weight) AS weight
      |  FROM und2 e JOIN x$iters la ON la.id = e.src JOIN x$iters lb ON lb.id = e.dst
      |  GROUP BY 1, 2
      |),
      |""".stripMargin
    louvainRoundCtes(b, "y", "cund2", iters)
    b ++= s"fin AS MATERIALIZED (SELECT x.id, y.c AS louvain FROM x$iters x JOIN y$iters y ON y.id = x.c)\n"
    b ++= "SELECT id, louvain FROM fin"
    b.toString
  }

  /** Emits the ecgVotesSupplier CTE chain through the `votes` CTE (both
    * edge directions retained), leaving a trailing comma for chaining. */
  private def ecgVotesCtes(b: StringBuilder, ensembleSize: Int, rounds: Int,
                           seed: Long): Unit = {
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n"
    b ++= s"runs AS MATERIALIZED (SELECT * FROM generate_series(0, ${ensembleSize - 1}) AS t(run)),\n"
    b ++= s"""eR AS MATERIALIZED (
      |  SELECT r.run, u.src, u.dst,
      |         u.weight * (10000 + ${h60(s"concat_ws('|', 'ecg', u.src, u.dst, $seed + r.run)")} % 1000) AS weight
      |  FROM und u CROSS JOIN runs r
      |),
      |""".stripMargin
    b ++= "m2r AS MATERIALIZED (SELECT run, sum(weight) AS w FROM eR GROUP BY 1),\n"
    b ++= "kir AS MATERIALIZED (SELECT run, src AS id, sum(weight) AS k FROM eR GROUP BY 1, 2),\n"
    b ++= "l0 AS MATERIALIZED (SELECT run, id, id AS c FROM kir),\n"
    for (i <- 1 to rounds) {
      val p = i - 1
      val mask = if (i == 1) "TRUE" else s"(l.id + $i) % 2 = 0"
      b ++= s"""tot$i AS MATERIALIZED (
        |  SELECT l.run, l.c, sum(k.k) AS tot
        |  FROM l$p l JOIN kir k ON k.run = l.run AND k.id = l.id GROUP BY 1, 2
        |),
        |nbr$i AS MATERIALIZED (
        |  SELECT run, id, nc, sum(w_in) AS w_in FROM (
        |    SELECT e.run, e.src AS id, l.c AS nc, e.weight AS w_in
        |    FROM eR e JOIN l$p l ON l.run = e.run AND l.id = e.dst
        |    WHERE e.src <> e.dst
        |    UNION ALL
        |    SELECT run, id, c AS nc, CAST(0 AS DOUBLE) FROM l$p
        |  ) GROUP BY 1, 2, 3
        |),
        |cand$i AS MATERIALIZED (
        |  SELECT n.run, n.id, n.nc, cur.c AS c_cur,
        |         n.w_in - k.k * (CASE WHEN n.nc = cur.c THEN t.tot - k.k ELSE t.tot END)
        |                  / m.w AS gain
        |  FROM nbr$i n
        |  JOIN l$p cur ON cur.run = n.run AND cur.id = n.id
        |  JOIN kir k ON k.run = n.run AND k.id = n.id
        |  JOIN tot$i t ON t.run = n.run AND t.c = n.nc
        |  JOIN m2r m ON m.run = n.run
        |),
        |best$i AS MATERIALIZED (
        |  SELECT run, id, nc, gain, stay_gain FROM (
        |    SELECT run, id, nc, gain,
        |           row_number() OVER (PARTITION BY run, id ORDER BY gain DESC, nc ASC) AS rn,
        |           max(CASE WHEN nc = c_cur THEN gain END) OVER (PARTITION BY run, id) AS stay_gain
        |    FROM cand$i
        |  ) WHERE rn = 1
        |),
        |l$i AS MATERIALIZED (
        |  SELECT l.run, l.id,
        |         CASE WHEN b.nc IS NOT NULL AND $mask
        |                   AND b.gain > coalesce(b.stay_gain, 0) + 1e-12
        |              THEN b.nc ELSE l.c END AS c
        |  FROM l$p l LEFT JOIN best$i b ON b.run = l.run AND b.id = l.id
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= s"""votes AS MATERIALIZED (
      |  SELECT u.src, u.dst, CAST(sum(CASE WHEN la.c = lb.c THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS votes
      |  FROM und u CROSS JOIN runs r
      |  JOIN l$rounds la ON la.run = r.run AND la.id = u.src
      |  JOIN l$rounds lb ON lb.run = r.run AND lb.id = u.dst
      |  GROUP BY 1, 2
      |)""".stripMargin
  }

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
