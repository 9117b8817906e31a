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

  /** Personalized PageRank: reset mass uniform over the k smallest vertices
    * (q_ppr fixture), no dangling on the symmetrized graph, unrolled. */
  def pprSupplier(iters: Int, k: Int, alpha: Double = 0.85): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= s"seeds AS MATERIALIZED (SELECT id FROM verts ORDER BY id LIMIT $k),\n"
    b ++= s"""rst AS MATERIALIZED (
      |  SELECT v.id, CASE WHEN s.id IS NOT NULL THEN 1.0 / $k ELSE 0.0 END AS r
      |  FROM verts v LEFT JOIN seeds s ON s.id = v.id
      |),
      |""".stripMargin
    b ++= "outdeg AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS DOUBLE) AS d FROM und GROUP BY 1),\n"
    b ++= "pr0 AS MATERIALIZED (SELECT id, r AS pr FROM rst),\n"
    for (i <- 1 to iters) {
      b ++= s"""pr$i AS MATERIALIZED (
        |  SELECT v.id, $alpha * coalesce(s.in_sum, 0) + ${1.0 - alpha} * v.r AS pr
        |  FROM rst v LEFT JOIN (
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

  /** Bellman-Ford SSSP unrolled: d_i(v) = min(d_{i-1}(v), min over edges
    * (u,v) of d_{i-1}(u)+w). Spark side asserts fixpoint within `rounds`. */
  def ssspSupplier(rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n"
    b ++= "d0 AS MATERIALIZED (SELECT (SELECT min(src) FROM supp_edges) AS id, 0.0 AS d),\n"
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

  /** Katz centrality unrolled, fixed iterations, final L2 normalization:
    * c_i = alpha·(Σ_in c_{i-1}) + beta over the symmetrized supplier graph. */
  def katzSupplier(iters: Int, alpha: Double, beta: Double = 1.0): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= s"k0 AS MATERIALIZED (SELECT id, CAST($beta AS DOUBLE) AS c FROM verts),\n"
    for (i <- 1 to iters) {
      b ++= s"""k$i AS MATERIALIZED (
        |  SELECT v.id, CAST($alpha AS DOUBLE) * coalesce(s.in_sum, 0) + CAST($beta AS DOUBLE) AS c
        |  FROM verts v LEFT JOIN (
        |    SELECT u.dst AS id, sum(p.c) AS in_sum
        |    FROM und u JOIN k${i - 1} p ON p.id = u.src GROUP BY 1
        |  ) s ON s.id = v.id
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= s"norm AS MATERIALIZED (SELECT sqrt(sum(c * c)) AS n FROM k$iters)\n"
    b ++= s"SELECT id, round(c / (SELECT n FROM norm), 6) AS katz FROM k$iters"
    b.toString
  }

  /** Eigenvector centrality unrolled: power iteration with per-round L2
    * normalization on the symmetrized weighted supplier graph. */
  def eigenvectorSupplier(iters: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= "nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),\n"
    b ++= "e0 AS MATERIALIZED (SELECT id, 1.0 / sqrt((SELECT n FROM nv)) AS c FROM verts),\n"
    for (i <- 1 to iters) {
      b ++= s"""e${i}r AS MATERIALIZED (
        |  SELECT v.id, coalesce(s.in_sum, 0) AS c
        |  FROM verts v LEFT JOIN (
        |    SELECT u.dst AS id, sum(p.c * u.weight) AS in_sum
        |    FROM und u JOIN e${i - 1} p ON p.id = u.src GROUP BY 1
        |  ) s ON s.id = v.id
        |),
        |e$i AS MATERIALIZED (
        |  SELECT id, c / (SELECT CASE WHEN sqrt(sum(c*c)) = 0 THEN 1 ELSE sqrt(sum(c*c)) END FROM e${i}r) AS c
        |  FROM e${i}r
        |)""".stripMargin
      b ++= (if (i < iters) ",\n" else "\n")
    }
    b ++= s"SELECT id, round(c, 6) AS ec FROM e$iters"
    b.toString
  }

  /** HITS unrolled on the customer→supplier bipartite graph, sum-normalized
    * authorities then hubs each round (matches Centrality.hits order).
    * `nstartOutDeg`: warm-start hubs from the out-degree frame (vertices
    * with no outgoing edge start at 0 — the absent-from-nstart default).
    * `normalized=false`: final values max-normalized instead of the
    * per-round sum scale (mirrors Centrality.hits' normalized flag). */
  def hitsCustSupp(iters: Int, nstartOutDeg: Boolean = false,
                   normalized: Boolean = true): String = {
    val b = new StringBuilder
    b ++= s"WITH $CUSTSUPP_EDGES_SQL,\n"
    b ++= "verts AS MATERIALIZED (SELECT src AS id FROM cs_edges UNION SELECT dst FROM cs_edges),\n"
    if (nstartOutDeg)
      b ++= """h0 AS MATERIALIZED (
        |  SELECT v.id, CAST(coalesce(o.d, 0) AS DOUBLE) AS h, 1.0 AS a
        |  FROM verts v LEFT JOIN (
        |    SELECT src AS id, count(*) AS d FROM cs_edges GROUP BY 1
        |  ) o ON o.id = v.id),
        |""".stripMargin
    else
      b ++= "h0 AS MATERIALIZED (SELECT id, 1.0 AS h, 1.0 AS a FROM verts),\n"
    for (i <- 1 to iters) {
      b ++= s"""a${i}r AS MATERIALIZED (
        |  SELECT v.id, coalesce(s.x, 0) AS a FROM verts v LEFT JOIN (
        |    SELECT e.dst AS id, sum(p.h) AS x FROM cs_edges e JOIN h${i - 1} p ON p.id = e.src GROUP BY 1
        |  ) s ON s.id = v.id
        |),
        |a$i AS MATERIALIZED (
        |  SELECT id, a / (SELECT CASE WHEN sum(a)=0 THEN 1 ELSE sum(a) END FROM a${i}r) AS a FROM a${i}r
        |),
        |h${i}r AS MATERIALIZED (
        |  SELECT v.id, coalesce(s.x, 0) AS h FROM verts v LEFT JOIN (
        |    SELECT e.src AS id, sum(p.a) AS x FROM cs_edges e JOIN a$i p ON p.id = e.dst GROUP BY 1
        |  ) s ON s.id = v.id
        |),
        |h$i AS MATERIALIZED (
        |  SELECT r.id, r.h / (SELECT CASE WHEN sum(h)=0 THEN 1 ELSE sum(h) END FROM h${i}r) AS h, a$i.a AS a
        |  FROM h${i}r r JOIN a$i ON a$i.id = r.id
        |)""".stripMargin
      b ++= (if (i < iters) ",\n" else "\n")
    }
    if (normalized)
      b ++= s"SELECT id, round(h, 6) AS hubs, round(a, 6) AS authorities FROM h$iters"
    else
      b ++= s"""SELECT id,
        |  round(h / (SELECT CASE WHEN max(h)=0 THEN 1 ELSE max(h) END FROM h$iters), 6) AS hubs,
        |  round(a / (SELECT CASE WHEN max(a)=0 THEN 1 ELSE max(a) END FROM h$iters), 6) AS authorities
        |FROM h$iters""".stripMargin
    b.toString
  }

  /** Directed PageRank with dangling-mass redistribution on the
    * customer→supplier bipartite graph (suppliers are sinks), unrolled. */
  def pagerankCustSupp(iters: Int, alpha: Double = 0.85): String = {
    val b = new StringBuilder
    b ++= s"WITH $CUSTSUPP_EDGES_SQL,\n"
    b ++= "verts AS MATERIALIZED (SELECT src AS id FROM cs_edges UNION SELECT dst FROM cs_edges),\n"
    b ++= "nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),\n"
    b ++= "outw AS MATERIALIZED (SELECT src AS id, sum(weight) AS w FROM cs_edges GROUP BY 1),\n"
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
        |    FROM cs_edges e JOIN p${i - 1} p ON p.id = e.src JOIN outw o ON o.id = e.src
        |    GROUP BY 1
        |  ) s ON s.id = v.id
        |)""".stripMargin
      b ++= (if (i < iters) ",\n" else "\n")
    }
    b ++= s"SELECT id, round(pr, 6) AS pagerank FROM p$iters"
    b.toString
  }

  /** Brandes betweenness, all sources, unrolled by BFS level on the
    * symmetrized supplier graph (unweighted shortest paths). Forward phase:
    * per-level frontier with path counts sigma; backward phase: dependency
    * delta(v) = sigma_v · Σ_{w∈succ} (1+delta_w)/sigma_w. Undirected ⇒
    * halve; normalized by (n-1)(n-2)/2. `levels` must be ≥ the graph's
    * eccentricity — the Spark query asserts that. */
  def betweennessSupplier(levels: Int, k: Option[Int] = None, seed: Long = 42,
                          endpoints: Boolean = false): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= "nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),\n"
    val rootsSrc = k match {
      case Some(kk) =>
        b ++= s"""roots AS MATERIALIZED (
          |  SELECT id FROM verts
          |  ORDER BY CAST('0x' || substr(md5(concat_ws('|', 'bc', id, $seed)), 1, 15) AS BIGINT), id
          |  LIMIT $kk
          |),
          |""".stripMargin
        "roots"
      case None => "verts"
    }
    b ++= s"f0 AS MATERIALIZED (SELECT id AS root, id, 1.0 AS sigma FROM $rootsSrc),\n"
    b ++= "s0 AS MATERIALIZED (SELECT root, id FROM f0),\n"
    for (l <- 1 to levels) {
      b ++= s"""f$l AS MATERIALIZED (
        |  SELECT p.root, u.dst AS id, sum(p.sigma) AS sigma
        |  FROM f${l - 1} p JOIN und u ON u.src = p.id
        |  WHERE NOT EXISTS (SELECT 1 FROM s${l - 1} s WHERE s.root = p.root AND s.id = u.dst)
        |  GROUP BY 1, 2
        |),
        |s$l AS MATERIALIZED (SELECT root, id FROM s${l - 1} UNION ALL SELECT root, id FROM f$l),
        |""".stripMargin
    }
    b ++= s"d$levels AS MATERIALIZED (SELECT root, id, sigma, 0.0 AS delta FROM f$levels),\n"
    for (l <- levels - 1 to 0 by -1) {
      b ++= s"""c$l AS MATERIALIZED (
        |  SELECT w.root, u.src AS id, sum((1 + w.delta) / w.sigma) AS xw
        |  FROM und u JOIN d${l + 1} w ON w.id = u.dst GROUP BY 1, 2
        |),
        |d$l AS MATERIALIZED (
        |  SELECT f.root, f.id, f.sigma, f.sigma * coalesce(c.xw, 0) AS delta
        |  FROM f$l f LEFT JOIN c$l c ON c.root = f.root AND c.id = f.id
        |),
        |""".stripMargin
    }
    b ++= "alldelta AS MATERIALIZED (" +
      (0 to levels).map(l => s"SELECT root, id, delta FROM d$l").mkString(" UNION ALL ") + "),\n"
    val kScale = k.map(kk => s" * $kk / (SELECT n FROM nv)").getOrElse("")
    if (!endpoints) {
      b ++= s"""bc AS MATERIALIZED (
        |  SELECT id, sum(delta) / 2.0 AS raw FROM alldelta WHERE root <> id GROUP BY id
        |)
        |SELECT v.id,
        |  round(coalesce(bc.raw, 0) / (((SELECT n FROM nv) - 1) * ((SELECT n FROM nv) - 2) / 2.0$kScale), 6)
        |    AS betweenness_centrality
        |FROM verts v LEFT JOIN bc ON bc.id = v.id""".stripMargin
    } else {
      // endpoints=True (reference betweenness_centrality.py:16): every
      // (s,t) pair also counts its endpoints — each root adds
      // (reached − 1), every vertex adds the number of roots reaching it;
      // both read off the settled set s$levels. Halve with the path sum
      // (undirected double-count), normalize by n(n−1)/2 instead of
      // (n−1)(n−2)/2 — exactly the Spark side's order of operations.
      b ++= s"""bc AS MATERIALIZED (
        |  SELECT id, sum(delta) AS raw FROM alldelta WHERE root <> id GROUP BY id
        |),
        |rr AS MATERIALIZED (
        |  SELECT root AS id, CAST(count(*) - 1 AS DOUBLE) AS rr FROM s$levels GROUP BY 1
        |),
        |sr AS MATERIALIZED (
        |  SELECT id, CAST(count(*) AS DOUBLE) AS sr FROM s$levels WHERE root <> id GROUP BY 1
        |)
        |SELECT v.id,
        |  round((coalesce(bc.raw, 0) + coalesce(rr.rr, 0) + coalesce(sr.sr, 0)) / 2.0
        |        / ((SELECT n FROM nv) * ((SELECT n FROM nv) - 1) / 2.0$kScale), 6)
        |    AS betweenness_centrality
        |FROM verts v LEFT JOIN bc ON bc.id = v.id
        |  LEFT JOIN rr ON rr.id = v.id LEFT JOIN sr ON sr.id = v.id""".stripMargin
    }
    b.toString
  }

  /** Edge betweenness, k md5-race-sampled roots, unrolled by BFS level:
    * per shortest-path-DAG edge (u,v), σ_u/σ_v·(1+δ_v) summed over roots,
    * canonical+halved, normalized by n(n−1)/2·k/n (sample rescaling). */
  def edgeBetweennessSupplier(levels: Int, k: Int, seed: Long = 42): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= "nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),\n"
    b ++= s"""roots AS MATERIALIZED (
      |  SELECT id FROM verts
      |  ORDER BY CAST('0x' || substr(md5(concat_ws('|', 'bc', id, $seed)), 1, 15) AS BIGINT), id
      |  LIMIT $k
      |),
      |""".stripMargin
    b ++= "f0 AS MATERIALIZED (SELECT id AS root, id, 1.0 AS sigma FROM roots),\n"
    b ++= "s0 AS MATERIALIZED (SELECT root, id FROM f0),\n"
    for (l <- 1 to levels) {
      b ++= s"""f$l AS MATERIALIZED (
        |  SELECT p.root, u.dst AS id, sum(p.sigma) AS sigma
        |  FROM f${l - 1} p JOIN und u ON u.src = p.id
        |  WHERE NOT EXISTS (SELECT 1 FROM s${l - 1} s WHERE s.root = p.root AND s.id = u.dst)
        |  GROUP BY 1, 2
        |),
        |s$l AS MATERIALIZED (SELECT root, id FROM s${l - 1} UNION ALL SELECT root, id FROM f$l),
        |""".stripMargin
    }
    b ++= s"d$levels AS MATERIALIZED (SELECT root, id, sigma, 0.0 AS delta FROM f$levels),\n"
    for (l <- levels - 1 to 0 by -1) {
      b ++= s"""c$l AS MATERIALIZED (
        |  SELECT w.root, u.src AS id, sum((1 + w.delta) / w.sigma) AS xw
        |  FROM und u JOIN d${l + 1} w ON w.id = u.dst GROUP BY 1, 2
        |),
        |d$l AS MATERIALIZED (
        |  SELECT f.root, f.id, f.sigma, f.sigma * coalesce(c.xw, 0) AS delta
        |  FROM f$l f LEFT JOIN c$l c ON c.root = f.root AND c.id = f.id
        |),
        |""".stripMargin
    }
    b ++= "alldelta AS MATERIALIZED (" +
      (0 to levels).map(l => s"SELECT root, id, delta FROM d$l").mkString(" UNION ALL ") + "),\n"
    b ++= "allf AS MATERIALIZED (" +
      (0 to levels).map(l => s"SELECT root, id, sigma, $l AS dist FROM f$l").mkString(" UNION ALL ") + "),\n"
    b ++= s"""eb AS MATERIALIZED (
      |  SELECT least(u.src, u.dst) AS src, greatest(u.src, u.dst) AS dst,
      |         sum(a.sigma / b.sigma * (1 + ad.delta)) / 2.0 AS raw
      |  FROM und u
      |  JOIN allf a ON a.id = u.src
      |  JOIN allf b ON b.root = a.root AND b.id = u.dst AND b.dist = a.dist + 1
      |  JOIN alldelta ad ON ad.root = a.root AND ad.id = u.dst
      |  GROUP BY 1, 2
      |)
      |SELECT e.src, e.dst,
      |  round(coalesce(eb.raw, 0) /
      |        ((SELECT n FROM nv) * ((SELECT n FROM nv) - 1) / 2.0 * $k / (SELECT n FROM nv)), 6)
      |    AS betweenness_centrality
      |FROM supp_edges e LEFT JOIN eb ON eb.src = e.src AND eb.dst = e.dst""".stripMargin
    b.toString
  }

  /** k-truss unrolled: `rounds` peels of (edge support via triangle count →
    * filter support ≥ k−2) over the canonical supplier edges. Spark asserts
    * fixpoint within `rounds`. */
  def ktrussSupplier(k: Int, rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n"
    b ++= "t0 AS MATERIALIZED (SELECT src, dst FROM supp_edges),\n"
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

  /** SCC oracle via transitive closure (recursive CTE): component(v) =
    * min w with v →* w and w →* v, over the cyclic supplier fixture
    * (canonical edges + reversed copies of weight ≥ 2 edges). */
  def sccSupplier: String =
    s"""WITH RECURSIVE $SUPP_EDGES_SQL,
       |dedges AS MATERIALIZED (
       |  SELECT src, dst FROM supp_edges
       |  UNION SELECT dst AS src, src AS dst FROM supp_edges WHERE weight >= 2
       |),
       |verts AS MATERIALIZED (SELECT src AS id FROM dedges UNION SELECT dst FROM dedges),
       |reach(a, b) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN dedges e ON e.src = r.b
       |)
       |SELECT r1.a AS id, min(r1.b) AS component
       |FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
       |GROUP BY 1""".stripMargin

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

  /** BFS forest edges (reference `bfs_edges`): the engine's deterministic
    * min-predecessor rule re-derived from the BFS levels — pred(v) = min u
    * adjacent to v with dist(u) = dist(v) − 1. */
  def bfsEdgesSupplier(maxDepth: Int): String =
    s"""WITH RECURSIVE $SUPP_EDGES_SQL,
       |$SUPP_UND_SQL,
       |bfs(id, dist) AS (
       |  SELECT (SELECT min(src) FROM supp_edges), 0
       |  UNION
       |  SELECT u.dst, b.dist + 1 FROM bfs b JOIN und u ON u.src = b.id
       |  WHERE b.dist < $maxDepth
       |),
       |lvl AS MATERIALIZED (SELECT id, min(dist) AS d FROM bfs GROUP BY id)
       |SELECT min(dp.id) AS src, dv.id AS dst
       |FROM lvl dv
       |JOIN und u ON u.dst = dv.id
       |JOIN lvl dp ON dp.id = u.src AND dp.d = dv.d - 1
       |WHERE dv.d > 0
       |GROUP BY dv.id""".stripMargin

  /** Structural bipartiteness oracle via the bipartite double cover: map
    * each vertex v to (2v, 2v+1) and each undirected edge (u,v) to
    * (2u,2v+1) and (2u+1,2v); the graph is bipartite iff no v has 2v and
    * 2v+1 in the same double-cover component (an odd closed walk is exactly
    * what merges them). Components by `rounds` unrolled min-label
    * propagation — the engine's answer comes from msBFS parity coloring,
    * the oracle's from an independent construction. Checks both the
    * customer×supplier graph (bipartite by construction) and the supplier
    * co-order graph (triangles ⇒ not). */
  def isBipartiteSupplier(rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $SUPP_EDGES_SQL,\n$CUSTSUPP_EDGES_SQL,\n"
    for ((g, und) <- Seq(
        "a" -> "SELECT src, dst FROM cs_edges UNION SELECT dst, src FROM cs_edges",
        "b" -> "SELECT src, dst FROM supp_edges UNION SELECT dst, src FROM supp_edges")) {
      b ++= s"""${g}_dc AS MATERIALIZED (
        |  SELECT src * 2 AS s, dst * 2 + 1 AS t FROM ($und)
        |  UNION ALL SELECT src * 2 + 1, dst * 2 FROM ($und)
        |),
        |${g}_l0 AS MATERIALIZED (
        |  SELECT id, id AS l FROM (SELECT s AS id FROM ${g}_dc UNION SELECT t FROM ${g}_dc)
        |),
        |""".stripMargin
      for (i <- 1 to rounds) {
        b ++= s"""${g}_l$i AS MATERIALIZED (
          |  SELECT n.id, least(n.l, coalesce(m.ml, n.l)) AS l
          |  FROM ${g}_l${i - 1} n LEFT JOIN (
          |    SELECT e.t AS id, min(x.l) AS ml
          |    FROM ${g}_dc e JOIN ${g}_l${i - 1} x ON x.id = e.s GROUP BY 1
          |  ) m ON m.id = n.id
          |),
          |""".stripMargin
      }
    }
    b.setLength(b.length - 2) // drop trailing ",\n"
    b ++= s"""
      |SELECT 'cust_supp' AS graph,
      |       NOT EXISTS (SELECT 1 FROM a_l$rounds x JOIN a_l$rounds y ON y.id = x.id + 1
      |                   WHERE x.id % 2 = 0 AND x.l = y.l) AS is_bipartite
      |UNION ALL
      |SELECT 'supplier',
      |       NOT EXISTS (SELECT 1 FROM b_l$rounds x JOIN b_l$rounds y ON y.id = x.id + 1
      |                   WHERE x.id % 2 = 0 AND x.l = y.l)""".stripMargin
    b.toString
  }

  /** Biclique-mining oracle (`experimental/structure/bicliques.py`): the
    * identical degree-ordered candidate scan in plain SQL — co-occurrence
    * counts via one src-keyed self-join, skip-same via lag, answers via
    * row_number. `stats = true` emits the S table instead of B. */
  def bicliquesSupplier(stats: Boolean, k: Int, support: Double,
                        minFeatures: Int, minMachines: Int,
                        maxIter: Int): String = {
    val prelude =
      s"""WITH $CUSTSUPP_EDGES_SQL,
         |e AS MATERIALIZED (
         |  SELECT src, dst, CASE WHEN src % 7 = 0 THEN 1 ELSE 0 END AS flag
         |  FROM cs_edges),
         |deg AS MATERIALIZED (SELECT dst, count(*) AS d FROM e GROUP BY 1),
         |cand0 AS MATERIALIZED (SELECT dst, d FROM deg ORDER BY d DESC, dst LIMIT $maxIter),
         |cand AS MATERIALIZED (
         |  SELECT dst, d, row_number() OVER (ORDER BY d DESC, dst) AS ord,
         |         lag(dst) OVER (ORDER BY d DESC, dst) AS pdst,
         |         lag(d) OVER (ORDER BY d DESC, dst) AS pd
         |  FROM cand0),
         |co AS MATERIALIZED (
         |  SELECT a.dst AS f, b.dst AS g, count(*) AS cnt
         |  FROM e a JOIN cand c ON c.dst = a.dst JOIN e b ON b.src = a.src
         |  GROUP BY 1, 2),
         |kept AS MATERIALIZED (
         |  SELECT co.f, co.g FROM co JOIN cand c ON c.dst = co.f
         |  WHERE co.cnt >= CAST(floor(c.d * $support) AS BIGINT)),
         |nf AS MATERIALIZED (SELECT f, count(*) AS nfeat FROM kept GROUP BY 1),
         |qual AS MATERIALIZED (
         |  SELECT c.dst AS f, c.ord FROM cand c
         |  JOIN nf ON nf.f = c.dst
         |  LEFT JOIN co pc ON pc.f = c.dst AND pc.g = c.pdst
         |  WHERE NOT (c.pd IS NOT NULL AND c.pd = c.d
         |             AND pc.cnt IS NOT NULL AND pc.cnt = c.d)
         |    AND nf.nfeat > $minFeatures AND c.d >= $minMachines),
         |ans0 AS MATERIALIZED (
         |  SELECT f, CAST(row_number() OVER (ORDER BY ord) - 1 AS BIGINT) AS id
         |  FROM qual),
         |ans AS MATERIALIZED (SELECT * FROM ans0 WHERE id < $k),
         |b AS MATERIALIZED (
         |  SELECT id, e.src AS vert, CAST(0 AS BIGINT) AS type, e.flag
         |  FROM ans JOIN e ON e.dst = ans.f
         |  UNION ALL
         |  SELECT id, kept.g AS vert, CAST(1 AS BIGINT) AS type, 0 AS flag
         |  FROM ans JOIN kept ON kept.f = ans.f)""".stripMargin
    if (stats)
      s"""$prelude
         |SELECT id, CAST(count(*) AS BIGINT) AS total,
         |       CAST(sum(CASE WHEN type = 0 THEN 1 ELSE 0 END) AS BIGINT) AS machines,
         |       CAST(sum(CASE WHEN type = 1 THEN 1 ELSE 0 END) AS BIGINT) AS features,
         |       round(sum(CASE WHEN type = 0 THEN flag ELSE 0 END)
         |             / CAST(count(*) AS DOUBLE), 6) AS bad_ratio
         |FROM b GROUP BY id""".stripMargin
    else s"$prelude\nSELECT id, vert, type FROM b"
  }

  /** `shortest_path` walk-back oracle: SSSP distances unrolled (identical
    * to [[ssspSupplier]]), the engine's argmin predecessor re-derived as
    * pred(v) = min u with dist(u) + w(u,v) = dist(v) (fixture weights are
    * integral counts, so the equality is exact), then a recursive
    * predecessor walk from the max-id vertex back to the source. */
  def shortestPathSupplier(rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH RECURSIVE $SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n$SUPP_VERTS_SQL,\n"
    b ++= "d0 AS MATERIALIZED (SELECT (SELECT min(src) FROM supp_edges) AS id, 0.0 AS d),\n"
    for (i <- 1 to rounds) {
      b ++= s"""d$i AS MATERIALIZED (
        |  SELECT id, min(d) AS d FROM (
        |    SELECT id, d FROM d${i - 1}
        |    UNION ALL
        |    SELECT u.dst AS id, p.d + u.weight AS d
        |    FROM und u JOIN d${i - 1} p ON p.id = u.src
        |  ) GROUP BY id
        |),
        |""".stripMargin
    }
    b ++= s"""pred AS MATERIALIZED (
      |  SELECT v.id,
      |         CASE WHEN v.id = (SELECT min(src) FROM supp_edges) THEN CAST(-1 AS BIGINT)
      |              ELSE (SELECT min(u.src) FROM und u JOIN d$rounds p ON p.id = u.src
      |                    WHERE u.dst = v.id AND p.d + u.weight = v.d) END AS pred
      |  FROM d$rounds v
      |),
      |tgt AS MATERIALIZED (SELECT max(id) AS t FROM verts),
      |path(pos, vertex) AS (
      |  SELECT 0, (SELECT t FROM tgt)
      |  UNION ALL
      |  SELECT p.pos + 1, pr.pred FROM path p JOIN pred pr ON pr.id = p.vertex
      |  WHERE pr.pred <> -1
      |)
      |SELECT (SELECT t FROM tgt) AS destination, CAST(pos AS BIGINT) AS pos, vertex
      |FROM path""".stripMargin
    b.toString
  }
}
