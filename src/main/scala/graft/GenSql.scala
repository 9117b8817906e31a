package graft

/** DuckDB oracle SQL for the generators — same hash60 draws, same
  * thresholds (interpolated from the identical Scala doubles, so both
  * engines compare against bit-identical constants). Generators read no
  * tables: the oracle is pure `range()` arithmetic.
  */
object GenSql {

  private def u01(e: String): String =
    s"(CAST(CAST('0x' || substr(md5($e), 1, 15) AS BIGINT) AS DOUBLE) / 1152921504606846976.0)"

  def rmat(scale: Int, numEdges: Long, a: Double = 0.57, b: Double = 0.19,
           c: Double = 0.19, seed: Long = 42): String = {
    val ab = a + b
    val abc = a + b + c
    s"""WITH u AS MATERIALIZED (
       |  SELECT e.i AS edge_id, l.l AS l,
       |         ${u01(s"concat_ws('|', 'rmat', e.i, l.l, $seed)")} AS u
       |  FROM range(0, $numEdges) e(i) CROSS JOIN range(0, $scale) l(l)
       |)
       |SELECT edge_id,
       |  CAST(coalesce(sum(CASE WHEN u >= $ab THEN (CAST(1 AS BIGINT) << l) ELSE 0 END), 0) AS BIGINT) AS src,
       |  CAST(coalesce(sum(CASE WHEN (u >= $a AND u < $ab) OR u >= $abc THEN (CAST(1 AS BIGINT) << l) ELSE 0 END), 0) AS BIGINT) AS dst
       |FROM u GROUP BY edge_id""".stripMargin
  }

  /** Batched-RMAT oracle: the scale draws come from the same pure-JVM md5
    * as the generator ([[gen.Generators.rmatScales]]), then one unrolled
    * per-graph RMAT block each, unioned. */
  def rmatMulti(nLists: Int, minScale: Int, maxScale: Int,
                edgeFactor: Int = 16, seed: Long = 42,
                powerLaw: Boolean = false): String = {
    val scales = gen.Generators.rmatScales(nLists, minScale, maxScale, seed, powerLaw)
    scales.zipWithIndex.map { case (sc, i) =>
      val inner = rmat(sc, edgeFactor.toLong << sc, seed = seed + 1000L * (i + 1))
        .replace("\n", "\n  ")
      s"""SELECT CAST($i AS BIGINT) AS graph_id, edge_id, src, dst FROM (
         |  $inner
         |)""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  def rmatScrambled(scale: Int, numEdges: Long, seed: Long = 42): String =
    s"""WITH base AS MATERIALIZED (${rmat(scale, numEdges).replace("\n", "\n  ")})
       |SELECT edge_id,
       |  (src * ${gen.Generators.ScrambleK} + $seed) % ${1L << scale} AS src,
       |  (dst * ${gen.Generators.ScrambleK} + $seed) % ${1L << scale} AS dst
       |FROM base""".stripMargin

  def erdosRenyi(n: Long, p: Double, seed: Long = 42): String =
    s"""SELECT i.i AS src, j.j AS dst
       |FROM range(0, $n) i(i) CROSS JOIN range(0, $n) j(j)
       |WHERE i.i < j.j AND ${u01(s"concat_ws('|', 'er', i.i, j.j, $seed)")} < $p""".stripMargin

  def pathGraph(n: Long): String =
    s"SELECT i AS src, i + 1 AS dst FROM range(0, ${n - 1}) t(i)"

  def grid2d(rows: Long, cols: Long): String =
    s"""SELECT i AS src, i + 1 AS dst FROM range(0, ${rows * cols}) t(i) WHERE i % $cols <> ${cols - 1}
       |UNION ALL
       |SELECT i, i + $cols FROM range(0, ${rows * cols}) t(i) WHERE i < ${(rows - 1) * cols}""".stripMargin

  def complete(n: Long): String =
    s"SELECT i.i AS src, j.j AS dst FROM range(0, $n) i(i) CROSS JOIN range(0, $n) j(j) WHERE i.i < j.j"

  def mesh3d(x: Long, y: Long, z: Long, base: Long = 0L): String = {
    val n = x * y * z
    s"""SELECT i + $base AS src, i + $base + 1 AS dst FROM range(0, $n) t(i) WHERE (i + 1) % $x <> 0
       |UNION ALL
       |SELECT i + $base, i + $base + $x FROM range(0, $n) t(i) WHERE (i + $x) % ${x * y} >= $x
       |UNION ALL
       |SELECT i + $base, i + $base + ${x * y} FROM range(0, $n) t(i) WHERE (i + ${x * y}) % $n >= ${x * y}""".stripMargin
  }

  def bipartiteRmat(srcScale: Int, dstScale: Int, numEdges: Long,
                    a: Double = 0.57, b: Double = 0.19, c: Double = 0.19,
                    seed: Long = 42): String = {
    val aPlusB = a + b
    val aPlusC = a + c
    val aNorm = if (a + b > 0.0) a / (a + b) else 0.0
    val cNorm = if (1.0 - (a + b) > 0.0) c / (1.0 - (a + b)) else 0.0
    val levels = math.max(srcScale, dstScale)
    s"""WITH u AS MATERIALIZED (
       |  SELECT e.i AS edge_id, l.l AS l,
       |         ${u01(s"concat_ws('|', 'brmat_s', e.i, l.l, $seed)")} AS us,
       |         ${u01(s"concat_ws('|', 'brmat_d', e.i, l.l, $seed)")} AS ud
       |  FROM range(0, $numEdges) e(i) CROSS JOIN range(0, $levels) l(l)
       |)
       |SELECT edge_id,
       |  CAST(coalesce(sum(CASE WHEN l < $srcScale AND us > $aPlusB
       |    THEN (CAST(1 AS BIGINT) << ($srcScale - l - 1)) ELSE 0 END), 0) AS BIGINT) AS src,
       |  CAST(coalesce(sum(CASE WHEN l < $dstScale AND ud > (
       |      CASE WHEN l < $srcScale
       |           THEN (CASE WHEN us > $aPlusB THEN $cNorm ELSE $aNorm END)
       |           ELSE $aPlusC END)
       |    THEN (CAST(1 AS BIGINT) << ($dstScale - l - 1)) ELSE 0 END), 0) AS BIGINT) AS dst
       |FROM u GROUP BY edge_id""".stripMargin
  }
}
