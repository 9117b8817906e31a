package graft

/** DuckDB oracle SQL for the sampling / random-walk / batched-traversal
  * queries. All "randomness" on the Spark side is the deterministic 60-bit
  * md5 hash (graft.pipeline.TextOps.hash60), which DuckDB reproduces exactly
  * as CAST('0x' || substr(md5(s),1,15) AS BIGINT) — so every sampler has an
  * EXACT oracle, not a rows-only check. Iterative shapes are unrolled
  * (recursive CTEs cannot carry aggregations/windows).
  */
object SamplingSql {
  import Fixtures._

  private def h60(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** u ∈ (0,1) from the hash — matches hash60(...).cast("double")/2^60. */
  private def u01(e: String): String =
    s"(CAST(${h60(e)} AS DOUBLE) / 1152921504606846976.0)"

  private val PRELUDE = s"$SUPP_EDGES_SQL,\n$SUPP_UND_SQL,\n$SUPP_VERTS_SQL"

  private def seeds(k: Int): String =
    s"seeds AS MATERIALIZED (SELECT id FROM verts ORDER BY id LIMIT $k)"

  /** Uniform walks: per step pick the neighbor minimizing the hash race. */
  def uniformWalks(nWalks: Int, depth: Int, seed: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nWalks)},\n"
    b ++= "w0 AS MATERIALIZED (SELECT id AS walk_id, id AS vertex FROM seeds),\n"
    for (t <- 1 to depth) {
      val key = h60(s"concat_ws('|', walk_id, $t, dst, $seed)")
      b ++= s"""w$t AS MATERIALIZED (
        |  SELECT walk_id, min_by(dst, $key) AS vertex
        |  FROM w${t - 1} JOIN und ON vertex = src GROUP BY walk_id
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "walks AS (" + (0 to depth).map(t =>
      s"SELECT walk_id, $t AS step, vertex FROM w$t").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT walk_id, CAST(step AS BIGINT) AS step, vertex FROM walks"
    b.toString
  }

  /** Biased walks: A-ES race — maximize u^(1/w). */
  def biasedWalks(nWalks: Int, depth: Int, seed: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nWalks)},\n"
    b ++= "w0 AS MATERIALIZED (SELECT id AS walk_id, id AS vertex FROM seeds),\n"
    for (t <- 1 to depth) {
      val key = s"pow(${u01(s"concat_ws('|', walk_id, $t, dst, $seed)")}, 1.0 / weight)"
      b ++= s"""w$t AS MATERIALIZED (
        |  SELECT walk_id, max_by(dst, $key) AS vertex
        |  FROM w${t - 1} JOIN und ON vertex = src GROUP BY walk_id
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "walks AS (" + (0 to depth).map(t =>
      s"SELECT walk_id, $t AS step, vertex FROM w$t").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT walk_id, CAST(step AS BIGINT) AS step, vertex FROM walks"
    b.toString
  }

  /** node2vec second-order walks: candidate weight w/p when returning to
    * prev, w when candidate neighbors prev, w/q otherwise; same A-ES race. */
  def node2vecWalks(nWalks: Int, depth: Int, p: Double, q: Double, seed: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nWalks)},\n"
    b ++= "n0 AS MATERIALIZED (SELECT id AS walk_id, CAST(-1 AS BIGINT) AS prev, id AS vertex FROM seeds),\n"
    for (t <- 1 to depth) {
      val key = s"pow(${u01(s"concat_ws('|', walk_id, $t, dst, $seed)")}, 1.0 / w2)"
      b ++= s"""c$t AS MATERIALIZED (
        |  SELECT s.walk_id, s.vertex AS from_v, e.dst,
        |    e.weight * (CASE WHEN e.dst = s.prev THEN ${1.0 / p}
        |                     WHEN a.dst IS NOT NULL THEN 1.0
        |                     ELSE ${1.0 / q} END) AS w2
        |  FROM n${t - 1} s JOIN und e ON s.vertex = e.src
        |  LEFT JOIN und a ON a.src = s.prev AND a.dst = e.dst
        |),
        |n$t AS MATERIALIZED (
        |  SELECT walk_id, arg_max(from_v, $key) AS prev, arg_max(dst, $key) AS vertex
        |  FROM c$t GROUP BY walk_id
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "walks AS (" + (0 to depth).map(t =>
      s"SELECT walk_id, $t AS step, vertex FROM n$t").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT walk_id, CAST(step AS BIGINT) AS step, vertex FROM walks"
    b.toString
  }

  /** Homogeneous neighbor sampling: per hop, top-fanout edges per
    * (batch, src) by hash order — the window row_number pattern. */
  def neighborSample(nBatches: Int, fanouts: Seq[Int], seed: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nBatches)},\n"
    b ++= "f0 AS MATERIALIZED (SELECT id AS batch_id, id AS vertex FROM seeds),\n"
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val key = h60(s"concat_ws('|', batch_id, $h, src, dst, $seed)")
      b ++= s"""h$h AS MATERIALIZED (
        |  SELECT batch_id, src, dst FROM (
        |    SELECT s.batch_id, e.src, e.dst,
        |      row_number() OVER (PARTITION BY s.batch_id, e.src ORDER BY $key) AS rn
        |    FROM f$h s JOIN und e ON s.vertex = e.src
        |  ) WHERE rn <= $f
        |),
        |f${h + 1} AS MATERIALIZED (SELECT DISTINCT batch_id, dst AS vertex FROM h$h)""".stripMargin
      b ++= ",\n"
    }
    b ++= "sampled AS (" + fanouts.indices.map(h =>
      s"SELECT batch_id, $h AS hop, src, dst FROM h$h").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT batch_id, CAST(hop AS BIGINT) AS hop, src, dst FROM sampled"
    b.toString
  }

  /** Heterogeneous sampling: per-edge-type fanouts; edge_type is the
    * deterministic (src+dst)%2 projection used by the fixture. */
  def heteroSample(nBatches: Int, fanouts: Map[Int, Seq[Int]], seed: Long): String = {
    val nHops = fanouts.values.head.size
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nBatches)},\n"
    b ++= "undt AS MATERIALIZED (SELECT src, dst, CAST((src + dst) % 2 AS INT) AS edge_type FROM und),\n"
    b ++= "f0 AS MATERIALIZED (SELECT id AS batch_id, id AS vertex FROM seeds),\n"
    for (h <- 0 until nHops) {
      val key = h60(s"concat_ws('|', batch_id, $h, src, dst, $seed)")
      val fanoutCase = "CASE " + fanouts.toSeq.sortBy(_._1).map { case (t, fs) =>
        s"WHEN edge_type = $t THEN ${fs(h)}" }.mkString(" ") + " ELSE 0 END"
      b ++= s"""h$h AS MATERIALIZED (
        |  SELECT batch_id, src, dst, edge_type FROM (
        |    SELECT s.batch_id, e.src, e.dst, e.edge_type,
        |      row_number() OVER (PARTITION BY s.batch_id, e.src, e.edge_type ORDER BY $key) AS rn
        |    FROM f$h s JOIN undt e ON s.vertex = e.src
        |  ) WHERE rn <= $fanoutCase
        |),
        |f${h + 1} AS MATERIALIZED (SELECT DISTINCT batch_id, dst AS vertex FROM h$h)""".stripMargin
      b ++= ",\n"
    }
    b ++= "sampled AS (" + (0 until nHops).map(h =>
      s"SELECT batch_id, $h AS hop, src, dst, edge_type FROM h$h").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT batch_id, CAST(hop AS BIGINT) AS hop, src, dst, edge_type FROM sampled"
    b.toString
  }

  /** Temporal sampling: sampled edge time must exceed the arrival time of
    * its source; fixture time t = CAST(weight AS BIGINT). */
  def temporalSample(nBatches: Int, fanouts: Seq[Int], seed: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nBatches)},\n"
    b ++= "undt AS MATERIALIZED (SELECT src, dst, CAST(weight AS BIGINT) AS t FROM und),\n"
    b ++= "f0 AS MATERIALIZED (SELECT id AS batch_id, id AS vertex, CAST(-1 AS BIGINT) AS t_in FROM seeds),\n"
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val key = h60(s"concat_ws('|', batch_id, $h, src, dst, $seed)")
      b ++= s"""h$h AS MATERIALIZED (
        |  SELECT batch_id, src, dst, t FROM (
        |    SELECT s.batch_id, e.src, e.dst, e.t,
        |      row_number() OVER (PARTITION BY s.batch_id, e.src, s.t_in ORDER BY $key) AS rn
        |    FROM f$h s JOIN undt e ON s.vertex = e.src AND e.t > s.t_in
        |  ) WHERE rn <= $f
        |),
        |f${h + 1} AS MATERIALIZED (
        |  SELECT batch_id, dst AS vertex, min(t) AS t_in FROM h$h GROUP BY 1, 2
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "sampled AS (" + fanouts.indices.map(h =>
      s"SELECT batch_id, $h AS hop, src, dst, t FROM h$h").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT batch_id, CAST(hop AS BIGINT) AS hop, src, dst, t FROM sampled"
    b.toString
  }

  /** Windowed temporal sampling: per-seed closed [start, end] time windows
    * (NULL = unbounded, fixture: start=2 for even seed ids, end=12 for
    * ids % 3 = 0) over the deterministic t = (src + 3*dst) % 16 time
    * projection; `decreasing` flips the walk direction (frontier starts at
    * the window's upper bound, each hop strictly older). */
  def temporalWindowedSample(nBatches: Int, fanouts: Seq[Int], seed: Long,
                             decreasing: Boolean): String = {
    val LO = "-4611686018427387904"
    val HI = "4611686018427387904"
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nBatches)},\n"
    b ++= "undt AS MATERIALIZED (SELECT src, dst, CAST((src + 3*dst) % 16 AS BIGINT) AS t FROM und),\n"
    b ++= s"""wins AS MATERIALIZED (SELECT id AS batch_id,
      |  COALESCE(CAST(CASE WHEN id % 2 = 0 THEN 2 END AS BIGINT), $LO) AS t_lo,
      |  COALESCE(CAST(CASE WHEN id % 3 = 0 THEN 12 END AS BIGINT), $HI) AS t_hi
      |  FROM seeds),
      |""".stripMargin
    val t0 = if (decreasing) HI else LO
    b ++= s"f0 AS MATERIALIZED (SELECT id AS batch_id, id AS vertex, CAST($t0 AS BIGINT) AS t_in FROM seeds),\n"
    val cmp = if (decreasing) "<" else ">"
    val nextT = if (decreasing) "max" else "min"
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val key = h60(s"concat_ws('|', s.batch_id, $h, e.src, e.dst, $seed)")
      b ++= s"""h$h AS MATERIALIZED (
        |  SELECT batch_id, src, dst, t FROM (
        |    SELECT s.batch_id, e.src, e.dst, e.t,
        |      row_number() OVER (PARTITION BY s.batch_id, e.src, s.t_in ORDER BY $key) AS rn
        |    FROM f$h s JOIN wins w ON s.batch_id = w.batch_id
        |    JOIN undt e ON s.vertex = e.src AND e.t $cmp s.t_in
        |      AND e.t >= w.t_lo AND e.t <= w.t_hi
        |  ) WHERE rn <= $f
        |),
        |f${h + 1} AS MATERIALIZED (
        |  SELECT batch_id, dst AS vertex, $nextT(t) AS t_in FROM h$h GROUP BY 1, 2
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "sampled AS (" + fanouts.indices.map(h =>
      s"SELECT batch_id, $h AS hop, src, dst, t FROM h$h").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT batch_id, CAST(hop AS BIGINT) AS hop, src, dst, t FROM sampled"
    b.toString
  }

  /** Biased temporal sampling: A-ES race key pow(u, 1/weight) descending
    * with the dst tie-break, within the time window. */
  def temporalBiasedSample(nBatches: Int, fanouts: Seq[Int], seed: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nBatches)},\n"
    b ++= "undt AS MATERIALIZED (SELECT src, dst, CAST(weight AS BIGINT) AS t, weight FROM und),\n"
    b ++= "f0 AS MATERIALIZED (SELECT id AS batch_id, id AS vertex, CAST(-1 AS BIGINT) AS t_in FROM seeds),\n"
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val key = s"pow(${u01(s"concat_ws('|', batch_id, $h, src, dst, $seed)")}, 1.0 / weight)"
      b ++= s"""h$h AS MATERIALIZED (
        |  SELECT batch_id, src, dst, t FROM (
        |    SELECT s.batch_id, e.src, e.dst, e.t,
        |      row_number() OVER (PARTITION BY s.batch_id, e.src, s.t_in ORDER BY $key DESC, e.dst) AS rn
        |    FROM f$h s JOIN undt e ON s.vertex = e.src AND e.t > s.t_in
        |  ) WHERE rn <= $f
        |),
        |f${h + 1} AS MATERIALIZED (
        |  SELECT batch_id, dst AS vertex, min(t) AS t_in FROM h$h GROUP BY 1, 2
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "sampled AS (" + fanouts.indices.map(h =>
      s"SELECT batch_id, $h AS hop, src, dst, t FROM h$h").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT batch_id, CAST(hop AS BIGINT) AS hop, src, dst, t FROM sampled"
    b.toString
  }

  /** Heterogeneous temporal sampling: per-edge-type fanouts inside the
    * time window; edge_type = (src+dst)%2 fixture projection. */
  def temporalHeteroSample(nBatches: Int, fanouts: Map[Int, Seq[Int]], seed: Long): String = {
    val nHops = fanouts.values.head.size
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nBatches)},\n"
    b ++= "undt AS MATERIALIZED (SELECT src, dst, CAST(weight AS BIGINT) AS t, CAST((src + dst) % 2 AS INT) AS edge_type FROM und),\n"
    b ++= "f0 AS MATERIALIZED (SELECT id AS batch_id, id AS vertex, CAST(-1 AS BIGINT) AS t_in FROM seeds),\n"
    for (h <- 0 until nHops) {
      val key = h60(s"concat_ws('|', batch_id, $h, src, dst, $seed)")
      val fanoutCase = "CASE " + fanouts.toSeq.sortBy(_._1).map { case (t, fs) =>
        s"WHEN edge_type = $t THEN ${fs(h)}" }.mkString(" ") + " ELSE 0 END"
      b ++= s"""h$h AS MATERIALIZED (
        |  SELECT batch_id, src, dst, t, edge_type FROM (
        |    SELECT s.batch_id, e.src, e.dst, e.t, e.edge_type,
        |      row_number() OVER (PARTITION BY s.batch_id, e.src, s.t_in, e.edge_type ORDER BY $key) AS rn
        |    FROM f$h s JOIN undt e ON s.vertex = e.src AND e.t > s.t_in
        |  ) WHERE rn <= $fanoutCase
        |),
        |f${h + 1} AS MATERIALIZED (
        |  SELECT batch_id, dst AS vertex, min(t) AS t_in FROM h$h GROUP BY 1, 2
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "sampled AS (" + (0 until nHops).map(h =>
      s"SELECT batch_id, $h AS hop, src, dst, t, edge_type FROM h$h").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT batch_id, CAST(hop AS BIGINT) AS hop, src, dst, t, edge_type FROM sampled"
    b.toString
  }

  /** Heterogeneous biased temporal sampling: per-edge-type fanouts AND the
    * A-ES race key pow(u, 1/weight) descending, inside the time window. */
  def temporalHeteroBiasedSample(nBatches: Int, fanouts: Map[Int, Seq[Int]],
                                 seed: Long): String = {
    val nHops = fanouts.values.head.size
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nBatches)},\n"
    b ++= "undt AS MATERIALIZED (SELECT src, dst, CAST(weight AS BIGINT) AS t, weight, CAST((src + dst) % 2 AS INT) AS edge_type FROM und),\n"
    b ++= "f0 AS MATERIALIZED (SELECT id AS batch_id, id AS vertex, CAST(-1 AS BIGINT) AS t_in FROM seeds),\n"
    for (h <- 0 until nHops) {
      val key = s"pow(${u01(s"concat_ws('|', batch_id, $h, src, dst, $seed)")}, 1.0 / weight)"
      val fanoutCase = "CASE " + fanouts.toSeq.sortBy(_._1).map { case (t, fs) =>
        s"WHEN edge_type = $t THEN ${fs(h)}" }.mkString(" ") + " ELSE 0 END"
      b ++= s"""h$h AS MATERIALIZED (
        |  SELECT batch_id, src, dst, t, edge_type FROM (
        |    SELECT s.batch_id, e.src, e.dst, e.t, e.edge_type, e.weight,
        |      row_number() OVER (PARTITION BY s.batch_id, e.src, s.t_in, e.edge_type ORDER BY $key DESC, e.dst) AS rn
        |    FROM f$h s JOIN undt e ON s.vertex = e.src AND e.t > s.t_in
        |  ) WHERE rn <= $fanoutCase
        |),
        |f${h + 1} AS MATERIALIZED (
        |  SELECT batch_id, dst AS vertex, min(t) AS t_in FROM h$h GROUP BY 1, 2
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "sampled AS (" + (0 until nHops).map(h =>
      s"SELECT batch_id, $h AS hop, src, dst, t, edge_type FROM h$h").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT batch_id, CAST(hop AS BIGINT) AS hop, src, dst, t, edge_type FROM sampled"
    b.toString
  }

  /** Negative sampling over the SPARSE customer→supplier bipartite graph
    * (the dense supplier fixture would anti-join everything away): hash-
    * indexed candidate pairs minus existing edges. */
  def negativeSample(n: Int, seed: Long): String =
    s"""WITH $CUSTSUPP_EDGES_SQL,
       |csverts AS MATERIALIZED (SELECT src AS id FROM cs_edges UNION SELECT dst FROM cs_edges),
       |idx AS MATERIALIZED (SELECT id, row_number() OVER (ORDER BY id) - 1 AS i FROM csverts),
       |nv AS MATERIALIZED (SELECT count(*) AS n FROM csverts),
       |cand AS MATERIALIZED (
       |  SELECT t.sample_id,
       |    ${h60(s"concat_ws('|', 'ns', t.sample_id, 0, $seed)")} % (SELECT n FROM nv) AS si,
       |    ${h60(s"concat_ws('|', 'ns', t.sample_id, 1, $seed)")} % (SELECT n FROM nv) AS di
       |  FROM range(0, $n) t(sample_id)
       |),
       |j AS MATERIALIZED (
       |  SELECT c.sample_id, a.id AS src, b.id AS dst
       |  FROM cand c JOIN idx a ON a.i = c.si JOIN idx b ON b.i = c.di
       |  WHERE a.id <> b.id
       |)
       |SELECT sample_id, src, dst FROM j
       |WHERE NOT EXISTS (SELECT 1 FROM cs_edges e WHERE e.src = j.src AND e.dst = j.dst)""".stripMargin

  /** Padded uniform walks on the hierarchy DAG: walks from the region
    * roots die at supplier leaves; each walk pivots to a fixed-length
    * comma-joined path padded with -1 (the use_padding output shape). */
  def paddedDagWalks(depth: Int, seed: Long): String = {
    val b = new StringBuilder
    b ++= """WITH dagu AS MATERIALIZED (
      |  SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(n_nationkey + 100 AS BIGINT) AS dst FROM nation
      |  UNION ALL
      |  SELECT CAST(s_nationkey + 100 AS BIGINT), CAST(s_suppkey + 1000 AS BIGINT) FROM supplier
      |),
      |dseeds AS MATERIALIZED (SELECT DISTINCT src AS id FROM dagu WHERE src < 100),
      |w0 AS MATERIALIZED (SELECT id AS walk_id, id AS vertex FROM dseeds),
      |""".stripMargin
    for (t <- 1 to depth) {
      val key = h60(s"concat_ws('|', walk_id, $t, dst, $seed)")
      b ++= s"""w$t AS MATERIALIZED (
        |  SELECT walk_id, min_by(dst, $key) AS vertex
        |  FROM w${t - 1} JOIN dagu ON vertex = src GROUP BY walk_id
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "base AS MATERIALIZED (" + (0 to depth).map(t =>
      s"SELECT walk_id, $t AS step, vertex FROM w$t").mkString(" UNION ALL ") + ")\n"
    val slots = (0 to depth).map(t =>
      s"coalesce(CAST(max(CASE WHEN step = $t THEN vertex END) AS VARCHAR), '-1')")
      .mkString(", ")
    b ++= s"SELECT walk_id, concat_ws(',', $slots) AS path FROM base GROUP BY walk_id"
    b.toString
  }

  /** Weight-biased homogeneous sampling: A-ES race pow(u, 1/weight)
    * descending with dst tie-break, top-fanout per (batch, src). */
  def neighborSampleBiased(nBatches: Int, fanouts: Seq[Int], seed: Long): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nBatches)},\n"
    b ++= "f0 AS MATERIALIZED (SELECT id AS batch_id, id AS vertex FROM seeds),\n"
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val key = s"pow(${u01(s"concat_ws('|', batch_id, $h, src, dst, $seed)")}, 1.0 / weight)"
      b ++= s"""h$h AS MATERIALIZED (
        |  SELECT batch_id, src, dst FROM (
        |    SELECT s.batch_id, e.src, e.dst,
        |      row_number() OVER (PARTITION BY s.batch_id, e.src ORDER BY $key DESC, e.dst) AS rn
        |    FROM f$h s JOIN und e ON s.vertex = e.src
        |  ) WHERE rn <= $f
        |),
        |f${h + 1} AS MATERIALIZED (SELECT DISTINCT batch_id, dst AS vertex FROM h$h)""".stripMargin
      b ++= ",\n"
    }
    b ++= "sampled AS (" + fanouts.indices.map(h =>
      s"SELECT batch_id, $h AS hop, src, dst FROM h$h").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT batch_id, CAST(hop AS BIGINT) AS hop, src, dst FROM sampled"
    b.toString
  }

  /** Shared tail: renumber CTEs (sfinal/sverts/ranked) appended onto the
    * neighbor-sample chain, ready for a caller-specific final SELECT. */
  private def renumberChain(nBatches: Int, fanouts: Seq[Int], seed: Long): String = {
    val base = neighborSample(nBatches, fanouts, seed)
    base.substring(0, base.lastIndexOf("SELECT batch_id,")) + ",\n" +
      """sfinal AS MATERIALIZED (SELECT batch_id, CAST(hop AS BIGINT) AS hop, src, dst FROM sampled),
        |sverts AS MATERIALIZED (
        |  SELECT DISTINCT batch_id, v FROM (
        |    SELECT batch_id, src AS v FROM sfinal UNION ALL SELECT batch_id, dst FROM sfinal
        |  )
        |),
        |ranked AS MATERIALIZED (
        |  SELECT batch_id, v, CAST(dense_rank() OVER (PARTITION BY batch_id ORDER BY v) - 1 AS BIGINT) AS r
        |  FROM sverts
        |)""".stripMargin
  }

  /** CSR compression of the renumbered sample: per-batch dense positions
    * over (hop, src_r, dst_r) order. */
  def sampleCsr(nBatches: Int, fanouts: Seq[Int], seed: Long): String =
    renumberChain(nBatches, fanouts, seed) + ",\n" +
      """csr AS MATERIALIZED (
        |  SELECT s.batch_id, s.hop, a.r AS src_r, b.r AS dst_r
        |  FROM sfinal s
        |  JOIN ranked a ON a.batch_id = s.batch_id AND a.v = s.src
        |  JOIN ranked b ON b.batch_id = s.batch_id AND b.v = s.dst
        |)
        |SELECT batch_id, hop, src_r, dst_r,
        |  CAST(row_number() OVER (PARTITION BY batch_id ORDER BY hop, src_r, dst_r) - 1 AS BIGINT) AS pos
        |FROM csr""".stripMargin

  /** DCSR offsets (src major, doubly compressed): only majors with ≥1
    * sampled edge, running offset over major_r order per batch. */
  def sampleDcsr(nBatches: Int, fanouts: Seq[Int], seed: Long): String =
    renumberChain(nBatches, fanouts, seed) + ",\n" +
      """edg AS MATERIALIZED (
        |  SELECT s.batch_id, a.r AS src_r, b.r AS dst_r
        |  FROM sfinal s
        |  JOIN ranked a ON a.batch_id = s.batch_id AND a.v = s.src
        |  JOIN ranked b ON b.batch_id = s.batch_id AND b.v = s.dst
        |),
        |deg AS MATERIALIZED (
        |  SELECT batch_id, src_r AS major_r, count(*) AS degree
        |  FROM edg GROUP BY 1, 2
        |)
        |SELECT batch_id, CAST(major_r AS BIGINT) AS major_r,
        |  CAST(coalesce(sum(degree) OVER (PARTITION BY batch_id ORDER BY major_r
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset_start,
        |  CAST(degree AS BIGINT) AS degree
        |FROM deg""".stripMargin

  /** CSC offsets (dst major, dense): one slot per major id in
    * [0, max major] per batch, zero-degree slots carry the running offset. */
  def sampleCsc(nBatches: Int, fanouts: Seq[Int], seed: Long): String =
    renumberChain(nBatches, fanouts, seed) + ",\n" +
      """edg AS MATERIALIZED (
        |  SELECT s.batch_id, a.r AS src_r, b.r AS dst_r
        |  FROM sfinal s
        |  JOIN ranked a ON a.batch_id = s.batch_id AND a.v = s.src
        |  JOIN ranked b ON b.batch_id = s.batch_id AND b.v = s.dst
        |),
        |deg AS MATERIALIZED (
        |  SELECT batch_id, dst_r AS major_r, count(*) AS degree
        |  FROM edg GROUP BY 1, 2
        |),
        |dense AS MATERIALIZED (
        |  SELECT batch_id, unnest(generate_series(0, mx)) AS major_r
        |  FROM (SELECT batch_id, max(dst_r) AS mx FROM edg GROUP BY 1)
        |)
        |SELECT d.batch_id, CAST(d.major_r AS BIGINT) AS major_r,
        |  CAST(coalesce(sum(coalesce(g.degree, 0)) OVER (PARTITION BY d.batch_id
        |    ORDER BY d.major_r ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset_start,
        |  CAST(coalesce(g.degree, 0) AS BIGINT) AS degree
        |FROM dense d LEFT JOIN deg g ON g.batch_id = d.batch_id AND g.major_r = d.major_r""".stripMargin

  /** retain_seeds renumber map: seeds always present and ranked FIRST. */
  def sampleRenumberSeeds(nBatches: Int, fanouts: Seq[Int], seed: Long): String =
    renumberChain(nBatches, fanouts, seed) + ",\n" +
      """seedv AS MATERIALIZED (SELECT id AS batch_id, id AS v FROM seeds),
        |tagged AS MATERIALIZED (
        |  SELECT batch_id, v, TRUE AS is_seed FROM seedv
        |  UNION ALL
        |  SELECT s.batch_id, s.v, FALSE FROM sverts s
        |  WHERE NOT EXISTS (SELECT 1 FROM seedv d WHERE d.batch_id = s.batch_id AND d.v = s.v)
        |)
        |SELECT batch_id, v,
        |  CAST(dense_rank() OVER (PARTITION BY batch_id ORDER BY is_seed DESC, v) - 1 AS BIGINT) AS r,
        |  is_seed
        |FROM tagged""".stripMargin

  /** Degree-biased negative sampling: a uniform random edge-index draw is
    * endpoint-degree-proportional — same edge index + hash draws as the
    * Spark side. */
  def negativeBiasedSample(n: Int, seed: Long): String =
    s"""WITH $CUSTSUPP_EDGES_SQL,
       |eidx AS MATERIALIZED (
       |  SELECT src, dst, row_number() OVER (ORDER BY src, dst) - 1 AS i
       |  FROM (SELECT DISTINCT src, dst FROM cs_edges)
       |),
       |ne AS MATERIALIZED (SELECT count(*) AS n FROM eidx),
       |cand AS MATERIALIZED (
       |  SELECT t.sample_id,
       |    ${h60(s"concat_ws('|', 'nb', t.sample_id, 0, $seed)")} % (SELECT n FROM ne) AS si,
       |    ${h60(s"concat_ws('|', 'nb', t.sample_id, 1, $seed)")} % (SELECT n FROM ne) AS di
       |  FROM range(0, $n) t(sample_id)
       |),
       |j AS MATERIALIZED (
       |  SELECT c.sample_id, a.src, b.dst
       |  FROM cand c JOIN eidx a ON a.i = c.si JOIN eidx b ON b.i = c.di
       |  WHERE a.src <> b.dst
       |)
       |SELECT sample_id, src, dst FROM j
       |WHERE NOT EXISTS (SELECT 1 FROM cs_edges e WHERE e.src = j.src AND e.dst = j.dst)""".stripMargin

  /** Uniform vertex sample without replacement: k min-hash vertices. */
  def selectRandomVertices(k: Int, seed: Long): String =
    s"""WITH $PRELUDE
       |SELECT id FROM (
       |  SELECT id, row_number() OVER (ORDER BY ${h60(s"concat_ws('|', 'srv', id, $seed)")}, id) AS rn
       |  FROM verts
       |) WHERE rn <= $k""".stripMargin

  /** Batched ego graphs: radius-unrolled multi-source BFS reach, then the
    * per-seed induced undirected edges with both endpoint distances. */
  def egoBatched(nSeeds: Int, radius: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nSeeds)},\n"
    b ++= "g0 AS MATERIALIZED (SELECT id AS seed, id, 0 AS dist FROM seeds),\n"
    b ++= "gs0 AS MATERIALIZED (SELECT seed, id FROM g0),\n"
    for (t <- 1 to radius) {
      b ++= s"""g$t AS MATERIALIZED (
        |  SELECT f.seed, u.dst AS id, $t AS dist
        |  FROM g${t - 1} f JOIN und u ON u.src = f.id
        |  WHERE NOT EXISTS (SELECT 1 FROM gs${t - 1} s WHERE s.seed = f.seed AND s.id = u.dst)
        |  GROUP BY 1, 2
        |),
        |gs$t AS MATERIALIZED (SELECT seed, id FROM gs${t - 1} UNION ALL SELECT seed, id FROM g$t)""".stripMargin
      b ++= ",\n"
    }
    b ++= "reach AS MATERIALIZED (" + (0 to radius).map(t =>
      s"SELECT seed, id, dist FROM g$t").mkString(" UNION ALL ") + ")\n"
    b ++= """SELECT r1.seed, u.src, u.dst,
      |  CAST(r1.dist AS BIGINT) AS src_dist, CAST(r2.dist AS BIGINT) AS dst_dist
      |FROM und u
      |JOIN reach r1 ON r1.id = u.src
      |JOIN reach r2 ON r2.seed = r1.seed AND r2.id = u.dst""".stripMargin
    b.toString
  }

  /** Multi-source BFS (batched by source), unrolled `rounds` levels.
    * Predecessor tie-break = min source endpoint, as in MultiTraversal. */
  def msBfs(nSources: Int, rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nSources)},\n"
    b ++= "m0 AS MATERIALIZED (SELECT id AS source, id, 0 AS dist, CAST(-1 AS BIGINT) AS predecessor FROM seeds),\n"
    b ++= "st0 AS MATERIALIZED (SELECT source, id FROM m0),\n"
    for (t <- 1 to rounds) {
      b ++= s"""m$t AS MATERIALIZED (
        |  SELECT f.source, u.dst AS id, $t AS dist, min(u.src) AS predecessor
        |  FROM m${t - 1} f JOIN und u ON u.src = f.id
        |  WHERE NOT EXISTS (SELECT 1 FROM st${t - 1} s WHERE s.source = f.source AND s.id = u.dst)
        |  GROUP BY 1, 2
        |),
        |st$t AS MATERIALIZED (SELECT source, id FROM st${t - 1} UNION ALL SELECT source, id FROM m$t)""".stripMargin
      b ++= ",\n"
    }
    b ++= "settled AS (" + (0 to rounds).map(t =>
      s"SELECT source, id, dist, predecessor FROM m$t").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT source, id, CAST(dist AS BIGINT) AS distance, predecessor FROM settled"
    b.toString
  }

  /** Origin-destination hop distances: the msBfs chain semi-joined to the
    * destination list. */
  def odDistances(nOrigins: Int, nDests: Int, rounds: Int): String = {
    val base = msBfs(nOrigins, rounds)
    // swap the final SELECT for the OD projection (settled is the last CTE)
    val body = base.substring(0, base.lastIndexOf("SELECT source,"))
    body + ",\n" +
      s"""dests AS MATERIALIZED (SELECT id FROM verts ORDER BY id LIMIT $nDests)
         |SELECT s.source AS origin, s.id AS destination, CAST(s.dist AS BIGINT) AS distance
         |FROM settled s JOIN dests d ON d.id = s.id""".stripMargin
  }

  /** WEIGHTED OD distances: Bellman-Ford keyed by origin, unrolled, then
    * the destination semi-join. */
  def odWeighted(nOrigins: Int, nDests: Int, rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n${seeds(nOrigins)},\n"
    b ++= "d0 AS MATERIALIZED (SELECT id AS source, id, 0.0 AS d FROM seeds),\n"
    for (i <- 1 to rounds) {
      b ++= s"""d$i AS MATERIALIZED (
        |  SELECT source, id, min(d) AS d FROM (
        |    SELECT source, id, d FROM d${i - 1}
        |    UNION ALL
        |    SELECT p.source, u.dst AS id, p.d + u.weight AS d
        |    FROM und u JOIN d${i - 1} p ON p.id = u.src
        |  ) GROUP BY source, id
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= s"dst_set AS MATERIALIZED (SELECT id FROM verts ORDER BY id LIMIT $nDests)\n"
    b ++= s"""SELECT d.source AS origin, d.id AS destination, round(d.d, 6) AS distance
       |FROM d$rounds d JOIN dst_set t ON t.id = d.id""".stripMargin
    b.toString
  }

  /** BFS predecessor-path extraction: single-source BFS unrolled, then walk
    * the predecessor chain from each destination (pos 0 = destination). */
  def bfsPaths(nDests: Int, rounds: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH $PRELUDE,\n"
    b ++= "m0 AS MATERIALIZED (SELECT (SELECT min(src) FROM supp_edges) AS id, CAST(-1 AS BIGINT) AS predecessor),\n"
    b ++= "st0 AS MATERIALIZED (SELECT id FROM m0),\n"
    for (t <- 1 to rounds) {
      b ++= s"""m$t AS MATERIALIZED (
        |  SELECT u.dst AS id, min(u.src) AS predecessor
        |  FROM m${t - 1} f JOIN und u ON u.src = f.id
        |  WHERE NOT EXISTS (SELECT 1 FROM st${t - 1} s WHERE s.id = u.dst)
        |  GROUP BY 1
        |),
        |st$t AS MATERIALIZED (SELECT id FROM st${t - 1} UNION ALL SELECT id FROM m$t)""".stripMargin
      b ++= ",\n"
    }
    b ++= "pred AS MATERIALIZED (" + (0 to rounds).map(t =>
      s"SELECT id, predecessor FROM m$t").mkString(" UNION ALL ") + "),\n"
    b ++= s"dests AS MATERIALIZED (SELECT id FROM verts ORDER BY id DESC LIMIT $nDests),\n"
    b ++= "p0 AS MATERIALIZED (SELECT d.id AS destination, 0 AS pos, p.id AS vertex, p.predecessor FROM dests d JOIN pred p ON p.id = d.id),\n"
    for (k <- 1 to rounds) {
      b ++= s"""p$k AS MATERIALIZED (
        |  SELECT c.destination, $k AS pos, p.id AS vertex, p.predecessor
        |  FROM p${k - 1} c JOIN pred p ON p.id = c.predecessor
        |  WHERE c.predecessor <> -1
        |)""".stripMargin
      b ++= ",\n"
    }
    b ++= "paths AS (" + (0 to rounds).map(k =>
      s"SELECT destination, pos, vertex FROM p$k").mkString(" UNION ALL ") + ")\n"
    b ++= "SELECT destination, CAST(pos AS BIGINT) AS pos, vertex FROM paths"
    b.toString
  }

  /** Edge cut of the supplier-nation partition (scalar). */
  def edgeCut: String =
    s"""WITH $SUPP_EDGES_SQL,
       |$SUPP_UND_SQL,
       |lbl AS MATERIALIZED (SELECT s_suppkey AS id, CAST(s_nationkey AS BIGINT) AS c FROM supplier)
       |SELECT round(coalesce(sum(CASE WHEN la.c <> lb.c THEN u.weight END), 0) / 2.0, 6) AS edge_cut
       |FROM und u JOIN lbl la ON la.id = u.src JOIN lbl lb ON lb.id = u.dst""".stripMargin

  /** Ratio cut Σ_c cut(c)/|c| of the supplier-nation partition (scalar). */
  def ratioCut: String =
    s"""WITH $SUPP_EDGES_SQL,
       |$SUPP_UND_SQL,
       |lbl AS MATERIALIZED (SELECT s_suppkey AS id, CAST(s_nationkey AS BIGINT) AS c FROM supplier),
       |sizes AS MATERIALIZED (SELECT c, count(*) AS n FROM lbl GROUP BY 1),
       |cuts AS MATERIALIZED (
       |  SELECT la.c AS c, sum(u.weight) / 2.0 AS cut
       |  FROM und u JOIN lbl la ON la.id = u.src JOIN lbl lb ON lb.id = u.dst
       |  WHERE la.c <> lb.c GROUP BY 1
       |)
       |SELECT round(sum(coalesce(cuts.cut, 0) / sizes.n), 6) AS ratio_cut
       |FROM sizes LEFT JOIN cuts ON cuts.c = sizes.c""".stripMargin
}
