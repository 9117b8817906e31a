package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Gr._
import graft.pipeline.TextOps.hash60

/** Graph generators (reference: `cpp/src/generators/` —
  * `generate_rmat_edgelist.cuh`, `erdos_renyi_generator.cuh`,
  * `simple_generators.cuh`; python surface `generators/rmat.py:407`,
  * C++ decls `graph_generators.hpp:69,205-337`).
  *
  * Scale shape: every generator is `spark.range(n)` + pure projections —
  * embarrassingly parallel, zero shuffles, so a scale-30 RMAT (17B edges)
  * is just a bigger range with more partitions. Randomness is the
  * deterministic md5-derived hash60 (counter-mode PRNG in expression form),
  * reproducible under any partitioning AND by the DuckDB oracle; for
  * maximum throughput swap hash60 for the codegen'd xxhash64 (same shape,
  * no longer oracle-portable).
  */
object Generators {

  /** RMAT edge list (Graph500 recursive-matrix): per edge i and bit level l
    * one uniform draw picks the quadrant — src bit 1 iff u ≥ a+b, dst bit 1
    * iff u ∈ [a, a+b) ∪ [a+b+c, 1). Defaults a=.57, b=.19, c=.19, seed=42
    * (reference `rmat.py:407-452`). Output (edge_id, src, dst); multi-edges
    * and self-loops are kept, as in the reference (clip_and_flip off). */
  def rmat(spark: SparkSession, scale: Int, numEdges: Long,
           a: Double = 0.57, b: Double = 0.19, c: Double = 0.19,
           seed: Long = 42, fastHash: Boolean = false): DataFrame = {
    val ab = a + b
    val abc = a + b + c
    // slice the id range by DATA size, not core count: `spark.range(n)`
    // defaults to one partition per core, so at scale 22 (67M edges on 32
    // cores) every downstream map-side partial agg holds a 2.1M-row hash
    // map per task — 32 of them racing an 8g-heap execution pool OOM'd the
    // graph-build dedup (r8 scale probe). ~1M rows per slice keeps every
    // per-task structure bounded by data, the same rule as shuffle
    // partition sizing; values are edge_id-deterministic, so slicing is
    // invariant for every gate.
    val slices = math.max(spark.sparkContext.defaultParallelism,
      (numEdges / 1000000L).toInt)
    val base = spark.range(0, numEdges, 1, slices).select(col("id").as("edge_id"))
    val (srcExpr, dstExpr) = (0 until scale).foldLeft((lit(0L), lit(0L))) {
      case ((s, d), l) =>
        // draw per (edge, level): md5-derived by default (DuckDB-portable
        // oracle); xxhash64 when benchmarking — ~20x cheaper per draw and
        // codegen'd, same distribution, not oracle-reproducible.
        val u = if (fastHash)
          pmod(xxhash64(col("edge_id"), lit(l), lit(seed)), lit(1L << 60))
            .cast("double") / lit(math.pow(2, 60))
        else
          hash60(concat_ws("|", lit("rmat"), col("edge_id"), lit(l), lit(seed)))
            .cast("double") / lit(math.pow(2, 60))
        (s + when(u >= ab, lit(1L << l)).otherwise(lit(0L)),
         d + when((u >= a && u < ab) || u >= abc, lit(1L << l)).otherwise(lit(0L)))
    }
    base.select(col("edge_id"), srcExpr.as(SRC), dstExpr.as(DST))
  }

  /** Deterministic per-graph scale draws for [[rmatMulti]] — pure JVM md5
    * (no Spark, no DuckDB), so the Spark generator and the SQL oracle
    * compute the same scales from the same parameters. `powerLaw` realizes
    * the reference's POWER_LAW size distribution as inverse-CDF over
    * geometric weights 2^-(s-minScale); UNIFORM is a plain modulus. */
  private[graft] def rmatScales(nLists: Int, minScale: Int, maxScale: Int,
                                seed: Long, powerLaw: Boolean): Seq[Int] = {
    val span = maxScale - minScale + 1
    (0 until nLists).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"rmats|$i|$seed".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      if (!powerLaw) minScale + (h % span).toInt
      else {
        // weights 2^-(k): CDF cut points at 1-2^-(k+1) of the total
        val total = (1L << span) - 1
        val u = h % total
        var k = 0; var acc = (1L << (span - 1))
        while (u >= acc && k < span - 1) { k += 1; acc += (1L << (span - 1 - k)) }
        minScale + k
      }
    }
  }

  /** Batched RMAT (`generate_rmat_edgelists`,
    * `pylibcugraph/generate_rmat_edgelists.pyx:57`;
    * `graph_generators.hpp:205`): `nLists` independent RMAT graphs whose
    * scales are drawn from [minScale, maxScale] under a UNIFORM or
    * POWER_LAW size distribution, each with edges = edgeFactor·2^scale and
    * its own seed stream. One union of pure projections — still zero
    * shuffles. Output (graph_id, edge_id, src, dst). */
  def rmatMulti(spark: SparkSession, nLists: Int, minScale: Int, maxScale: Int,
                edgeFactor: Int = 16, seed: Long = 42,
                powerLaw: Boolean = false, fastHash: Boolean = false): DataFrame = {
    val scales = rmatScales(nLists, minScale, maxScale, seed, powerLaw)
    scales.zipWithIndex.map { case (sc, i) =>
      rmat(spark, sc, edgeFactor.toLong << sc, seed = seed + 1000L * (i + 1),
        fastHash = fastHash)
        .select(lit(i.toLong).as("graph_id"), col("edge_id"), col(SRC), col(DST))
    }.reduce(_ unionByName _)
  }

  /** Erdős–Rényi G(n,p): each ordered pair i<j kept iff its hash draw < p.
    * The pair stream is `range(n·(n−1)/2)` with the pair index INVERTED back
    * to (i, j) — pure projection, no join, no quadratic shuffle/broadcast
    * (a crossJoin would plan as a BroadcastNestedLoopJoin). Pairs are
    * enumerated column-major (k=0→(0,1), 1→(0,2), 2→(1,2), …): j is the
    * triangular-number root of k, i the remainder. The float sqrt seed is
    * corrected with exact integer comparisons, valid while 8k+1 < 2^53
    * (n ≤ ~67M — beyond that the Θ(n²) pair space itself is the limit). */
  def erdosRenyi(spark: SparkSession, n: Long, p: Double, seed: Long = 42): DataFrame = {
    val k = col("id")
    val jGuess = floor((sqrt(k.cast("double") * 8.0 + 1.0) + 1.0) / 2.0).cast("long")
    // triangular numbers are products of consecutive ints — always even, so
    // the /2 is exact in double well past the 2^53 guard above
    def tri(c: org.apache.spark.sql.Column) = ((c * (c - 1L)).cast("double") / 2.0).cast("long")
    val j = when(k < tri(jGuess), jGuess - 1L)
      .when(k >= tri(jGuess + 1L), jGuess + 1L)
      .otherwise(jGuess)
    val pairs = spark.range(n * (n - 1L) / 2L)
      .select((k - tri(j)).as(SRC), j.as(DST))
    val u = hash60(concat_ws("|", lit("er"), col(SRC), col(DST), lit(seed)))
      .cast("double") / lit(math.pow(2, 60))
    pairs.filter(u < p)
  }

  /** Path graph 0−1−…−(n−1) (reference `graph_generators.hpp:205`). */
  def pathGraph(spark: SparkSession, n: Long): DataFrame =
    spark.range(n - 1).select(col("id").as(SRC), (col("id") + 1L).as(DST))

  /** 2D mesh rows×cols with right + down edges (`graph_generators.hpp:231`). */
  def grid2d(spark: SparkSession, rows: Long, cols: Long): DataFrame = {
    val cells = spark.range(rows * cols)
    val right = cells.filter(col("id") % cols =!= cols - 1)
      .select(col("id").as(SRC), (col("id") + 1L).as(DST))
    val down = cells.filter(col("id") < (rows - 1) * cols)
      .select(col("id").as(SRC), (col("id") + cols).as(DST))
    right.union(down)
  }

  /** 3D mesh x×y×z with +1 / +x / +x·y edges (`graph_generators.hpp:257`,
    * kernel `simple_generators.cuh:149-216`): vertex v = base + ix + iy·x +
    * iz·x·y; an edge is kept exactly when its destination stays inside the
    * same row / plane / grid — the reference's three filtered
    * counting-iterator families, here three filtered range projections. */
  def mesh3d(spark: SparkSession, x: Long, y: Long, z: Long,
             base: Long = 0L): DataFrame = {
    val n = x * y * z
    val cells = spark.range(n).select((col("id") + base).as(SRC))
    val right = cells.filter((col(SRC) + 1 - base) % x =!= 0)
      .select(col(SRC), (col(SRC) + 1L).as(DST))
    val up = cells.filter((col(SRC) + x - base) % (x * y) >= x)
      .select(col(SRC), (col(SRC) + x).as(DST))
    val deep = cells.filter((col(SRC) + x * y - base) % n >= x * y)
      .select(col(SRC), (col(SRC) + x * y).as(DST))
    right.union(up).union(deep)
  }

  /** Complete graph K_n, canonical i<j (`graph_generators.hpp:283`). */
  def complete(spark: SparkSession, n: Long): DataFrame = {
    val i = spark.range(n).select(col("id").as(SRC))
    val j = spark.range(n).select(col("id").as(DST))
    i.crossJoin(j).filter(col(SRC) < col(DST))
  }

  /** Bipartite RMAT (`graph_generators.hpp:112`,
    * `generate_bipartite_rmat_edgelist.cuh:28`): src ∈ [0, 2^srcScale) and
    * dst ∈ [0, 2^dstScale) drawn level by level MSB-first; at each level the
    * src draw picks the row half (bit set iff u > a+b), and the dst
    * threshold CONDITIONS on that row choice — c/(1−(a+b)) in the lower
    * row, a/(a+b) in the upper — so the joint quadrant probabilities are
    * the Graph500 (a,b,c,d). Levels past the shorter scale use the marginal
    * threshold a+c, exactly as the reference kernel. Same counter-mode
    * hash60 draws as [[rmat]], reproducible by the DuckDB oracle. */
  def bipartiteRmat(spark: SparkSession, srcScale: Int, dstScale: Int,
                    numEdges: Long, a: Double = 0.57, b: Double = 0.19,
                    c: Double = 0.19, seed: Long = 42): DataFrame = {
    val aPlusB = a + b
    val aPlusC = a + c
    val aNorm = if (a + b > 0.0) a / (a + b) else 0.0
    val cNorm = if (1.0 - (a + b) > 0.0) c / (1.0 - (a + b)) else 0.0
    val base = spark.range(numEdges).select(col("id").as("edge_id"))
    def u(tag: String, l: Int) =
      hash60(concat_ws("|", lit(tag), col("edge_id"), lit(l), lit(seed)))
        .cast("double") / lit(math.pow(2, 60))
    val levels = math.max(srcScale, dstScale)
    val (srcExpr, dstExpr) = (0 until levels).foldLeft((lit(0L), lit(0L))) {
      case ((s, d), l) =>
        if (l < srcScale) {
          val srcSet = u("brmat_s", l) > aPlusB
          val thr = when(srcSet, lit(cNorm)).otherwise(lit(aNorm))
          val s2 = s + when(srcSet, lit(1L << (srcScale - l - 1))).otherwise(lit(0L))
          val d2 = if (l < dstScale)
            d + when(u("brmat_d", l) > thr, lit(1L << (dstScale - l - 1))).otherwise(lit(0L))
          else d
          (s2, d2)
        } else
          (s, d + when(u("brmat_d", l) > aPlusC, lit(1L << (dstScale - l - 1)))
            .otherwise(lit(0L)))
    }
    base.select(col("edge_id"), srcExpr.as(SRC), dstExpr.as(DST))
  }

  /** Scramble vertex ids within [0, 2^scale) — the reference's
    * `scramble.cuh` id-decorrelation step. A permutation is required (ids
    * must stay distinct), so this is the affine map x → (x·K + seed) mod
    * 2^scale with K odd (bijective mod a power of two). Supports scale ≤ 30
    * (product stays inside Long under ANSI arithmetic). */
  val ScrambleK = 2654435761L
  def scrambleVertexIds(edges: DataFrame, scale: Int, seed: Long = 42): DataFrame = {
    require(scale <= 30, "scramble supports scale <= 30")
    def mix(c: org.apache.spark.sql.Column) =
      pmod(c * lit(ScrambleK) + lit(seed), lit(1L << scale))
    edges.withColumn(SRC, mix(col(SRC))).withColumn(DST, mix(col(DST)))
  }
}
