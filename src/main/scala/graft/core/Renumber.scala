package graft.core

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** External-id ⇄ dense-internal-id mapping.
  *
  * Reference semantics: `NumberMap` (`structure/number_map.py:592` renumber,
  * `:599` unrenumber): arbitrary (possibly multi-column, possibly string)
  * external vertex ids are mapped to dense `[0, V)` integers with two hash
  * joins back onto the edge list. The reference implements this *entirely
  * with DataFrame ops* (`number_map.py:25-37`) — we do the same, Spark-style.
  *
  * Scale notes (100 TB): the dense-id assignment uses
  * `zipWithIndex`-over-sorted-partitions semantics via
  * `monotonically_increasing_id` on a repartitioned distinct set, then a
  * window-free dense-rank trick: ids don't need to be *contiguous* for any
  * algorithm we implement — only unique and Long — so we use
  * `xxhash64`-free monotonic ids per partition (no global sort, no driver
  * collect). When contiguity matters (e.g. bounded arrays), use
  * `denseContiguous = true` which pays one extra shuffle (zipWithIndex).
  */
object Renumber {

  /** Build a renumber map for the distinct union of the given key columns.
    * Returns map DataFrame: (extCol₁.., int_id: Long).
    */
  def buildMap(edges: DataFrame, srcCols: Seq[String], dstCols: Seq[String],
               denseContiguous: Boolean = true, sorted: Boolean = false): DataFrame = {
    require(srcCols.length == dstCols.length, "src/dst arity mismatch")
    val n = srcCols.length
    val extNames = (0 until n).map(i => s"ext_$i")
    val srcSide = edges.select(srcCols.zip(extNames).map { case (c, a) => col(c).as(a) }: _*)
    val dstSide = edges.select(dstCols.zip(extNames).map { case (c, a) => col(c).as(a) }: _*)
    val distinctVerts0 = srcSide.union(dstSide).distinct()
    // sorted=true gives a DETERMINISTIC id assignment (ids in external-id
    // order) at the cost of a global sort — used by tests/oracles; the
    // default is partition-order ids (cheaper, still dense+unique).
    val distinctVerts = if (sorted) distinctVerts0.orderBy(extNames.map(col): _*) else distinctVerts0
    assignIds(distinctVerts, denseContiguous)
  }

  /** Attach dense Long ids to each distinct row. zipWithIndex keeps this a
    * single pass + lightweight count-per-partition job (no global sort). */
  def assignIds(distinctRows: DataFrame, contiguous: Boolean = true): DataFrame = {
    if (contiguous) {
      val schema = distinctRows.schema.add(Gr.INT_ID, LongType, nullable = false)
      val indexed = distinctRows.rdd.zipWithIndex().map { case (row, idx) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
      }
      distinctRows.sparkSession.createDataFrame(indexed, schema)
    } else {
      distinctRows.withColumn(Gr.INT_ID, monotonically_increasing_id())
    }
  }

  /** Renumber an edge list: replaces external src/dst key columns with dense
    * `src`/`dst` Long columns. Two hash joins, exactly the reference's plan
    * (`number_map.py:25-37` merge×2). Returns (renumberedEdges, map). */
  def renumberEdges(edges: DataFrame, srcCols: Seq[String], dstCols: Seq[String],
                    carryCols: Seq[String] = Seq.empty,
                    sorted: Boolean = false): (DataFrame, DataFrame) = {
    val map = buildMap(edges, srcCols, dstCols, sorted = sorted)
    val extNames = srcCols.indices.map(i => s"ext_$i")
    // Alias the map per join side: joining the SAME DataFrame instance twice
    // is Spark's ambiguous-self-join trap (mis-resolved attributes /
    // AnalysisException). `m1`/`m2` give each join its own attribute ids.
    val m1 = map.as("m1")
    val m2 = map.as("m2")

    val carry = carryCols.map(edges(_))
    val srcCond = srcCols.zip(extNames).map { case (k, e) => edges(k) <=> col(s"m1.$e") }.reduce(_ && _)
    val withSrc = edges.join(m1, srcCond)
      .select((dstCols.map(edges(_)) ++ carry :+ col(s"m1.${Gr.INT_ID}").as(Gr.SRC)): _*)
    val dstCond = dstCols.zip(extNames).map { case (k, e) => withSrc(k) <=> col(s"m2.$e") }.reduce(_ && _)
    val withBoth = withSrc.join(m2, dstCond)
      .select((Seq(withSrc(Gr.SRC), col(s"m2.${Gr.INT_ID}").as(Gr.DST)) ++ carryCols.map(withSrc(_))): _*)
    (withBoth, map)
  }
}
