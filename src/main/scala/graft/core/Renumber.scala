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
               denseContiguous: Boolean = true): DataFrame = {
    require(srcCols.length == dstCols.length, "src/dst arity mismatch")
    val n = srcCols.length
    val extNames = (0 until n).map(i => s"ext_$i")
    val srcSide = edges.select(srcCols.zip(extNames).map { case (c, a) => col(c).as(a) }: _*)
    val dstSide = edges.select(dstCols.zip(extNames).map { case (c, a) => col(c).as(a) }: _*)
    val distinctVerts = srcSide.union(dstSide).distinct()
    assignIds(distinctVerts, denseContiguous)
  }

  /** Attach dense Long ids to each distinct row. zipWithIndex keeps this a
    * single pass + lightweight count-per-partition job (no global sort). */
  def assignIds(distinctRows: DataFrame, contiguous: Boolean = true): DataFrame = {
    if (contiguous) {
      val schema = distinctRows.schema.add(Gr.INT_ID, LongType, nullable = false)
      val indexed = distinctRows.rdd.zipWithIndex.map { case (row, idx) =>
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
                    carryCols: Seq[String] = Seq.empty): (DataFrame, DataFrame) = {
    val map = buildMap(edges, srcCols, dstCols)
    val extNames = srcCols.indices.map(i => s"ext_$i")

    def joinSide(df: DataFrame, keyCols: Seq[String], outName: String, keep: Seq[Column]): DataFrame = {
      val cond = keyCols.zip(extNames).map { case (k, e) => df(k) <=> map(e) }.reduce(_ && _)
      df.join(map, cond).select(keep :+ map(Gr.INT_ID).as(outName): _*)
    }

    val carry = carryCols.map(edges(_))
    val withSrc = joinSide(edges, srcCols, Gr.SRC, dstCols.map(edges(_)) ++ carry)
    // after first select, dst cols + carry survive by name
    val withBoth = {
      val df = withSrc
      val cond = dstCols.zip(extNames).map { case (k, e) => df(k) <=> map(e) }.reduce(_ && _)
      df.join(map, cond)
        .select((Seq(df(Gr.SRC), map(Gr.INT_ID).as(Gr.DST)) ++ carryCols.map(df(_))): _*)
    }
    (withBoth, map)
  }
}
