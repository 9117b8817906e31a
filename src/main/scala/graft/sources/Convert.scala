package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Gr._

/** Input-format conversions (reference `structure/convert_matrix.py`:
  * `from_adjlist:111`, `from_pandas_adjacency:382`, `from_numpy_array:435`;
  * CSR construction `pylibcugraph/graphs.pyx:305`; export
  * `to_pandas_adjacency:421`).
  *
  * All conversions are single projections/explodes — no shuffles beyond
  * what the data layout demands — so they scale to arbitrarily wide
  * inputs.
  */
object Convert {

  /** CSR adjacency (per-vertex offsets + flat indices) → COO edge list.
    * Input: one row per vertex (id, neighbors array[, weights array]).
    * `posexplode` keeps per-row order, matching CSR index semantics. */
  def fromAdjList(adj: DataFrame, idCol: String = "id",
                  nbrsCol: String = "nbrs", wCol: Option[String] = None): DataFrame =
    wCol match {
      case Some(w) =>
        adj.select(col(idCol).as(SRC),
            posexplode(arrays_zip(col(nbrsCol), col(w))).as(Seq("pos", "z")))
          .select(col(SRC), col(s"z.$nbrsCol").as(DST), col(s"z.$w").as(WEIGHT))
      case None =>
        adj.select(col(idCol).as(SRC), explode(col(nbrsCol)).as(DST))
    }

  /** Offsets/indices CSR arrays (as DataFrames of (vertex, offset) rows and
    * flat (pos, dst) rows) → COO: a range join replaced by a running-offset
    * join — the exact `cugraph_graph_create_sg_from_csr` semantics. */
  def fromCsr(offsets: DataFrame, indices: DataFrame): DataFrame = {
    // offsets: (id, start, end); indices: (pos, dst)
    offsets.join(indices,
        indices("pos") >= offsets("start") && indices("pos") < offsets("end"))
      .select(offsets("id").as(SRC), indices("dst").as(DST))
  }

  /** Dense adjacency matrix (one row per source: (id, row array)) → COO,
    * keeping non-zero cells — the `from_numpy_array` melt. */
  def fromDense(matrix: DataFrame, idCol: String = "id",
                rowCol: String = "row"): DataFrame =
    matrix.select(col(idCol).as(SRC), posexplode(col(rowCol)).as(Seq(DST, WEIGHT)))
      .filter(col(WEIGHT) =!= 0.0)
      .select(col(SRC), col(DST).cast("long").as(DST), col(WEIGHT))

  /** COO → dense adjacency rows (to_pandas_adjacency): pivot-free —
    * per-source sorted (dst, weight) structs; callers needing a true dense
    * row expand against the vertex dimension. */
  def toAdjList(edges: DataFrame): DataFrame =
    edges.select(col(SRC), col(DST),
        (if (edges.columns.contains(WEIGHT)) col(WEIGHT) else lit(1.0)).as(WEIGHT))
      .groupBy(col(SRC).as("id"))
      .agg(sort_array(collect_list(struct(col(DST), col(WEIGHT)))).as("nbrs"))

  /** COO → DENSE adjacency rows (the `to_pandas_adjacency` /
    * `to_numpy_array` inverse of [[fromDense]], reference
    * `convert_matrix.py:421,474`): one row per vertex id with a length-|V|
    * weight array, column j = the j-th smallest vertex id (the reference
    * likewise orders the pandas adjacency by the node index). Missing edges
    * are 0.0, as in the reference's zero-filled matrix.
    *
    * EXPORT-ONLY op with O(|V|²) output by definition — the rank window is
    * a deliberate global sort, same regime as the reference materializing a
    * pandas DataFrame on the host. Not for the 100-TB path; the scalable
    * export is [[toAdjList]]. */
  def toDense(edges: DataFrame): DataFrame = {
    val e = edges.select(col(SRC), col(DST),
      (if (edges.columns.contains(WEIGHT)) col(WEIGHT) else lit(1.0)).as(WEIGHT))
    val idx = vertexRanks(e)
    // dense cells via (vertex × position) grid left-join + ordered collect —
    // NOT element_at on a per-row map, whose MapData lookup is a linear scan
    // (the q_from_dense fixture hit exactly that: O(positions × degree) per
    // row turned a 16 MB build into ~30s of CPU)
    val cells = e.join(broadcast(idx).select(col("id").as(DST), col("j")), DST)
      .select(col(SRC).as("id"), col("j"), col(WEIGHT).as("w"))
    idx.select("id").crossJoin(broadcast(idx).select("j"))
      .join(cells, Seq("id", "j"), "left")
      .groupBy("id")
      .agg(transform(sort_array(collect_list(struct(col("j"),
        coalesce(col("w"), lit(0.0)).as("w")))), x => x.getField("w")).as("row"))
  }

  /** (id, j) rank table: j = rank of id in ascending vertex-id order — the
    * dense matrix's column order. Global window, same export-only caveat as
    * [[toDense]]. */
  def vertexRanks(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    edges.select(col(SRC).as("id")).union(edges.select(col(DST).as("id"))).distinct()
      .select(col("id"), (row_number().over(Window.orderBy("id")) - 1L).as("j"))
  }

  /** MatrixMarket (.mtx) coordinate file → COO edge list. Header `%` lines
    * and the size line are dropped; 1-based ids are shifted to 0-based as
    * the reference's MTX reader does. */
  def readMtx(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // zipWithIndex over textFile preserves file order, so the size line is
    // identified POSITIONALLY (min line number among non-comment lines) —
    // a value-based drop (limit(1)+exceptAll) could delete a real edge that
    // happens to equal the (rows, cols, nnz) triple on multi-partition input.
    val lines = spark.sparkContext.textFile(path).zipWithIndex().toDF("value", "_ln")
      .filter(!col("value").startsWith("%"))
    val hdrLn = lines.agg(min("_ln")).first().getLong(0)
    val parts = split(trim(col("value")), "\\s+")
    lines.filter(col("_ln") =!= hdrLn)
      .select(parts.getItem(0).cast("long").as(SRC),
        parts.getItem(1).cast("long").as(DST),
        when(size(parts) > 2, parts.getItem(2).cast("double")).otherwise(1.0).as(WEIGHT))
      .select((col(SRC) - 1).as(SRC), (col(DST) - 1).as(DST), col(WEIGHT))
  }

  /** Space/comma-delimited edge-list CSV with schema (src, dst[, weight]). */
  def readEdgeCsv(spark: SparkSession, path: String, delimiter: String = " "): DataFrame =
    spark.read.option("delimiter", delimiter).option("comment", "%")
      .schema("src LONG, dst LONG, weight DOUBLE").csv(path)
      .na.fill(1.0, Seq(WEIGHT))

  /** Replicate a small DataFrame to every task (reference
    * `replicate_edgelist.py`) — in Spark simply the broadcast hint; the
    * runtime ships one copy per executor. */
  def replicate(df: DataFrame): DataFrame = broadcast(df)
}
