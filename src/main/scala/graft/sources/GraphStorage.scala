package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Gr

/** Bucketed persistent graph storage — the co-location story at 100 TB
  * (SURVEY §1.4: the reference 2D-partitions the adjacency across GPUs;
  * Spark's equivalent is hash-bucketed tables).
  *
  * Edges bucketed+sorted by `src` make every frontier/state equi-join and
  * per-source aggregation read co-located buckets: the planner drops the
  * edge-side Exchange entirely (verified in GraphStorageSpec), so an
  * iterative algorithm over a saved graph shuffles only its (small) state
  * per round — on a real cluster that is the difference between moving
  * terabytes per iteration and moving megabytes. */
object GraphStorage {

  /** Persist an edge list bucketed by source. `buckets` should be sized so
    * one bucket ≈ one task's worth of data at the target scale. */
  def saveBucketed(edges: DataFrame, table: String, buckets: Int = 64): Unit =
    edges.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, Gr.SRC).sortBy(Gr.SRC)
      .saveAsTable(table)

  /** Load a bucketed edge table; joins/aggregations on `src` use the
    * bucket layout (no Exchange on this side). */
  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
