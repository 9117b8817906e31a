package graft

import org.apache.spark.sql.functions._
import graft.sources.GraphStorage

/** Bucketed storage: per-source aggregation over a bucketed edge table
  * must plan WITHOUT an Exchange (the co-location contract). */
class GraphStorageSpec extends SparkSpec {

  test("groupBy(src) on a bucketed table plans without a shuffle") {
    val e = edgeDF((0L until 200L).map(i => (i % 20, i % 7)))
    GraphStorage.saveBucketed(e, "g_bucketed_test", buckets = 4)
    try {
      val t = GraphStorage.load(spark, "g_bucketed_test")
      val agg = t.groupBy("src").agg(count(lit(1)))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in plan:\n$plan")
      // and the result is still correct
      assert(agg.collect().map(_.getLong(1)).sum == 200L)
    } finally spark.sql("DROP TABLE IF EXISTS g_bucketed_test")
  }
}
