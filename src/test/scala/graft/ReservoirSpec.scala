package graft

import org.apache.spark.sql.functions._
import graft.functions.ReservoirSample

/** TypedImperativeAggregate reservoir sampler: size bound, membership,
  * exactness below k, and statistical sanity of the replacement rule. */
class ReservoirSpec extends SparkSpec {

  test("groups smaller than k are returned exactly") {
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("g", "v")
    val r = df.groupBy("g").agg(ReservoirSample.of(col("v"), k = 5).as("s"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1).toSet).toMap
    assert(r(1L) == Set(10L, 11L) && r(2L) == Set(20L))
  }

  test("large groups are capped at k with members drawn from the group") {
    import spark.implicits._
    val df = (0L until 10000L).map(i => (i % 4, i)).toDF("g", "v")
      .repartition(8)
    val r = df.groupBy("g").agg(ReservoirSample.of(col("v"), k = 16).as("s")).collect()
    r.foreach { row =>
      val g = row.getLong(0)
      val s = row.getSeq[Long](1)
      assert(s.length == 16)
      assert(s.distinct.length == 16) // no duplicates from merges
      assert(s.forall(v => v % 4 == g))
    }
  }

  test("samples are roughly uniform across the value range") {
    import spark.implicits._
    val df = (0L until 20000L).map(i => (0L, i)).toDF("g", "v").repartition(16)
    val s = df.groupBy("g").agg(ReservoirSample.of(col("v"), k = 400).as("s"))
      .first().getSeq[Long](1)
    val lowHalf = s.count(_ < 10000L)
    assert(lowHalf > 120 && lowHalf < 280, s"skewed sample: $lowHalf/400 below median")
  }
}
