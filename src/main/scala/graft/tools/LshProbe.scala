package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.prims.Mat._

/** Scratch profiler for the minhashLshPairs stages (r5 drift analysis). */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lshprobe] $name t=${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val docs = t("docs.read+count") {
      val d = graft.Fixtures.documents(spark, dir).mat; d.count(); d
    }
    val sh = t("shingleFrame") {
      val s = graft.pipeline.Dedup.shingleFrame(docs).mat; s.count(); s
    }
    val mh = t("minhash(agg only)") {
      val m = graft.pipeline.Dedup.minhash(docs).mat; m.count(); m
    }
    val bandKeys = t("bandKeys+selfjoin+distinct") {
      val bands = 4; val rowsPerBand = 2
      val bk = (0 until bands).map { b =>
        val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"mh$j").cast("string"))
        mh.select(col("doc_id"), lit(b).as("band"), md5(concat_ws("_", cols: _*)).as("bk"))
      }.reduce(_ union _)
      val cand = bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct().mat
      println(s"[lshprobe] candidates=${cand.count()}")
      cand
    }
    t("jaccard scoring") {
      graft.pipeline.Dedup.ngramJaccard(docs, bandKeys).count()
    }
    t("full minhashLshPairs") {
      graft.pipeline.Dedup.minhashLshPairs(docs).count()
    }
    spark.stop()
  }
}
