package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.prims.Mat._

/** Scratch profiler for the minhashLshPairs stages (r5 drift analysis;
  * r9: optional corpus replication — the same salted-token scheme as
  * ScaleProbe's pipeline family — to attribute the scale-26 superlinear
  * wall to a stage instead of guessing).
  * Usage: LshProbe [dir] [reps] [cpus] [parts]. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 1
    val cpus = if (args.length > 2) args(2) else "8"
    val parts = if (args.length > 3) args(3) else cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lshprobe] $name t=${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val docs = t("docs.read+replicate+count") {
      val d0 = graft.Fixtures.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val d = if (reps <= 1) d0.mat else
        d0.crossJoin(spark.range(reps).select(col("id").as("rep")))
          .select((col("doc_id") * reps + col("rep")).as("doc_id"),
            array_join(transform(split(col("text"), " "),
              tk => concat(tk, lit("\u0001"), col("rep").cast("string"))), " ").as("text"))
          .repartition(math.max(cpus.toInt, reps * 5000 / 20000), col("doc_id"))
          .mat
      println(s"[lshprobe] corpus=${d.count()} (reps=$reps)"); d
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
