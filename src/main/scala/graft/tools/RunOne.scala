package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import scala.collection.concurrent.TrieMap

/** Scratch runner: time a single SparkEntry query with per-job attribution.
  * Usage: RunOne <name> <sfDir> [cpus].
  *
  * Prints every Spark job's wall time + first stage name, so a slow query's
  * cost lands on a specific round/join instead of "run variance" (VERDICT r5
  * item #4 demanded exactly this kind of isolated autopsy). */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val cpus = if (args.length > 2) args(2) else "8"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStart = TrieMap[Int, (Long, String)]()
    val jobs = scala.collection.mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("RunOne"))
          .getOrElse(js.stageInfos.last.name)).getOrElse("?")
        jobStart(js.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { case (t0, site) =>
          jobs.synchronized { jobs += ((je.jobId, (System.nanoTime() - t0) / 1e9, site)) }
        }
    })
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    val n = df.count()
    // listener events are async: give the bus a moment, then snapshot the
    // buffer UNDER the same lock onJobEnd appends with — the late-event
    // race is on buffer mutation, not on staleness (a job ending after the
    // snapshot was already outside the timed window)
    Thread.sleep(500)
    val snapshot = jobs.synchronized { jobs.toVector }
    println(f"[runone] $name rows=$n t=$dt%.1fs jobs=${snapshot.size}")
    val byTime = snapshot.sortBy(-_._2)
    println("[runone] slowest jobs:")
    byTime.take(20).foreach { case (id, t, site) =>
      println(f"  job=$id%4d t=$t%6.2fs  $site")
    }
    val total = snapshot.map(_._2).sum
    println(f"[runone] sum(job wall)=$total%.1fs (gaps to t are driver/planning time)")
    // GRAFT_ALL_JOBS=1: chronological dump of every job with its call site
    // — identifies the per-round job mix of an iterative query (the r8
    // jobs/round audit needed exactly this)
    if (sys.env.contains("GRAFT_ALL_JOBS"))
      snapshot.sortBy(_._1).foreach { case (id, t, site) =>
        println(f"[alljobs] job=$id%4d t=$t%6.2fs  $site")
      }
    spark.stop()
  }
}
