package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Scratch probe (round 6): Spark job/stage count per declared query —
  * separates scheduling-floor-bound queries (many small jobs) from
  * compute-bound ones. Warm run counted (2nd execution). */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = { stages.incrementAndGet(); () }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        fn(spark, sfDir).queryExecution.toRdd.count() // warm-up
        Thread.sleep(200) // let listener drain
        jobs.set(0); stages.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[jobs] $name%-28s jobs=${jobs.get()}%3d stages=${stages.get()}%3d sec=$sec%.3f")
      } catch { case e: Throwable => println(s"[jobs] $name FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
