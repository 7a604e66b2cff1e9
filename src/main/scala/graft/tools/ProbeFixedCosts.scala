package graft.tools

import org.apache.spark.sql.SparkSession

import graft.extract.CampConversion
import graft.gazetteer.Gazetteers
import graft.model.NS

/** Dev probe: where does the pipeline's input-INDEPENDENT fixed cost go?
  * (A 33k-triple sf0.001 run spends ~56 s — the camps stage alone ~19 s on
  * 96 rows.) Times session init, first trivial job, then each piece of the
  * camps stage separately so warm-up, planning, and execution can be told
  * apart. */
object ProbeFixedCosts {
  def main(args: Array[String]): Unit = {
    def tick[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fixed] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val spark = tick("session") {
      SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    spark.sparkContext.setLogLevel("WARN")
    tick("trivial-job")(spark.range(1000).count())
    tick("trivial-parquet") {
      val p = java.nio.file.Files.createTempDirectory("probe_pq").toString
      spark.range(10).write.mode("overwrite").parquet(p)
      spark.read.parquet(p).count()
    }
    val raw = tick("rawCampTriples-plan")(Gazetteers.rawCampTriples(spark))
    tick("rawCampTriples-collect")(raw.count())
    val remint1 = tick("remint1-ckpt")(CampConversion.remintSubjects(raw,
      NS.SCHEMA_WARSA + "PowCamp", NS.SCHEMA_POW + "camp_id",
      NS.SCHEMA_POW + "captivity_location", NS.DATA + "camp_").localCheckpoint())
    val remint2 = tick("remint2-ckpt")(CampConversion.remintSubjects(remint1,
      NS.SCHEMA_WARSA + "PowHospital", NS.SCHEMA_POW + "camp_id",
      NS.SCHEMA_POW + "captivity_location", NS.DATA + "hospital_").localCheckpoint())
    val camps = tick("construct-plan")(CampConversion.constructCamps(remint2))
    tick("construct-collect")(camps.count())
    tick("construct-again")(CampConversion.constructCamps(remint2).count())
    tick("construct-3rd")(CampConversion.constructCamps(remint2).count())
    tick("write-stage") {
      val wd = java.nio.file.Files.createTempDirectory("probe_store").toString
      val store = new graft.pipeline.SnapshotStore(spark, wd)
      store.stage("camps", metrics = Seq("triples" ->
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)))) { camps }
    }
    // the other suspect fixed costs, on sf0.001:
    val sf = "/root/testdata/sf0.001"
    val docs = tick("synthdocs-plan")(graft.extract.SynthDocs.fromDocuments(spark, sf, 1))
    tick("extract-triples")(graft.extract.Extraction.triples(docs).toDF().count())
    tick("prune")(graft.privacy.Privacy.prunePersons(
      graft.extract.Extraction.triples(docs).toDF(),
      Gazetteers.casualtiesNameCounts(spark),
      java.time.LocalDate.parse("2026-08-17")).count())
    spark.stop()
  }
}
