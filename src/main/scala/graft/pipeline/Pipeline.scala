package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents
import graft.erlink.RecordLinkage
import graft.events.Events
import graft.extract.{CampConversion, Extraction}
import graft.gazetteer.Gazetteers
import graft.link.Linkers
import graft.model.NS
import graft.privacy.Privacy

/** The full KG-construction pipeline: extract → prune → link → er-link →
  * canonicalize → materialize events → final predicate-partitioned store.
  *
  * This is the Spark re-expression of the reference's `process.sh` DAG
  * (reference: process.sh:19-137): the reference's per-stage TTL files +
  * Fuseki round-trips become versioned snapshot tables; stage boundaries
  * are exactly the places the reference could resume from, so resume-from-
  * checkpoint falls out of the snapshot layer (kill the JVM anywhere — on
  * restart, committed stages are read back, the interrupted stage recomputes).
  *
  * Stage metrics (extraction error rate, per-task link hit counts — the
  * reference's log counters, linker.py:309-311) land in each stage manifest.
  *
  * Shuffle budget (SURVEY.md §4): extraction is narrow; every gazetteer
  * join broadcasts; the only wide exchanges are the triple-set dedup, the
  * ER candidate join (salted), connected components (iterative), and the
  * final `partitionBy(pred_key)` write.
  */
object Pipeline {

  /** Derived physical partition key: predicate local name (the north
    * rule's "partitioned by predicate"; raw URIs make bad dir names). */
  def withPredKey(df: DataFrame): DataFrame =
    df.withColumn("pred_key", regexp_replace(
      regexp_extract(col("pred"), "([^/#]+)[/#]?$", 1), "[^A-Za-z0-9_.-]", "_"))

  /** `requestedToday` is the privacy-cutoff reference date; the EFFECTIVE
    * date is pinned per workDir on first run (`SnapshotStore.pinRunDate`),
    * so a kill-and-resume across midnight — or a caller passing a
    * different date to a half-finished workDir — still classifies privacy
    * exactly like the uninterrupted first run. Callers must choose the
    * date explicitly (no `LocalDate.now()` default: a wall-clock default
    * at this entrypoint is precisely the nondeterminism the snapshot
    * contract forbids). */
  def run(spark: SparkSession, docs: DataFrame, workDir: String,
          requestedToday: java.time.LocalDate): DataFrame = {
    import spark.implicits._
    val store = new SnapshotStore(spark, workDir)
    val today = store.pinRunDate(requestedToday)

    // -- 0. camps & hospitals conversion (process.sh:20-23; convert.sh
    // camps flow): raw row-numbered triples -> E19 re-mint under the
    // slugified camp/hospital URI space -> camp CONSTRUCT (labels +
    // wgs84 coordinates). A separate graph, like the reference's
    // camps.ttl/warsa graph — the camp LINKER's gazetteer shares its URI
    // minting rule, so location links resolve into this graph.
    store.stage("camps", metrics = Seq("triples" -> count(lit(1)))) {
      // localCheckpoint between the chain links: constructCamps references
      // its input ~8 times and remintSubjects its input 4 times — left
      // lazy, the raw→remint→remint chain (with its shuffles) re-executes
      // MULTIPLICATIVELY under those references (measured: ~8 s warm on 96
      // rows, pure job/shuffle overhead). The camp gazetteer is bounded at
      // any corpus scale (a fixed camp registry, not per-document data),
      // so local materialization is safe.
      val raw = Gazetteers.rawCampTriples(spark)
      val camps = CampConversion.remintSubjects(raw,
        NS.SCHEMA_WARSA + "PowCamp", NS.SCHEMA_POW + "camp_id",
        NS.SCHEMA_POW + "captivity_location", NS.DATA + "camp_")
        .localCheckpoint()
      val both = CampConversion.remintSubjects(camps,
        NS.SCHEMA_WARSA + "PowHospital", NS.SCHEMA_POW + "camp_id",
        NS.SCHEMA_POW + "captivity_location", NS.DATA + "hospital_")
        .localCheckpoint()
      CampConversion.constructCamps(both)
    }

    // -- 0b. schema graph (csv_to_rdf.py --outschema + schema_base.ttl) ---
    store.stage("schema", metrics = Seq("triples" -> count(lit(1)))) {
      Extraction.schemaTriples(spark).toDF()
    }

    // -- 1. extraction ----------------------------------------------------
    val extracted = store.stage("extract",
      metrics = Seq("triples" -> count(lit(1))), sortCols = Seq("pred")) {
      Extraction.triples(docs).toDF()
    }
    store.stage("extract_errors",
      metrics = Seq("errors" -> count(lit(1)))) {
      Extraction.errors(docs).toDF()
    }

    // -- 2. privacy pruning (process.sh:25-28 runs before linking); the
    // casualties name-count gazetteer plays the WarSampo SPARQL role in
    // the common-name rule (prune_nonpublic.py:149-175)
    val pruned = store.stage("pruned", sortCols = Seq("pred")) {
      Privacy.prunePersons(extracted, Gazetteers.casualtiesNameCounts(spark), today)
    }
    // the pruning pass persists its person-sized classification frames for
    // the duration of the stage write; once the snapshot is committed (or
    // was resumed) nothing reads them again — release the executor storage
    // instead of pinning it for the remaining stages. Nothing else is
    // cached at this point in the DAG, so the blanket clear is exact.
    spark.catalog.clearCache()

    // -- 3. linking (process.sh:30-96) ------------------------------------
    // media linkers return (links, media-doc entities): links join the
    // prisoners graph (…_links.ttl files), entities go to the separate
    // media stage below (prisoners_media.ttl, process.sh:126-128)
    val magazines = Linkers.linkMagazines(pruned, Gazetteers.magazineIndex(spark))
    val personDocs = Linkers.linkPersonDocuments(Gazetteers.personDocumentPaths(spark))
    val videos = Linkers.linkVideos(Gazetteers.videoIndex(spark), Gazetteers.videoLabels(spark))
    val linked = store.stage("linked", metrics = Seq("links" -> count(lit(1)))) {
      val ranksGaz = Gazetteers.ranks(spark)
      val periods = Linkers.docPeriods(pruned)
      val links =
        Linkers.linkRanks(pruned, ranksGaz)
          .unionByName(Linkers.linkCamps(pruned, Gazetteers.camps(spark)))
          .unionByName(Linkers.linkMunicipalities(pruned, Gazetteers.municipalities(spark)))
          .unionByName(Linkers.linkPnrDeathMunicipality(pruned, Gazetteers.pnrPlaces(spark)))
          .unionByName(Linkers.linkOccupations(pruned, Gazetteers.occupations(spark)))
          .unionByName(Linkers.linkUnits(pruned, Gazetteers.units(spark), periods, Gazetteers.unitClasses(spark)))
          .unionByName(magazines._1)
          .unionByName(personDocs._1)
          .unionByName(videos._1)
          // hand-curated extra links (input_rdf/additional_links.ttl,
          // cat'd into the graph at process.sh:78,96)
          .unionByName(Gazetteers.additionalLinks(spark))
      links
    }

    // -- 3b. media graph: magazine/person-document/video doc entities -----
    store.stage("media", metrics = Seq("triples" -> count(lit(1)))) {
      magazines._2.unionByName(personDocs._2).unionByName(videos._2)
        .dropDuplicates("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype")
    }

    // -- 4. person record linkage (J9) ------------------------------------
    val personLinks = store.stage("person_links",
      metrics = Seq("links" -> count(lit(1)))) {
      RecordLinkage.linkPersons(pruned.unionByName(linked),
        Gazetteers.ranks(spark), Gazetteers.persons(spark))
    }

    // -- 5. sources rewrite (linker.py:453-509, in-place) -----------------
    val withSources = store.stage("sourced", sortCols = Seq("pred")) {
      val all = pruned.unionByName(linked).unionByName(personLinks)
      val (added, removed) = Linkers.linkSources(all, Gazetteers.sourcesRegister(spark))
      all.join(removed,
          Seq("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype", "docId"),
          "left_anti")
        .unionByName(added)
        .dropDuplicates("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype")
    }

    // -- 6. canonicalization (connected components over person links) -----
    val canonical = store.stage("canonical", sortCols = Seq("pred")) {
      val edges = ConnectedComponents.edgesFromLinks(
        withSources.filter($"pred" === (NS.CRM + "P70_documents")))
      ConnectedComponents.canonicalizeTriples(withSources, edges)
    }

    // -- 7. event materialization (process.sh:98-124) ---------------------
    // record_frame is its own snapshot stage: eight event constructors
    // consume it, and as a lazy plan the person-wide aggregation over the
    // whole canonical triple set would re-execute once PER constructor
    // inside the events write job. A materialized (and resumable) snapshot
    // is the scale-correct sharing mechanism — unlike executor-local
    // caching it survives executor loss and the write job reads it like
    // any other columnar input.
    // NESTED inside the events compute block: when 'events' is already
    // committed (resume), its by-name body never evaluates, so the
    // record_frame stage — whose only consumer is this block — is neither
    // computed nor written; a fresh run still materializes it first, and a
    // kill between the two commits resumes from the record_frame snapshot.
    val withEvents = store.stage("events") {
      val frame = store.stage("record_frame") {
        Events.recordFrame(canonical)
      }
      val none = canonical.limit(0)
      val mediaPreds = Seq(NS.SCHEMA_WARSA + "sotilaan_aani_magazine",
        NS.SCHEMA_WARSA + "person_document", NS.SCHEMA_WARSA + "documented_in_video",
        NS.BIOC + "has_occupation")
      val linkedMedia = canonical.filter($"pred".isin(mediaPreds: _*))
      val events =
        Events.people(frame, linkedMedia)
          .unionByName(Events.births(frame, none))
          .unionByName(Events.deaths(frame, none))
          .unionByName(Events.captures(frame))
          .unionByName(Events.disappearances(frame, none))
          .unionByName(Events.promotions(canonical, frame, Gazetteers.ranks(spark)))
          .unionByName(Events.unitJoinings(canonical, frame))
          .unionByName(Events.relatedPeriods(canonical))
          .unionByName(Events.documentsLinks(frame))
          .unionByName(Events.invertDocumentsLinks(canonical))
          .unionByName(Events.campCoordinates(Gazetteers.camps(spark)))
      canonical.unionByName(events)
        .dropDuplicates("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype")
    }

    // -- 8. final store: triples partitioned by predicate -----------------
    // repartition on (pred_key, 8-way salt) before the partitioned write:
    // without it every upstream shuffle partition holding rows of a
    // predicate opens its own file under that predicate's directory —
    // #shuffle-partitions × #predicates small files (at 1000 executors,
    // ~hundreds of thousands), which also serializes the manifest's
    // footer-lineage pass. The salt keeps a hot predicate (rdf:type holds
    // ~15% of all triples) spread over 8 writer tasks instead of one.
    store.stage("final", partitionCols = Seq("pred_key"),
      metrics = Seq("triples" -> count(lit(1)))) {
      withPredKey(withEvents)
        .repartition(col("pred_key"), pmod(xxhash64(col("subj")), lit(8)))
    }
  }
}
