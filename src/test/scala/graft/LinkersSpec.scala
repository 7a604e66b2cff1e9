package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.erlink.RecordLinkage
import graft.events.Events
import graft.extract.{Extraction, SynthDocs}
import graft.gazetteer.Gazetteers
import graft.link.Linkers
import graft.model.NS

/** Entity-linking operators (J1-J13) + event materialization over the
  * synthetic corpus and hand-built micro-fixtures. */
class LinkersSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val triples =
    Extraction.triples(SynthDocs.fromDocuments(spark, "/root/testdata/sf0.001")).toDF()
      .persist()

  test("rank linking: abbreviation + label equi-join (J5)") {
    val links = Linkers.linkRanks(triples, Gazetteers.ranks(spark))
    assert(links.count() > 0)
    val preds = links.select("pred").distinct().as[String].collect()
    assert(preds.sameElements(Array(NS.SCHEMA_POW + "rank")))
    // every link target is a known rank URI
    val targets = links.select("objValue").distinct().as[String].collect()
    assert(targets.forall(_.startsWith(NS.RANKS)))
    // abbreviation expansion: "korpr" (fixture CSV form) resolves
    val fixture = Seq(
      (NS.DATA + "p1", NS.SCHEMA_POW + "rank_literal", "korpr", false, null: String, null: String, "p1"),
      (NS.DATA + "p2", NS.SCHEMA_POW + "rank_literal", "siv", false, null: String, null: String, "p2"),
    ).toDF("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype", "docId")
    val fx = Linkers.linkRanks(fixture, Gazetteers.ranks(spark))
      .select("subj", "objValue").as[(String, String)].collect().toMap
    assert(fx(NS.DATA + "p1") == NS.RANKS + "Korpraali")
    assert(fx(NS.DATA + "p2") == NS.RANKS + "Siviili")
  }

  test("occupation fuzzy linking at 0.84 (J6)") {
    val fixture = Seq(
      (NS.DATA + "p1", NS.SCHEMA_POW + "occupation_literal", "sekatyomies", false, null: String, null: String, "p1"), // typo'd
      (NS.DATA + "p2", NS.SCHEMA_POW + "occupation_literal", "posteljooni", false, null: String, null: String, "p2"), // exact
      (NS.DATA + "p3", NS.SCHEMA_POW + "occupation_literal", "astronautti", false, null: String, null: String, "p3"), // no match
    ).toDF("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype", "docId")
    val links = Linkers.linkOccupations(fixture, Gazetteers.occupations(spark))
      .select("subj", "objValue").as[(String, String)].collect().toMap
    assert(links.contains(NS.DATA + "p1"), "fuzzy match above 0.84 expected")
    assert(links(NS.DATA + "p2").endsWith("posteljooni"))
    assert(!links.contains(NS.DATA + "p3"))
  }

  test("unit linking: n-gram candidates + covernumber + period preference (J7/J8)") {
    val fixture = Seq(
      (NS.DATA + "p1", NS.SCHEMA_POW + "unit_literal", "1./JR 3 konekivääri", false, null: String, null: String, "p1"),
      (NS.DATA + "p2", NS.SCHEMA_POW + "unit_literal", "1025", false, null: String, null: String, "p2"), // covernumber of JR 25
    ).toDF("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype", "docId")
    val periods = Seq(("p1", "http://ldf.fi/warsa/conflicts/WinterWar"))
      .toDF("docId", "period_uri")
    val links = Linkers.linkUnits(fixture, Gazetteers.units(spark), periods, Gazetteers.unitClasses(spark))
      .select("subj", "objValue").as[(String, String)].collect().toMap
    assert(links(NS.DATA + "p1") == NS.ACTORS + "actor_3")
    assert(links(NS.DATA + "p2") == NS.ACTORS + "actor_25")
  }

  test("unit linking: subClassOf* restriction + P95_has_formed traversal (J8)") {
    val fixture = Seq(
      // matches only the veterans' club label -> class outside Group -> NO link
      (NS.DATA + "p1", NS.SCHEMA_POW + "unit_literal", "Sotilaskoti 9", false, null: String, null: String, "p1"),
      // matches the forming regiment "TR 2" -> resolves to the FORMED unit
      (NS.DATA + "p2", NS.SCHEMA_POW + "unit_literal", "TR 2", false, null: String, null: String, "p2"),
    ).toDF("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype", "docId")
    val periods = spark.emptyDataFrame
      .sparkSession.createDataFrame(Seq(("p2", NS.EVENTS + "ContinuationWar")))
      .toDF("docId", "period_uri")
    val links = Linkers.linkUnits(fixture, Gazetteers.units(spark), periods,
        Gazetteers.unitClasses(spark))
      .select("subj", "objValue").as[(String, String)].collect().toMap
    assert(!links.contains(NS.DATA + "p1"),
      "non-Group actor (WelfareOrganization) must not be a unit candidate")
    assert(links(NS.DATA + "p2") == NS.ACTORS + "actor_ktr15",
      s"TR 2 must resolve through P95_has_formed to KTR 15, got ${links.get(NS.DATA + "p2")}")
  }

  test("unit class closure: reflexive + transitive over the ladder") {
    import graft.link.Closure
    val closure = Closure.reflexiveTransitive(Gazetteers.unitClasses(spark))
      .as[(String, String)].collect().toSet
    val A = NS.SCHEMA_ACTORS
    assert(closure.contains((A + "Regiment", A + "Regiment")), "reflexive")
    assert(closure.contains((A + "Regiment", A + "Unit")), "1 hop")
    assert(closure.contains((A + "Regiment", A + "Group")), "2 hops")
    assert(closure.contains((A + "Regiment", A + "Agent")), "3 hops")
    assert(!closure.contains((A + "WelfareOrganization", A + "Group")),
      "club ladder must not reach Group")
  }

  test("municipality + camp linking over synthetic corpus (J2/J3)") {
    val mun = Linkers.linkMunicipalities(triples, Gazetteers.municipalities(spark))
    assert(mun.count() > 0)
    assert(mun.select("pred").distinct().count() >= 1)
    // camps link from captivity location_literal
    val camps = Linkers.linkCamps(triples, Gazetteers.camps(spark))
    assert(camps.count() > 0)
  }

  test("magazine multimap + sources rewrite (J10/J13)") {
    val fixture = Seq(
      (NS.DATA + "p1", NS.SCHEMA_POW + "sotilaan_aani", "nro 5/1942", false, null: String, null: String, "p1"),
      (NS.DATA + "p1", NS.DCT_SOURCE, "mikrofilmi", false, null: String, null: String, "p1"),
      (NS.DATA + "p2", NS.DCT_SOURCE, "jokin uusi lähde", false, null: String, null: String, "p2"),
    ).toDF("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype", "docId")

    val (links, docs) = Linkers.linkMagazines(fixture, Gazetteers.magazineIndex(spark))
    assert(links.count() == 1)
    assert(docs.filter($"pred" === NS.RDF_TYPE).count() > 0)

    val (added, removed) = Linkers.linkSources(fixture, Gazetteers.sourcesRegister(spark))
    assert(removed.count() == 2) // both literals rewritten
    val rewritten = added.filter($"pred" === NS.DCT_SOURCE)
      .select("objValue").as[String].collect()
    assert(rewritten.forall(_.startsWith(NS.DATA + "source_")))
    // register-known source gets the register description as label;
    // unknown source minted on the fly with the literal as label
    val labels = added.filter($"pred" === NS.SKOS_PREF_LABEL)
      .select("subj", "objValue").as[(String, String)].collect().toMap
    assert(labels(NS.DATA + "source_mikrofilmi") == "Mikrofilmatut kantakortit")
    assert(labels(NS.DATA + "source_jokin-uusi-lahde") == "jokin uusi lähde")
  }

  test("person-document regex linking (J11)") {
    val paths = Seq(
      "data/person_documents/returned/123_scan.pdf",
      "data/person_documents/winterwar_interrogation/7_form.pdf",
      "data/person_documents/misc/readme.txt",
    ).toDF("path")
    val (links, docs) = Linkers.linkPersonDocuments(paths)
    val got = links.select("subj").as[String].collect().toSet
    assert(got == Set(NS.DATA + "prisoner_123", NS.DATA + "prisoner_7"))
    assert(docs.filter($"pred" === (NS.SCHEMA_ORG + "contentUrl")).count() == 2)
  }

  test("record linkage end-to-end: features, salted blocking, threshold (J9)") {
    val links = RecordLinkage.linkPersons(triples, Gazetteers.ranks(spark),
      Gazetteers.persons(spark))
    val n = links.count()
    assert(n > 0, "expected some person links from the aligned synth distributions")
    // deterministic across runs
    val n2 = RecordLinkage.linkPersons(triples, Gazetteers.ranks(spark),
      Gazetteers.persons(spark)).count()
    assert(n == n2)
  }

  test("record linkage semantic accuracy: linked person shares name + birth window") {
    val ranksGaz = Gazetteers.ranks(spark)
    val personsGaz = Gazetteers.persons(spark)
    val feats = RecordLinkage.prisonerFeatures(triples, ranksGaz)
    val links = RecordLinkage.scorePairs(
      RecordLinkage.candidatePairs(feats, personsGaz), feats, personsGaz)

    val joined = links
      .join(feats.select($"person_uri".as("prisoner"), $"given".as("p_given"),
        $"family".as("p_family"), $"birth_begin".as("p_bb")), Seq("prisoner"))
      .join(personsGaz.select($"person", $"given".as("g_given"),
        $"family".as("g_family"), $"birth_begin".as("g_bb")), Seq("person"))
      .collect()
    assert(joined.nonEmpty)
    // every accepted link must agree on family name; most on given + birth
    joined.foreach { r =>
      assert(r.getAs[String]("p_family") == r.getAs[String]("g_family"),
        s"family mismatch in accepted link: $r")
    }
    val exact = joined.count(r =>
      r.getAs[String]("p_given") == r.getAs[String]("g_given") &&
        (r.getAs[String]("p_bb") == null ||
          r.getAs[String]("p_bb") == r.getAs[String]("g_bb")))
    assert(exact.toDouble / joined.length >= 0.95,
      s"only $exact/${joined.length} links agree on given+birth")
  }

  test("record linkage precision: 13-field scorer rejects same-name/different-cohort (J9)") {
    // Two gazetteer candidates share the prisoner's exact name and birth
    // window (a same-name cohort, the case the reference's 13-field dedupe
    // model exists for, linker.py:175-189). Candidate A agrees on rank,
    // unit, occupation and birth place; candidate B — the impostor — is
    // present-but-disjoint on all four. A name+birth-only scorer cannot
    // tell them apart (both would clear any threshold); the full scorer
    // must link A and push B below 0.8.
    val feats = Seq(
      (NS.DATA + "prisoner_x", "Matti", "Virtanen", "1918-03-07", "1918-03-07",
        Seq("Juuka"), Seq("sotamies"), Seq("JR 8"), Seq("maanviljelijä")),
    ).toDF("person_uri", "given", "family", "birth_begin", "birth_end",
      "birth_place", "rank", "unit", "occupation")
    val gaz = Seq(
      (NS.ACTORS + "person_match", "Matti", "Virtanen", "1918-03-07", "1918-03-07",
        Seq("Juuka"), Seq("sotamies"), Seq("JR 8"), Seq("maanviljelijä")),
      (NS.ACTORS + "person_impostor", "Matti", "Virtanen", "1918-03-07", "1918-03-07",
        Seq("Viipuri"), Seq("kapteeni"), Seq("KTR 15"), Seq("opettaja")),
    ).toDF("person", "given", "family", "birth_begin", "birth_end",
      "birth_place", "rank", "unit", "occupation")

    val pairs = Seq(
      (NS.DATA + "prisoner_x", NS.ACTORS + "person_match"),
      (NS.DATA + "prisoner_x", NS.ACTORS + "person_impostor"),
    ).toDF("prisoner", "person")

    // threshold 0 -> observe raw top-1 pick and both scores
    val all = RecordLinkage.scorePairs(pairs, feats, gaz, threshold = 0.0)
      .select("person", "score").as[(String, Double)].collect().toMap
    // top-1 keeps only the best candidate; rerun pairwise for the impostor
    val impostorOnly = RecordLinkage.scorePairs(
      pairs.filter($"person".contains("impostor")), feats, gaz, threshold = 0.0)
      .select("person", "score").as[(String, Double)].collect().toMap

    assert(all(NS.ACTORS + "person_match") == 1.0,
      s"full-agreement pair must score 1.0, got $all")
    val impostorScore = impostorOnly(NS.ACTORS + "person_impostor")
    assert(impostorScore < 0.8,
      s"impostor (name+birth only, 4 disjoint context fields) must fall below " +
        s"threshold, got $impostorScore")
    // and the accepted link set at the default threshold contains only A
    val accepted = RecordLinkage.scorePairs(pairs, feats, gaz)
      .select("person").as[String].collect().toSet
    assert(accepted == Set(NS.ACTORS + "person_match"))
  }

  test("events: anti-join guard suppresses already-evented persons (J15)") {
    val ranksGaz = Gazetteers.ranks(spark)
    val linked = triples.unionByName(
      RecordLinkage.linkPersons(triples, ranksGaz, Gazetteers.persons(spark)))
    val frame = Events.recordFrame(linked)
    val none = linked.limit(0)

    val all = Events.births(frame, none)
    val allBirths = all.filter($"pred" === NS.RDF_TYPE &&
      $"objValue" === (NS.SCHEMA_WARSA + "Birth")).count()
    assert(allBirths > 1)

    // pretend half the persons already have Birth events -> guarded out
    val existing = all.filter($"pred" === (NS.CRM + "P98_brought_into_life"))
      .limit((allBirths / 2).toInt)
    val guarded = Events.births(frame, existing)
    val remaining = guarded.filter($"pred" === NS.RDF_TYPE &&
      $"objValue" === (NS.SCHEMA_WARSA + "Birth")).count()
    assert(remaining == allBirths - allBirths / 2,
      s"guard removed ${allBirths - remaining} of $allBirths")
  }

  test("events: birth/capture/period materialization") {
    val ranksGaz = Gazetteers.ranks(spark)
    val linked = triples
      .unionByName(Linkers.linkRanks(triples, ranksGaz))
      .unionByName(RecordLinkage.linkPersons(triples, ranksGaz, Gazetteers.persons(spark)))
    val frame = Events.recordFrame(linked)
    val none = linked.limit(0)

    val births = Events.births(frame, none)
    assert(births.filter($"pred" === NS.RDF_TYPE &&
      $"objValue" === (NS.SCHEMA_WARSA + "Birth")).count() > 0)
    // time-span resources minted and typed
    assert(births.filter($"pred" === NS.RDF_TYPE &&
      $"objValue" === (NS.CRM + "E52_Time-Span")).count() > 0)

    val captures = Events.captures(frame)
    assert(captures.count() > 0, "captures need linked persons (old_uri)")

    val periods = Events.relatedPeriods(linked)
    val wars = periods.select("objValue").distinct().as[String].collect().toSet
    assert(wars.subsetOf(Set("http://ldf.fi/warsa/conflicts/WinterWar",
      "http://ldf.fi/warsa/conflicts/ContinuationWar")))
    assert(periods.count() > 0)

    val backlinks = Events.invertDocumentsLinks(linked)
    assert(backlinks.count() == linked.filter($"pred" === (NS.CRM + "P70_documents")).count())
  }
}
