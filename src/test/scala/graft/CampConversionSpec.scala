package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.CampConversion
import graft.model.NS

class CampConversionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tdf(rows: (String, String, String, Boolean)*) =
    rows.map { case (s, p, o, u) => (s, p, o, u, null: String, null: String, "") }
      .toDF("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype", "docId")

  test("E19: camp subject re-minting via slugified property") {
    val cls = NS.SCHEMA_WARSA + "PowCamp"
    val t = tdf(
      ("urn:row1", NS.RDF_TYPE, cls, true),
      ("urn:row1", "urn:p:numero", "74", false),
      ("urn:row1", "urn:p:paikka", "Oranki", false),
      ("urn:row2", NS.RDF_TYPE, cls, true),
      ("urn:row2", "urn:p:paikka", "Vienan Kemi", false),
      ("urn:other", "urn:p:x", "y", false),
    )
    val out = CampConversion.remintSubjects(t, cls, "urn:p:numero", "urn:p:paikka",
      "http://ldf.fi/warsa/prisoners/camp_")
    val subjects = out.select("subj").distinct().as[String].collect().toSet
    assert(subjects == Set(
      "http://ldf.fi/warsa/prisoners/camp_74",
      "http://ldf.fi/warsa/prisoners/camp_vienan-kemi",
      "urn:other"))
    // triples preserved under the new subject
    assert(out.filter($"subj" === "http://ldf.fi/warsa/prisoners/camp_74" &&
      $"objValue" === "Oranki").count() == 1)
  }

  test("J16: person-related closure picks own triples, 1-hop, reifications") {
    val person = NS.DATA + "prisoner_9"
    val capt = NS.DATA + "prisoner_9_captivity_0"
    val reif = NS.DATA + "prisoner_9_rank_literal_0_reification_source"
    val t = tdf(
      (person, NS.SCHEMA_POW + "captivity", capt, true),
      (person, NS.SCHEMA_POW + "rank_literal", "korpr", false),
      (capt, NS.SCHEMA_POW + "location_literal", "74", false),
      (reif, NS.RDF_SUBJECT, person, true),
      (reif, NS.DCT_SOURCE, "mikrofilmi", false),
      (NS.DATA + "prisoner_8", NS.SCHEMA_POW + "rank_literal", "siv", false),
    )
    val out = CampConversion.personRelatedTriples(t, Seq(person).toDF("subj"))
    assert(out.count() == 5)
    assert(out.filter($"subj" === (NS.DATA + "prisoner_8")).count() == 0)
    assert(out.filter($"subj" === capt).count() == 1)
    assert(out.filter($"subj" === reif).count() == 2)
  }

  test("construct_camps branch semantics: required location, per-branch filters, REPLACE passthrough") {
    val POW = NS.SCHEMA_POW
    val camp = NS.SCHEMA_WARSA + "PowCamp"
    val hosp = NS.SCHEMA_WARSA + "PowHospital"
    val noise1 = POW + "huomautuksia-poistetaan-kun-asiat-on-kayty-lapi"
    val noise2 = POW + "poistettava-tyosarake"
    val t = tdf(
      // c1: camp with two location values, both noise preds, raw coords
      ("urn:c1", NS.RDF_TYPE, camp, true),
      ("urn:c1", POW + "captivity_location", "Leiri A", false),
      ("urn:c1", POW + "captivity_location", "Leiri B", false),
      ("urn:c1", noise1, "drop-me", false),
      ("urn:c1", noise2, "keep-me-in-camp-branch", false),
      ("urn:c1", POW + "coordinates", "ei tiedossa", false),
      // c2: camp WITHOUT captivity_location -> emits NOTHING
      ("urn:c2", NS.RDF_TYPE, camp, true),
      ("urn:c2", POW + "camp_id", "99", false),
      // h1: hospital, both noise preds, matching coordinates
      ("urn:h1", NS.RDF_TYPE, hosp, true),
      ("urn:h1", POW + "hospital_type", "sairaala", false),
      ("urn:h1", POW + "camp_id", "7", false),
      ("urn:h1", noise1, "keep-me-in-hospital-branch", false),
      ("urn:h1", noise2, "drop-me", false),
      ("urn:h1", POW + "coordinates", "61.52, 29.31", false),
    )
    val out = CampConversion.constructCamps(t)
    val wgs = "http://www.w3.org/2003/01/geo/wgs84_pos#"

    // camp without captivity_location: the required pattern kills it
    assert(out.filter($"subj" === "urn:c2").count() == 0,
      "camp lacking captivity_location must emit nothing")
    // per-branch blacklists: huomautuksia only in the camp branch,
    // poistettava only in the hospital branch
    assert(out.filter($"subj" === "urn:c1" && $"pred" === noise1).count() == 0)
    assert(out.filter($"subj" === "urn:c1" && $"pred" === noise2).count() == 1)
    assert(out.filter($"subj" === "urn:h1" && $"pred" === noise2).count() == 0)
    assert(out.filter($"subj" === "urn:h1" && $"pred" === noise1).count() == 1)
    // one label per captivity_location VALUE
    val c1Labels = out.filter($"subj" === "urn:c1" && $"pred" === NS.SKOS_PREF_LABEL)
      .select("objValue").as[String].collect().toSet
    assert(c1Labels == Set("Leiri A", "Leiri B"), c1Labels.toString)
    // hospital label = "type camp_id"
    val h1Labels = out.filter($"subj" === "urn:h1" && $"pred" === NS.SKOS_PREF_LABEL)
      .select("objValue").as[String].collect().toSet
    assert(h1Labels == Set("sairaala 7"), h1Labels.toString)
    // REPLACE passthrough: non-matching coordinate literal rides through RAW
    val c1Lat = out.filter($"subj" === "urn:c1" && $"pred" === (wgs + "lat"))
      .select("objValue").as[String].collect().toSeq
    assert(c1Lat == Seq("ei tiedossa"), s"raw passthrough expected: $c1Lat")
    // matching coordinates split into lat/long
    val h1Coords = out.filter($"subj" === "urn:h1" &&
        $"pred".isin(wgs + "lat", wgs + "long"))
      .select("objValue").as[String].collect().toSet
    assert(h1Coords == Set("61.52", "29.31"), h1Coords.toString)
  }
}
