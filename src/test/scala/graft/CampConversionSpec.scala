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
}
