package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{DocIngest, Extraction}

/** Golden errors of the reference fixture — the side channel the reference
  * writes to errors.csv (src/csv_to_rdf.py:376-379). The four rows below
  * are exactly what the reference's validators flag on
  * test_data/prisoners.csv. */
class ErrorsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("fixture validation errors: exact set") {
    val docs = DocIngest.prisonersDocs(spark)
    val errs = Extraction.errors(docs).collect()
      .map(e => (e.docId, e.column, e.error.take(30))).toSet

    val expected = Set(
      ("prisoner_1", "syntymäaika", "Päivämäärä ei ole kelvollinen"),
      ("prisoner_1", "katoamisaika", "Päivämäärä ei ole kelvollinen"),
      // the memoir cell's "15.9.1942-25.12.1944." range: trailing dot makes
      // the end date unparseable -> flagged (and the golden TTL value is
      // truncated the same way the reference truncates it)
      ("prisoner_1", "muistelmat, lehtijutut, tietokirjat, tutkimukset, Kansa taisteli-lehti, näyttelyt",
        "Päivämäärä ei ole kelvollinen"),
      ("prisoner_2", "katoamisaika", "Päivämäärä ei ole kelvollinen"),
    )
    assert(errs == expected, s"got: ${errs.mkString("\n")}")
  }
}
