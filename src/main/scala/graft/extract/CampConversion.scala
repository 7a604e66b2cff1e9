package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.link.Normalize
import graft.model.NS

/** E19/E20 + J16 — subject re-minting and graph closure utilities.
  */
object CampConversion {

  /** E19: camp/hospital URI re-minting — new subject =
    * namespace + slugify(prop1 value, else prop2 value, else "unknown");
    * all triples of the old subject are copied to the new one and the old
    * ones dropped (reference: src/csv_to_rdf.py:382-398 simulates this
    * with add+remove loops; here it is one projection + broadcast join —
    * no mutation). Only subjects of `classUri` are re-minted. */
  def remintSubjects(triples: DataFrame, classUri: String,
                     prop1: String, prop2: String, namespace: String): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._

    val targets = triples
      .filter($"pred" === NS.RDF_TYPE && $"objValue" === classUri)
      .select($"subj").distinct()

    // plain aliases: property URIs contain dots, which Column-name parsing
    // would read as struct-field access
    def valueOf(prop: String, alias: String) =
      triples.filter($"pred" === prop && !$"objIsUri")
        .groupBy($"subj").agg(min($"objValue").as(alias))

    val mapping = targets
      .join(valueOf(prop1, "__p1"), Seq("subj"), "left")
      .join(valueOf(prop2, "__p2"), Seq("subj"), "left")
      .select($"subj",
        concat(lit(namespace),
          Normalize.slugifyCol(coalesce($"__p1", $"__p2", lit("unknown"))))
          .as("new_subj"))

    triples.join(broadcast(mapping), Seq("subj"), "left")
      .select(coalesce($"new_subj", $"subj").as("subj"),
        $"pred", $"objValue", $"objIsUri", $"objLang", $"objDatatype", $"docId")
      .dropDuplicates("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype")
  }

  /** The camp CONSTRUCT (sparql/construct_camps.sparql, run
    * process.sh:23): pass through every triple of a PowCamp/PowHospital
    * subject (minus the reference's worksheet-noise predicates), and add
    *  - skos:prefLabel@fi — the camp's captivity_location, or for
    *    hospitals `CONCAT(type, " ", camp_id)` with the reference's
    *    IF(BOUND(...)) space rule (construct_camps.sparql:19-29);
    *  - wgs84 lat/long split from the `coordinates` literal
    *    (construct_camps.sparql:31-34 regexes, incl. the `\d\d\.\d+`
    *    two-digit constraint).
    * All joins are against the (tiny) camp-subject set → broadcast. */
  def constructCamps(triples: DataFrame,
                     blacklist: Seq[String] = Seq(
                       NS.SCHEMA_POW + "huomautuksia-poistetaan-kun-asiat-on-kayty-lapi",
                       NS.SCHEMA_POW + "poistettava-tyosarake")): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val wgs = "http://www.w3.org/2003/01/geo/wgs84_pos#"

    def subjectsOf(cls: String) = triples
      .filter($"pred" === NS.RDF_TYPE && $"objValue" === (NS.SCHEMA_WARSA + cls))
      .select($"subj").distinct()
    val campSubj = subjectsOf("PowCamp")
    val hospSubj = subjectsOf("PowHospital")
    val allSubj = broadcast(campSubj.unionByName(hospSubj).distinct())

    val own = triples.join(allSubj, Seq("subj"), "left_semi")
      .filter(!$"pred".isin(blacklist: _*))

    def labelRow(df: DataFrame) = df.select($"subj",
      lit(NS.SKOS_PREF_LABEL).as("pred"), $"label".as("objValue"),
      lit(false).as("objIsUri"), lit("fi").as("objLang"),
      lit(null).cast("string").as("objDatatype"), lit("").as("docId"))

    val campLabels = labelRow(triples
      .filter($"pred" === (NS.SCHEMA_POW + "captivity_location") && !$"objIsUri")
      .join(broadcast(campSubj), Seq("subj"), "left_semi")
      .groupBy($"subj").agg(min($"objValue").as("label")))

    val hospLabels = labelRow(hospSubj
      .join(triples.filter($"pred" === (NS.SCHEMA_POW + "hospital_type"))
        .groupBy($"subj").agg(min($"objValue").as("htype")), Seq("subj"), "left")
      .join(triples.filter($"pred" === (NS.SCHEMA_POW + "camp_id"))
        .groupBy($"subj").agg(min($"objValue").as("cid")), Seq("subj"), "left")
      .select($"subj", concat(
        coalesce($"htype", lit("")),
        when($"htype".isNotNull, lit(" ")).otherwise(lit("")),
        coalesce($"cid", lit(""))).as("label")))

    val coords = triples.filter($"pred" === (NS.SCHEMA_POW + "coordinates"))
      .join(allSubj, Seq("subj"), "left_semi")
      .select($"subj",
        regexp_extract($"objValue", "(\\d\\d\\.\\d+),.*", 1).as("lat"),
        regexp_extract($"objValue", ".*,\\W*(\\d\\d\\.\\d+)$", 1).as("long"))
      .filter($"lat" =!= "" && $"long" =!= "")
    def coordRow(pred: String, c: Column) = coords.select($"subj",
      lit(wgs + pred).as("pred"), c.as("objValue"), lit(false).as("objIsUri"),
      lit(null).cast("string").as("objLang"),
      lit(null).cast("string").as("objDatatype"), lit("").as("docId"))

    own.unionByName(campLabels).unionByName(hospLabels)
      .unionByName(coordRow("lat", $"lat")).unionByName(coordRow("long", $"long"))
      .dropDuplicates("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype")
  }

  /** J16: all triples related to a set of persons — the person's own
    * triples, a 1-hop object expansion, and the reifications of the
    * person's statements (reference: src/csv_to_rdf.py:39-47
    * `get_person_related_triples`). `persons` is a one-column (subj) DF. */
  def personRelatedTriples(triples: DataFrame, persons: DataFrame): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val p = broadcast(persons.select($"subj").distinct())

    val own = triples.join(p, Seq("subj"), "left_semi")

    // 1-hop: triples whose subject is an object of a person triple
    val hopSubjects = own.filter($"objIsUri")
      .select($"objValue".as("subj")).distinct()
    val hop = triples.join(hopSubjects, Seq("subj"), "left_semi")

    // reifications: reif nodes whose rdf:subject is the person
    val reifs = triples.filter($"pred" === NS.RDF_SUBJECT)
      .join(p.select($"subj".as("objValue")), Seq("objValue"), "left_semi")
      .select($"subj").distinct()
    val reifTriples = triples.join(reifs, Seq("subj"), "left_semi")

    own.unionByName(hop).unionByName(reifTriples)
      .dropDuplicates("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype")
  }
}
