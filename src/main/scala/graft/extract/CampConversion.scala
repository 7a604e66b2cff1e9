package graft.extract

import org.apache.spark.sql.DataFrame
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

    def valueOf(prop: String) = triples.filter($"pred" === prop && !$"objIsUri")
      .groupBy($"subj").agg(min($"objValue").as(prop))

    val mapping = targets
      .join(valueOf(prop1), Seq("subj"), "left")
      .join(valueOf(prop2), Seq("subj"), "left")
      .select($"subj",
        concat(lit(namespace),
          Normalize.slugifyCol(coalesce(col(prop1), col(prop2), lit("unknown"))))
          .as("new_subj"))

    triples.join(broadcast(mapping), Seq("subj"), "left")
      .select(coalesce($"new_subj", $"subj").as("subj"),
        $"pred", $"objValue", $"objIsUri", $"objLang", $"objDatatype", $"docId")
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
