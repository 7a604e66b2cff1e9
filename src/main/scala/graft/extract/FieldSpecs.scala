package graft.extract

import graft.model.NS

/** Declarative column→predicate mapping — the Spark-native re-expression of
  * the reference's PRISONER_MAPPING dict (reference: src/mapping.py:27-452).
  *
  * `converter` / `validator` are symbolic ids dispatched by
  * [[SpanProcessor]]; keeping the table declarative lets Catalyst see one
  * wide plan and lets the schema-triple emitter (reference:
  * src/csv_to_rdf.py:367-374) derive property labels from the same source
  * of truth. Long Finnish `description_fi` strings are intentionally not
  * carried — they are schema documentation, not data, and the golden data
  * graph never contains them.
  */
final case class FieldSpec(
    kind: String,            // canonical column key (mapping dict key)
    uri: String,             // predicate URI
    sep: String,             // "/" | ";" | "" (value_separator)
    converter: String,       // "" | dates | strip_dash | swedish | marital | uriref
    validator: String,       // "" | dates_war | dates_birth | dates_return | dates_death | mother_tongue
    createResource: String,  // resource class URI or ""
    captureValueProp: String,
    labelFi: String,
    labelEn: String,
    captureOrder: Boolean,
    captureDates: Boolean,
    nameFi: String,
    nameEn: String,
) {
  def predLocal: String = uri.substring(uri.lastIndexOf('/') + 1)
}

object FieldSpecs {

  /** The dedicated name column handled outside the mapping dict
    * (reference: src/csv_to_rdf.py:180-196). */
  val NameKind = "sukunimi ja etunimet"

  private def f(kind: String, uri: String, sep: String = "", conv: String = "",
                valid: String = "", nameFi: String = "", nameEn: String = ""): FieldSpec =
    FieldSpec(kind, uri, sep, conv, valid, "", "", "", "", captureOrder = false,
      captureDates = false, nameFi, nameEn)

  private val POW = NS.SCHEMA_POW
  private val WSCH = NS.SCHEMA_WARSA

  /** reference: src/mapping.py:27-452, one entry per mapped column.
    * `valokuva Sotilaan Äänessä` is included even though the reference
    * comments it out (mapping.py:292-298) because the golden RDF
    * (test_data/prisoners.ttl:246-247,316-320) still contains
    * `wps:photograph_sotilaan_aani` and downstream linking consumes it
    * (src/linker.py:296). */
  val prisonerFields: Seq[FieldSpec] = Seq(
    f("syntymäaika", WSCH + "date_of_birth", "/", "dates", "dates_birth", "Syntymäpäivä", "Date of birth"),
    f("synnyinkunta", WSCH + "municipality_of_birth_literal", "/", nameFi = "Syntymäkunta", nameEn = "Municipality of birth"),
    f("kotikunta", POW + "municipality_of_domicile_literal", "/", nameFi = "Kotikunta", nameEn = "Municipality of domicile"),
    f("asuinkunta", POW + "municipality_of_residence_literal", "/", nameFi = "Asuinkunta", nameEn = "Municipality of residence"),
    f("kuolinkunta, palanneet", POW + "municipality_of_death_literal", nameFi = "Kuolinkunta", nameEn = "Municipality of death"),
    f("ammatti", POW + "occupation_literal", "/", nameFi = "Ammatti", nameEn = "Occupation"),
    f("siviilisääty", POW + "marital_status", "/", conv = "marital", nameFi = "Siviilisääty", nameEn = "Marital status"),
    f("lapset", POW + "number_of_children", "/", conv = "strip_dash", nameFi = "Lasten lukumäärä", nameEn = "Number of children"),
    f("sotilasarvo", POW + "rank_literal", "/", nameFi = "Sotilasarvo", nameEn = "Military rank"),
    f("joukko-osasto", POW + "unit_literal", nameFi = "Joukko-osasto", nameEn = "Military unit"),
    f("katoamisaika", POW + "date_of_going_mia", "/", "dates", "dates_war", "Katoamispäivä", "Date of going missing in action"),
    f("katoamispaikka", POW + "place_of_going_mia_literal", "/", nameFi = "Katoamispaikka", nameEn = "Place of going missing in action"),
    f("vangiksi aika", POW + "date_of_capture", "/", "dates", "dates_war", "Vangiksi jäämisen päivämäärä", "Date of capture"),
    f("vangiksi paikka, kunta", POW + "municipality_of_capture_literal", "/", nameFi = "Vangiksi jäämisen kunta", nameEn = "Municipality of capture"),
    f("vangiksi paikka, kylä, kaupunginosa", POW + "place_of_capture_literal", "/", nameFi = "Vangiksi jäämisen kylä tai kaupunginosa", nameEn = "Village or district of capture"),
    f("vangiksi taistelupaikka", POW + "place_of_capture_battle_literal", "/", nameFi = "Vangiksi jäämisen taistelupaikka", nameEn = "Location of battle in which captured"),
    f("vangiksi jääminen, oma tai muiden selostus kuulusteluissa, arkistotietoja", POW + "description_of_capture", ";", nameFi = "Selvitys vangiksi jäämisestä", nameEn = "Description of capture"),
    f("palannut", POW + "date_of_return", "/", "dates", "dates_return", "Sotavankeudesta palaamisen päivämäärä", "Date of return from captivity"),
    f("kuollut", POW + "date_of_death", "/", "dates", "dates_death", "Kuolinpäivä", "Date of death"),
    f("kuolinsyy", POW + "cause_of_death", "/", nameFi = "Kuolinsyy", nameEn = "Cause of death"),
    f("kuolinpaikka", POW + "place_of_death", "/", nameFi = "Kuolinpaikka", nameEn = "Place of death"),
    f("hautauspaikka ja -aika", POW + "place_of_burial_literal", ";", nameFi = "Hautauspaikka", nameEn = "Place of burial"),
    FieldSpec("vankeuspaikat", POW + "captivity", ";", "", "",
      POW + "Captivity", POW + "location_literal",
      // golden prisoners.ttl:160 uses "Person X captivity" (the mapping
      // dict's "Person's ..." variant postdates the golden; the golden is
      // the P/R anchor)
      "Henkilön {person} sotavankeus", "Person {person} captivity",
      captureOrder = true, captureDates = true,
      "Vankeuspaikat", "Captivity locations"),
    f("muita tietoja", POW + "additional_information", ";", nameFi = "Muita vankeustietoja", nameEn = "Additional information"),
    f("palanneiden kuolinaika", POW + "date_of_death", "/", "dates", "dates_death"),
    f("kuolleeksi julistaminen", POW + "date_of_declaration_of_death", "", "dates", "dates_death", "Kuolleeksi julistamisen päivämäärä", "Date of declaration of death"),
    f("valokuva KA:n henkilöakteissa, RGVA:n henkilömapeissa, muissa venäläisissä arkistoissa ja suomalaisissa julkaisuissa", POW + "photograph", ";", nameFi = "Valokuva", nameEn = "Photograph"),
    f("valokuva Sotilaan Äänessä", POW + "photograph_sotilaan_aani", ";", nameFi = "Valokuva Sotilaan Ääni -lehdessä", nameEn = "Photograph in Sotilaan Ääni magazine"),
    f("suomalainen paluukuulustelupöytäkirja", POW + "finnish_return_interrogation_file", ";", nameFi = "Suomalainen paluukuulustelupöytäkirja", nameEn = "Finnish return interrogation file"),
    f("radiossa, PM:n valvontatoimiston radiokatsaukset", POW + "radio_report", ";", nameFi = "PM:n valvontatoimiston radiokatsaukset", nameEn = "Radio reports"),
    f("vankeudessa takavarikoitu omaisuus markoissa", POW + "confiscated_possession", nameFi = "Vankeudessa takavarikoitu omaisuus markoissa", nameEn = "Confiscated possessions"),
    f("suomenruotsalainen", WSCH + "mother_tongue", "", "swedish", "mother_tongue", "Äidinkieli", "Mother tongue"),
    f("Karagandan kortisto", POW + "karaganda_card_file", ";", nameFi = "Karagandan kortisto", nameEn = "Karaganda card file"),
    f("Neuvostoliittolaiset sotavankikortistot ja henkilömappikokoelmat", POW + "soviet_card_files", ";", nameFi = "Neuvostoliittolaiset sotavankikortistot ja henkilömappikokoelmat", nameEn = "Soviet prisoner of war card files and person registers"),
    f("Talvisodan kokoelma", POW + "winter_war_collection", ";", nameFi = "Talvisodan kokoelma", nameEn = "Winter War collection"),
    f("lentolehtinen", POW + "flyer", ";", nameFi = "Lentolehtinen", nameEn = "Flyer"),
    f("Sotilaan Ääni-lehti, digitoitu ja indeksoitu", POW + "sotilaan_aani", ";", nameFi = "Sotilaan Ääni", nameEn = "Sotilaan Ääni magazine"),
    f("Kansan Valta, Kansan Mies, Kansan Ääni, Suomen Kansan Ääni, Kansan Sana", POW + "propaganda_magazine", ";", nameFi = "Propagandalehti", nameEn = "Propaganda magazine"),
    f("Kansan Valta, Kansan Mies, Kansan Ääni, Suomen Kansan Ääni. Linkit", POW + "propaganda_magazine_link", ";", conv = "uriref", nameFi = "Linkki propagandalehteen", nameEn = "Propaganda magazine link"),
    f("Kansan Valta, Kansan Mies, Kansan Ääni, Suomen Kansan Ääni. Toiset linkit", POW + "propaganda_magazine_link", ";", conv = "uriref", nameFi = "Linkki propagandalehteen", nameEn = "Propaganda magazine link"),
    f("Kansan Valta, Kansan Mies, Kansan Ääni, Suomen Kansan Ääni. Kolmannet linkit", POW + "propaganda_magazine_link", ";", conv = "uriref", nameFi = "Linkki propagandalehteen", nameEn = "Propaganda magazine link"),
    f("Kansan Valta, Kansan Mies, Kansan Ääni, Suomen Kansan Ääni. Neljännet linkit", POW + "propaganda_magazine_link", ";", conv = "uriref", nameFi = "Linkki propagandalehteen", nameEn = "Propaganda magazine link"),
    f("muistelmat, lehtijutut, tietokirjat, tutkimukset, Kansa taisteli-lehti, näyttelyt", POW + "memoir", ";", nameFi = "Muistelmat, lehtiartikkelit ja kirjallisuus", nameEn = "Memoirs"),
    f("TV-ja radio-ohjelmat, tallenne video/audio", POW + "recording", nameFi = "Tallenne (video/audio)", nameEn = "Recording (video/audio)"),
    f("Karjalan tasavallan kansallisarkiston dokumentit", POW + "karelian_archive_documents", nameFi = "Karjalan kansallisarkiston dokumentit", nameEn = "Karelian archive documents"),
  )

  val byKind: Map[String, FieldSpec] = prisonerFields.map(s => s.kind -> s).toMap

  /** Column-name→mapping resolution with the `" ("` annotation-strip
    * fallback (reference: src/csv_to_rdf.py:298-306). */
  def resolve(columnName: String): Option[FieldSpec] =
    byKind.get(columnName).orElse {
      val base = columnName.split('(')(0).strip()
      byKind.get(base)
    }

  /** Media link columns whose span should carry `media_ref`
    * (reference: src/linker.py:283-285,348-349,429 — URL-bearing columns). */
  val mediaRefPreds: Set[String] = Set(NS.SCHEMA_POW + "propaganda_magazine_link")
}
