package graft.erlink

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.link.Normalize

/** The 13-field comparator space of the reference's person record linkage
  * (reference: src/linker.py:175-189). The reference delegates scoring to
  * the `dedupe` library with custom `intersection_comparator` /
  * `activity_comparator` functions from the public warsa-linkers package;
  * here each comparator is a deterministic Catalyst Column expression so
  * the whole scorer stays inside whole-stage codegen and is reproducible
  * bit-for-bit (the reference itself pins RNG seeds for determinism,
  * linker.py:193-194).
  *
  * Missing-value semantics: `dedupe` models 'has missing': True fields with
  * a presence indicator rather than a fixed penalty; we reproduce that by
  * RENORMALIZATION — a field contributes to the weighted score only when
  * both sides carry a value, and the weight mass of absent fields is
  * dropped from the denominator (see [[score]]). A record matching on all
  * fields it has scores 1.0 regardless of how sparse it is; a field
  * present on both sides but disagreeing actively pulls the score down.
  */
object Comparators {

  /** Set-intersection comparator on multi-valued fields (linker.py's
    * `intersection_comparator` on birth/death place, rank, unit,
    * occupation): 1.0 if the normalized sets intersect, 0.0 if both are
    * non-empty and disjoint. Values are label-folded so literal-space and
    * URI-space sides compare consistently.
    *
    * PER-PAIR COST: folding here runs once per candidate PAIR per field —
    * a record in k pairs re-folds its sets k times. The scorer therefore
    * pre-folds once per RECORD ([[RecordLinkage.scorePairs]]) and uses
    * [[intersectionFolded]]; this raw form stays for callers comparing
    * un-normalized columns directly. fold is idempotent, so pre-folded
    * inputs score identically. */
  def intersection(a: Column, b: Column): Column =
    intersectionFolded(transform(a, Normalize.fold(_)), transform(b, Normalize.fold(_)))

  /** [[intersection]] over already-folded sets. */
  def intersectionFolded(a: Column, b: Column): Column =
    when(size(array_intersect(a, b)) > 0, 1.0).otherwise(0.0)

  /** DateTime comparator with fuzzy=False (linker.py:179-182): exact match
    * 1.0, same calendar year 0.5 (the reference's dedupe DateTime
    * comparator degrades smoothly with distance; one coarse step keeps the
    * expression exact-arithmetic and DuckDB-reproducible), else 0.0.
    * Operates on yyyy-MM-dd strings. */
  def dateEq(a: Column, b: Column): Column =
    when(a === b, 1.0)
      .when(substring(a, 1, 4) === substring(b, 1, 4), 0.5)
      .otherwise(0.0)

  /** Price-type comparator on rank_level (linker.py:186): closeness on the
    * 0..12 ordinal rank ladder, 1 - |a-b|/12 floored at 0. */
  def rankLevel(a: Column, b: Column): Column =
    greatest(lit(0.0), lit(1.0) - abs(a.cast("double") - b.cast("double")) / 12.0)

  /** activity_comparator (linker.py:184): consistency of the candidate's
    * activity end with the person's — a document about someone can't
    * postdate the end of their activity span. 1.0 when equal, 0.5 when the
    * prisoner's activity end does not exceed the person's, else 0.0. */
  def activity(prisonerEnd: Column, personEnd: Column): Column =
    when(prisonerEnd === personEnd, 1.0)
      .when(prisonerEnd <= personEnd, 0.5)
      .otherwise(0.0)

  /** Name comparator: Jaro-Winkler over folded strings (the dedupe String
    * type is JW-based), via the native codegen expression. */
  def name(a: Column, b: Column): Column =
    nameFolded(Normalize.fold(a), Normalize.fold(b))

  /** [[name]] over already-folded strings. */
  def nameFolded(a: Column, b: Column): Column = Normalize.jaroWinkler(a, b)

  /** One weighted field: (weight, rawScore, bothPresent). */
  final case class Field(weight: Double, score: Column, present: Column)

  def stringField(w: Double, a: Column, b: Column): Field =
    Field(w, name(a, b), a.isNotNull && b.isNotNull)

  def stringFieldFolded(w: Double, a: Column, b: Column): Field =
    Field(w, nameFolded(a, b), a.isNotNull && b.isNotNull)

  def dateField(w: Double, a: Column, b: Column): Field =
    Field(w, dateEq(a, b), a.isNotNull && b.isNotNull)

  def setField(w: Double, a: Column, b: Column): Field =
    Field(w, intersection(a, b),
      a.isNotNull && b.isNotNull && size(a) > 0 && size(b) > 0)

  def setFieldFolded(w: Double, a: Column, b: Column): Field =
    Field(w, intersectionFolded(a, b),
      a.isNotNull && b.isNotNull && size(a) > 0 && size(b) > 0)

  def levelField(w: Double, a: Column, b: Column): Field =
    Field(w, rankLevel(a, b), a.isNotNull && b.isNotNull)

  def activityField(w: Double, a: Column, b: Column): Field =
    Field(w, activity(a, b), a.isNotNull && b.isNotNull)

  /** Renormalized weighted score: Σ wᵢsᵢ[presentᵢ] / Σ wᵢ[presentᵢ], 0.0 if
    * nothing is comparable. Both sums fold left in field order so the
    * floating-point result is reproducible (and matches a DuckDB oracle
    * writing the same chain). */
  def score(fields: Seq[Field]): Column = {
    val num = fields.map(f => when(f.present, f.score * f.weight).otherwise(0.0))
      .reduceLeft(_ + _)
    val den = fields.map(f => when(f.present, lit(f.weight)).otherwise(0.0))
      .reduceLeft(_ + _)
    when(den > 0.0, num / den).otherwise(0.0)
  }

  /** The reference's 13 fields (linker.py:175-189) with fixed weights that
    * sum to 1.0 — names dominate (dedupe's learned models consistently
    * weigh exact-identity fields highest), multi-valued context fields
    * share the rest. Order matters for float reproducibility. */
  def prisonerScore(p: PrisonerCols, g: PrisonerCols,
                    preFolded: Boolean = false): Column = {
    val str = if (preFolded) stringFieldFolded _ else stringField _
    val set = if (preFolded) setFieldFolded _ else setField _
    score(Seq(
      str(0.15, p.given, g.given),
      str(0.17, p.family, g.family),
      set(0.08, p.birthPlace, g.birthPlace),
      dateField(0.08, p.birthBegin, g.birthBegin),
      dateField(0.08, p.birthEnd, g.birthEnd),
      dateField(0.05, p.deathBegin, g.deathBegin),
      dateField(0.05, p.deathEnd, g.deathEnd),
      set(0.05, p.deathPlace, g.deathPlace),
      activityField(0.04, p.activityEnd, g.activityEnd),
      set(0.08, p.rank, g.rank),
      levelField(0.05, p.rankLevel, g.rankLevel),
      set(0.06, p.unit, g.unit),
      set(0.06, p.occupation, g.occupation),
    ))
  }

  /** Column bundle for one side of the comparison. */
  final case class PrisonerCols(
      given: Column, family: Column,
      birthPlace: Column, birthBegin: Column, birthEnd: Column,
      deathBegin: Column, deathEnd: Column, deathPlace: Column,
      activityEnd: Column, rank: Column, rankLevel: Column,
      unit: Column, occupation: Column)
}
