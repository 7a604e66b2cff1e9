package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Property-based invariants of the scalar core (SURVEY.md §5 extensions):
  * idempotence of the name normalization, inverse relations of the parse
  * ops, determinism of minting/slugify. Uses raw ScalaCheck generators with
  * a fixed seed (the scalatest-scalacheck bridge isn't in the offline
  * dependency cache). */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private val finWord: Gen[String] =
    Gen.chooseNum(2, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ Seq('ä', 'ö', 'å'))).map(_.mkString))

  private val nameGen: Gen[String] = for {
    last <- finWord
    first <- finWord
    second <- finWord
  } yield s"${last.capitalize} ${first.capitalize} ${second.capitalize}"

  test("person-name normalization is idempotent on its own output") {
    forAll(nameGen) { raw =>
      val once = Converters.convertPersonName(raw)
      val assembled = if (once.given.nonEmpty) s"${once.family} ${once.given}" else once.family
      val twice = Converters.convertPersonName(assembled)
      assert(twice.family == once.family)
      assert(twice.given == once.given)
    }
  }

  test("value-with-source parse inverts the (value, source) template") {
    val valGen = finWord.map(_.capitalize)
    forAll(valGen, finWord) { (v, src) =>
      val parsed = Parsers.readValueWithSource(s"$v ($src)")
      assert(parsed.value == v)
      assert(parsed.source == src)
      assert(parsed.trash.isEmpty)
    }
  }

  test("semicolon parse inverts the 'source: value' template") {
    forAll(finWord, finWord) { (src, v) =>
      val parsed = Parsers.readSemicolonSeparated(s"$src: $v")
      assert(parsed.value == v)
      assert(parsed.source == src)
    }
  }

  test("date conversion: valid d.M.yyyy roundtrips, garbage passes through") {
    forAll(Gen.chooseNum(1, 28), Gen.chooseNum(1, 12), Gen.chooseNum(1860, 1960)) {
      (d, m, y) =>
        val r = Converters.convertDates(s"$d.$m.$y")
        assert(r.isDate)
        assert(r.date.toLocalDate == java.time.LocalDate.of(y, m, d))
        val slash = Converters.convertDates(s"$d/$m/$y")
        assert(slash.date == r.date)
    }
    forAll(finWord) { junk =>
      val r = Converters.convertDates(junk)
      assert(!r.isDate && r.raw == junk)
    }
  }

  test("slugify is deterministic, ascii, and idempotent") {
    forAll(Gen.alphaStr.suchThat(_.nonEmpty), finWord) { (a, b) =>
      val s1 = Converters.slugify(s"$a $b")
      assert(s1 == Converters.slugify(s"$a $b"))
      assert(s1.matches("[a-z0-9-]*"))
      assert(Converters.slugify(s1) == s1)
    }
  }

  test("jaro-winkler: bounded, symmetric, 1 iff equal (non-empty)") {
    forAll(finWord, finWord) { (a, b) =>
      val s = Converters.jaroWinkler(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(math.abs(s - Converters.jaroWinkler(b, a)) < 1e-12)
      if (a == b) assert(s == 1.0)
    }
  }

  test("python title: idempotent and case-insensitive-stable") {
    forAll(Gen.listOf(Gen.oneOf(finWord, Gen.numStr)).map(_.mkString(" "))) { s =>
      val t1 = PyStr.title(s)
      assert(PyStr.title(t1) == t1)
      assert(PyStr.title(s.toUpperCase) == t1)
    }
  }
}
