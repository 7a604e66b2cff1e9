package graft.rdf

import scala.collection.mutable

import graft.model.{NS, RdfTriple}

/** Minimal Turtle reader/writer for the RDF edges of the pipeline.
  *
  * The engine's native interchange is the triples Dataset in Parquet
  * (SURVEY.md §2.1 S9); Turtle exists only at the boundaries — reading the
  * reference's golden fixture (test_data/prisoners.ttl) and emitting
  * human-checkable exports. Covers the subset rdflib's turtle serializer
  * emits: @prefix, prefixed names, `a`, `;`/`,` continuation, quoted /
  * triple-quoted strings with escapes, `@lang`, `^^datatype`, bare
  * integers/booleans. No blank nodes (the reference mints URIs for
  * everything, so its output has none).
  */
object Turtle {

  private sealed trait Tok
  private case class TRes(uri: String) extends Tok                        // <...> or resolved pname
  private case class TLit(v: String, lang: String, dt: String) extends Tok
  private case class TPunct(c: Char) extends Tok
  private case class TPrefixDecl(prefix: String, uri: String) extends Tok

  def parse(text: String): Seq[RdfTriple] = {
    val toks = tokenize(text)
    val out = mutable.ArrayBuffer[RdfTriple]()
    var i = 0
    def cur: Tok = toks(i)
    while (i < toks.length) {
      cur match {
        case TPrefixDecl(_, _) => i += 1
        case TRes(subj) =>
          i += 1
          var done = false
          while (!done) {
            val pred = cur match {
              case TRes(p) => i += 1; p
              case t => sys.error(s"expected predicate, got $t")
            }
            var moreObjects = true
            while (moreObjects) {
              cur match {
                case TRes(o)        => out += RdfTriple.uri(subj, pred, o); i += 1
                case TLit(v, l, d)  => out += RdfTriple(subj, pred, v, objIsUri = false,
                  if (l == null || l.isEmpty) null else l,
                  if (d == null || d.isEmpty) null else d, ""); i += 1
                case t => sys.error(s"expected object, got $t")
              }
              cur match {
                case TPunct(',') => i += 1
                case TPunct(';') => moreObjects = false; i += 1
                  // allow trailing "; ." (not emitted by rdflib, but cheap)
                  if (i < toks.length && cur == TPunct('.')) { done = true; i += 1 }
                case TPunct('.') => moreObjects = false; done = true; i += 1
                case t => sys.error(s"expected , ; or . got $t")
              }
            }
          }
        case t => sys.error(s"expected subject, got $t")
      }
    }
    out.toSeq
  }

  private def tokenize(text: String): IndexedSeq[Tok] = {
    val prefixes = mutable.Map[String, String]()
    val toks = mutable.ArrayBuffer[Tok]()
    var i = 0
    val n = text.length
    def ws(): Unit = { while (i < n && Character.isWhitespace(text.charAt(i))) i += 1 }

    def readUri(): String = { // at '<'
      val end = text.indexOf('>', i)
      val u = text.substring(i + 1, end)
      i = end + 1
      u
    }

    def readQuoted(): String = {
      // at first '"'; handles """...""" and "..." with escapes
      if (text.startsWith("\"\"\"", i)) {
        val end = text.indexOf("\"\"\"", i + 3)
        val body = text.substring(i + 3, end)
        i = end + 3
        unescape(body)
      } else {
        val sb = new StringBuilder
        i += 1
        while (text.charAt(i) != '"') {
          if (text.charAt(i) == '\\') {
            sb.append(unescapeChar(text.charAt(i + 1))); i += 2
          } else { sb.append(text.charAt(i)); i += 1 }
        }
        i += 1
        sb.toString
      }
    }

    def resolvePName(tok: String): String = {
      val colon = tok.indexOf(':')
      val prefix = tok.substring(0, colon)
      val local = tok.substring(colon + 1)
      prefixes.get(prefix) match {
        case Some(base) => base + local
        case None => sys.error(s"unknown prefix '$prefix' in $tok")
      }
    }

    while ({ ws(); i < n }) {
      text.charAt(i) match {
        case '<' => toks += TRes(readUri())
        case '"' =>
          val v = readQuoted()
          var lang: String = null
          var dt: String = null
          if (i < n && text.charAt(i) == '@') {
            val start = i + 1
            var j = start
            while (j < n && (Character.isLetterOrDigit(text.charAt(j)) || text.charAt(j) == '-')) j += 1
            lang = text.substring(start, j); i = j
          } else if (i + 1 < n && text.charAt(i) == '^' && text.charAt(i + 1) == '^') {
            i += 2
            dt = if (text.charAt(i) == '<') readUri()
                 else { val s = readBare(); resolvePName(s) }
          }
          toks += TLit(v, lang, dt)
        case '.' => toks += TPunct('.'); i += 1
        case ';' => toks += TPunct(';'); i += 1
        case ',' => toks += TPunct(','); i += 1
        case '@' => // @prefix p: <uri> .
          val kw = readBare() // "@prefix"
          require(kw == "@prefix" || kw == "@base", s"unsupported directive $kw")
          ws(); val p = readBare() // "p:"
          ws(); require(text.charAt(i) == '<', "expected <uri> in @prefix")
          val u = readUri()
          ws(); require(text.charAt(i) == '.', "expected . after @prefix"); i += 1
          if (kw == "@prefix") prefixes(p.stripSuffix(":")) = u
          toks += TPrefixDecl(p.stripSuffix(":"), u)
        case '#' => while (i < n && text.charAt(i) != '\n') i += 1 // comment
        case _ =>
          val bare = readBare()
          if (bare == "a") toks += TRes(NS.RDF_TYPE)
          else if (bare == "true" || bare == "false") toks += TLit(bare, null, NS.XSD_BOOLEAN)
          else if (bare.matches("[+-]?\\d+")) toks += TLit(bare, null, NS.XSD_INTEGER)
          else if (bare.matches("[+-]?\\d*\\.\\d+")) toks += TLit(bare, null, NS.XSD + "decimal")
          else if (bare.contains(':')) toks += TRes(resolvePName(bare))
          else sys.error(s"cannot tokenize '$bare'")
      }
    }

    def readBare(): String = {
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i)) &&
        text.charAt(i) != ',' && text.charAt(i) != ';') i += 1
      // a statement-final '.' can attach ("local." never occurs in our data)
      var s = text.substring(start, i)
      if (s.length > 1 && s.endsWith(".") && !s.matches("[+-]?\\d+\\.")) {
        s = s.dropRight(1); i -= 1
      }
      s
    }

    toks.toIndexedSeq
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        sb.append(unescapeChar(s.charAt(i + 1))); i += 2
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def unescapeChar(c: Char): Char = c match {
    case 'n' => '\n'
    case 't' => '\t'
    case 'r' => '\r'
    case '"' => '"'
    case '\\' => '\\'
    case other => other
  }

  /** Deterministic N-Triples-ish serialization (sorted), for goldens and
    * human inspection — the engine's real sink is predicate-partitioned
    * Parquet. */
  def toNTriples(triples: Seq[RdfTriple]): String =
    triples.map(_.key).sorted.mkString("", "\n", "\n")
}
