package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.rdf.Turtle

/** One-shot generator for src/main/resources/golden_prisoners.nt: parses
  * the reference's golden TTL (/root/reference/test_data/prisoners.ttl)
  * and emits its canonical sorted N-Triples lines. The resource feeds the
  * kg_golden_fixture DuckDB oracle (SparkEntry.oracleSql), so the driver's
  * correctness gate hash-compares extraction output against the
  * reference-emitted golden set, not just a row count. */
object DumpGoldenNt {
  def main(args: Array[String]): Unit = {
    val in = if (args.nonEmpty) args(0) else "/root/reference/test_data/prisoners.ttl"
    val out = if (args.length > 1) args(1) else "src/main/resources/golden_prisoners.nt"
    val text = new String(Files.readAllBytes(Paths.get(in)), StandardCharsets.UTF_8)
    val keys = Turtle.parse(text).map(_.key).distinct.sorted
    Files.createDirectories(Paths.get(out).getParent)
    Files.write(Paths.get(out), keys.mkString("\n").getBytes(StandardCharsets.UTF_8))
    println(s"${keys.size} golden triples -> $out")
  }
}
