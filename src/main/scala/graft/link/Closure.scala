package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive closures over tiny dimension hierarchies (unit class
  * ladders, formation chains). The reference resolves these per query with
  * SPARQL property paths (`a/rdfs:subClassOf* wsc:Group`,
  * reference: sparql/units.sparql:20-26); Spark has no recursive join, so
  * the closure is PRECOMPUTED once per batch by iterative self-join and
  * then broadcast into the linking joins — the dim side is gazetteer-sized
  * by contract (thousands of classes at most), so the loop runs on
  * broadcast-sized frames and converges in ladder-depth iterations. */
object Closure {

  /** Reflexive-transitive closure of an edge table `(node, parent)`:
    * returns `(node, ancestor)` with every node reachable via 0..n parent
    * hops. Fixpoint by linear expansion (depth iterations, each a
    * broadcast-sized join); `maxDepth` is a runaway guard for cyclic
    * input, not a tuning knob. */
  def reflexiveTransitive(edges: DataFrame, node: String = "clazz",
                          parent: String = "parent", maxDepth: Int = 32): DataFrame = {
    val nodes = edges.select(col(node))
      .unionByName(edges.select(col(parent).as(node)))
      .distinct()
    var closure = nodes.select(col(node), col(node).as("ancestor"))
      .unionByName(edges.select(col(node), col(parent).as("ancestor")))
      .distinct().cache()
    var n = closure.count()
    var depth = 0
    var grown = true
    while (grown && depth < maxDepth) {
      val next = closure.as("c")
        .join(edges.as("e"), col("c.ancestor") === col(s"e.$node"))
        .select(col(s"c.$node"), col(s"e.$parent").as("ancestor"))
        .unionByName(closure)
        .distinct().cache()
      val m = next.count()
      grown = m > n
      closure.unpersist()
      closure = next
      n = m
      depth += 1
    }
    // a still-growing closure at the depth cap means a cycle or a ladder
    // deeper than expected — return loudly, never a silently-partial
    // closure (a partial subClassOf* closure would wrongly EXCLUDE unit
    // candidates downstream)
    require(!grown,
      s"transitive closure still growing after $maxDepth iterations — " +
        "cyclic hierarchy or maxDepth too small")
    closure
  }
}
