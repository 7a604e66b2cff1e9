package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.NS

/** Connected components over link edges + canonical-id rewrite —
  * the canonicalization stage (north rule; SURVEY.md §4 "iterative
  * fixpoint").
  *
  * The reference sidesteps CC (its record linkage emits pairwise links
  * only, src/linker.py:206-210); generalizing to entity canonicalization
  * requires grouping link clusters and electing one canonical URI per
  * cluster. GraphFrames is unavailable here, so this is a hand-rolled
  * alternating large-star/small-star-style min-label propagation
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14 — public algorithm) as iterative DataFrame self-joins with
  * `localCheckpoint` every iteration to cut lineage.
  *
  * Scale notes: each iteration is one shuffle on the node id; convergence
  * is O(log d) iterations for diameter d — entity-link clusters are
  * near-star-shaped (diameter ≤ 4), so 3-6 iterations in practice. The
  * iteration count is capped and the final assignment is verified by a
  * fixpoint check, not assumed.
  */
object ConnectedComponents {

  /** edges(src,dst) → (node, component) where component = min node id
    * (lexicographic) in the node's connected component. */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // materialize the symmetric edge set ONCE — the loop touches it twice
    // per iteration (neighbor propagation + convergence check), and an
    // expensive upstream plan (e.g. a similarity join producing the pairs)
    // must not re-execute per iteration
    val sym = edges.select($"src", $"dst")
      .unionByName(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .localCheckpoint()

    var labels = sym.select($"src".as("node")).distinct()
      .withColumn("comp", $"node")
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // candidate label per node: min over (own label, neighbours' labels)
      val neighborLabels = sym
        .join(labels.withColumnRenamed("node", "dst2"), $"dst" === $"dst2")
        .select($"src".as("node"), $"comp")
      val updated = labels.select($"node", $"comp")
        .unionByName(neighborLabels)
        .groupBy($"node").agg(min($"comp").as("comp"))
        .localCheckpoint()

      val changed = updated.alias("u")
        .join(labels.alias("l"), Seq("node"))
        .filter(col("u.comp") =!= col("l.comp"))
        .limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** owl:sameAs-style canonicalization: every URI in a link cluster is
    * rewritten to the cluster's canonical (min) URI in both subject and
    * object position. Triples not in any cluster pass through untouched —
    * the join is left + coalesce, one shuffle per side. */
  def canonicalizeTriples(triples: DataFrame, linkEdges: DataFrame): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val mapping = components(linkEdges)
      .filter($"node" =!= $"comp")
      .select($"node", $"comp")

    val m1 = mapping.withColumnRenamed("node", "subj").withColumnRenamed("comp", "subj_canon")
    val m2 = mapping.withColumnRenamed("node", "obj_node").withColumnRenamed("comp", "obj_canon")

    triples
      .join(m1, Seq("subj"), "left")
      .withColumn("obj_node", when($"objIsUri", $"objValue"))
      .join(m2, Seq("obj_node"), "left")
      .select(
        coalesce($"subj_canon", $"subj").as("subj"),
        $"pred",
        coalesce($"obj_canon", $"objValue").as("objValue"),
        $"objIsUri", $"objLang", $"objDatatype", $"docId")
      .dropDuplicates("subj", "pred", "objValue", "objIsUri", "objLang", "objDatatype")
  }

  /** Link triples (P70_documents / sameAs-shaped) → edges. */
  def edgesFromLinks(links: DataFrame): DataFrame =
    links.filter(col("objIsUri"))
      .select(col("subj").as("src"), col("objValue").as("dst"))
}
