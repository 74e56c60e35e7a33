package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.ClusterRow

/**
 * Connected-components clustering over verified duplicate pairs
 * (SURVEY.md §2.12 — the north_rule requirement the reference lacks; it
 * only emits ranked pair tables).
 *
 * Algorithm: alternating small-star min-label propagation expressed purely
 * as DataFrame joins + groupBy(min) iterated to fixpoint — the standard
 * scalable CC formulation (Kiveris et al., "Connected Components in
 * MapReduce and Beyond", SoCC'14). Each iteration:
 *   label(v) ← min(label(v), min over neighbors u of label(u))
 * propagated through the edge list both ways. Convergence in O(log n)
 * iterations on real graphs; every iteration is localCheckpoint'ed to cut
 * the lineage (SURVEY.md §7 hard part (b)) so plans stay bounded at scale.
 *
 * Labels are the lexicographic-min conv_id of the component, which makes
 * cluster ids deterministic and stable across runs/cluster sizes.
 */
object ConnectedComponents {

  /** edges: DataFrame with (conv_a, conv_b). Returns (conv_id, cluster_id, cluster_size). */
  def cluster(edges: DataFrame, maxIters: Int = 25): Dataset[ClusterRow] = {
    val spark = edges.sparkSession
    import spark.implicits._

    val sym = edges.select(col("conv_a").as("src"), col("conv_b").as("dst"))
      .unionAll(edges.select(col("conv_b").as("src"), col("conv_a").as("dst")))
      .distinct()
      .localCheckpoint(true)

    // initial label = own id
    var labels = sym.select($"src".as("id")).distinct()
      .withColumn("label", $"id")
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // candidate label via neighbors: min(label(dst)) per src
      val viaNbr = sym
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "nbr_label"), Seq("dst"))
        .groupBy($"src").agg(min($"nbr_label").as("nbr_label"))
      val next = labels
        .join(viaNbr.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select($"id", least($"label", coalesce($"nbr_label", $"label")).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter($"label" =!= $"old").limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }

    val sizes = labels.groupBy($"label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("label"))
      .select($"id".as("conv_id"), $"label".as("cluster_id"), $"cluster_size")
      .as[ClusterRow]
  }
}
