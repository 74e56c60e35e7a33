package graft

import graft.operators.ConnectedComponents

/** Both CC paths (driver-local union-find, distributed min-label loop)
  * produce identical, deterministic components. */
class ConnectedComponentsSpec extends SparkSpec {

  private def edgesDf(es: Seq[(String, String)]) = {
    import spark.implicits._
    es.toDF("conv_a", "conv_b")
  }

  private val graph = Seq(
    ("a", "b"), ("b", "c"),           // chain abc
    ("d", "e"),                        // pair
    ("x", "y"), ("y", "z"), ("x", "z") // triangle
  )

  test("driver-local and distributed paths agree exactly") {
    val local = ConnectedComponents.cluster(edgesDf(graph))
      .collect().map(c => (c.conv_id, c.cluster_id, c.cluster_size)).toSet
    val dist = ConnectedComponents.cluster(edgesDf(graph), driverLocalMaxEdges = 0)
      .collect().map(c => (c.conv_id, c.cluster_id, c.cluster_size)).toSet
    assert(local == dist)
    assert(local == Set(
      ("a", "a", 3L), ("b", "a", 3L), ("c", "a", 3L),
      ("d", "d", 2L), ("e", "d", 2L),
      ("x", "x", 3L), ("y", "x", 3L), ("z", "x", 3L)))
  }

  test("distributed path converges on a long chain (diameter > 1 iteration)") {
    val chain = (0 until 40).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    val out = ConnectedComponents.cluster(edgesDf(chain), driverLocalMaxEdges = 0)
      .collect()
    assert(out.forall(_.cluster_id == "n000"))
    assert(out.forall(_.cluster_size == 41L))
  }

  test("re-contraction collapses a partition-count-inflated forest (no distributed loop needed)") {
    // One 300-member star family scattered over 50 partitions: pass-1
    // contraction emits ~(members + one hub edge PER PARTITION) = ~349
    // forest edges > cap 320, even though the graph itself needs only 300.
    // The coalesce+re-contract round merges the per-partition trees
    // (~305 ≤ 320) so the driver-local path is reached — the high-
    // parallelism cliff measured at 9.1M turns (clusters 2.0 s at local[8]
    // vs 9.7 s at local[32], purely from the forest spilling into the
    // iterative loop).
    val star = (1 until 300).map(i => ("v000", f"v$i%03d"))
    val scattered = edgesDf(star).repartition(50)
    val stats = new ConnectedComponents.CcStats
    val viaMerge = ConnectedComponents
      .cluster(scattered, driverLocalMaxEdges = 320, stats = stats)
      .collect().map(c => (c.conv_id, c.cluster_id, c.cluster_size)).toSet
    val local = ConnectedComponents.cluster(edgesDf(star))
      .collect().map(c => (c.conv_id, c.cluster_id, c.cluster_size)).toSet
    assert(viaMerge == local)
    assert(viaMerge.forall(t => t._2 == "v000" && t._3 == 300L))
    // and the re-contraction must actually have REACHED the driver-local
    // path — without this pin, a broken merge round silently falls through
    // to the distributed loop, which computes the same clusters (the
    // high-parallelism wall cliff would return undetected)
    assert(stats.path == "local" && stats.iterations == 0,
      s"expected driver-local after re-contraction, took ${stats.path}")
  }

  test("CcStats records the taken path, forest sizes, and loop iterations") {
    val hinted = new ConnectedComponents.CcStats
    ConnectedComponents.cluster(edgesDf(graph), edgeCountHint = Some(6L),
      stats = hinted).collect()
    assert(hinted.path == "hint-local" && hinted.forestEdges.isEmpty)
    val local = new ConnectedComponents.CcStats
    ConnectedComponents.cluster(edgesDf(graph), driverLocalMaxEdges = 100,
      stats = local).collect()
    assert(local.path == "local" && local.forestEdges.nonEmpty)
    assert(local.iterations == 0)
    val dist = new ConnectedComponents.CcStats
    ConnectedComponents.cluster(edgesDf(graph), driverLocalMaxEdges = 0,
      stats = dist).collect()
    assert(dist.path == "distributed" && dist.iterations >= 1)
    assert(dist.forestEdges.nonEmpty)
  }

  test("contraction path (edges over budget, forest under) agrees exactly") {
    // chain: 82 symmetric edges > cap 60 ≥ 41 forest edges → the partition-
    // local union-find contraction runs, then finishes driver-local
    val chain = (0 until 40).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    val stats = new ConnectedComponents.CcStats
    val viaContraction = ConnectedComponents
      .cluster(edgesDf(chain), driverLocalMaxEdges = 60, stats = stats)
      .collect().map(c => (c.conv_id, c.cluster_id, c.cluster_size)).toSet
    val local = ConnectedComponents.cluster(edgesDf(chain))
      .collect().map(c => (c.conv_id, c.cluster_id, c.cluster_size)).toSet
    assert(viaContraction == local)
    assert(viaContraction.forall(t => t._2 == "n000" && t._3 == 41L))
    assert(stats.path == "local" && stats.iterations == 0,
      s"expected driver-local after contraction, took ${stats.path}")
  }
}
