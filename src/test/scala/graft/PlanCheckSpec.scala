package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/**
 * Physical-plan discipline checks (the ".explain and iterate" requirement):
 * filters/projections reach the parquet scan, small dims broadcast, hot
 * expressions stay inside WholeStageCodegen.
 */
class PlanCheckSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("filter + projection push down to the parquet scan") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 40)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = li.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(l_quantity"),
      s"filter not pushed: $scan")
    // column pruning: only the two referenced columns in ReadSchema
    assert(scan.contains("l_orderkey") && !scan.contains("l_extendedprice"),
      s"columns not pruned: $scan")
  }

  test("dimension join broadcasts the small side") {
    val p = planString(SparkEntry.queries("q_join_agg")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val p = planString(SparkEntry.queries("q_topk_global")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("custom SimHash64 expression stays inside WholeStageCodegen") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(graft.functions.GraftFunctions.simhash64($"text").as("sh"))
      .filter($"sh" =!= 0L)
    val p = planString(df)
    // '*(n)' prefixes mark operators fused into WholeStageCodegen stage n
    assert(p.contains("*(1) Project [simhash64"), s"no codegen span:\n$p")
    // the expression must not force a fallback project outside codegen
    assert(!p.contains("!Project"), s"codegen fallback detected:\n$p")
  }

  test("aggregation uses partial (map-side) aggregation") {
    val q = SparkEntry.queries("q1_agg")(spark, sf)
    val p = planString(q)
    // two HashAggregate nodes: partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("ann_lsh_topk joins on the bucket key (no degenerate cross join)") {
    val p = planString(SparkEntry.queries("ann_lsh_topk")(spark, sf))
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucket equi-join degenerated to a cross join:\n$p")
  }

  test("candidate-stage plan keeps its exchange budget (shuffle-collapse discipline)") {
    import spark.implicits._
    // The round-3 rework fused bucket sizing into one window exchange and
    // made the dedup agg + cap windows ride the signature-join exchanges —
    // the whole candidate join must plan with at most 8 exchanges (it held
    // ~11 before; regressions here directly re-open the serial driver floor
    // the 2→8 scaling gate depends on).
    val turns = sources.ConversationGen.corpus(spark, sources.ConversationGen.smoke)
    val sigs = operators.Signatures.compute(
      operators.Reassembly.assemble(turns), model.DedupConfig.balanced)
      .localCheckpoint(true)
    val cand = operators.LshJoin.candidates(sigs, model.DedupConfig.balanced)
    // materialize THIS QueryExecution (count() would build a separate one)
    // so AQE finalizes the plan; count the shuffle stages that actually ran
    // in the final section (the tail repeats the pre-AQE Initial Plan)
    cand.collect()
    val full = cand.queryExecution.executedPlan.toString
    assert(full.contains("isFinalPlan=true"), s"plan did not finalize:\n$full")
    val p = full.split("== Initial Plan ==").head
    val shuffles = "ShuffleQueryStage [0-9]+".r.findAllIn(p).toSet
    assert(shuffles.size <= 8, s"candidate plan ran ${shuffles.size} shuffle stages ($shuffles):\n$p")
  }

  test("reassembly rides the corpus's conv_id partitioning (zero-exchange groupBy)") {
    // The generator delivers the corpus hash-distributed by conv_id (the
    // conv-bucketed input-table layout); assemble's groupBy must reuse that
    // partitioning instead of re-shuffling the full corpus text — the
    // aggregate sits DIRECTLY on the cached scan with no Exchange between.
    val turns = sources.ConversationGen.corpus(spark, sources.ConversationGen.smoke).persist()
    turns.count()
    try {
      val docs = operators.Reassembly.assemble(turns)
      docs.count()
      val p = planString(docs.toDF())
      val aboveCache = p.linesIterator
        .takeWhile(!_.contains("InMemoryRelation")).mkString("\n")
      assert(!aboveCache.contains("Exchange"),
        s"assemble re-shuffled a conv_id-partitioned corpus:\n$aboveCache")
    } finally turns.unpersist()
  }

  test("semi and anti joins compile to semi/anti join operators") {
    val semi = planString(SparkEntry.queries("q_semi_join")(spark, sf))
    assert(semi.contains("LeftSemi"), s"no semi join:\n$semi")
    val anti = planString(SparkEntry.queries("q_anti_join")(spark, sf))
    assert(anti.contains("LeftAnti"), s"no anti join:\n$anti")
  }
}
