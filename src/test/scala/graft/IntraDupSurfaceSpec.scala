package graft

import graft.operators.IntraDup
import graft.model.ConvDoc

/**
 * The intra-dup oracle surface must stay in lockstep with the operator:
 * every `repeatedSpans` column is re-derivable from the dumped positional
 * shingle hashes. The DuckDB replay in SparkEntry.oracleSql performs the
 * same derivation in SQL (gaps-and-islands for the interval union); this
 * spec guards the surface↔operator contract inside `sbt test`.
 */
class IntraDupSurfaceSpec extends SparkSpec {

  test("repeatedSpans columns are re-derivable from the shingle surface") {
    import spark.implicits._
    val k = 5
    val docs = Seq(
      // heavy cyclic repetition: most shingles repeat, one merged island
      ConvDoc("c_rep", 3, "alpha beta gamma delta epsilon zeta " * 3 +
        "tail one two three four five six"),
      // all-distinct tokens: no repeats, must be filtered from the output
      ConvDoc("c_none", 2, (1 to 40).map(i => s"tok$i").mkString(" ")),
      // below the shingle width: no surface rows at all
      ConvDoc("c_short", 1, "just four tokens here"),
      // one shingle at multiplicity 3 with two DISJOINT islands (pos 0/5
      // adjacent, pos 20 separated) — exercises the interval-union merge
      ConvDoc("c_two", 2, "x y z w v " * 2 +
        (1 to 10).map(i => s"m$i").mkString(" ") + " x y z w v")
    ).toDS()

    val out = IntraDup.repeatedSpans(docs, k).collect()
      .map(r => r.getString(0) -> r).toMap
    val surf = IntraDup.shingleSurface(docs, k).toMap
    val sh = surf("intra_shingles").as[(String, Int, Long)].collect()
    val nTok = surf("intra_doc").as[(String, Int)].collect().toMap

    // the driver query filters n_repeated_shingles > 0; the operator
    // itself emits every conversation — verify both repeat and
    // zero-repeat rows against the surface
    assert(out("c_rep").getInt(2) > 0 && out("c_two").getInt(2) > 0)
    assert(out("c_none").getInt(2) == 0 && out("c_short").getInt(2) == 0)

    nTok.foreach { case (cid, n) =>
      val rows = sh.filter(_._1 == cid).sortBy(_._2)
      val counts = rows.groupBy(_._3).map { case (h, g) => h -> g.length }
      val nRep = counts.count(_._2 > 1)
      val r = out(cid)
      assert(r.getInt(1) == n, s"$cid n_tokens")
      assert(r.getInt(2) == nRep, s"$cid n_repeated_shingles")
      if (nRep > 0) {
        assert(r.getInt(3) == counts.values.filter(_ > 1).max,
          s"$cid max_multiplicity")
        val excess = counts.values.filter(_ > 1).map(_ - 1).sum
        assert(r.getDouble(4) == excess.toDouble / math.max(1, n - k + 1),
          s"$cid repeat_fraction")
        // interval union replayed independently from surface positions
        val repPos = rows.filter(t => counts(t._3) > 1).map(_._2)
        var covered = 0; var curS = -1; var curE = -1
        repPos.foreach { p =>
          if (p >= curE) { if (curE > curS) covered += curE - curS; curS = p }
          curE = p + k
        }
        if (curE > curS) covered += curE - curS
        assert(r.getDouble(5) == covered.toDouble / n, s"$cid clone_coverage")
      }
    }
  }
}
