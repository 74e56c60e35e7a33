package graft

import graft.operators.SuffixSpans

class SuffixSpansSpec extends SparkSpec {

  test("suffix array sorts all suffixes of 'banana'") {
    val s = "banana".map(_.toInt + 256).toArray :+ -1
    val sa = SuffixSpans.suffixArray(s)
    assert(sa.length == 7 && sa.toSet == (0 to 6).toSet)
    // suffixes must come out in lexicographic order
    val raw = sa.map(i => s.drop(i).toSeq).toSeq
    assert(raw.sliding(2).forall {
      case Seq(a, b) => Ordering.Implicits.seqOrdering[Seq, Int].lteq(a, b)
      case _ => true
    })
    // sentinel (smallest) suffix first, full string where expected
    assert(sa(0) == 6)
    assert(sa.indexOf(0) > 0)
  }

  test("groupSpans finds the longest shared substring across docs") {
    val shared = "the quick brown fox jumps over the lazy dog repeatedly"
    val docs = Seq(
      ("d1", "prefix one " + shared + " suffix alpha"),
      ("d2", "other start " + shared + " different end"),
      ("d3", "completely unrelated content here with nothing shared at all"))
    val spans = SuffixSpans.groupSpans(docs, minLen = 20)
    val d12 = spans.find(s => Set(s._1, s._2) == Set("d1", "d2"))
    assert(d12.isDefined)
    // found span covers at least the shared sentence (padding spaces may extend it)
    assert(d12.get._3 >= shared.length, s"span=${d12.get._3}")
    assert(!spans.exists(s => s._1 == "d3" || s._2 == "d3"))
  }

  test("spansForPairs: distributed spans match per-group computation") {
    import spark.implicits._
    val shared = "a long exactly repeated span of text that both conversations contain verbatim"
    val docs = Seq(
      ("c1", "aaa " + shared + " bbb"),
      ("c2", "ccc " + shared + " ddd"),
      ("c3", "eee unrelated fff")).toDF("conv_id", "head_text")
    val pairs = Seq(("c1", "c2"), ("c1", "c3")).toDF("conv_a", "conv_b")
    val out = SuffixSpans.spansForPairs(pairs, docs, minLen = 30).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(out.contains(("c1", "c2")))
    assert(out(("c1", "c2")) >= shared.length)
    assert(!out.contains(("c1", "c3")))
  }
}
