package graft

/** Session-memo lifetime (VERDICT r03 minor): the SparkEntry memos
  * (corpus/pipeline/jaccard) are evicted when the application ends, so a
  * long-lived multi-session JVM cannot accumulate map entries pinning
  * Datasets of a dead context. */
class MemoHygieneSpec extends SparkSpec {

  test("application-end listener evicts every memo entry") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.corpusFor(spark, dir).count()
    assert(SparkEntry.memoSize >= 1, "memo populated")
    // fire the registered listener's callback exactly as the listener bus
    // would on context stop (stopping the shared test context here would
    // kill every other suite in this JVM)
    SparkEntry.memoListener.onApplicationEnd(
      org.apache.spark.scheduler.SparkListenerApplicationEnd(System.currentTimeMillis()))
    assert(SparkEntry.memoSize == 0, "all memo maps must be empty after application end")
    // memos repopulate cleanly afterwards (fresh compute, same session)
    SparkEntry.corpusFor(spark, dir).count()
    assert(SparkEntry.memoSize >= 1)
  }
}
