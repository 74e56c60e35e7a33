package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.dot_arr
import graft.functions.Hashing

/**
 * IVF (inverted-file) approximate nearest neighbor — the general top-k
 * scale path over embeddings (SURVEY.md "similarity search" requirement;
 * the reference's adaptive all-pairs/batched dispatch,
 * /root/reference/ai_pdf_panel_duplicate_check_AUTO.py:3766-3783, maps to
 * coarse quantization + probed search at 100 TB).
 *
 * Shape (classic IVF-Flat): train K spherical-k-means centroids on a
 * deterministic hash-ordered sample (driver-side — the sample is tiny and
 * the train step is exactly the kind of size-adaptive planning the
 * reference does in auto_configure); broadcast centroids; one narrow
 * mapPartitions pass assigns every vector to its nearest centroid AND
 * computes its nProbe nearest centroid list; search joins queries to
 * corpus vectors on probed centroid ids only — candidate fraction ≈
 * nProbe/K of the corpus per query instead of all-pairs.
 *
 * Everything is deterministic: hash-ordered sampling, fixed iteration
 * count, ties broken by index. No randomness at task level.
 *
 * Why IVF and not sign-LSH for general top-k: measured on the testdata
 * embeddings, top-5 neighbors sit at cosine ≈ 0.25–0.42 (near-orthogonal);
 * per-hyperplane agreement is ~0.6, so any single-table LSH needs to scan
 * most of the corpus to reach recall 0.9. Centroid probing exploits the
 * cluster structure instead (recall gate in AnnRecallSpec).
 */
object AnnIvf {

  private def toDoubles(v: Any): Array[Double] = v match {
    case s: scala.collection.Seq[_] => s.iterator.map {
      case f: Float => f.toDouble
      case d: Double => d
      case n: Number => n.doubleValue()
    }.toArray
    case a: Array[Float] => a.map(_.toDouble)
    case a: Array[Double] => a
  }

  private def normalize(x: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) return x
    val out = new Array[Double](x.length)
    i = 0
    while (i < x.length) { out(i) = x(i) / n; i += 1 }
    out
  }

  /**
   * Deterministic spherical k-means over a hash-ordered sample (Lloyd,
   * fixed iterations). Init = first k sample vectors in hash order; empty
   * clusters keep their previous centroid. Driver-side: sample ≤ sampleN
   * vectors — O(sampleN · k · dims) per iteration, milliseconds at any
   * corpus scale.
   */
  def trainCentroids(emb: DataFrame, k: Int, iters: Int = 10,
                     sampleN: Int = 4096, seed: Long = 11L): Array[Array[Double]] = {
    val rows = emb.select(col("vec_id"), col("embedding"))
      .orderBy(pmod(xxhash64(col("vec_id"), lit(seed)), lit(1000003L)), col("vec_id"))
      .limit(sampleN)
      .collect()
    val x = rows.map(r => normalize(toDoubles(r.get(1))))
    require(x.nonEmpty, "empty embedding table")
    val kk = math.min(k, x.length)
    var cent = Array.tabulate(kk)(i => x(i).clone())
    val dims = x(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dims))
      val cnts = new Array[Int](kk)
      x.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < kk) {
          var d = 0.0; var i = 0
          while (i < dims) { d += v(i) * cent(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dims) { sums(best)(i) += v(i); i += 1 }
        cnts(best) += 1
      }
      cent = Array.tabulate(kk)(c =>
        if (cnts(c) == 0) cent(c) else normalize(sums(c)))
      it += 1
    }
    cent
  }

  /** Heuristic centroid count for a corpus of n vectors: ~sqrt(2n),
    * clamped — the same size-adaptive dispatch shape as the reference's
    * auto_configure. */
  def centroidsFor(n: Long): Int =
    math.max(8, math.min(4096, math.round(math.sqrt(2.0 * n)).toInt))

  /** The assignment pass as a standalone plan: (vec_id, cell, probes, e)
    * with e normalized — factored out so the oracle dump (below) replays
    * the exact cell/probe routing the search join consumes. */
  def assignments(emb: DataFrame, nProbe: Int = 4,
                  nCentroids: Int = 0, seed: Long = 11L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val kk = if (nCentroids > 0) nCentroids else centroidsFor(emb.count())
    val cent = trainCentroids(emb, kk, seed = seed)
    val bc = spark.sparkContext.broadcast(cent)
    val np = math.min(nProbe, cent.length)

    // one narrow pass: normalized vector + own cell + probe list
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val c = bc.value
        val kc = c.length
        it.map { case (id, raw) =>
          val v = normalize(raw.iterator.map(_.toDouble).toArray)
          val dots = new Array[Double](kc)
          var ci = 0
          while (ci < kc) {
            var d = 0.0; var i = 0
            val cc = c(ci)
            while (i < v.length) { d += v(i) * cc(i); i += 1 }
            // NaN guard: a single invalid embedding (NaN/Inf component) makes
            // every > comparison false — map to -Inf so probe selection still
            // returns a valid (arbitrary but deterministic) centroid instead
            // of failing the whole job on taken(-1)
            dots(ci) = if (java.lang.Double.isNaN(d)) Double.NegativeInfinity else d
            ci += 1
          }
          // top-np centroid ids by dot, ties by index (selection by repeated max)
          val probes = new Array[Int](np)
          val taken = new Array[Boolean](kc)
          var p = 0
          while (p < np) {
            var best = -1; var bestDot = Double.NegativeInfinity
            ci = 0
            while (ci < kc) {
              if (!taken(ci) && (best < 0 || dots(ci) > bestDot)) {
                bestDot = dots(ci); best = ci
              }
              ci += 1
            }
            taken(best) = true; probes(p) = best; p += 1
          }
          (id, probes(0), probes, v)
        }
      }.toDF("vec_id", "cell", "probes", "e")
  }

  /** IVF top-k: every vector is a query; candidates come from the nProbe
    * nearest centroids' inverted lists. Returns (q_id, n_id, rnk, cosine). */
  def annIvfTopK(emb: DataFrame, k: Int = 5, nProbe: Int = 4,
                 nCentroids: Int = 0, seed: Long = 11L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val assigned = assignments(emb, nProbe, nCentroids, seed).persist()

    val corpus = assigned.select($"vec_id", $"cell", $"e")
    val queries = assigned.select($"vec_id".as("q_id"),
      explode($"probes").as("cell"), $"e".as("qe"))
    val pairs = queries.join(corpus, Seq("cell"))
      .filter($"q_id" =!= $"vec_id")
      // vectors are pre-normalized: cosine = codegen'd dot product
      .withColumn("cos", dot_arr($"qe", $"e"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
    val topk = pairs.withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"q_id", $"vec_id".as("n_id"), $"rnk", round($"cos", 6).as("cosine"))
      // materialize the (small, n·k-row) result so the assignment cache can
      // be released — a long-lived session must not accumulate cached blocks
      // per invocation
      .localCheckpoint(true)
    assigned.unpersist()
    topk
  }

  /** The routing surface `annIvfTopK` consumes, exploded to scalar rows —
    * per-vector cell assignment and per-query probed cells — so the IVF
    * search (probed-list join + normalized-cosine top-k) can be replayed as
    * pure SQL in DuckDB and compared hash-exact against `ann_ivf_topk`
    * (graft.Verify dumps these; trainCentroids is fully deterministic, so
    * the dump pass and the query pass route identically). */
  def oracleTables(emb: DataFrame, nProbe: Int = 4,
                   nCentroids: Int = 0, seed: Long = 11L): Seq[(String, DataFrame)] = {
    // ONE assignment pass feeds both dumps: without the eager checkpoint the
    // shared unpersisted plan re-executes the full pass — emb.count() and
    // centroid training included — per dump write (ADVICE r04). The
    // checkpointed projection drops the wide `e` column, so the pinned
    // blocks are the scalar routing surface only.
    val a = assignments(emb, nProbe, nCentroids, seed)
      .select(col("vec_id"), col("cell"), col("probes"))
      .localCheckpoint(true)
    Seq(
      "ann_ivf_cells" -> a.select(col("vec_id"), col("cell")),
      "ann_ivf_probes" -> a.select(col("vec_id").as("q_id"),
        explode(col("probes")).as("cell")))
  }
}
