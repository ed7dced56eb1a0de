package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the industry-standard coding for
  * billion-vector corpora: the 64-dim vector splits into [[Subs]]
  * subspaces of [[DSub]] dims, each subspace gets its own ≤[[PqK]]-code
  * codebook, and a vector stores one code per subspace (8 bytes/vector
  * here vs 256 for the floats — a 32× cut, vs int8-SQ's 4×). Ranking
  * uses asymmetric distance computation (ADC): the query precomputes
  * its distance to every (subspace, code) centroid — a [[Subs]]·[[PqK]]
  * table, broadcast — and a candidate's distance is the SUM of 8 table
  * lookups, never a float op against the corpus.
  *
  * Everything runs in the repo's scaled-long fixed point, ONE notch
  * stricter than the IVF chain: components scale to round(x·1e6) longs
  * at the edge, so every squared-L2 distance — training assignment,
  * coding, the ADC table, and the exact side — is an INTEGER, exact in
  * any summation order in any engine. The whole query (training
  * included) replays in DuckDB with no rounding grid at all. */
object ProductQuant {

  /** Subspace count × dims per subspace = the embedding width (64). */
  private[graft] val Subs = 8
  private[graft] val DSub = 8

  /** Codes per subspace codebook — fixed, like [[Similarity.IvfNlist]]:
    * the codebook broadcast is O([[Subs]]·PqK) at any corpus size. */
  private[graft] val PqK = 16L

  /** Codebook seed stride (every stride-th vec_id seeds a code in EVERY
    * subspace): ⌈n/stride⌉ ≤ ~[[PqK]] codes regardless of corpus size,
    * the same size-independence contract as [[Similarity.ivfStride]]. */
  private[graft] def pqStride(n: Long): Long = math.max(50L, n / PqK)

  /** Lloyd's refinement rounds per subspace codebook. */
  private[graft] val PqIters = 1

  /** Exact integer squared L2 between two scaled-long arrays. Integer
    * adds commute, so the fold order is irrelevant — no rounding grid,
    * no Det scheme needed. */
  private def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** (vec_id, sub, v) — the 1e6-scaled [[DSub]]-dim subvectors of every
    * vector, one row per (vector, subspace). */
  private def subvecs(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long")).as("xs"))
      .select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(Subs - 1)),
          s => slice(col("xs"), s * DSub + 1, lit(DSub)))).as(Seq("sub", "v")))

  /** Argmin-d2 code assignment per (vector, subspace) over a broadcast
    * codebook — min of the (d2, code) struct: lowest distance, then
    * lowest code id on integer ties (the oracle's `ORDER BY d2 ASC,
    * code ASC` window). */
  private def assignCodes(sv: DataFrame, cb: DataFrame): DataFrame =
    sv.join(broadcast(cb), "sub")
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(d2(col("v"), col("c")).as("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.code").as("code"))

  /** Trained per-subspace codebooks (sub, code, c: array<long>):
    * stride-seeded, then [[PqIters]] Lloyd's rounds — assign every
    * subvector to its argmin-d2 code, recenter each (sub, code) on the
    * member mean. The mean stays in the scaled-long domain: per-pos
    * sums are exact integers, and round(sx/cnt) is one IEEE division +
    * one half-away-from-zero round on identical inputs — the same long
    * in both engines. Code identity stays the seed id, keeping argmin
    * ties stable; a code that loses all members drops out. */
  private def trainCodebooks(sv: DataFrame, stride: Long): DataFrame = {
    var cb = sv.filter(col("vec_id") % stride === 0)
      .select(col("sub"), col("vec_id").as("code"), col("v").as("c"))
    for (_ <- 1 to PqIters) {
      val asn = assignCodes(sv, cb)
      cb = sv.join(asn, Seq("vec_id", "sub"))
        .select(col("sub"), col("code"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .groupBy(col("sub"), col("code"))
        .agg(collect_list(struct(col("pos"),
          round(col("sx").cast("double") / col("cnt")).cast("long").as("cv"))).as("pv"))
        .select(col("sub"), col("code"),
          transform(array_sort(col("pv")), p => p.getField("cv")).as("c"))
    }
    cb.localCheckpoint()
  }

  /** q_pq_recall — recall@10 of PQ-ADC ranking against the EXACT
    * scaled-integer L2 ranking, on the shared seed-disjoint panel
    * ([[Similarity.panelFilter]]) — the row that sits next to
    * q_sq_recall and answers whether the 32× storage cut still returns
    * the right neighbors. Shapes at 100 TB: the codebook and the
    * per-query ADC tables broadcast (Subs·PqK rows each), the corpus
    * side moves only (vec_id, sub, code) triples — 8 small ints per
    * vector — and both rankings are per-qid top-k windows over
    * panel-bounded candidate sets. Fully oracled end to end, training
    * included: every distance is an exact integer. */
  def pqRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val sv = subvecs(e)
    val cb = trainCodebooks(sv, pqStride(n))
    val codes = assignCodes(sv, cb)
    val panelIds = Tables.embeddings(s, d).filter(Similarity.panelFilter(n))
      .select(col("vec_id").as("qid"))
    val psv = broadcast(sv.join(panelIds, sv("vec_id") === panelIds("qid"))
      .select(col("qid"), col("sub"), col("v").as("qv")))
    // per-query ADC table: distance to every (sub, code) centroid
    val dtable = broadcast(psv.join(broadcast(cb), "sub")
      .select(col("qid"), col("sub"), col("code"), d2(col("qv"), col("c")).as("dq")))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("dist").asc, col("vec_id").asc)
    val approx = codes.join(dtable, Seq("sub", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("dq")).as("dist"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 10)
      .select(col("qid"), col("vec_id"), lit(1).as("hit"))
    val exact = sv.join(psv, "sub")
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(d2(col("v"), col("qv"))).as("dist"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 10)
      .select(col("qid"), col("vec_id"))
    Similarity.recallSummary(exact, approx)
  }
}
