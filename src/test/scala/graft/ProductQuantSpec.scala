package graft

import graft.operators.ProductQuant

/** Randomized + boundary model-twin checks for the PQ training chain —
  * the same rigor the IVF family gets from OperatorsSpec's
  * trained-centroid twins: a driver-side Scala reimplementation of the
  * FULL pipeline (scaling, subvectors, stride seeding, the Lloyd's
  * round, coding, ADC ranking, the exact side) must reproduce the
  * DataFrame chain's recall row bit for bit. Every distance is an
  * exact integer, so the twin needs no epsilon anywhere. */
class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = 64

  /** HALF_UP long on the 1e6 grid — Spark's round(x·1e6).cast(long). */
  private def scl(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def subs(v: Seq[Float]): Seq[Seq[Long]] =
    v.map(f => scl(f.toDouble)).grouped(ProductQuant.DSub).toSeq

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Model twin of the trained codebooks + final coding: stride seeds,
    * PqIters Lloyd's rounds (argmin (d2, code) assignment, HALF_UP
    * integer recenter, dropped empty codes), then the final argmin. */
  private def pqModel(vecs: Seq[(Long, Seq[Float])])
      : (Int, Long, Long, Long, Double) = {
    val n = vecs.size.toLong
    val stride = ProductQuant.pqStride(n)
    val sv: Seq[(Long, Int, Seq[Long])] = vecs.flatMap { case (id, v) =>
      subs(v).zipWithIndex.map { case (s, i) => (id, i, s) }
    }
    var cb: Map[Int, Seq[(Long, Seq[Long])]] =
      sv.filter(_._1 % stride == 0)
        .groupBy(_._2).map { case (sub, rows) =>
          sub -> rows.map { case (id, _, s) => (id, s) }
        }
    def assign(sub: Int, v: Seq[Long]): Long =
      cb(sub).map { case (code, c) => (d2(v, c), code) }.min._2
    for (_ <- 1 to ProductQuant.PqIters) {
      cb = sv.groupBy { case (id, sub, v) => (sub, assign(sub, v)) }
        .toSeq.map { case ((sub, code), members) =>
          val cnt = members.size
          val c = (0 until ProductQuant.DSub).map { i =>
            val sx = members.map(_._3(i)).sum
            BigDecimal(sx.toDouble / cnt)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          }
          (sub, (code, c))
        }.groupBy(_._1).map { case (sub, rows) => sub -> rows.map(_._2) }
    }
    val codes: Map[(Long, Int), Long] =
      sv.map { case (id, sub, v) => (id, sub) -> assign(sub, v) }.toMap
    val cbMap: Map[(Int, Long), Seq[Long]] =
      cb.toSeq.flatMap { case (sub, rows) =>
        rows.map { case (code, c) => (sub, code) -> c }
      }.toMap
    // the shared seed-disjoint panel (Similarity.panelFilter semantics)
    val panel = vecs.filter { case (id, _) =>
      id % operators.Similarity.panelStride(n) == operators.Similarity.PanelOffset &&
        id % operators.Similarity.ivfStride(n) != 0
    }
    var nx = 0L; var nh = 0L
    panel.foreach { case (qid, qv) =>
      val qsubs = subs(qv)
      val exact = vecs.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, subs(v).zip(qsubs).map { case (a, b) => d2(a, b) }.sum)
        }
        .sortBy { case (id, dist) => (dist, id) }.take(10).map(_._1).toSet
      val approx = vecs.filter(_._1 != qid)
        .map { case (id, _) =>
          (id, (0 until ProductQuant.Subs).map { sub =>
            d2(qsubs(sub), cbMap((sub, codes((id, sub)))))
          }.sum)
        }
        .sortBy { case (id, dist) => (dist, id) }.take(10).map(_._1).toSet
      nx += exact.size; nh += exact.intersect(approx).size
    }
    (10, panel.size.toLong, nx, nh,
      BigDecimal(nh.toDouble / nx).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  private def runPq(vecs: Seq[(Long, Seq[Float])]): (Int, Long, Long, Long, Double) = {
    val dir = fixtureDir("embeddings" ->
      vecs.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label"))
    val r = ProductQuant.pqRecall(spark, dir).collect().head
    (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("pqRecall: randomized corpus matches the driver-side model twin exactly") {
    val rnd = new scala.util.Random(41)
    val vecs: Seq[(Long, Seq[Float])] = (0L until 120L).map { id =>
      id -> Seq.fill(Dims)((rnd.nextInt(2001) - 1000) / 1000f)
    }
    // 120 ids → stride 50: seeds {0,50,100}, panel {17,67,117}
    val want = pqModel(vecs)
    assert(want._2 == 3L)
    assert(runPq(vecs) == want)
  }

  test("pqRecall boundary: a corpus of exact codebook prototypes is lossless — recall 1.0") {
    val rnd = new scala.util.Random(7)
    val protos = Seq.fill(3)(Seq.fill(Dims)((rnd.nextInt(2001) - 1000) / 1000f))
    // seeds 0/50/100 carry the three prototypes; everyone else copies
    // one — every vector IS its centroid after training, so ADC
    // distances equal exact distances and the ranking is identical
    val vecs: Seq[(Long, Seq[Float])] = (0L until 120L).map { id =>
      id -> protos((id % 3).toInt match {
        case _ if id == 0L => 0
        case _ if id == 50L => 1
        case _ if id == 100L => 2
        case m => m
      })
    }
    val got = runPq(vecs)
    assert(got == pqModel(vecs))
    assert(got._5 == 1.0)
  }
}
