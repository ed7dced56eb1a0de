package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Corpus

/** Property check for interpolated Kneser-Ney: on random small-alphabet
  * corpora (two-letter words so bigram keys collide and continuation
  * counts differ from raw counts), the distributed plan must agree with
  * a plain in-memory model computing the same formula with the same
  * IEEE operand order — and the smoothed distribution must satisfy the
  * KN mass invariant: Σ over SEEN (w1, ·) bigrams of P_KN ≤ 1 per w1
  * (equality iff every continuation word co-occurs with w1), with every
  * probability in (0, 1]. */
class KnPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genDocs: Gen[List[List[String]]] = for {
    nd <- Gen.choose(1, 3)
    docs <- Gen.listOfN(nd, for {
      n <- Gen.choose(2, 10)
      ws <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 2)
        cs <- Gen.listOfN(len, Gen.oneOf('x', 'y'))
      } yield cs.mkString)
    } yield ws)
  } yield docs

  /** The engine's arithmetic, replicated operand-for-operand. */
  private def model(docs: Seq[Seq[String]]): Seq[(String, String, Long, Double)] = {
    val grams = docs.filter(_.size >= 2).flatMap(ts => ts.zip(ts.tail))
    val big = grams.groupBy(identity).map { case (g, xs) => (g, xs.size.toLong) }
    val uni = grams.groupBy(_._1).map { case (w, xs) => (w, xs.size.toLong) }
    val t1 = big.keys.toSeq.groupBy(_._1).map { case (w, xs) => (w, xs.size.toLong) }
    val t2 = big.keys.toSeq.groupBy(_._2).map { case (w, xs) => (w, xs.size.toLong) }
    val tall = big.size.toLong
    big.toSeq
      .map { case ((w1, w2), c12) =>
        val p = math.max(c12.toDouble - 0.75, 0.0) / uni(w1) +
          0.75 * t1(w1).toDouble / uni(w1) * (t2(w2).toDouble / tall)
        (w1, w2, c12,
          BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (w1, w2, c12, _) => (-c12, w1, w2) }
      .take(50)
  }

  test("distributed KN ≡ in-memory model on random 2-letter corpora; per-context mass ≤ 1") {
    (1 to 6).foreach { i =>
      val docs = genDocs.pureApply(Gen.Parameters.default, Seed(i.toLong * 29))
      val dir = fixtureDir("documents" ->
        docs.zipWithIndex
          .map { case (ws, j) => (j.toLong, ws.mkString(" "), "en", "s", 1L) }
          .toDF("doc_id", "text", "lang", "source", "n_chars"))
      val got = Corpus.bigramKn(spark, dir).collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3))).toSeq
      val want = model(docs.map(_.toSeq))
      assert(got == want, s"case $i: docs=$docs got=$got want=$want")
      got.foreach { case (_, _, _, p) => assert(p > 0.0 && p <= 1.0 + 1e-9, p) }
      got.groupBy(_._1).foreach { case (w1, rows) =>
        // seen-pair mass never exceeds the full smoothed distribution's 1
        assert(rows.map(_._4).sum <= 1.0 + 1e-6, s"w1=$w1 rows=$rows")
      }
    }
  }
}
