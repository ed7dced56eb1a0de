package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Corpus

/** Property check for BPE merge induction: on random two-letter
  * corpora (small alphabet so merges collide and chain), the
  * distributed 3-round plan must agree with a plain in-memory BPE
  * trainer implementing the same contract — frequency-weighted overlap
  * counting, (count desc, lhs asc, rhs asc) rule selection, and
  * value-greedy left-to-right application. */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  private val genWords: Gen[List[String]] = for {
    n <- Gen.choose(1, 8)
    ws <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString)
    reps <- Gen.listOfN(n, Gen.choose(1, 4))
  } yield ws.zip(reps).flatMap { case (w, r) => List.fill(r)(w) }

  private def model(words: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Long, Vector[String])] = words.groupBy(identity).toSeq
      .map { case (w, ws) => (ws.size.toLong, w.split("").toVector) }
    (1 to rounds).flatMap { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (f, syms) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (counts.isEmpty) None
      else {
        val ((l, rr), c) = counts.toSeq
          .sortBy { case ((a, b), cn) => (-cn, a, b) }.head
        vocab = vocab.map { case (f, syms) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (out.nonEmpty && out.last == l && x == rr)
              out(out.length - 1) = l + rr
            else out += x
          }
          (f, out.toVector)
        }
        Some((r, l, rr, c))
      }
    }
  }

  test("distributed 3-round BPE ≡ in-memory trainer on random 2-letter corpora") {
    (1 to 6).foreach { i =>
      val words = genWords.pureApply(Gen.Parameters.default, Seed(i.toLong * 13))
      val dir = fixtureDir("documents" ->
        Seq((1L, words.mkString(" "), "en", "s", 1L))
          .toDF("doc_id", "text", "lang", "source", "n_chars"))
      val got = Corpus.bpeMerges(spark, dir).collect()
        .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3))).toSeq
      val want = model(words, 3)
      assert(got == want, s"case $i: words=$words got=$got want=$want")
    }
  }
}
