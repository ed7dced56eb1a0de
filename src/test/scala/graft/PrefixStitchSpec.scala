package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixStitch

/** The consolidated property spec for the driver prefix stitch — the
  * one code path behind gapsIslands' distributed rank and skyline's
  * distributed 2-D maxima sweep (consumer-level both-branch
  * row-identity specs live in AnalyticsSpec). Forces several range
  * layouts (partition counts far from the data's natural one) because
  * the stitch's whole failure mode is a prefix misaligned with the
  * sampled boundaries. */
class PrefixStitchSpec extends SparkSpec {
  import spark.implicits._

  private def withParts[A](parts: Int)(body: => A): A = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("sum-fold: prefix counts lift local ranks to the exact global row_number under any layout") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(200)(rnd.nextInt(50).toLong) // heavy duplicates
    for (parts <- Seq(1, 3, 7, 16)) withParts(parts) {
      val (pinned, prefix) = PrefixStitch.rangePrefix[Long](
        vals.toDF("k"), Seq(col("k")), Seq(count(lit(1))),
        0L, _ + _, _.getLong(1), sortWithin = false)
      // prefix(p) = number of rows strictly before partition p
      val counts = pinned.groupBy(col("pid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var acc = 0L
      for (p <- prefix.indices) {
        assert(prefix(p) == acc, s"parts=$parts pid=$p")
        acc += counts.getOrElse(p, 0L)
      }
      // stitched rank sequence must be exactly 1..n with the globally
      // sorted values attached — an off-by-one at any range boundary
      // duplicates or skips a rank
      val w = Window.partitionBy(col("pid")).orderBy(col("k"))
      val prefixDf = prefix.zipWithIndex
        .map { case (v, p) => (p, v) }.toSeq.toDF("pid", "before")
      val got = pinned.withColumn("lrn", row_number().over(w))
        .join(broadcast(prefixDf), "pid")
        .select(col("k"), (col("before") + col("lrn")).as("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
      assert(got.map(_._2).toSeq == (1L to vals.size.toLong), s"parts=$parts")
      assert(got.map(_._1).toSeq == vals.sorted, s"parts=$parts")
    }
  }

  test("max-fold: strict prefix max over DESC ranges; empty partitions fold as identity") {
    val rnd = new scala.util.Random(13)
    val vals = Seq.fill(120)(math.floor(rnd.nextDouble() * 1000) / 10)
    for (parts <- Seq(2, 5, 11)) withParts(parts) {
      val (pinned, prefix) = PrefixStitch.rangePrefix[Double](
        vals.toDF("v"), Seq(col("v").desc), Seq(max(col("v"))),
        Double.NegativeInfinity, math.max, _.getDouble(1),
        sortWithin = true)
      val rows = pinned.collect().map(r => (r.getDouble(0), r.getInt(1)))
      for (p <- prefix.indices) {
        val before = rows.filter(_._2 < p).map(_._1)
        val want = if (before.isEmpty) Double.NegativeInfinity else before.max
        assert(prefix(p) == want, s"parts=$parts pid=$p")
      }
      // sortWithin contract: each partition streams in key order, so a
      // consumer's single forward sweep sees its range sorted
      val sortedWithin = pinned.select(col("v"), col("pid"))
        .as[(Double, Int)].mapPartitions { it =>
          val a = it.map(_._1).toArray
          Iterator.single(a.sameElements(a.sorted(Ordering[Double].reverse)))
        }.collect().forall(x => x)
      assert(sortedWithin, s"parts=$parts")
    }
  }

  test("degenerate inputs: empty relation and single row produce coherent prefixes") {
    withParts(4) {
      val (pEmpty, prEmpty) = PrefixStitch.rangePrefix[Long](
        Seq.empty[Long].toDF("k"), Seq(col("k")), Seq(count(lit(1))),
        0L, _ + _, _.getLong(1), sortWithin = false)
      assert(pEmpty.count() == 0L)
      assert(prEmpty.forall(_ == 0L))
      val (pOne, prOne) = PrefixStitch.rangePrefix[Long](
        Seq(42L).toDF("k"), Seq(col("k")), Seq(count(lit(1))),
        0L, _ + _, _.getLong(1), sortWithin = false)
      assert(pOne.count() == 1L)
      // monotone 0 → 1 step exactly at the row's partition
      assert(prOne.head == 0L && prOne.max <= 1L && prOne.sorted.sameElements(prOne))
    }
  }
}
