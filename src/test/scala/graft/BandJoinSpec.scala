package graft

import org.apache.spark.sql.functions._

import graft.plans.BandJoin.bandJoin

/** Boundary semantics of the custom BandJoinPlan operator — the edges
  * a passing oracle on organic data could get right by luck. */
class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probe(vs: java.lang.Double*) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

  test("lo is inclusive, hi is exclusive") {
    val bands = Seq(("a", 0.0, 100.0), ("b", 100.0, 200.0)).toDF("band", "lo", "hi")
    val r = bandJoin(probe(0.0, 99.999, 100.0, 200.0), bands, "v", "lo", "hi")
      .select(col("id"), col("band")).collect().map(x => (x.getLong(0), x.getString(1)))
    // 0.0 and 99.999 → a; 100.0 lands in b, not a; 200.0 matches nothing
    assert(r.toSet == Set((0L, "a"), (1L, "a"), (2L, "b")))
  }

  test("overlapping bands each emit; the prefix-max walk crosses a low-hi gap") {
    // sorted by lo: (0,1000) spans everything, (10,20) is a short band,
    // (30,40) holds the probe. The backward walk from (30,40) must not
    // stop at (10,20) (hi=20 < 35) — the running max of hi keeps it
    // alive until (0,1000) is found.
    val bands = Seq(("wide", 0.0, 1000.0), ("short", 10.0, 20.0),
      ("mid", 30.0, 40.0)).toDF("band", "lo", "hi")
    val r = bandJoin(probe(35.0), bands, "v", "lo", "hi")
      .select(col("band")).collect().map(_.getString(0))
    assert(r.toSet == Set("wide", "mid"))
  }

  test("null keys and null band edges match nothing; empty build joins empty") {
    val bands = Seq(("a", java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(100.0)),
      ("broken", null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(50.0)))
      .toDF("band", "lo", "hi")
    val r = bandJoin(probe(5.0, null), bands, "v", "lo", "hi")
      .select(col("id"), col("band")).collect().map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSet == Set((0L, "a"))) // null probe row 1 and the broken band drop
    val empty = Seq.empty[(String, Double, Double)].toDF("band", "lo", "hi")
    assert(bandJoin(probe(5.0), empty, "v", "lo", "hi").count() == 0L)
  }

  test("custom operator ≡ declarative theta join on the organic events table") {
    val bands = Seq(("p0", 0.0, 100.0), ("p1", 100.0, 250.0),
      ("p2", 250.0, 500.0), ("p3", 500.0, 1e9)).toDF("band", "lo", "hi")
    val ev = Tables.events(spark, sf("sf0.001")).select(col("value"))
    val custom = bandJoin(ev, bands, "value", "lo", "hi")
      .groupBy("band").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val decl = ev.join(broadcast(bands),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(custom == decl && custom.values.sum > 0)
  }

  test("random overlapping bands: custom operator ≡ in-memory filter model") {
    val rnd = new scala.util.Random(41)
    (1 to 5).foreach { c =>
      val bands = (0 until rnd.nextInt(12) + 1).map { i =>
        val lo = rnd.nextDouble() * 100 - 20   // negatives too
        (s"b$i", lo, lo + rnd.nextDouble() * 60) // arbitrary overlap
      }
      val vs = Seq.fill(rnd.nextInt(40) + 5)(rnd.nextDouble() * 140 - 30)
      val got = bandJoin(probe(vs.map(java.lang.Double.valueOf): _*),
          bands.toDF("band", "lo", "hi"), "v", "lo", "hi")
        .select(col("id"), col("band")).collect()
        .map(x => (x.getLong(0), x.getString(1))).sorted.toSeq
      val want = (for {
        (v, i) <- vs.zipWithIndex
        (b, lo, hi) <- bands if v >= lo && v < hi
      } yield (i.toLong, b)).sorted
      assert(got == want, s"case $c")
    }
  }

  test("the plan runs through BandJoin, not a nested loop") {
    val p = SparkEntry.queries("q_range_join_custom")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString()
    assert(p.contains("BandJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
