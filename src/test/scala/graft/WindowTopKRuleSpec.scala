package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The row_number-filter → TopKPerKeyPlan auto-rewrite: shape,
  * semantics, and — just as important — the cases it must NOT touch. */
class WindowTopKRuleSpec extends SparkSpec {
  import spark.implicits._

  /** The suites share one JVM-wide session, so the flag must never
    * leak past a test — every rewrite check runs inside this. */
  private def withRewrite[A](body: => A): A = {
    spark.conf.set("spark.graft.topkRewrite", "true")
    try body finally spark.conf.unset("spark.graft.topkRewrite")
  }

  test("the rewrite is opt-in: with the flag off the window plan is untouched") {
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(!planOf(q).contains("TopKPerKey"), planOf(q))
  }

  private def df: DataFrame =
    Seq(("a", 5, 1), ("a", 3, 2), ("a", 9, 3), ("a", 1, 4),
      ("b", 7, 5), ("b", 2, 6)).toDF("k", "v", "id")

  private val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)

  private def planOf(d: DataFrame): String =
    d.queryExecution.executedPlan.toString()

  test("rn <= k rewrites to the bounded-heap operator and keeps the answer") {
    withRewrite {
      val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      val p = planOf(q)
      assert(p.contains("TopKPerKey"), p)
      assert(!p.contains("WindowExec") && !p.contains("RunningWindowFunction"), p)
      val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(3))).toSet
      assert(got == Set(("a", 9, 1), ("a", 5, 2), ("b", 7, 1), ("b", 2, 2)))
    }
  }

  test("a residual conjunct survives above the rewrite") {
    withRewrite {
      val q = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2 && col("v") > 4)
      assert(planOf(q).contains("TopKPerKey"), planOf(q))
      val got = q.collect().map(r => (r.getString(0), r.getInt(1))).toSet
      assert(got == Set(("a", 9), ("a", 5), ("b", 7))) // (b,2) cut by v > 4
    }
  }

  test("rn = 1 is the k=1 rewrite") {
    withRewrite {
      val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      assert(planOf(q).contains("TopKPerKey"), planOf(q))
      assert(q.collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
        Set(("a", 9), ("b", 7)))
    }
  }

  test("rank() and an unpartitioned row_number are left to WindowExec") {
    withRewrite {
      val ranked = df.withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
      assert(!planOf(ranked).contains("TopKPerKey"), planOf(ranked))
      val global = df.withColumn("rn",
          row_number().over(Window.orderBy(col("v").desc)))
        .filter(col("rn") <= 2)
      assert(!planOf(global).contains("TopKPerKey"), planOf(global))
      // and both still answer correctly through the window path
      assert(ranked.count() == 4L && global.count() == 2L)
    }
  }

  test("an unfiltered row_number is untouched") {
    withRewrite {
      val q = df.withColumn("rn", row_number().over(w))
      assert(!planOf(q).contains("TopKPerKey"), planOf(q))
      assert(q.count() == 6L)
    }
  }
}
