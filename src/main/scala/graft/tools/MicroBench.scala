// Scratch micro-benchmark (not part of the library build: lives under
// tools/, compiled ad hoc) — quantifies the determinism tax of the
// decimal-sum scheme vs raw double sums vs scaled-long sums.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    li.cache().count()

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        if (i == 3) println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    time("double") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
    }
    time("decimal") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 4))),
          sum(col("l_extendedprice").cast(DecimalType(18, 4))),
          sum(col("l_extendedprice").cast(DecimalType(12, 4)) *
            (lit(1.0) - col("l_discount")).cast(DecimalType(12, 4))))
    }
    time("scaled-long") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(floor(col("l_quantity") * 10000 + 0.5)),
          sum(floor(col("l_extendedprice") * 10000 + 0.5)),
          sum(floor(col("l_extendedprice") * 10000 + 0.5) *
            floor((lit(1.0) - col("l_discount")) * 10000 + 0.5)))
    }
    spark.stop()
  }
}
