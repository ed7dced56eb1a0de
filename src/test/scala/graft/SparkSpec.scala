package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + fixture helpers for the engine's specs (one JVM-wide
  * session via getOrCreate; Test/fork gives the suite its own JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // all suites share one JVM-wide session via getOrCreate, so the
    // extensions must ride on the shared builder
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  /** Writes crafted per-table DataFrames as `<tmp>/<name>.parquet` so the
    * operator library (which reads `Tables`) can run on fixture data. */
  def fixtureDir(tables: (String, DataFrame)*): String = {
    val dir = Files.createTempDirectory("graft_fixture").toString
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  def sf(name: String) = s"/root/testdata/$name"
}
