package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

/** Library-grade degenerate input: EVERY registry operator must be
  * empty-in → empty-out (or empty-in → defined-aggregate-out), never a
  * crash. The mirror preserves each table's exact schema with zero
  * rows, so schema-dependent paths (k-means training, prefix-sum
  * offsets, sketch finishes, explode/window/grid generation) all
  * execute their empty branches.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    // the legacy flag keeps a TIMESTAMP(NANOS)-vintage events file
    // readable (mirrored as BIGINT nanos); the current timestamp[us]
    // vintage mirrors as TIMESTAMP_NTZ — Tables.normalizeEventTs
    // handles both
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dst = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .filter(lit(false)).coalesce(1)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    dst
  }

  test("every registry query runs on an empty corpus without throwing") {
    val failures = graft.Registry.all.flatMap { q =>
      spark.sharedState.cacheManager.clearCache()
      try { q.fn(spark, emptyDir).count(); None }
      catch {
        case e: Throwable =>
          Some(s"${q.name}: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(failures.isEmpty, s"operators crashed on empty input:\n  ${failures.mkString("\n  ")}")
  }
}
