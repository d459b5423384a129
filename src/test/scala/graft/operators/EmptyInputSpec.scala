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
    // events.parquet is TIMESTAMP(NANOS) — unreadable without the
    // legacy flag (same normalization Tables.events applies); the
    // mirror then carries the ts column as BIGINT nanos, which
    // Tables.events' `ts div 1000` handles identically
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
