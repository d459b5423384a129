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

  test("parquetMerged unions evolving schemas; default read would drop the new column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // generation 1: (id, v); generation 2 adds `tag`
    Seq((1L, 10.0)).toDF("id", "v").write.parquet(s"$dir/g=1")
    Seq((2L, 20.0, "new")).toDF("id", "v", "tag").write.parquet(s"$dir/g=2")
    val merged = Sources.parquetMerged(spark, dir)
    assert(merged.columns.toSet == Set("id", "v", "tag", "g"))
    val byId = merged.collect().map(r => r.getLong(0) -> Option(r.getAs[String]("tag"))).toMap
    assert(byId == Map(1L -> None, 2L -> Some("new"))) // old files null-fill
  }

  test("xml source round-trip (native Spark 4 XML), attributes and nesting") {
    val dir = Files.createTempDirectory("graft-sources").toString
    val path = s"$dir/t.xml"
    Files.writeString(java.nio.file.Paths.get(path),
      """<rows><row id="1"><name>alpha</name><m><k>7</k></m></row>""" +
        """<row id="2"><name>beta &amp; co</name><m><k>9</k></m></row></rows>""")
    val df = Sources.xml(spark, path, "row",
      Some("_id BIGINT, name STRING, m STRUCT<k: BIGINT>"))
    assert(df.count() == 2)
    val beta = df.where("_id = 2").selectExpr("name", "m.k").head()
    assert(beta.getString(0) == "beta & co") // entity decoded by the parser
    assert(beta.getLong(1) == 9L)
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
