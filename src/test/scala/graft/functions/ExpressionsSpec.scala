package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native expression kernels vs their HOF reference formulations. */
class ExpressionsSpec extends SparkSpec {

  test("vec_dot is bit-identical to the aggregate/zip_with fold") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, 0.6)),
      (Seq.fill(64)(0.123), Seq.fill(64)(-0.456)))
      .toDF("a", "b")
    val rows = df.select(
      expr("vec_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)").as("hof"))
      .collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("vec_dot known value") {
    import spark.implicits._
    val r = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(expr("vec_dot(a, b)")).head()
    assert(r.getDouble(0) == 11.0)
  }

  test("simhash64 matches the HOF bit-vote formulation") {
    import spark.implicits._
    val df = Seq(
      Seq("hash", "table", "row", "scan"),
      Seq("one"),
      Seq("a", "b", "c", "a", "b", "c", "d"))
      .toDF("toks")
    val rows = df.select(
      expr("simhash64(toks)").as("native"),
      expr(
        """aggregate(sequence(0, 63), 0L, (f, b) -> f + IF(
          |  aggregate(toks, 0L, (acc, t) ->
          |    acc + IF((shiftright(xxhash64(t), b) & 1) = 1, 1L, -1L)) > 0,
          |  shiftleft(1L, b), 0L))""".stripMargin).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("simhash64: similar token sets have small hamming distance") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i")
    val similar = base.updated(5, "CHANGED")
    val dissimilar = (1 to 40).map(i => s"other$i")
    val df = Seq((base, similar, dissimilar)).toDF("a", "b", "c")
      .select(
        expr("bit_count(simhash64(a) ^ simhash64(b))").as("near"),
        expr("bit_count(simhash64(a) ^ simhash64(c))").as("far"))
    val r = df.head()
    assert(r.getInt(0) < r.getInt(1))
    assert(r.getInt(0) <= 12)
  }

  test("rolling_hash matches the per-character HOF fold") {
    import spark.implicits._
    val df = Seq("hello world", "", "a", "key agg row scan", "x" * 500)
      .toDF("text")
    val rows = df.select(
      expr("rolling_hash(text, 31L, 1000000007L)").as("native"),
      expr("aggregate(sequence(1, length(text)), 0L, (h, i) -> (h * 31 + ascii(substring(text, i, 1))) % 1000000007)").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("shingle_hashes matches the split/transform/array_distinct/xxhash64 pipeline") {
    graft.functions.GraftFunctions.register(spark)
    for (n <- Seq(3, 5)) {
      val lam = (1 to n).map(j => s"element_at(toks, i + ${j - 1})").mkString(", ")
      val hof = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .withColumn("toks", split(col("text"), " "))
        .where(size(col("toks")) >= n)
        .select(col("doc_id"), explode(expr(
          s"array_distinct(transform(sequence(1, size(toks) - ${n - 1}), i -> concat_ws(' ', $lam)))")).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("g"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val native = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"), explode(expr(s"shingle_hashes(text, $n)")).as("g"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(native == hof && native.nonEmpty, s"n=$n")
    }
  }

  test("shingle_hashes edge cases: short text, repeated grams, consecutive spaces, null") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq("a b", "a b c a b c a b c", "a  b c", null)
      .toDF("text")
      .select(expr("shingle_hashes(text, 3)").as("hs"))
      .collect()
    assert(rows(0).getSeq[Long](0).isEmpty)          // 2 tokens < n
    assert(rows(1).getSeq[Long](0).size == 3)        // 7 windows, 3 distinct grams
    // "a  b c" splits to ["a","","b","c"] -> grams "a  b" and " b c"
    assert(rows(2).getSeq[Long](0).size == 2)
    assert(rows(3).isNullAt(0))                      // null in, null out
  }

  test("shingle_hashes property: equals HOF pipeline on random unicode texts") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // multi-byte UTF-8, runs of spaces, empty tokens — the cases the
    // byte-scan must get right
    val tokGen = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("é", "ü", "日", "本", "𝕏", "ß", "λ"),
      1 -> Gen.oneOf("\t", ",", "\""))).map(_.mkString)
    val textGen = Gen.listOf(tokGen).map(_.mkString(" "))
    val texts = (0 until 300).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(7L + i)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val hof = df
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 3)
      .select(col("id"), explode(expr(
        "array_distinct(transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))")).as("g"))
      .select(col("id"), xxhash64(col("g")).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = df
      .select(col("id"), explode(expr("shingle_hashes(text, 3)")).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == hof && native.nonEmpty)
  }

  test("shingle_polyhashes equals the rolling_hash-composed gram pipeline on random unicode") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val tokGen = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("é", "ü", "日", "本", "𝕏", "ß", "λ"),
      1 -> Gen.oneOf("\t", ",", "\""))).map(_.mkString)
    val textGen = Gen.listOf(tokGen).map(_.mkString(" "))
    val texts = (0 until 300).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(11L + i)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // independent formulation: materialize gram STRINGS, hash each with
    // the rolling_hash kernel (itself pinned to its HOF fold above),
    // combine h1·2³¹+h2 — must equal the one-pass byte-scan kernel
    val composed = df
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 3)
      .select(col("id"), explode(expr(
        "array_distinct(transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))")).as("g"))
      .select(col("id"), expr(
        "rolling_hash(g, 31L, 1000000007L) * 2147483648L + rolling_hash(g, 131L, 998244353L)").as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = df
      .select(col("id"), explode(expr("shingle_polyhashes(text, 3)")).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == composed && native.nonEmpty)
  }

  test("simhash_poly equals the rolling_hash-composed vote pipeline on random unicode") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val textGen = Gen.listOf(Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("é", "日", "𝕏", "ß"))).map(_.mkString)).map(_.mkString(" "))
    val texts = (0 until 200).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(13L + i)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // independent formulation: per-token rolling hashes → one
    // multiply/xor-fold mix round each → explicit per-bit ±1 vote
    // aggregation → sign fingerprint
    val (m1, m2) = (SimHashPoly.M1, SimHashPoly.M2)
    val composed = df
      .select(col("id"), explode(split(col("text"), " ")).as("t"))
      .select(col("id"),
        expr("rolling_hash(t, 31L, 1000000007L)").as("h1"),
        expr("rolling_hash(t, 131L, 998244353L)").as("h2"))
      .select(col("id"),
        expr(s"((($m1 * h1) % 2147483648L) ^ (($m1 * h1) div 2147483648L)) % 2147483648L").as("y1"),
        expr(s"((($m2 * h2) % 2147483648L) ^ (($m2 * h2) div 2147483648L)) % 2147483648L").as("y2"))
      .select(col("id"), col("y1"), col("y2"), explode(expr("sequence(0, 59)")).as("b"))
      .withColumn("v", expr(
        "IF((IF(b < 30, shiftright(y1, b), shiftright(y2, b - 30)) & 1) = 1, 1, -1)"))
      .groupBy("id", "b").agg(sum("v").as("v"))
      .groupBy("id").agg(expr("sum(IF(v > 0, shiftleft(1L, b), 0L))").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = df
      .withColumn("toks", split(col("text"), " "))
      .select(col("id"), expr("simhash_poly(toks)").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed && native.nonEmpty)
  }

  test("poly_pair equals the 1-token shingle kernel, keeps multiplicity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // on a single-token string, poly_pair IS shingle_polyhashes(_, 1)
    val toks = Seq("batch", "window", "spark", "日本語", "a b".replace(" ", ""))
      .toDF("w")
    val pairs = toks
      .select(expr("poly_pair(w)").as("h"),
        element_at(expr("shingle_polyhashes(w, 1)"), 1).as("hk"))
      .collect()
    pairs.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // the shingle kernel dedups; exploded poly_pair keeps multiplicity
    val doc = Seq("x y x").toDF("text")
    assert(doc.select(size(expr("shingle_polyhashes(text, 1)"))).head.getInt(0) == 2)
    assert(doc.select(explode(split(col("text"), " ")).as("w"))
      .select(expr("poly_pair(w)")).count() == 3)
  }

  test("functions are injected via GraftExtensions (no manual register)") {
    // SparkSpec builds the session with spark.sql.extensions; the
    // expressions above resolving at all proves injection, but check
    // the catalog-level lookup path too.
    assert(spark.sql("SELECT vec_dot(array(1D), array(2D))").head().getDouble(0) == 2.0)
  }
}
