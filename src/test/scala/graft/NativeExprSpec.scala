package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.functions.{GraftFunctions, NativeExprs, Shingles}
import graft.operators.Substring

/** Native codegen expressions: bit parity with the UDF path, SQL-function
 *  registration, and the plan staying inside whole-stage codegen with no
 *  ScalaUDF boundary. */
class NativeExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private lazy val corpus = Corpus.synthetic(spark, 200, seed = 17L).toDF()

  test("graft_shingles / graft_rolling_fp match the UDF path bit-for-bit") {
    val shingleUdf = udf((c: String) => Shingles.shingleHashes(c, 5))
    val rollUdf = udf((c: String) => Substring.rollingFingerprints(c, 48, 63L))
    val minhashUdf = udf((sh: Array[Long]) => Shingles.minhashSignature(sh, 128))
    val bandUdf = udf((sig: Array[Long]) => Shingles.bandHashes(sig, 64, 2))
    val both = corpus.select(
      NativeExprs.shingleHashes(col("content"), 5).as("sn"),
      shingleUdf(col("content")).as("su"),
      NativeExprs.rollingFingerprints(col("content"), 48, 63L).as("rn"),
      rollUdf(col("content")).as("ru"))
      .withColumn("mn", NativeExprs.minhash(col("sn"), 128))
      .withColumn("mu", minhashUdf(col("su")))
      .withColumn("bn", NativeExprs.bandHashes(col("mn"), 64, 2))
      .withColumn("bu", bandUdf(col("mu")))
    val bad = both.where(col("sn") =!= col("su") || col("rn") =!= col("ru") ||
      col("mn") =!= col("mu") || col("bn") =!= col("bu")).count()
    assert(bad === 0L)
    assert(both.count() >= 200L) // synthetic(200) plants extra duplicate rows
  }

  test("ALL seven native functions are SQL-registered and evaluate (registry + extensions)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_shingles('a b c d e f g', 5) AS s, graft_rolling_fp('" +
        ("x" * 60) + "', 48, 0) AS f, " +
        "graft_dotl(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d, " +
        "graft_intersect_n(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS i, " +
        "graft_minhash(graft_shingles('a b c d e f g', 5), 16) AS m, " +
        "graft_bands(graft_minhash(graft_shingles('a b c d e f g', 5), 16), 8, 2) AS b, " +
        "graft_xxh3_64('') AS x3").collect().head
    assert(r.getSeq[Long](0) === Shingles.shingleHashes("a b c d e f g", 5).toSeq)
    assert(r.getSeq[Long](1) === Substring.rollingFingerprints("x" * 60, 48, 0L).toSeq)
    assert(r.getLong(2) === (4L + 10L + 18L))
    assert(r.getLong(3) === 2L)
    assert(r.getSeq[Long](4) ===
      Shingles.minhashSignature(Shingles.shingleHashes("a b c d e f g", 5), 16).toSeq)
    assert(r.getSeq[Long](5) ===
      Shingles.bandHashes(
        Shingles.minhashSignature(Shingles.shingleHashes("a b c d e f g", 5), 16), 8, 2).toSeq)
    assert(r.getLong(6) === 0x2D06800538D394C2L)
    // the extension injector draws from the SAME function list — the two
    // surfaces cannot drift (round-2 finding: only 2 of 5 were registered)
    assert(graft.functions.NativeExprs.sqlFunctions.map(_._1.funcName).sorted ===
      Seq("graft_bands", "graft_dotl", "graft_intersect_n", "graft_minhash",
        "graft_rolling_fp", "graft_shingles", "graft_xxh3_64"))
    val ext = new graft.functions.GraftExtensions
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }

  test("projection stays inside whole-stage codegen — no UDF boundary in the plan") {
    val df = corpus.select(
      NativeExprs.shingleHashes(col("content"), 5).as("s"),
      NativeExprs.rollingFingerprints(col("content"), 48, 63L).as("f"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"UDF boundary leaked into:\n$plan")
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l => l.trim.matches("""\*\(\d+\) Project \[graft_shingles.*""")),
      s"projection not inside a codegen stage:\n$plan")
    // and codegen actually compiles (evaluation succeeds, non-degenerate)
    assert(df.where(size(col("s")) > 0).count() > 0)
  }
}
