package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.XXHash64

/** Bit-parity of the pure-Scala XXH64 against Spark's built-in `xxhash64`
 *  (XXH64, seed 42, over UTF-8 bytes) — proves driver/executor-side hashing
 *  is the same function end to end. */
class XXHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("XXHash64.hashString matches Spark's xxhash64 built-in") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val samples = Seq("", "a", "abc", "0123456789abcdef", "x" * 31, "y" * 32,
      "z" * 100, "token stream with spaces \n and newlines") ++
      (1 to 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(300)).mkString)
    val df = samples.toDF("s").select(col("s"), xxhash64(col("s")).as("h")).collect()
    df.foreach { r =>
      assert(XXHash64.hashString(r.getString(0), 42L) === r.getLong(1),
        s"mismatch for '${r.getString(0).take(40)}'")
    }
  }

  test("hash is stable across offsets and seeds") {
    val b = "hello world, a deterministic buffer for slicing".getBytes("UTF-8")
    val full = XXHash64.hash(b, 0, b.length, 0L)
    val sliced = XXHash64.hash(("XX" + new String(b, "UTF-8") + "YY").getBytes("UTF-8"), 2, 2 + b.length, 0L)
    assert(full === sliced)
    assert(XXHash64.hash(b, 1L) !== XXHash64.hash(b, 2L))
  }
}
