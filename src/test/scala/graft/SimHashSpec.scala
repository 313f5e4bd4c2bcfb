package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.functions.Shingles
import graft.operators.{ExactDedup, NearDup}

/** SimHash block-join pairs vs a brute-force Hamming-distance oracle
 *  (Manku et al. pigeonhole decomposition must have recall 1 by construction). */
class SimHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("simhash pairs at Hamming<=3 match brute force exactly") {
    val corpus = Corpus.synthetic(spark, 250, seed = 3L)
    val local = corpus.collect()
    val sketches = local.map(f => s"${f.repo}/${f.path}" -> Shingles.simhash64(f.content))
    val oracle = (for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
      d = java.lang.Long.bitCount(sketches(i)._2 ^ sketches(j)._2)
      if d <= 3
    } yield {
      val (a, b) = if (sketches(i)._1 < sketches(j)._1) (sketches(i)._1, sketches(j)._1)
                   else (sketches(j)._1, sketches(i)._1)
      (a, b, d)
    }).toSet

    val df = ExactDedup.validRows(corpus.toDF())
      .withColumn("rkey", ExactDedup.rkey)
    val got = NearDup.simhashPairs(NearDup.simhashes(df), maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === oracle)
  }
}
