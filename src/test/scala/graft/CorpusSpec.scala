package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.Corpus

/** Corpus providers: exclusion predicate pushdown (S2) + derivation
 *  determinism. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("exclusion predicates are pushed into the parquet scan (scanner.rs:21-22)") {
    // Excludes on the RAW documents scan: the filter must reach the source.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .where(!col("source").startsWith("cc"))
    val plan = docs.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("StringStartsWith"),
      s"exclusion not pushed to the scan:\n$plan")
  }

  test("withExcludes drops exactly the excluded prefixes") {
    val all = Corpus.fromDocuments(spark, dir)
    val kept = Corpus.withExcludes(all, Seq("copy/", "lic/")).collect()
    assert(kept.nonEmpty)
    assert(kept.forall { r =>
      val p = r.getAs[String]("path")
      !p.startsWith("copy/") && !p.startsWith("lic/")
    })
    // nothing else was dropped
    val wantCount = all.collect().count { r =>
      val p = r.getAs[String]("path")
      !p.startsWith("copy/") && !p.startsWith("lic/")
    }
    assert(kept.length === wantCount)
  }

  test("corpus derivation is deterministic (same rows on re-read)") {
    val a = Corpus.fromDocuments(spark, dir).collect().map(_.toString).sorted
    val b = Corpus.fromDocuments(spark, dir).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }
}
