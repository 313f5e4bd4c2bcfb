package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Shingles
import graft.operators.TextAnalysis

/** Text-analysis operators vs hand-computed values and the shared token
 *  contract. */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def df(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("rkey", "content")
  }

  test("textStats: counts and ratios on a hand-checked document") {
    val content = "The quick, brown fox; is it 42 for ever?"
    // tokens: the quick brown fox is it 42 for ever (9); stop: the,is,it,for (4)
    val r = TextAnalysis.textStats(df("d1" -> content)).head()
    assert(r.getAs[Long]("n_chars") === content.length.toLong)
    assert(r.getAs[Long]("n_tokens") === 9L)
    assert(r.getAs[Long]("n_alnum") === Shingles.tokenize(content).map(_.length).sum.toLong)
    assert(r.getAs[Double]("stopword_ratio") === 4.0 / 9.0)
    val alnum = r.getAs[Long]("n_alnum").toDouble / content.length
    assert(r.getAs[Double]("quality_score") === 0.4 * alnum + 0.3 * (9.0 / 50.0) + 0.3 * (1.0 - 4.0 / 9.0))
  }

  test("textStats: empty and punctuation-only documents do not divide by zero") {
    val rows = TextAnalysis.textStats(df("e" -> "", "p" -> "?!...;;;"))
      .collect().map(r => r.getAs[String]("rkey") -> r).toMap
    assert(rows("e").getAs[Long]("n_tokens") === 0L)
    assert(rows("e").getAs[Double]("quality_score") === 0.3) // only the (1-stop) term
    assert(rows("p").getAs[Long]("n_alnum") === 0L)
  }

  test("langId: marker voting, tie-break, charset rule, und fallback") {
    val rows = TextAnalysis.langId(df(
      "en" -> "the cat is on the mat and it is fine",
      "de" -> "der hund und die katze das ist gut",
      "es" -> "el perro y la casa de que los gatos",
      "fr" -> "le chien et les chats des amis",
      "zh" -> "你好 world",
      "und" -> "zzz qqq www",
      "tie" -> "the la")) // en=1 es/fr share 'la'=1 → alphabetical: en beats es/fr? de=0 → en
      .collect().map(r => r.getAs[String]("rkey") -> r.getAs[String]("predicted_lang")).toMap
    assert(rows("en") === "en")
    assert(rows("de") === "de")
    assert(rows("es") === "es")
    assert(rows("fr") === "fr")
    assert(rows("zh") === "zh")
    assert(rows("und") === "und")
    assert(rows("tie") === "en")
  }

  test("fingerprint: equals brute-force min md5 gram; shift-invariant") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val base = ("x" * 10) + "the shared long block that dominates the minimum selection process" + ("y" * 10)
    val shifted = "PREFIX-" + base
    val rows = TextAnalysis.fingerprints(df("a" -> base, "b" -> shifted), 48)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val brute = (0 to base.length - 48).map(i => md5hex(base.substring(i, i + 48))).min
    assert(rows("a") === brute)
    // shifted doc contains every gram of base plus 7 more — min can only stay or decrease
    assert(rows("b") <= rows("a"))
  }

  test("short documents are excluded from fingerprints") {
    assert(TextAnalysis.fingerprints(df("s" -> "short"), 48).count() === 0)
  }
}
