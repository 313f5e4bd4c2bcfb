package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Textformat

/** Golden-file + round-trip tests for the snapshot text serializer
 *  (textformat.rs parity: header, group ordering by keeper size desc,
 *  member ordering, all three action markers). */
class TextformatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def snapDF() = {
    import spark.implicits._
    Seq(
      // group A: two small files
      ("aa11", "r1/a.txt", 3L, "keep", null.asInstanceOf[String]),
      ("aa11", "r1/b.txt", 3L, "symlink", "r1/a.txt"),
      // group B: bigger files → must render first
      ("bb22", "r2/x.txt", 100L, "keep", null.asInstanceOf[String]),
      ("bb22", "r2/y.txt", 100L, "delete", null.asInstanceOf[String]),
      ("bb22", "r2/z.txt", 100L, "symlink", null.asInstanceOf[String]))
      .toDF("group_id", "rkey", "size", "action", "symlink_source")
  }

  private val golden = Seq(
    "#! rootdir: /corpus",
    "#! generated_at: Thu, 01 Jan 2026 00:00:00 +0000",
    "",
    "[bb22]",
    "keep r2/x.txt",
    "delete r2/y.txt",
    "symlink r2/z.txt",
    "",
    "[aa11]",
    "keep r1/a.txt",
    "symlink r1/b.txt -> r1/a.txt",
    "")

  test("render matches the golden snapshot (ordering + markers + header)") {
    val got = Textformat.render(snapDF(), "/corpus", "Thu, 01 Jan 2026 00:00:00 +0000")
    assert(got === golden)
  }

  test("parse round-trips render") {
    val (meta, rows) = Textformat.parse(golden)
    assert(meta === Map("rootdir" -> "/corpus",
      "generated_at" -> "Thu, 01 Jan 2026 00:00:00 +0000"))
    assert(rows === Seq(
      ("bb22", "r2/x.txt", "keep", None),
      ("bb22", "r2/y.txt", "delete", None),
      ("bb22", "r2/z.txt", "symlink", None),
      ("aa11", "r1/a.txt", "keep", None),
      ("aa11", "r1/b.txt", "symlink", Some("r1/a.txt"))))
  }

  test("parse rejects malformed input like the reference") {
    intercept[IllegalArgumentException] { Textformat.parse(Seq("keep orphan.txt")) }
    intercept[IllegalArgumentException] { Textformat.parse(Seq("[aa]", "symlink a -> b -> c")) }
    intercept[IllegalArgumentException] { Textformat.parse(Seq("???")) }
  }

  test("comments and blanks are ignored") {
    val (_, rows) = Textformat.parse(Seq("# a comment", "", "[ff]", "keep p"))
    assert(rows === Seq(("ff", "p", "keep", None)))
  }
}
