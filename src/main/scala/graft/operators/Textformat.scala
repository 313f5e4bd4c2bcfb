package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Optional parity serializer for the reference's snapshot *text format*
 * (textformat.rs): the human-editable wire form of a snapshot —
 *
 * {{{
 * #! rootdir: <path>
 * #! generated_at: <RFC2822>
 *
 * [<group hash>]
 * keep <path>
 * symlink <path> [-> <source>]
 * delete <path>
 * }}}
 *
 * Groups are ordered by keeper size descending (textformat.rs:185-199 —
 * "prioritize big wins", CHANGELOG.md:7-10), members lexicographically
 * (snapshot/mod.rs:49-53 Ord). The canonical engine sink is the snapshot
 * *table*; this serializer exists for golden-file parity tests and human
 * review of small snapshots — it collects to the driver by design and is
 * not a distributed sink.
 */
object Textformat {

  /** Metadata line `#! k: v` (textformat.rs:28-49). */
  private def meta(k: String, v: String) = s"#! $k: $v"

  /** F4 — RFC2822 timestamp codec (textformat.rs:222 `to_rfc2822`,
   *  textformat.rs:279 `parse_from_rfc2822`): chrono renders e.g.
   *  `Tue, 1 Jul 2003 10:52:37 +0200` — day unpadded, numeric offset
   *  (never `GMT`), English names. */
  private val Rfc2822 = java.time.format.DateTimeFormatter
    .ofPattern("EEE, d MMM yyyy HH:mm:ss Z", java.util.Locale.US)

  def formatRfc2822(t: java.time.OffsetDateTime): String = t.format(Rfc2822)

  /** Parse-or-throw (the reference's parse fails on a bad timestamp). */
  def parseRfc2822(s: String): java.time.OffsetDateTime =
    java.time.OffsetDateTime.parse(s, Rfc2822)

  /** F8 — human-readable byte size (snapshot/mod.rs:161, executor.rs:161
   *  via the `size` crate): binary units, two decimals above bytes. */
  def humanBytes(n: Long): String = {
    val units = Array("B", "KiB", "MiB", "GiB", "TiB", "PiB")
    var v = n.toDouble
    var u = 0
    while (v >= 1024.0 && u < units.length - 1) { v /= 1024.0; u += 1 }
    if (u == 0) s"$n B" else f"$v%.2f ${units(u)}"
  }

  /**
   * Render a snapshot DataFrame (`group_id, rkey, size, action,
   * symlink_source`) to text lines. `generatedAt` is injected for
   * deterministic goldens (the reference stamps now(), snapshot/mod.rs:141-145).
   */
  def render(snapshot: DataFrame, rootdir: String, generatedAt: String): Seq[String] = {
    val rows = snapshot
      .select("group_id", "rkey", "size", "action", "symlink_source")
      .collect()
    val groups = rows.groupBy(_.getString(0)).toSeq
      .map { case (gid, ms) =>
        val sorted = ms.sortBy(_.getString(1))
        val keeperSize = sorted.map(_.getLong(2)).min
        (gid, keeperSize, sorted)
      }
      // keeper size desc, then group id for a total order (the reference's
      // HashMap iteration breaks size ties arbitrarily; we pin them)
      .sortBy { case (gid, sz, _) => (-sz, gid) }

    val header = Seq(meta("rootdir", rootdir), meta("generated_at", generatedAt), "")
    val body = groups.flatMap { case (gid, _, ms) =>
      s"[$gid]" +: ms.map { r =>
        val path = r.getString(1)
        r.getString(3) match {
          case "keep"    => s"keep $path"
          case "delete"  => s"delete $path"
          case "symlink" =>
            Option(r.getString(4)).filter(_.nonEmpty)
              .map(src => s"symlink $path -> $src")
              .getOrElse(s"symlink $path")
        }
      } :+ ""
    }
    header ++ body
  }

  /**
   * Distributed twin of [[render]]: the same text lines as a DataFrame of
   * `(line_no: Long, line: String)`, computed with window functions instead
   * of a driver collect — group rank by keeper size descending (O1), member
   * rank by key (O2), line offsets as a prefix sum over group blocks.
   *
   * The text file is inherently a single sequential artifact (the reference's
   * human-editable snapshot), so the two global windows here are single-
   * partition BY CONTRACT — this sink renders *reports*, not the corpus; at
   * corpus scale the canonical sink is the snapshot table / catalog version.
   * What the distributed form buys is (a) no driver materialization of the
   * member rows (only the final lines ever reach a collect, if the caller
   * collects at all) and (b) a DuckDB-oracleable query surface for the codec.
   */
  def renderTable(snapshot: DataFrame, rootdir: String, generatedAt: String): DataFrame = {
    parseRfc2822(generatedAt) // F4 enforced on the way in, as the reference does
    val spark = snapshot.sparkSession
    import spark.implicits._

    val m = snapshot.select("group_id", "rkey", "size", "action", "symlink_source")
    // One block per group: hash line + members + trailing blank. Offsets are
    // a running sum over the O1 order (keeper size desc, group id tiebreak).
    val groups = m.groupBy("group_id")
      .agg(min(col("size")).as("gsize"), count(lit(1)).as("n"))
    val o1 = Window.orderBy(col("gsize").desc, col("group_id"))
    val gOff = groups.withColumn("offset",
      lit(3L) + coalesce(
        sum(col("n") + lit(2L)).over(o1.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))

    val header = Seq(
      (1L, meta("rootdir", rootdir)),
      (2L, meta("generated_at", generatedAt)),
      (3L, "")).toDF("line_no", "line")
    val hashLines = gOff.select(
      (col("offset") + 1).as("line_no"),
      concat(lit("["), col("group_id"), lit("]")).as("line"))
    val blankLines = gOff.select(
      (col("offset") + col("n") + 2).as("line_no"), lit("").as("line"))
    val o2 = Window.partitionBy("group_id").orderBy("rkey")
    val memberLines = m.withColumn("rn", row_number().over(o2))
      .join(gOff.select("group_id", "offset"), Seq("group_id"))
      .select(
        (col("offset") + 1 + col("rn")).as("line_no"),
        when(col("action") === "keep", concat(lit("keep "), col("rkey")))
          .when(col("action") === "delete", concat(lit("delete "), col("rkey")))
          .when(col("symlink_source").isNotNull && length(col("symlink_source")) > 0,
            concat(lit("symlink "), col("rkey"), lit(" -> "), col("symlink_source")))
          .otherwise(concat(lit("symlink "), col("rkey"))).as("line"))

    header.union(hashLines).union(memberLines).union(blankLines)
  }

  private val PathReStr = """^(keep|symlink|delete)\s+(.+?)(?:\s+->\s+(.+))?$"""

  /**
   * Distributed twin of [[parse]] over `(line_no, line)` rows (F7): each
   * line classifies independently; a path row's group hash is the LAST hash
   * line at a smaller line number (a running `last(..., ignoreNulls)` window
   * — the one inherently sequential dependency of the format). The
   * reference's rejections (textformat.rs:51-146, 423-500) fire as
   * `raise_error`: unparseable line shapes, a path row before any checksum,
   * and the `a -> b -> c` chained-source form. Same single-sequential-file
   * contract as [[renderTable]].
   */
  def parseTable(lines: DataFrame): DataFrame = {
    val w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val op = regexp_extract(col("line"), PathReStr, 1)
    val classified = lines
      .withColumn("kind",
        when(trim(col("line")) === "", "blank")
          .when(col("line").rlike("""^#!\s*[a-z_]+:"""), "meta")
          .when(col("line").startsWith("#"), "comment")
          .when(col("line").rlike("""^\[[0-9a-fA-F]+\]$"""), "hash")
          .when(op =!= "", "path")
          .otherwise(raise_error(concat(lit("unparseable line: "), col("line")))))
      .withColumn("gid",
        last(when(col("kind") === "hash",
          lower(regexp_extract(col("line"), """^\[([0-9a-fA-F]+)\]$""", 1))),
          ignoreNulls = true).over(w))
    classified.where(col("kind") === "path")
      .select(
        when(col("gid").isNull,
          raise_error(concat(lit("path line before any checksum: "), col("line"))))
          .otherwise(col("gid")).as("group_id"),
        regexp_extract(col("line"), PathReStr, 2).as("rkey"),
        op.as("action"),
        when(regexp_extract(col("line"), PathReStr, 3) === "", lit(null))
          .when(regexp_extract(col("line"), PathReStr, 3).contains(" -> "),
            raise_error(concat(lit("malformed symlink source: "), col("line"))))
          .otherwise(regexp_extract(col("line"), PathReStr, 3)).as("symlink_source"))
  }

  private val MetaRe = """^#!\s*([a-z_]+):\s*(.*)$""".r
  private val HashRe = """^\[([0-9a-fA-F]+)\]$""".r
  private val PathRe = """^(keep|symlink|delete)\s+(.+?)(?:\s+->\s+(.+))?$""".r

  /** Parsed snapshot line-set: metadata plus flat rows. Errors mirror the
   *  reference's parse failures (textformat.rs:51-146): unknown line shapes
   *  and path rows before any group hash throw IllegalArgumentException. */
  def parse(lines: Seq[String]): (Map[String, String], Seq[(String, String, String, Option[String])]) = {
    var metadata = Map.empty[String, String]
    var current: Option[String] = None
    val rows = Seq.newBuilder[(String, String, String, Option[String])]
    lines.foreach {
      case l if l.trim.isEmpty     => // blank (textformat.rs Line::Blank)
      case MetaRe(k, v)            =>
        // generated_at must parse as RFC2822 (textformat.rs:279 errors on a
        // malformed timestamp; we mirror that instead of passing it through)
        if (k == "generated_at") parseRfc2822(v)
        metadata += (k -> v)
      case l if l.startsWith("#")  => // comment
      case HashRe(h)               => current = Some(h.toLowerCase)
      case PathRe(op, path, src)   =>
        val gid = current.getOrElse(
          throw new IllegalArgumentException(s"path line before any checksum: $path"))
        // `a -> b -> c` is rejected (textformat.rs:423-500 test matrix)
        if (src != null && src.contains(" -> "))
          throw new IllegalArgumentException(s"malformed symlink source: $src")
        rows += ((gid, path, op, Option(src)))
      case other =>
        throw new IllegalArgumentException(s"unparseable line: $other")
    }
    (metadata, rows.result())
  }
}
