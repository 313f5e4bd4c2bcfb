package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.operators.{ExactDedup, Snapshots}

/** Validation truth table (transliterated from validation.rs:359-497 to the
 *  table model) + apply idempotency (README.md:108-113: a second apply is all
 *  no-ops). */
class SnapshotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edited(rows: (String, String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("group_id", "rkey", "action", "symlink_source")
  }
  private def state(rows: (String, String, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("rkey", "true_sha", "size", "points_to")
  }

  private def validateMap(e: DataFrame, s: DataFrame, allowFull: Boolean = false) =
    Snapshots.validateState(e, s, allowFull).collect()
      .map(r => r.getAs[String]("rkey") ->
        ((r.getAs[Boolean]("valid"), r.getAs[String]("error"), r.getAs[Boolean]("is_no_op")))).toMap

  test("truth table: missing path per action kind (validation.rs:99-104, 265-273, 296-302)") {
    val e = edited(
      ("h1", "a", "keep", null), ("h1", "b", "symlink", "a"), ("h1", "gone-del", "delete", null),
      ("h1", "gone-keep", "keep", null), ("h1", "gone-sym", "symlink", "a"))
    val s = state(("a", "h1", 3L, null), ("b", "h1", 3L, null))
    val v = validateMap(e, s)
    assert(v("gone-del") === ((true, null, true)))     // missing + delete = no-op
    assert(v("gone-keep") === ((false, "missing_path", false)))
    assert(v("gone-sym") === ((false, "missing_path", false)))
    assert(v("a") === ((true, null, false)))
    assert(v("b") === ((true, null, false)))           // pending symlink
  }

  test("truth table: checksum mismatch (validation.rs:70-81)") {
    val e = edited(("h1", "a", "keep", null), ("h1", "b", "delete", null))
    val s = state(("a", "h1", 3L, null), ("b", "OTHER", 3L, null))
    val v = validateMap(e, s)
    assert(v("a") === ((true, null, false)))
    assert(v("b") === ((false, "checksum_mismatch", false)))
  }

  test("truth table: all-delete group needs the explicit flag (validation.rs:56-67)") {
    val e = edited(("h1", "a", "delete", null), ("h1", "b", "delete", null))
    val s = state(("a", "h1", 3L, null), ("b", "h1", 3L, null))
    assert(validateMap(e, s).values.forall(_ == ((false, "no_keep_in_group", false))))
    assert(validateMap(e, s, allowFull = true).values.forall(_ == ((true, null, false))))
  }

  test("truth table: already-linked symlink is a valid no-op (validation.rs:237-242)") {
    val e = edited(("h1", "a", "keep", null), ("h1", "b", "symlink", "a"))
    val s = state(("a", "h1", 3L, null), ("b", "h1", 3L, "a"))
    val v = validateMap(e, s)
    assert(v("b") === ((true, null, true)))
  }

  test("apply is idempotent: second validate against applied state has zero pending") {
    val h = ExactDedup.withHashes(Corpus.synthetic(spark, 300, seed = 5L).toDF()).cache()
    val e = Snapshots.editedSnapshot(h).cache()
    val v1 = Snapshots.validate(e, h)
    val p1 = Snapshots.pendingStats(v1).head()
    assert(p1.getLong(0) > 0, "first round must have pending actions")

    val s2 = Snapshots.appliedState(v1, Snapshots.currentState(h))
    val v2 = Snapshots.validateState(e, s2)
    val p2 = Snapshots.pendingStats(v2).head()
    assert(p2.getLong(0) === 0L, "second round must be all no-ops")
    assert(p2.getLong(1) === 0L)
  }

  test("apply excludes invalid groups whole and drops only valid deletes") {
    val h = ExactDedup.withHashes(Corpus.synthetic(spark, 300, seed = 5L).toDF()).cache()
    val v = Snapshots.validate(Snapshots.editedSnapshot(h), h).cache()
    val applied = Snapshots.applyActions(v, h).cache()
    val badGroups = Snapshots.invalidGroups(v).collect().map(_.getString(0)).toSet
    val deleted = v.where(col("valid") && col("action") === "delete" && !col("is_no_op"))
      .collect().filterNot(r => badGroups.contains(r.getAs[String]("group_id")))
      .map(_.getAs[String]("rkey")).toSet
    val appliedKeys = applied.collect().map(_.getString(0)).toSet
    assert(deleted.intersect(appliedKeys).isEmpty, "valid deletes must be dropped")
    assert(appliedKeys.size === h.count() - deleted.size)
    // redirected rows point at their keeper
    applied.where(col("status") === "redirected").collect()
      .foreach(r => assert(r.getString(2) != null))
  }
}
