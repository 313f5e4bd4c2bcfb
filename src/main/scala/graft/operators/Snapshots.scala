package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Stage 5 — snapshot validation + apply: the Spark analog of the reference's
 * `validate` and `apply` commands (SURVEY.md §3.2/§3.3).
 *
 * The reference re-parses a user-edited snapshot and checks every action
 * against the live filesystem (validation.rs:305-335), then executes
 * keep/symlink/delete effects (executor.rs:96-137). In the table model:
 *
 *  - "live filesystem"   = the current corpus hash projection (J1 join);
 *  - "checksum check"    = sha256(current content) == snapshot group id
 *                          (validation.rs:70-81);
 *  - "group constraints" = ≥1 keep per group unless all-delete is explicitly
 *                          allowed (validation.rs:49-67);
 *  - "missing + delete"  = no-op delete, the idempotency mechanism
 *                          (validation.rs:296-302);
 *  - "apply"             = a transactional rewrite of the canonical table —
 *                          deletes dropped, symlinks rewritten as pointers to
 *                          the representative; prior versions retained by the
 *                          versioned-table sink (backup semantics,
 *                          fileutil.rs:136-150).
 *
 * Deviation (documented, strictly more informative): the reference aborts on
 * the first violation (validation.rs:350-353); we mark every row
 * valid/invalid with an error code and exclude *whole groups* containing any
 * invalid row from apply — same accept/reject decision per group, full
 * violation report instead of one error.
 */
object Snapshots {

  /**
   * Deterministic "user-edited" snapshot derived from the default snapshot,
   * with planted violations keyed off the first hex char `c` of the group id
   * (mirrors the reference's validation test matrix, validation.rs:359-497):
   *
   *  - c = 'd' → group id corrupted (uppercased) ⇒ checksum_mismatch rows;
   *  - c = 'e' → an extra ghost member `<keeper>.ghost` marked delete ⇒
   *              missing-path no-op delete;
   *  - c = 'f' → every member marked delete ⇒ no_keep_in_group violation;
   *  - else    → keeper keeps; non-keepers delete when c ∈ [0-7], symlink
   *              (to the keeper) when c ∈ [8-b].
   *
   * Output: `(group_id, rkey, action, symlink_source)`.
   */
  def editedSnapshot(hashed: DataFrame): DataFrame = {
    val snap = ExactDedup.snapshot(hashed)
      .withColumn("keeper", min(col("rkey")).over(Window.partitionBy("group_id")))
    val c = substring(col("group_id"), 1, 1)
    val act = when(c === "f", lit("delete"))
      .when(col("rkey") === col("keeper"), lit("keep"))
      .when(c.between("0", "7"), lit("delete"))
      .otherwise(lit("symlink"))
    val base = snap.select(
      when(c === "d", upper(col("group_id"))).otherwise(col("group_id")).as("group_id"),
      col("rkey"),
      act.as("action"),
      when(act === "symlink", col("keeper")).as("symlink_source"))
    val ghosts = snap.where(c === "e" && col("rkey") === col("keeper"))
      .select(col("group_id"),
        concat(col("keeper"), lit(".ghost")).as("rkey"),
        lit("delete").as("action"),
        lit(null).cast("string").as("symlink_source"))
    base.unionAll(ghosts)
  }

  /**
   * J1 validation join: every snapshot row vs current corpus state, plus the
   * group-level keep constraint. Check order (fixed, mirrored in the oracle):
   * missing+delete → no-op; missing → missing_path; sha mismatch →
   * checksum_mismatch; no keep in group → no_keep_in_group; else valid.
   *
   * Output: `(group_id, rkey, action, symlink_source, size, valid, error,
   * is_no_op)`; `size` is null for rows absent from the corpus.
   */
  def validate(edited: DataFrame, hashed: DataFrame,
               allowFullDeletion: Boolean = false): DataFrame =
    validateState(edited, currentState(hashed), allowFullDeletion)

  /** The "live filesystem" view: `(rkey, true_sha, size, points_to)` —
   *  `points_to` is the existing redirect target (null on a fresh corpus),
   *  the analog of an already-present symlink (snapshot/mod.rs:56-67). */
  def currentState(hashed: DataFrame): DataFrame =
    hashed.select(col("rkey"), col("group_id").as("true_sha"), col("size"))
      .withColumn("points_to", lit(null).cast("string"))

  /** Validation against an explicit current state; a symlink action whose
   *  redirect already points at the intended source is a valid no-op
   *  (validation.rs:237-242 — the idempotency mechanism). */
  def validateState(edited: DataFrame, state: DataFrame,
                    allowFullDeletion: Boolean = false): DataFrame = {
    val hasKeep = edited.groupBy("group_id")
      .agg(max(when(col("action") === "keep", 1).otherwise(0)).as("has_keep"))
    val ex = col("true_sha").isNotNull
    val groupOk = col("has_keep") === 1 || lit(allowFullDeletion)
    val alreadyLinked = col("action") === "symlink" &&
      col("points_to").isNotNull && col("points_to") === col("symlink_source")
    edited
      .join(state, Seq("rkey"), "left_outer")
      .join(hasKeep, Seq("group_id"))
      .select(
        col("group_id"), col("rkey"), col("action"), col("symlink_source"), col("size"),
        when(!ex && col("action") === "delete", lit(true))
          .when(!ex, lit(false))
          .when(col("true_sha") =!= col("group_id"), lit(false))
          .when(!groupOk, lit(false))
          .otherwise(lit(true)).as("valid"),
        when(!ex && col("action") === "delete", lit(null).cast("string"))
          .when(!ex, lit("missing_path"))
          .when(col("true_sha") =!= col("group_id"), lit("checksum_mismatch"))
          .when(!groupOk, lit("no_keep_in_group"))
          .otherwise(lit(null).cast("string")).as("error"),
        ((!ex && col("action") === "delete") || (ex && alreadyLinked)).as("is_no_op"))
  }

  /** Post-apply current state: deletes gone, redirects carry `points_to` —
   *  feed back into [[validateState]] for incremental / idempotent runs. */
  def appliedState(validated: DataFrame, state: DataFrame): DataFrame = {
    val bad = invalidGroups(validated).withColumn("bad", lit(true))
    val v = validated.join(bad, Seq("group_id"), "left_outer")
      .select(col("rkey"), col("action"), col("symlink_source"),
        coalesce(col("bad"), lit(false)).as("bad"))
    val untouched = col("action").isNull || col("action") === "keep" || col("bad")
    state.drop("points_to")
      .join(v, Seq("rkey"), "left_outer")
      .where(untouched || col("action") =!= "delete")
      .select(col("rkey"), col("true_sha"), col("size"),
        when(!untouched && col("action") === "symlink", col("symlink_source"))
          .as("points_to"))
  }

  /** Groups containing any invalid row — excluded whole from apply. */
  def invalidGroups(validated: DataFrame): DataFrame =
    validated.where(!col("valid")).select("group_id").distinct()

  /**
   * Apply: rewrite the canonical table. Rows of invalid groups stay `kept`
   * (reference semantics: a failed validation applies nothing); valid deletes
   * drop the row; valid symlinks become `redirected` pointer rows.
   * Output: `(rkey, status ∈ {kept, redirected}, points_to)`.
   */
  def applyActions(validated: DataFrame, hashed: DataFrame): DataFrame = {
    val bad = invalidGroups(validated).withColumn("bad", lit(true))
    val v = validated.join(bad, Seq("group_id"), "left_outer")
      .select(col("rkey"), col("action"), col("symlink_source"),
        coalesce(col("bad"), lit(false)).as("bad"))
    val untouched = col("action").isNull || col("action") === "keep" || col("bad")
    hashed.select("rkey")
      .join(v, Seq("rkey"), "left_outer")
      .select(
        col("rkey"),
        when(untouched, lit("kept"))
          .when(col("action") === "symlink", lit("redirected"))
          .otherwise(lit("deleted")).as("status"),
        when(!untouched && col("action") === "symlink", col("symlink_source")).as("points_to"))
      .where(col("status") =!= "deleted")
  }

  /** A8/A9 (executor.rs:140-162): pending-action count + freeable bytes —
   *  valid, non-no-op, non-keep actions in fully-valid groups. */
  def pendingStats(validated: DataFrame): DataFrame = {
    val bad = invalidGroups(validated).withColumn("bad", lit(true))
    validated.join(bad, Seq("group_id"), "left_outer")
      .where(col("valid") && !col("is_no_op") && col("action") =!= "keep" && col("bad").isNull)
      .agg(count(lit(1)).as("n_pending"),
        coalesce(sum(col("size")), lit(0L)).as("freeable_bytes"))
  }
}
