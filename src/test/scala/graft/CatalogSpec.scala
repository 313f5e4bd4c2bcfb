package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.operators.{ExactDedup, Snapshots}
import graft.sources.ParquetCatalog

/** Catalog-table surface: versioned writes, canonical = newest, apply as
 *  read-modify-write with prior-version retention (backup rule), restore,
 *  and resume against warehouse files when catalog metadata is gone. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val cat = ParquetCatalog

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("apply = RMW of the canonical table; prior version retained; restore round-trips") {
    val base = "graft_spec_state"
    cat.dropAll(spark, base)
    val h = ExactDedup.withHashes(Corpus.synthetic(spark, 200, seed = 23L).toDF())
    val state = Snapshots.plantedState(h)

    assert(cat.writeVersion(spark, base, state) === 1L)
    assert(cat.versions(spark, base) === Seq(1L))
    assert(rows(cat.readCanonical(spark, base)) === rows(state))

    val validated = Snapshots.validateState(
      Snapshots.editedSnapshot(h), cat.readCanonical(spark, base))
    val v2 = cat.applyReadModifyWrite(spark, base)(cur =>
      Snapshots.appliedState(validated, cur))
    assert(v2 === 2L)
    assert(cat.versions(spark, base) === Seq(1L, 2L))

    // canonical is the applied state; the pre-image is STILL readable (backup)
    assert(rows(cat.readCanonical(spark, base)) ===
      rows(Snapshots.appliedState(validated, state)))
    assert(rows(cat.readVersion(spark, base, 1L)) === rows(state))
    // apply actually changed something, so retention is non-vacuous
    assert(rows(cat.readVersion(spark, base, 1L)) !==
      rows(cat.readVersion(spark, base, 2L)))

    // restore: old content becomes the NEW canonical; history intact
    val v3 = cat.restoreVersion(spark, base, 1L)
    assert(v3 === 3L)
    assert(rows(cat.readCanonical(spark, base)) === rows(state))
    assert(cat.versions(spark, base) === Seq(1L, 2L, 3L))
    cat.dropAll(spark, base)
    assert(cat.versions(spark, base) === Seq.empty)
  }

  test("pipeline publishes cluster/snapshot/metrics tables as catalog versions") {
    val base = "graft_spec_pub"
    Seq("_snapshot", "_clusters", "_metrics").foreach(s => cat.dropAll(spark, base + s))
    val corpus = Corpus.synthetic(spark, 150, seed = 37L).toDF()
    val tmp1 = java.nio.file.Files.createTempDirectory("graft_cat_run1").toString
    val ctx1 = graft.runtime.RunContext(spark, tmp1)
    val (res1, v1) = Pipeline.runToCatalog(ctx1, corpus, base)
    ctx1.cleanup()
    assert(v1 === 1L)
    assert(rows(cat.readCanonical(spark, s"${base}_clusters")) === rows(res1.clusters))
    assert(cat.readCanonical(spark, s"${base}_snapshot").count() === res1.snapshot.count())

    // corpus evolves (rows dropped) → re-run publishes version 2; version 1
    // stays readable — prior cluster assignments are never destroyed
    val corpus2 = corpus.where(expr("xxhash64(repo, path) % 5 != 0"))
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_cat_run2").toString
    val ctx2 = graft.runtime.RunContext(spark, tmp2)
    val (res2, v2) = Pipeline.runToCatalog(ctx2, corpus2, base)
    ctx2.cleanup()
    assert(v2 === 2L)
    assert(cat.versions(spark, s"${base}_clusters") === Seq(1L, 2L))
    assert(rows(cat.readVersion(spark, s"${base}_clusters", 1L)) === rows(res1.clusters))
    assert(rows(cat.readCanonical(spark, s"${base}_clusters")) === rows(res2.clusters))
    Seq("_snapshot", "_clusters", "_metrics").foreach(s => cat.dropAll(spark, base + s))
  }

  test("resume: versions discovered from warehouse files when catalog metadata is absent") {
    val base = "graft_spec_resume"
    cat.dropAll(spark, base)
    val df = spark.range(5).select(col("id"), (col("id") * 2).as("x"))
    cat.writeVersion(spark, base, df)
    // plant a version the CATALOG has never heard of — as a fresh session
    // would find after a JVM restart (files survive, in-memory metadata not)
    val wh = java.nio.file.Paths.get(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    df.withColumn("x", col("x") + 1).write.mode("overwrite")
      .parquet(wh.resolve(s"${base}_v2").toString)
    assert(cat.versions(spark, base) === Seq(1L, 2L))
    // readVersion re-registers the orphan directory as an external table
    assert(rows(cat.readCanonical(spark, base)) ===
      rows(df.withColumn("x", col("x") + 1)))
    assert(spark.catalog.tableExists(s"${base}_v2"))
    // and the next write lands ABOVE the recovered history
    assert(cat.writeVersion(spark, base, df) === 3L)
    cat.dropAll(spark, base)
  }

  // ---- IcebergCatalog gate, exercised through a test double ----------------
  // No Iceberg runtime ships in this environment (SURVEY §7); the class's
  // engine touchpoints are protected seams, so the create-vs-overwrite GATE —
  // the logic guarding the never-destroy-without-backup rule — is assertable
  // with an in-memory fake (round-4 verdict "What's missing #4").

  private class FakeIceberg extends graft.sources.IcebergCatalog("fake", "ns") {
    var existing: Set[String] = Set.empty
    var created: List[String] = Nil
    var overwritten: List[String] = Nil
    var existsFailure: Option[RuntimeException] = None
    var snapshotsFailure: Option[RuntimeException] = None
    var snaps: Map[String, Seq[Long]] = Map.empty
    override protected def icebergTableExists(s: org.apache.spark.sql.SparkSession,
                                              name: String): Boolean = {
      existsFailure.foreach(throw _)
      existing.contains(name)
    }
    override protected def icebergCreate(s: org.apache.spark.sql.SparkSession,
                                         name: String,
                                         df: org.apache.spark.sql.DataFrame): Unit = {
      created ::= name
      existing += name
      snaps += name -> Seq(1L)
    }
    override protected def icebergOverwrite(s: org.apache.spark.sql.SparkSession,
                                            name: String,
                                            df: org.apache.spark.sql.DataFrame): Unit = {
      overwritten ::= name
      val prev = snaps.getOrElse(name, Seq.empty)
      snaps += name -> (prev :+ (prev.lastOption.getOrElse(0L) + 1L))
    }
    override protected def icebergSnapshotIds(s: org.apache.spark.sql.SparkSession,
                                              name: String): Seq[Long] = {
      snapshotsFailure.foreach(throw _)
      snaps(name)
    }
  }

  test("iceberg gate: create ONLY on explicit non-existence, overwrite after") {
    val fake = new FakeIceberg
    val df = spark.range(3).toDF("id")
    assert(fake.writeVersion(spark, "t", df) === 1L)
    assert(fake.created === List("fake.ns.t") && fake.overwritten === Nil)
    // second write: table exists → overwrite (new snapshot), NEVER re-create
    assert(fake.writeVersion(spark, "t", df) === 2L)
    assert(fake.created === List("fake.ns.t"))
    assert(fake.overwritten === List("fake.ns.t"))
    assert(fake.versions(spark, "t") === Seq(1L, 2L))
  }

  test("iceberg gate: a metadata failure on the existence check propagates — never routes to create or replace") {
    val fake = new FakeIceberg
    fake.existing = Set("fake.ns.t")
    fake.snaps = Map("fake.ns.t" -> Seq(1L))
    fake.existsFailure = Some(new RuntimeException("metastore down"))
    val df = spark.range(3).toDF("id")
    val e = intercept[RuntimeException] { fake.writeVersion(spark, "t", df) }
    assert(e.getMessage === "metastore down")
    // neither branch ran: the table's history was never touched
    assert(fake.created === Nil && fake.overwritten === Nil)
  }

  test("iceberg gate: snapshot-metadata failure on an EXISTING table propagates, not Seq.empty") {
    val fake = new FakeIceberg
    fake.existing = Set("fake.ns.t")
    fake.snapshotsFailure = Some(new RuntimeException("snapshots unreadable"))
    val e = intercept[RuntimeException] { fake.versions(spark, "t") }
    assert(e.getMessage === "snapshots unreadable")
    // a MISSING table is still an empty history, not an error
    assert(fake.versions(spark, "missing") === Seq.empty)
  }
}
