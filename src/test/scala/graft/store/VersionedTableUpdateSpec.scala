package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[VersionedTable.updateRows]] — the copy-on-write row update
  * (rescrub's store primitive): matched rows transformed, unmatched
  * rows and unmatched FILES carried untouched, schema preservation
  * enforced, CDC delete/insert pairs over only the touched files,
  * txn replay, audit evidence.
  */
class VersionedTableUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(statsCols: Seq[String] = Seq("id")) = new VersionedTable(
    spark, Files.createTempDirectory("vtupd").toString, statsCols)

  test("updateRows transforms exactly the matched rows; key-clustered " +
      "files off the key band carry VERBATIM (FileEntry identity)") {
    val vt = fresh()
    vt.commit((1L to 10L).map(i => (i, s"t$i")).toDF("id", "text")
      .coalesce(1))
    vt.commit((11L to 20L).map(i => (i, s"t$i")).toDF("id", "text")
      .coalesce(1))
    val before = vt.readManifest(vt.currentVersion.get).files
    val v = vt.updateRows("id", Seq(3L, 7L),
      m => m.withColumn("text", concat($"text", lit("!"))))
    val after = vt.readManifest(v).files
    // the 11-20 file never overlapped keys 3/7: carried verbatim
    val liveFile = before.find(_.stats("id")._1.toLong == 11L).get
    assert(after.contains(liveFile))
    val got = vt.read().as[(Long, String)].collect().toMap
    assert(got(3L) === "t3!" && got(7L) === "t7!")
    assert((1L to 20L).filterNot(Set(3L, 7L))
      .forall(i => got(i) === s"t$i"))
    assert(got.size === 20)
  }

  test("CDC across an update reports each changed row as its delete/" +
      "insert pair and reads only the touched files") {
    val vt = fresh()
    vt.commit((1L to 10L).map(i => (i, s"t$i")).toDF("id", "text")
      .coalesce(1))
    vt.commit((11L to 20L).map(i => (i, s"t$i")).toDF("id", "text")
      .coalesce(1))
    val vBefore = vt.currentVersion.get
    vt.updateRows("id", Seq(5L),
      m => m.withColumn("text", lit("redacted")))
    val diff = vt.changesSince(vBefore)
    val rows = diff.select($"id", $"text", $"change_type")
      .as[(Long, String, String)].collect().toSet
    assert(rows === Set((5L, "t5", "delete"), (5L, "redacted", "insert")))
    // the verbatim-carried 11-20 file is never opened by the diff
    val carried = vt.readManifest(vBefore).files
      .find(_.stats("id")._1.toLong == 11L).get.path
    assert(!diff.inputFiles.exists(_.endsWith(carried)))
  }

  test("a transform that changes the schema fails loudly; NULL-keyed " +
      "rows are never matched; keys touching no file publish nothing") {
    val vt = fresh()
    vt.commit(Seq((Some(1L), "a"), (Option.empty[Long], "nul"))
      .toDF("id", "text").coalesce(1))
    intercept[IllegalArgumentException] {
      vt.updateRows("id", Seq(1L), m => m.withColumn("extra", lit(1)))
    }
    val v1 = vt.currentVersion.get
    // key 99 misses every band: no publish
    assert(vt.updateRows("id", Seq(99L), identity) === v1)
    // NULL row survives an update of everything else untouched
    vt.updateRows("id", Seq(1L), m => m.withColumn("text", lit("X")))
    assert(vt.read().orderBy($"id").as[(Option[Long], String)]
      .collect().toSeq === Seq((None, "nul"), (Some(1L), "X")))
    intercept[IllegalArgumentException](vt.updateRows("id", Nil, identity))
    intercept[IllegalArgumentException](
      vt.updateRows("id", Seq(1L, null), identity))
  }

  test("txn replay is a no-op; the update commit carries audit " +
      "evidence (counts, never keys); time travel spans the update") {
    val vt = fresh()
    val v0 = vt.commit((1L to 5L).map(i => (i, s"t$i")).toDF("id", "text"))
    val v = vt.updateRows("id", Seq(2L),
      m => m.withColumn("text", lit("u")), txnId = Some("upd-1"))
    assert(vt.updateRows("id", Seq(2L),
      m => m.withColumn("text", lit("DIFFERENT")),
      txnId = Some("upd-1")) === v)
    assert(vt.read().filter($"id" === 2L).select($"text")
      .as[String].head() === "u")
    assert(vt.readAt(v0).filter($"id" === 2L).select($"text")
      .as[String].head() === "t2")
    val audit = vt.auditOf(v)
    assert(audit("key_count") === "1" && audit("key_col") === "id")
    assert(!audit.values.exists(_.contains("2L")))
  }

  test("property: random interleavings of commit/deleteKeys/" +
      "updateRows match a driver-side model of the final row set") {
    val rnd = new scala.util.Random(14014L)
    (1 to 5).foreach { round =>
      val vt = fresh()
      val model = scala.collection.mutable.Map.empty[Long, String]
      var nextId = 0L
      (1 to 10).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 => // commit a fresh id-clustered batch
            val n = 1 + rnd.nextInt(5)
            val rows = (nextId until nextId + n).map(i => (i, s"v$i"))
            nextId += n
            vt.commit(rows.toDF("id", "text").coalesce(1))
            rows.foreach { case (i, t) => model(i) = t }
          case 1 if model.nonEmpty => // delete a random key subset
            val keys = rnd.shuffle(model.keys.toList)
              .take(1 + rnd.nextInt(3))
            vt.deleteKeys("id", keys)
            keys.foreach(model.remove)
          case 2 if model.nonEmpty => // bang-suffix a random subset
            val keys = rnd.shuffle(model.keys.toList)
              .take(1 + rnd.nextInt(3))
            vt.updateRows("id", keys,
              m => m.withColumn("text", concat($"text", lit("!"))))
            keys.foreach(k => model(k) = model(k) + "!")
          case _ => ()
        }
      }
      val got =
        if (vt.currentVersion.isEmpty) Map.empty[Long, String]
        else vt.read().as[(Long, String)].collect().toMap
      assert(got === model.toMap, s"round $round")
    }
  }

  test("a transform may DROP or EXPAND matched rows (fewer/more rows, " +
      "same schema)") {
    val vt = fresh()
    vt.commit((1L to 6L).map(i => (i, s"t$i")).toDF("id", "text"))
    // drop evens among matched, duplicate key 1
    vt.updateRows("id", Seq(1L, 2L, 4L), m =>
      m.filter($"id" % 2 === 1).unionByName(m.filter($"id" === 1L)))
    val got = vt.read().select($"id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 1L, 3L, 5L, 6L))
  }
}
