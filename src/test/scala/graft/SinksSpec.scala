package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Sinks, Tables}

class SinksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  val d = "/root/testdata/sf0.001"

  test("partitioned write: pruned layout, bounded files, lossless round-trip") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val docs = Tables.documents(spark, d)
    Sinks.writePartitioned(docs, out, Seq("lang"), filesPerPartition = 2)
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(langDirs.nonEmpty && langDirs.forall(_.matches("lang=\\w+")))
    // bounded file count per partition dir
    new java.io.File(out).listFiles().filter(_.getName.startsWith("lang=")).foreach { dir =>
      val files = dir.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files >= 1 && files <= 2, s"${dir.getName}: $files files")
    }
    // round-trip is lossless and partition-pruning works on the layout
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val en = back.filter(org.apache.spark.sql.functions.col("lang") === "en")
    val scan = en.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning in:\n$scan")
  }

  test("training-order write: concatenating files in range order == global sort") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, d)
    // session-lifetime persist is fine here: one shared test session
    val manifest = graft.operators.Corpus.trainingMix(docs,
      Seq("src0" -> 5, "src1" -> 80), 30, 400L, Seq("src0" -> 1, "src1" -> 3), 2)
    val out = java.nio.file.Files.createTempDirectory("graft_order").toString
    Sinks.writeTrainingOrder(manifest, out, files = 4)
    val expected = manifest.orderBy(col("vt"), col("source"), col("doc_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    // read the part files individually, in range-partition name order
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(parts.length >= 2, "expected a multi-file layout")
    val streamed = parts.flatMap { f =>
      spark.read.parquet(f.getPath)
        .orderBy(col("vt"), col("source"), col("doc_id"))
        .select(col("doc_id")).collect().map(_.getLong(0))
    }.toSeq
    assert(streamed == expected && expected.nonEmpty)
  }

  test("z-ordered layout prunes range queries on BOTH keys; sorted layout only one") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_partkey")
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft_s").toString
    Sinks.writeZOrdered(li, zDir, "l_orderkey", "l_partkey", files = 8)
    // the comparison layout: single-column sort (clusters orderkey only)
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sDir)
    // per-file (min, max) of l_partkey: how many files would a
    // partkey-range predicate have to read under each layout?
    def spans(dir: String): Seq[(Long, Long)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          spark.read.parquet(f.toString)
            .agg(min("l_partkey"), max("l_partkey"))
            .as[(Long, Long)].head()
        }
    val (pkLo, pkHi) = li.agg(min("l_partkey"), max("l_partkey"))
      .as[(Long, Long)].head()
    val boxLo = pkLo + (pkHi - pkLo) / 2
    val boxHi = boxLo + (pkHi - pkLo) / 8
    def hits(ss: Seq[(Long, Long)]): Int =
      ss.count { case (lo, hi) => hi >= boxLo && lo <= boxHi }
    val (zHits, sHits) = (hits(spans(zDir)), hits(spans(sDir)))
    // orderkey-sorted files each span nearly the full partkey range →
    // a partkey predicate reads ~every file; the Z layout keeps file
    // rectangles tight in both dimensions
    assert(sHits >= 7, s"expected the sorted layout to read ~all files, got $sHits/8")
    assert(zHits < sHits, s"z-order should prune: z=$zHits sorted=$sHits")
    // and the layout is lossless
    assert(spark.read.parquet(zDir).count() == li.count())
  }

  test("3-column z-order prunes range queries on every key; a sort only its own") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val keys = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val li = Tables.lineitem(spark, d).select(keys.map(col): _*)
    // 16 files: 3 interleaved dimensions need ≥ 2^3 curve cells before
    // per-file key spans tighten enough to measure pruning
    val zDir = java.nio.file.Files.createTempDirectory("graft_z3").toString
    Sinks.writeZOrdered(li, zDir, keys, files = 16)
    assert(spark.read.parquet(zDir).count() == li.count()) // lossless
    // comparison layouts: one single-column sort per key
    val sortDirs = keys.map { k =>
      val sd = java.nio.file.Files.createTempDirectory(s"graft_s3_$k").toString
      li.repartitionByRange(16, col(k)).sortWithinPartitions(k)
        .write.mode("overwrite").parquet(sd)
      k -> sd
    }.toMap
    // per-NON-EMPTY-file (min,max) spans: range partitioning can leave
    // empty part files whose null stats would distort the comparison
    def spans(dir: String, key: String): Seq[(Long, Long)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq.flatMap { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min(col(key)), max(col(key))).head()
          if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
        }
    def boxFor(key: String): (Long, Long) = {
      val (lo, hi) = li.agg(min(col(key)), max(col(key))).as[(Long, Long)].head()
      // strictly inside the key's upper half: a box STARTING at the
      // exact midpoint straddles the top-bit cell boundary (integer
      // division puts the midpoint in the low half), and a perfectly
      // cell-aligned layout then legitimately reads every file
      val b = lo + (hi - lo) * 5 / 8
      (b, b + (hi - lo) / 16)
    }
    // fraction of data files a box-range predicate must read
    def frac(ss: Seq[(Long, Long)], box: (Long, Long)): Double =
      ss.count { case (lo, hi) => hi >= box._1 && lo <= box._2 }.toDouble / ss.size
    keys.foreach { qKey =>
      val box = boxFor(qKey)
      val z = frac(spans(zDir, qKey), box)
      // every layout sorted on a DIFFERENT key scatters qKey across
      // ~all its files; the 3-d Z layout must beat each of them
      keys.filter(_ != qKey).foreach { sKey =>
        val s = frac(spans(sortDirs(sKey), qKey), box)
        assert(z < s, s"query on $qKey: z=$z !< $sKey-sorted=$s")
      }
    }
  }
}
