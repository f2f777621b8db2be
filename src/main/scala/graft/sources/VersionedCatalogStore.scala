package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-table sibling of [[VersionedStore]] (r20, VERDICT r19
  * item #4) — the variant that object-store / warehouse deployments
  * use, built exactly to the design the path-layout scaladoc records
  * (VersionedStore.scala's BUCKETING note): each version is a family
  * of BUCKETED managed tables `{prefix}_vNNNNN_{table}` written via
  * [[Sinks.writeBucketed]]'s layout, and promotion is one atomic
  * metastore DDL — `CREATE OR REPLACE VIEW {prefix}_pointer` naming
  * the version — playing the role of the path layout's `CURRENT`
  * rename. This closes the two costs the path variant admits:
  *
  *  - **no local-FS restriction**: the pointer, claim and reclaim
  *    all run through the session catalog, so the store works
  *    wherever the warehouse lives (HMS + S3/HDFS included) — the
  *    seam ADVICE r18 flagged as the first thing a real deployment
  *    hits;
  *  - **bucketing survives publication**: saveAsTable carries the
  *    bucket spec in the catalog, so store-side joins stay
  *    shuffle-free ACROSS versions — the path layout re-shuffles on
  *    every read because a bare parquet dir can't carry bucketing
  *    metadata (VersionedCatalogStoreSpec pins the Exchange-free
  *    join plan on a published version).
  *
  * The concurrency contract is ported from [[VersionedStore]]
  * one-for-one, with catalog primitives in place of filesystem ones:
  *
  *  - **claim**: `CREATE TABLE {prefix}_vNNNNN_claim` is the atomic
  *    test-and-set (the metastore rejects a second create), so racing
  *    writers always land DISTINCT versions; the claim table carries
  *    a `graft.claim.ts` property refreshed after each table lands —
  *    the heartbeat — so staleness (`graft.store.claim.stale.ms`,
  *    shared knob) means "no progress", not "long write";
  *  - **publish**: tables first, then the one pointer DDL; the claim
  *    table drops only AFTER promotion (the r20 marker ordering —
  *    there is no claimless-unpromoted instant for a racer's cleanup
  *    to misread as debris);
  *  - **reclaim**: a version's tables drop only when it is OLDER
  *    than the cleaner's claim, NOT named by the pointer (re-read
  *    after promotion), not the one-generation reader-grace copy,
  *    and claimless or stale-claimed — [[VersionedStore.reclaimable]]'s
  *    predicate with tables for dirs;
  *  - **resolve**: a pointer naming a version missing ANY declared
  *    table resolves to None, never to a partial store.
  *
  * Last-writer-wins applies exactly as in the path variant: callers
  * needing read-modify-write serialization still need their own
  * mutual exclusion. The pointer view is `SELECT 'vNNNNN' AS v` —
  * constant, no table dependency — so replacing it can never fail
  * against a half-dropped version, and readers resolve through
  * [[resolve]] (version string → existence check → table names)
  * rather than querying the view per scan. */
object VersionedCatalogStore {

  /** One store table's spec: bucketed on `bucketCol` into `buckets`
    * files per the co-location discipline every graft store uses
    * (store-side joins read pre-partitioned on their join key). */
  final case class TableSpec(name: String, df: DataFrame,
                             bucketCol: String, buckets: Int)

  private val Ident = "[a-z][a-z0-9_]*"

  private def requireIdent(s: String, what: String): Unit =
    require(s.matches(Ident),
      s"$what must be a lowercase catalog identifier " +
        s"([a-z][a-z0-9_]*): got '$s' — Spark lowercases table names, " +
        "so mixed case would silently alias")

  private def pointerName(prefix: String) = s"${prefix}_pointer"
  private def claimName(prefix: String, v: String) = s"${prefix}_${v}_claim"
  private def tableName(prefix: String, v: String, t: String) =
    s"${prefix}_${v}_$t"

  private val ClaimTsProp = "graft.claim.ts"

  /** The live version string (`vNNNNN`) the pointer view names, if
    * the pointer exists. */
  private def pointerVersion(spark: SparkSession,
                             prefix: String): Option[String] =
    if (!spark.catalog.tableExists(pointerName(prefix))) None
    else Some(spark.table(pointerName(prefix))
      .collect().head.getString(0).trim)

  /** Resolve the LIVE version's table NAMES in `tables` order — or
    * None when no complete store exists (no pointer, or a pointer
    * naming a version missing any declared table). The names read
    * back through `spark.table`, bucketing metadata intact. */
  def resolve(spark: SparkSession, prefix: String,
              tables: Seq[String]): Option[Seq[String]] = {
    requireIdent(prefix, "store prefix")
    pointerVersion(spark, prefix).flatMap { v =>
      val names = tables.map(t => tableName(prefix, v, t))
      if (names.forall(spark.catalog.tableExists)) Some(names) else None
    }
  }

  /** [[resolve]] + read: the live tables as DataFrames, in `tables`
    * order — catalog scans, so joins against their bucket columns
    * plan shuffle-free. */
  def read(spark: SparkSession, prefix: String,
           tables: Seq[String]): Option[Seq[DataFrame]] =
    resolve(spark, prefix, tables).map(_.map(spark.table))

  /** Every version number present under `prefix`, read from the
    * catalog's table list (claim tables count — a claimed version
    * with no tables yet written must still advance the next claim).
    * The listing is PATTERN-scoped to the store's own names: a
    * warehouse at the 100 TB posture holds thousands of unrelated
    * tables, and an unfiltered listTables per write/cleanup would
    * pull the whole catalog driver-side on every publish. */
  private def listStoreTables(spark: SparkSession,
                              pattern: String): Seq[String] =
    spark.catalog.listTables(spark.catalog.currentDatabase, pattern)
      .collect().toSeq.map(_.name)

  private def versionNumbers(spark: SparkSession, prefix: String): Seq[Int] = {
    val pat = java.util.regex.Pattern
      .compile(java.util.regex.Pattern.quote(prefix) + "_v(\\d{5})_.*")
    listStoreTables(spark, s"${prefix}_v*")
      .flatMap { n =>
        val m = pat.matcher(n)
        if (m.matches()) Some(m.group(1).toInt) else None
      }
      .distinct
  }

  private def claimTs(spark: SparkSession, claim: String): Option[Long] =
    spark.sql(s"SHOW TBLPROPERTIES $claim").collect()
      .find(_.getString(0) == ClaimTsProp)
      .flatMap(r => r.getString(1).toLongOption)

  /** Heartbeat: stamp the claim table's `graft.claim.ts` to now —
    * called at claim and after each table lands (the catalog form of
    * [[VersionedStore.touchClaim]]). */
  private def touchClaim(spark: SparkSession, claim: String): Unit =
    spark.sql(s"ALTER TABLE $claim SET TBLPROPERTIES " +
      s"('$ClaimTsProp'='${System.currentTimeMillis()}')")

  /** Persist all `tables` as ONE atomic catalog store version:
    * claim `{prefix}_vNNNNN_claim` atomically (retrying upward past
    * versions concurrent writers claimed first), write every frame
    * as a bucketed managed table into the version, promote with ONE
    * `CREATE OR REPLACE VIEW` DDL, drop the claim, then best-effort
    * reclaim superseded older versions under the
    * [[VersionedStore.reclaimable]] guards. Returns the live table
    * names in `tables` order. */
  def write(spark: SparkSession, prefix: String,
            tables: Seq[TableSpec]): Seq[String] = {
    require(tables.nonEmpty,
      "VersionedCatalogStore.write needs at least one table")
    requireIdent(prefix, "store prefix")
    tables.foreach(t => requireIdent(t.name, "store table name"))
    // atomic claim: CREATE TABLE is the metastore's test-and-set
    var nextN = versionNumbers(spark, prefix).maxOption.getOrElse(0) + 1
    var vName = f"v$nextN%05d"
    var claimed = false
    while (!claimed) {
      try {
        spark.sql(s"CREATE TABLE ${claimName(prefix, vName)} (nonce INT) " +
          "USING PARQUET")
        claimed = true
      } catch {
        case _: org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException =>
          nextN += 1; vName = f"v$nextN%05d"
      }
    }
    val claim = claimName(prefix, vName)
    touchClaim(spark, claim)
    tables.foreach { t =>
      t.df.write
        .bucketBy(t.buckets, t.bucketCol)
        .sortBy(t.bucketCol)
        .mode("overwrite")
        .saveAsTable(tableName(prefix, vName, t.name))
      touchClaim(spark, claim) // heartbeat: staleness = idle, not long
    }
    // grace capture, then the SINGLE atomic promotion DDL
    val prevLive = pointerVersion(spark, prefix)
    spark.sql(s"CREATE OR REPLACE VIEW ${pointerName(prefix)} " +
      s"AS SELECT '$vName' AS v")
    // claim drops only AFTER promotion (r20 ordering): a version is
    // either claimed or published at every instant, so a racer's
    // cleanup can never misread a complete-but-unpromoted one as
    // reclaimable debris
    spark.sql(s"DROP TABLE IF EXISTS $claim")
    // best-effort reclaim, pointer re-read AFTER promotion (a racer
    // may have promoted since — whatever the pointer names survives)
    val currentNow = pointerVersion(spark, prefix)
    val staleMs = VersionedStore.claimStaleMs
    versionNumbers(spark, prefix).foreach { n =>
      val v = f"v$n%05d"
      val c = claimName(prefix, v)
      val claimLive = spark.catalog.tableExists(c) && {
        val age = claimTs(spark, c)
          .map(System.currentTimeMillis() - _)
        // a claim with an unreadable ts is treated as LIVE — reclaim
        // must fail safe toward keeping a possibly-in-flight write
        age.forall(_ <= staleMs)
      }
      val reclaim = n < nextN && !currentNow.contains(v) &&
        !prevLive.contains(v) && !claimLive
      if (reclaim) {
        // drop EVERY table of the version, whatever its schema era
        // named them — the catalog form of the path variant's
        // whole-dir delete (reclaiming only currently-declared names
        // would leak tables across store schema evolutions)
        listStoreTables(spark, s"${prefix}_${v}_*")
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
    }
    tables.map(t => tableName(prefix, vName, t.name))
  }
}
