package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic multi-table store persistence — the ONE write-back seam for
  * every maintained store (r18, VERDICT r17 item #2).
  *
  * The batch retraction operators (`exactRetract`, `keepBestRetract`,
  * `semanticRetract`, `postingsRetract`, …) return FRAMES and leave
  * persistence to the caller; for a single-table store a plain
  * overwrite is recoverable, but a takedown against a multi-table
  * store (SemanticStore's two tables, SemanticBestStore's four) that
  * crashes mid-rewrite leaves a TORN store — new assignment beside
  * stale pairs — which for a legal-erasure queue is the worst failure
  * mode available: the store would keep serving some of what it was
  * ordered to forget, in a state no rebuild-free pass can diagnose.
  * This object generalizes the versioned-directory contract
  * [[graft.streaming.Streams.semanticServe]] proved in r13 (each
  * write lands ALL tables in a fresh `vNNNNN/` subdir, then ONE
  * atomic `CURRENT` pointer move publishes them together) so batch
  * callers — takedown bindings, probes, any ingest that rewrites a
  * store — get the same all-or-nothing publish:
  *
  *  - a crash while WRITING tables orphans an unreferenced version
  *    dir; the pointer still names the prior version, which stays
  *    fully live (VersionedStoreSpec simulates exactly this);
  *  - a crash BETWEEN the write and the pointer move is the same
  *    case — the move is the only publish step and it is atomic
  *    (`ATOMIC_MOVE` of `CURRENT.tmp` onto `CURRENT`);
  *  - a pointer naming a version missing ANY declared table is
  *    REJECTED at resolve time (a half-deleted version can never be
  *    trusted into a serve), so even external mutilation degrades to
  *    "no store" rather than a torn one;
  *  - the previously-live version survives its successor's promotion
  *    for ONE generation (a reader that resolved the old pointer just
  *    before promotion may still be mid-scan; deleting its files
  *    would trade the torn-write fix for a torn read) — N−2 and
  *    older, unreferenced orphans, legacy flat tables, and stale
  *    `.staging` leftovers are reclaimed after promotion.
  *
  * At scale the same layout works on any rename-capable store;
  * object stores without atomic rename put the pointer in a CAS-able
  * metadata service and keep the version dirs immutable — the layout
  * already never mutates a published file. */
object VersionedStore {

  private val VDir = "v(\\d{5})".r

  /** Resolve the LIVE version's table paths under `storeDir` in the
    * order of `tables` — or None when no complete store exists: a
    * missing dir, a missing pointer, or a pointer naming a version
    * missing any of the declared tables all resolve to None rather
    * than a partial store. */
  def resolve(storeDir: String, tables: Seq[String]): Option[Seq[String]] = {
    val pointer = new java.io.File(storeDir, "CURRENT")
    if (!pointer.isFile) return None
    val v = java.nio.file.Files.readString(pointer.toPath).trim
    val paths = tables.map(t => s"$storeDir/$v/$t")
    if (paths.forall(p => new java.io.File(p).isDirectory)) Some(paths)
    else None
  }

  /** [[resolve]] + read: the live tables as DataFrames, in `tables`
    * order. */
  def read(spark: SparkSession, storeDir: String,
           tables: Seq[String]): Option[Seq[DataFrame]] =
    resolve(storeDir, tables).map(_.map(spark.read.parquet(_)))

  /** Persist all `tables` as ONE atomic store version: write every
    * frame into a fresh `vNNNNN/` subdir (next N = max existing + 1,
    * counting orphans from crashed writes so a retry never reuses a
    * half-written dir), promote with one atomic `CURRENT` move, then
    * best-effort reclaim superseded versions (keeping the immediately
    * prior one as the one-generation reader grace), legacy flat-layout
    * dirs named like a declared table, and stale `.staging`
    * leftovers. Returns the LIVE table paths in `tables` order.
    * Every failure point before the pointer move leaves the prior
    * store fully live. */
  def write(storeDir: String,
            tables: Seq[(String, DataFrame)]): Seq[String] = {
    require(tables.nonEmpty, "VersionedStore.write needs at least one table")
    val root = new java.io.File(storeDir)
    root.mkdirs()
    val nextN = Option(root.listFiles()).getOrElse(Array.empty)
      .collect { case f if f.isDirectory => f.getName }
      .collect { case VDir(n) => n.toInt }
      .maxOption.getOrElse(0) + 1
    val vName = f"v$nextN%05d"
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$storeDir/$vName/$name")
    }
    // capture the previously-live version BEFORE the swap for the
    // one-generation grace retention
    val prevLive = Option(new java.io.File(storeDir, "CURRENT"))
      .filter(_.isFile)
      .map(p => java.nio.file.Files.readString(p.toPath).trim)
    // the SINGLE atomic promotion: readers see the old pointer or the
    // new one, never a torn store
    val tmp = java.nio.file.Paths.get(storeDir, "CURRENT.tmp")
    java.nio.file.Files.writeString(tmp, vName)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(storeDir, "CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // best-effort cleanup AFTER promotion
    val legacy = tables.map(_._1).toSet
    val legacyStaging = legacy.map(_ + ".staging")
    Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
      val stale = f.getName match {
        case VDir(n) => n.toInt != nextN && !prevLive.contains(f.getName)
        case n if legacy(n) || legacyStaging(n) => true
        case _ => false
      }
      if (stale && f.isDirectory) {
        scala.reflect.io.Directory(f).deleteRecursively(); ()
      }
    }
    tables.map { case (name, _) => s"$storeDir/$vName/$name" }
  }
}
