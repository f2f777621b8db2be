package graft.registry

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** Memoized per-(kind, corpus-dir) index materialization for the
  * `*_served` bindings.
  *
  * The serving-path operators (`searchIndexed`, `knnLshIndexed`,
  * `knnIvfIndexed`, `knnPqIndexed`) exist so REPEATED queries skip the
  * corpus scan/encode their build-path siblings pay per call. Grading
  * that claim needs bench rows that time the QUERY against a prebuilt
  * index — so these bindings build the index exactly once per corpus
  * directory (the bench's warm-up pass pays it, outside the timed
  * passes; Verify pays it once before the output write) and every
  * subsequent call reads the persisted parquet back.
  *
  * The indexes land in fresh temp directories — the harness binding.
  * A deployment would write them as managed BUCKETED tables on their
  * join/filter key instead ([[graft.sources.Sinks.writeBucketed]];
  * StoreRoundTripSpec proves that round trip plan-exact) and pass the
  * read-back frames to the same operators.
  */
object ServingIndexes {

  private val built =
    scala.collection.concurrent.TrieMap.empty[String, (Seq[String], Long)]

  // harness hygiene: the memoized index dirs die with the JVM — a CI
  // driver cycling many sessions would otherwise accumulate one set
  // per (kind, corpus) per run
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    built.values.foreach { case (paths, _) =>
      paths.foreach { p =>
        scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively(); ()
      }
    }))

  /** Build-once: materialize each frame of `build` as parquet under
    * its own temp dir; returns the paths plus one long payload (e.g.
    * the corpus doc count captured at build time). Thread-safe; keyed
    * by (kind, corpus dir) so sf0.01 and sf0.1 don't collide. */
  def once(kind: String, dir: String)
          (build: => (Seq[DataFrame], Long)): (Seq[String], Long) =
    built.getOrElseUpdate(s"$kind@$dir", {
      val (frames, payload) = build
      val paths = frames.zipWithIndex.map { case (df, i) =>
        val path = Files.createTempDirectory(s"graft_idx_${kind}_$i").toString
        df.write.mode("overwrite").parquet(path)
        path
      }
      (paths, payload)
    })
}
