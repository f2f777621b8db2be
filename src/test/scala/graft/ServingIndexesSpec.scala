package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.registry.ServingIndexes

/** The `*_served` bindings memoize built index paths per corpus dir;
  * the memo must not outlive the DATA — regenerating a corpus dir
  * within a session has to invalidate it (advisor finding, round 9). */
class ServingIndexesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  test("once(): memoizes per content fingerprint, rebuilds on regenerated data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_si").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "data.txt"), "generation-1".getBytes)
    var builds = 0
    def build(): (Seq[org.apache.spark.sql.DataFrame], Long) = {
      builds += 1
      (Seq(Seq((1L, "a")).toDF("id", "v")), 7L)
    }
    val (paths1, pay1) = ServingIndexes.once("spec_fp", dir)(build())
    val (paths2, pay2) = ServingIndexes.once("spec_fp", dir)(build())
    assert(builds == 1, "unchanged dir must serve the memoized index")
    assert(paths1 == paths2 && pay1 == 7L && pay2 == 7L)
    // regenerate the data under the SAME dir (different size, so the
    // fingerprint moves even on coarse-mtime filesystems)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "data.txt"),
      "generation-2, regenerated".getBytes)
    val (paths3, _) = ServingIndexes.once("spec_fp", dir)(build())
    assert(builds == 2, "regenerated dir must trigger a fresh build")
    assert(paths3 != paths1, "fresh build must land in fresh dirs")
    scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
  }
}
