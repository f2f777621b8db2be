package graft.tools

/** Dev utility: print every registered query key (for §2 sync checks). */
object DumpKeys {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(k => println(s"KEY $k"))
}
