package graft

/** Prints the SparkEntry query-name surface, one per line — the
  * enumeration hook for tools/roundcheck.py. No SparkSession is built:
  * the queries map holds thunks, so listing keys is free, and the tool
  * gets the surface from the engine itself instead of re-parsing Scala. */
object QueryNames {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
