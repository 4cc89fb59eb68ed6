package graft.tools

/** Prints every registered SparkEntry query name, one per line — the
  * registry side of tools/close_round.sh's coverage check (the closing
  * bench sidecar must contain exactly this set, or the round ships
  * unpriced queries — the round-11 failure mode this gate mechanizes).
  * No SparkSession needed: the registry is a map of thunks.
  */
object QueryList {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keySet.toSeq.sorted.foreach(println)
}
