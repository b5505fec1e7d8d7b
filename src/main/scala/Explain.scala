object Explain {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local(8)
    for (n <- args) {
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(s, "/root/testdata/sf0.1")
        .queryExecution.executedPlan.toString
        .linesIterator.map(_.take(140)).mkString("\n"))
    }
    s.stop()
  }
}
