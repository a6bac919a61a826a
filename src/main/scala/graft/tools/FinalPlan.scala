package graft.tools

/** Dev: execute a query and print the FINAL adaptive plan (shows
  * runtime stage/exchange reuse that the initial plan cannot). */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = graft.Spark.session(appName = "graft-finalplan")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect() // execute THIS df so its AdaptiveSparkPlan finalizes
    val s = df.queryExecution.executedPlan.toString
    println("=== FINAL PLAN " + name + " ===")
    println(s)
  }
}
