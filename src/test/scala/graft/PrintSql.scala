package graft
object PrintSql {
  def main(args: Array[String]): Unit =
    args.foreach(n => println(SparkEntry.oracleSql(n)))
}
