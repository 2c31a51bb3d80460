package graft
import org.apache.spark.sql.SparkSession
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tryQ(name: String, q: String): Unit =
      try { val r = spark.sql(q).collect(); println(s"PROBE-OK: $name (${r.length} rows) ${r.take(3).mkString("|")}") }
      catch { case e: Throwable => println(s"PROBE-FAIL: $name -> ${e.getMessage.take(200).replace('\n',' ')}") }
    spark.sql("CREATE OR REPLACE TEMP VIEW nat AS SELECT * FROM VALUES (0,0,'ALG'),(1,0,'ARG'),(2,1,'BRA'),(3,1,'CAN'),(4,1,'EGY') AS t(nk,rk,nm)")
    spark.sql("CREATE OR REPLACE TEMP VIEW reg AS SELECT * FROM VALUES (0,'AFR'),(1,'AME') AS t(rk,rnm)")
    tryQ("lateral_limit", "SELECT r.rnm, x.nm FROM reg r, LATERAL (SELECT nm FROM nat n WHERE n.rk = r.rk ORDER BY nm LIMIT 2) x ORDER BY rnm, nm")
    tryQ("lateral_agg", "SELECT r.rnm, x.c FROM reg r, LATERAL (SELECT count(*) AS c FROM nat n WHERE n.rk = r.rk) x ORDER BY rnm")
    tryQ("recursive_data", "WITH RECURSIVE w(rk, d) AS (SELECT rk, 0 FROM reg UNION ALL SELECT rk, d+1 FROM w WHERE d < rk + 1) SELECT rk, count(*) AS n, sum(d) AS sd FROM w GROUP BY rk ORDER BY rk")
    tryQ("zorder", "SELECT nk, rk, ((nk & 1) | ((rk & 1) << 1) | (((nk >> 1) & 1) << 2) | (((rk >> 1) & 1) << 3)) AS z FROM nat ORDER BY z")
    spark.stop()
  }
}
