package object graft {
  /** Contract type for every operator exposed through [[graft.SparkEntry]]:
    * (session, sfDir) => result. `sfDir` is a directory holding one parquet
    * file per table (see /root/repo/TESTDATA.md).
    */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
