package graft.engine

/** spark-submit command-line builder (SURVEY O8; reference
  * create_spark_submit, yaetos/etl_utils.py:1282-1316): assembles the
  * cluster launch command from job params — submit-level args (before the
  * application) selected by `spark_submit_keys`, app-level args (after)
  * by `spark_app_keys`, each `--`-separated; a key mapped to "no value"
  * renders as a bare flag. Pure function — the engine runs in-JVM
  * locally, this is the documented seam to a cluster launcher.
  */
object Submit {

  val flagOnly = "no value"

  def buildCommand(application: String, params: Map[String, String]): Seq[String] = {
    require(application.nonEmpty, "spark-submit needs an application (jar/py)")
    def keyed(listKey: String): Seq[String] = {
      val keys = params.getOrElse(listKey, "")
        .split("--").map(_.trim).filter(_.nonEmpty).toSeq
      keys.map { k =>
        val v = params.getOrElse(k, sys.error(
          s"param '$k' named in $listKey is missing from the job params"))
        if (v == flagOnly) s"--$k" else s"--$k=$v"
      }
    }
    Seq("spark-submit") ++
      params.get("spark_submit_args").toSeq ++
      keyed("spark_submit_keys") ++
      Seq(application) ++
      params.get("spark_app_args").toSeq ++
      keyed("spark_app_keys")
  }
}
