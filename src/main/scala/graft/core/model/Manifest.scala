package graft.core.model

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import java.util.{List => JList, Map => JMap}
import scala.jdk.CollectionConverters._

/** YAML manifest loader with mode-layered parameters.
  *
  * Mirrors the reference's `Job_Yml_Parser`/`Job_Args_Parser`
  * (yaetos/etl_utils.py:873-905, 930-972): a manifest has
  *
  * {{{
  * common_params:
  *   all_mode_params: {k: v, ...}
  *   mode_specific_params:
  *     dev: {k: v}
  *     prod: {k: v}
  * jobs:
  *   my_job:
  *     inputs: {name: {path: ..., type: csv, inc_field: ..., glob: ...}}
  *     output: {path: ..., type: parquet}
  *     sql: SELECT ...   # or sql_file / class
  *     dependencies: [other_job]
  * }}}
  *
  * Param precedence (low→high): all_mode_params < mode_specific_params
  * (multiple modes comma-separated, later wins) < job-level params <
  * command-line args — the precedence the reference tests pin down
  * (reference tests/yaetos/etl_utils_test.py:104-153).
  */
object Manifest {

  final case class Loaded(jobs: Map[String, JobSpec], params: Map[String, String])

  private val mapper = new ObjectMapper(new YAMLFactory())

  def parse(yamlText: String, modes: Seq[String] = Seq("dev"),
            cmdArgs: Map[String, String] = Map.empty): Loaded = {
    val root = mapper.readValue(yamlText, classOf[JMap[String, Object]]).asScala

    def asMap(o: Object): Map[String, Object] = o match {
      case m: JMap[_, _] => m.asInstanceOf[JMap[String, Object]].asScala.toMap
      case null => Map.empty
      case other => sys.error(s"expected mapping, got $other")
    }
    def asStrMap(o: Object): Map[String, String] =
      asMap(o).map { case (k, v) => k -> String.valueOf(v) }

    val common = root.get("common_params").map(asMap).getOrElse(Map.empty)
    val allMode = common.get("all_mode_params").map(asStrMap).getOrElse(Map.empty)
    val modeSpecific = common.get("mode_specific_params").map(asMap).getOrElse(Map.empty)
    val modeParams = modes.foldLeft(Map.empty[String, String]) { (acc, m) =>
      acc ++ modeSpecific.get(m).map(asStrMap).getOrElse(Map.empty)
    }
    val baseParams = allMode ++ modeParams

    def dataset(o: Object): DatasetSpec = {
      val m = asMap(o)
      def str(k: String): Option[String] = m.get(k).map(String.valueOf)
      DatasetSpec(
        path = str("path").getOrElse(""),
        format = str("type").getOrElse("parquet"),
        incField = str("inc_field"),
        glob = str("glob"),
        readOptions = m.get("read_kwargs").map(asStrMap).getOrElse(Map.empty),
        saveOptions = m.get("save_kwargs").map(asStrMap).getOrElse(Map.empty),
        pk = m.get("pk").map {
          case l: JList[_] => l.asScala.map(String.valueOf).toSeq
          case s => Seq(String.valueOf(s))
        }.getOrElse(Nil),
        from = str("from"),
        skipManifest = str("skip_manifest"),
        skipRanges = m.get("skip_ranges").map {
          case l: JList[_] => l.asScala.toSeq.map { e =>
            val rm = asMap(e.asInstanceOf[Object])
            def rs(k: String) = rm.get(k).map(String.valueOf)
            SkipRange(
              column = rs("column").getOrElse(sys.error(
                "skip_ranges entry needs a column")),
              lower = rs("lower"), upper = rs("upper"),
              values = rm.get("values").map {
                case vl: JList[_] => vl.asScala.map(String.valueOf).toSeq
                case v => Seq(String.valueOf(v))
              }.getOrElse(Nil),
              notNull = rs("not_null").exists(_.toBoolean))
          }
          case other => sys.error(s"skip_ranges must be a list, got $other")
        }.getOrElse(Nil),
        skipBlooms = str("skip_blooms").exists(_.toBoolean),
        statsManifest = str("stats_manifest"),
        statsCols = m.get("stats_cols").map {
          case l: JList[_] => l.asScala.map(String.valueOf).toSeq
          case s => String.valueOf(s).split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
        }.getOrElse(Nil))
    }

    val jobs = root.get("jobs").map(asMap).getOrElse(Map.empty).map { case (name, jo) =>
      val m = asMap(jo)
      def str(k: String): Option[String] = m.get(k).map(String.valueOf)
      val jobParams = m.get("params").map(asStrMap).getOrElse(Map.empty)
      name -> JobSpec(
        name = name,
        inputs = m.get("inputs").map(asMap).getOrElse(Map.empty)
          .map { case (n, d) => n -> dataset(d) },
        output = m.get("output").map(dataset),
        sql = str("sql"),
        sqlFile = str("sql_file"),
        className = str("class"),
        dependencies = m.get("dependencies").map {
          case l: JList[_] => l.asScala.map(String.valueOf).toSeq
          case s => Seq(String.valueOf(s))
        }.getOrElse(Nil),
        incrementalMode = str("incremental_mode").getOrElse("no_schema"),
        repartition = str("repartition").map(_.toInt),
        partitionBy = m.get("partition_by").map {
          case l: JList[_] => l.asScala.map(String.valueOf).toSeq
          case s => Seq(String.valueOf(s))
        }.getOrElse(Nil),
        // layered: base < job-level < cmd args; then self-interpolated so
        // a param can reference another ({{out_root}}-style composition,
        // reference replace_placeholders) — unknown keys stay intact for
        // the later path-templating pass ({{latest}}/{{now}})
        params = selfInterpolate(baseParams ++ jobParams ++ cmdArgs))
    }
    Loaded(jobs, selfInterpolate(baseParams ++ cmdArgs))
  }

  private def selfInterpolate(m: Map[String, String]): Map[String, String] =
    m.map { case (k, v) => k -> Params.interpolate(v, m) }

  def loadFile(path: String, modes: Seq[String] = Seq("dev"),
               cmdArgs: Map[String, String] = Map.empty): Loaded =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"), modes, cmdArgs)
}
