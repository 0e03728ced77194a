package graft.core

/** Credentials dispatch (SURVEY O12; reference Cred_Ops_Dispatcher,
  * yaetos/env_dispatchers.py:332-356): INI/cfg-format secrets, resolved
  * from a local file or a pluggable remote backend.
  *
  * The reference reads either `conf/connections.cfg` locally or an AWS
  * Secrets Manager SecretString (same cfg text) on cluster. The remote
  * side here is a seam — a `String => String` fetcher — because a cloud
  * SDK is environment-specific; the dispatch, parse, and lookup semantics
  * (sections, key=value, comments) are the portable part and live here.
  */
object Secrets {

  /** section -> (key -> value) */
  type Creds = Map[String, Map[String, String]]

  /** ConfigParser-compatible subset: `[section]` headers, `key = value` or
    * `key: value` entries, `#`/`;` comment lines, blank lines ignored.
    * Keys are lower-cased like Python's ConfigParser.
    */
  def parse(text: String): Creds = {
    val out = collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    var section: Option[String] = None
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = Some(line.substring(1, line.length - 1).trim)
          if (!out.contains(section.get)) out(section.get) = Map.empty
        } else {
          val idx = {
            val eq = line.indexOf('='); val co = line.indexOf(':')
            if (eq < 0) co else if (co < 0) eq else math.min(eq, co)
          }
          require(idx > 0, s"malformed cfg line (no key separator): $raw")
          val sec = section.getOrElse(
            sys.error(s"cfg entry before any [section] header: $raw"))
          val k = line.substring(0, idx).trim.toLowerCase
          val v = line.substring(idx + 1).trim
          out(sec) = out(sec) + (k -> v)
        }
      }
    }
    out.toMap
  }

  def loadLocal(path: String): Creds = {
    val p = java.nio.file.Paths.get(path)
    require(java.nio.file.Files.isRegularFile(p), s"credentials file not found: $path")
    parse(java.nio.file.Files.readString(p))
  }

  /** The reference's storage dispatch: `"s3"` (cluster) pulls the cfg text
    * from the remote secrets backend via `remoteFetch(remoteId)`; anything
    * else reads the local file. No backend is wired by default — remote
    * use fails loudly instead of silently returning empty creds.
    */
  def retrieve(storage: String,
               localPath: String = "conf/connections.cfg",
               remoteId: String = "graft/connections",
               remoteFetch: String => String = id =>
                 sys.error(s"no remote secrets backend configured (wanted '$id')")): Creds =
    if (storage == "s3") parse(remoteFetch(remoteId)) else loadLocal(localPath)

  /** Strict lookup — a missing credential is a config error, not a null. */
  def get(creds: Creds, section: String, key: String): String =
    creds.getOrElse(section, sys.error(s"no credentials section [$section]"))
      .getOrElse(key.toLowerCase,
        sys.error(s"no key '$key' in credentials section [$section]"))
}
