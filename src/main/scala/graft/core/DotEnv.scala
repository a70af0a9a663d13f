package graft.core

/** Minimal `.env` file loader — the reference's config entry point
  * (`main.py:123` `load_dotenv()`; key inventory in `sample.env`).
  *
  * Format per the de-facto dotenv convention: one `KEY=VALUE` per
  * line; blank lines and `#` comment lines skipped; an optional
  * `export ` prefix tolerated; values may be single- or double-quoted
  * (quotes stripped, no escape processing — values here are paths and
  * identifiers, not code); whitespace around key and unquoted values
  * trimmed. Process environment variables intentionally WIN over file
  * entries (same precedence as python-dotenv's default `override=False`).
  */
object DotEnv {

  /** Parse a dotenv file; missing file → empty map (load_dotenv's
    * no-op behavior).
    */
  def parse(path: String): Map[String, String] = {
    val f = new java.io.File(path)
    if (!f.isFile) return Map.empty
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try {
      src.getLines().flatMap { line0 =>
        val line = line0.trim
        if (line.isEmpty || line.startsWith("#") || !line.contains('=')) None
        else {
          val Array(k0, v0) = line.split("=", 2)
          val k = k0.trim.stripPrefix("export ").trim
          val v1 = v0.trim
          val v =
            if (v1.length >= 2 &&
                ((v1.head == '"' && v1.last == '"') || (v1.head == '\'' && v1.last == '\'')))
              v1.substring(1, v1.length - 1)
            else v1
          if (k.isEmpty) None else Some(k -> v)
        }
      }.toMap
    } finally src.close()
  }

  /** Config lookup with the standard precedence: process env > .env
    * file > default.
    */
  def get(key: String, envFile: Map[String, String], default: => String): String =
    sys.env.get(key).orElse(envFile.get(key)).getOrElse(default)
}
