package graft.core

/** Credential/config layer (SURVEY.md §2.13).
  *
  * The reference stores Fernet-encrypted credentials keyed by a HARDCODED
  * password (/root/reference/dags/utils.py:14,78-117) — explicitly flagged
  * as a defect not to replicate. The engine takes everything from the
  * environment (or an injected map for tests); nothing secret lives in
  * code or the repo.
  */
final case class Config(values: Map[String, String]) {
  def get(key: String): Option[String] = values.get(key)
  def require(key: String): String =
    values.getOrElse(key, throw new IllegalStateException(
      s"missing config '$key' — set env var ${Config.envName(key)}"))
  def jdbc(prefix: String): graft.sources.Jdbc.JdbcConfig =
    graft.sources.Jdbc.JdbcConfig(
      url = require(s"$prefix.url"),
      user = require(s"$prefix.user"),
      password = require(s"$prefix.password"),
      driver = get(s"$prefix.driver"))
}

object Config {
  def envName(key: String): String = "GRAFT_" + key.toUpperCase.replace('.', '_')

  /** Environment-backed config: `warehouse.url` <- GRAFT_WAREHOUSE_URL. */
  def fromEnv(env: Map[String, String] = sys.env): Config =
    Config(env.collect { case (k, v) if k.startsWith("GRAFT_") =>
      k.stripPrefix("GRAFT_").toLowerCase.replace('_', '.') -> v
    })
}
