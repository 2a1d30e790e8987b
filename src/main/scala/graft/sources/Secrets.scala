package graft.sources

/** Credential resolution interface (reference
  * utils/secrets_manager_operations.py:10-30 + the per-environment
  * fallback chain in utils/config_gen.py:60-123).
  *
  * The reference resolves a secret id from AWS Secrets Manager and
  * falls back to values embedded in its config module. Here the shape
  * is an interface with pluggable backends and an explicit resolution
  * order — and, deliberately, no hardcoded fallback credentials
  * anywhere in code (the reference embeds them; not reproduced).
  */
trait SecretProvider {
  /** Resolve a key, or None if this provider doesn't hold it. */
  def get(key: String): Option[String]

  /** Resolve a key or fail fast with the key name (never logs values). */
  final def require(key: String): String =
    get(key).getOrElse(
      throw new NoSuchElementException(s"secret '$key' not resolvable"))

  /** Resolution order: this provider first, `that` on miss. */
  final def orElse(that: SecretProvider): SecretProvider = {
    val self = this
    (key: String) => self.get(key).orElse(that.get(key))
  }
}

object SecretProvider {

  /** Environment-variable backend. Keys are normalized the env way:
    * `db.password` -> `DB_PASSWORD`.
    */
  def fromEnv(env: Map[String, String] = sys.env): SecretProvider =
    (key: String) => env.get(key.toUpperCase.replaceAll("[.-]", "_"))

  /** In-memory / config-map backend (the reference's config-module
    * fallback, minus the embedded values).
    */
  def fromMap(m: Map[String, String]): SecretProvider = (key: String) => m.get(key)

  /** Flat `key: value` YAML document backend — a secrets file kept
    * outside the repo, e.g. mounted by the scheduler.
    */
  def fromYaml(yaml: String): SecretProvider = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val root = mapper.readTree(yaml)
    val m = root.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    fromMap(m)
  }
}
