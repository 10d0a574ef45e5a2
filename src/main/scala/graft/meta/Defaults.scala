package graft.meta

import scala.collection.concurrent.TrieMap

/** The reference's `ETLDefaults` per-domain KV store
  * (`lib/etl/etl_defaults.rb`, backed by the `etl_defaults` table): point
  * lookup, get-or-set, bool coercion, upsert, delete. All values are
  * strings (`etl_defaults.rb:73,79`); typed reads coerce.
  *
  * This is framework metadata, not data-plane — a driver-side map with
  * parquet persistence (DataFrame-roundtrip) replaces the RDBMS table. At
  * scale, config metadata never belongs in the cluster's data path.
  */
final class Defaults(val domain: String, store: TrieMap[(String, String), String]) {

  /** `defaults[key]` — reference `etl_defaults.rb:35-41`. */
  def get(key: String): Option[String] = store.get((domain, key))

  /** Get-or-set — reference `value(key, default)` `etl_defaults.rb:43-52`:
    * returns stored value, else writes `default.toString` and returns it.
    */
  def value(key: String, default: Any): String =
    store.getOrElseUpdate((domain, key), default.toString)

  /** String→bool coercion (`1`/`true`/`yes`) — reference
    * `etl_defaults.rb:54-65`.
    */
  def boolValue(key: String): Boolean =
    get(key).exists(v => Set("1", "true", "yes").contains(v.trim.toLowerCase))

  /** Upsert — reference `etl_defaults.rb:69-82`. */
  def update(key: String, v: Any): Unit = store.put((domain, key), v.toString)

  /** Delete — reference `etl_defaults.rb:84-89`. */
  def delete(key: String): Unit = store.remove((domain, key))
}

/** Store-level operations + parquet persistence. */
final class DefaultsStore {
  private val store = TrieMap.empty[(String, String), String]

  /** Per-domain view — reference `defaults_for_domain`
    * (`etl_manager.rb:181-184`).
    */
  def forDomain(domain: String): Defaults = new Defaults(domain, store)

  def snapshot: Seq[(String, String, String)] =
    store.toSeq.map { case ((d, k), v) => (d, k, v) }.sortBy(t => (t._1, t._2))

  def save(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    snapshot.toDF("domain", "default_key", "default_value")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    store.clear()
    spark.read.parquet(path).collect().foreach { r =>
      store.put((r.getString(0), r.getString(1)), r.getString(2))
    }
  }
}
