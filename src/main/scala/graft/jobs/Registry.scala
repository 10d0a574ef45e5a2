package graft.jobs

import scala.collection.concurrent.TrieMap

/** Named job registry — the Spark-native replacement for the reference's
  * bundle discovery + dynamic `require` (`lib/etl/job_bundle.rb`): `.etl`
  * directories, `info.yml` descriptors, `name.camelize + "ETLJob"` class
  * convention, superclass check. Dynamic code loading has no sane JVM
  * analog in scope (SURVEY.md §7.4.6), so jobs register explicitly at
  * compile time; the name/type conventions survive.
  */
final class JobRegistry {
  private val jobs = TrieMap.empty[String, EtlJob]

  /** Register under the job's name — duplicate registration replaces, like
    * the reference's bundle cache refresh (`job_bundle.rb:42-61`).
    */
  def register(job: EtlJob): Unit = jobs.put(job.name, job)

  /** Lookup — reference `bundle_with_name` (`job_bundle.rb:42-61`). */
  def get(name: String): Option[EtlJob] = jobs.get(name)

  /** Enumeration — reference `JobBundle.bundles` (`job_bundle.rb:63-76`). */
  def names: Seq[String] = jobs.keys.toSeq.sorted

  /** The reference derived job name from class name by stripping the
    * `ETLJob`/type suffix and underscoring (`extraction.rb:23-29`,
    * `loading.rb` ditto, `job_bundle.rb:105-108`). Exposed for naming-
    * convention parity.
    */
  def deriveName(className: String): String = {
    val base = className
      .replaceAll("(ETLJob|ExtractionJob|LoadingJob|Job)$", "")
    base.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase
  }
}
