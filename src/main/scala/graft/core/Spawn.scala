package graft.core

/** `ProcessBuilder.start()` hardened against TRANSIENT spawn failures.
  *
  * On Linux the JDK launches children through a `jspawnhelper` binary
  * (posix_spawn); under memory pressure or a sandbox reaping stray
  * processes, that helper can be killed between fork and exec, surfacing as
  * `java.io.IOException: ... Failed to exec spawn helper: pid N, signal: 15`
  * out of `ProcessImpl.forkAndExec` — an environment blip, not a property
  * of the command. The r17 driver run lost its whole `sbt test` signal to
  * exactly one such blip (VERIFY_r17 `tests_ok: false`; the same suites
  * pass 692/692 when re-run). EAGAIN ("Resource temporarily unavailable")
  * is the same class.
  *
  * Retrying is safe by construction: the failure happens BEFORE exec, so
  * the command never ran. Anything else (command not found, permission
  * denied) rethrows on the first attempt unchanged.
  */
object Spawn {

  private[core] def transientSpawnFailure(e: java.io.IOException): Boolean = {
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(4).flatMap(t => Option(t.getMessage)).mkString(" | ")
    msgs.contains("Failed to exec spawn helper") ||
      msgs.contains("Resource temporarily unavailable")
  }

  /** Start the process, retrying up to `retries` times (with a short
    * backoff) when the failure is a pre-exec spawn blip. */
  def start(pb: ProcessBuilder, retries: Int = 2): Process = {
    var attempt = 0
    while (true) {
      try return pb.start()
      catch {
        case e: java.io.IOException if attempt < retries && transientSpawnFailure(e) =>
          attempt += 1
          System.err.println(s"[graft] transient process-spawn failure " +
            s"(attempt $attempt/$retries, retrying): ${e.getMessage}")
          Thread.sleep(200L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
