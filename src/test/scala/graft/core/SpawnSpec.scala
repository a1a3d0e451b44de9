package graft.core

import org.scalatest.funsuite.AnyFunSuite

class SpawnSpec extends AnyFunSuite {

  test("classifies the jspawnhelper SIGTERM blip (nested cause) as transient") {
    // the exact shape ProcessImpl.forkAndExec surfaced in VERIFY_r17:
    // outer "Cannot run program", cause carries the spawn-helper message
    val cause = new java.io.IOException(
      "error=0, Failed to exec spawn helper: pid: 31149, signal: 15")
    val outer = new java.io.IOException("Cannot run program \"git\"", cause)
    assert(Spawn.transientSpawnFailure(outer))
    assert(Spawn.transientSpawnFailure(cause))
    assert(Spawn.transientSpawnFailure(
      new java.io.IOException("error=11, Resource temporarily unavailable")))
  }

  test("permanent failures are NOT transient and rethrow on first attempt") {
    val enoent = new java.io.IOException(
      "Cannot run program \"definitely-not-a-command\": error=2, No such file or directory")
    assert(!Spawn.transientSpawnFailure(enoent))
    val t0 = System.nanoTime()
    intercept[java.io.IOException] {
      Spawn.start(new ProcessBuilder("graft-no-such-binary-xyzzy"))
    }
    // no retry backoff was paid: the failure classified as permanent
    assert((System.nanoTime() - t0) / 1e6 < 150,
      "permanent spawn failure took a retry-backoff path")
  }

  test("a healthy spawn runs exactly once and returns the live process") {
    val p = Spawn.start(new ProcessBuilder("true"))
    assert(p.waitFor() == 0)
  }
}
