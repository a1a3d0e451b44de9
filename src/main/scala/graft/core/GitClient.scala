package graft.core

import java.nio.file.{Path, Paths}

/** Git introspection for `git:<branch>` model selections (reference
  * utils/git.py GitClient; selector.py:214 evaluates a Git node as the union
  * of untracked + uncommitted + committed-vs-target-branch changed files).
  *
  * Shells out to the `git` binary (the reference does the same via
  * subprocess — no JGit dependency): all commands run with the project
  * directory as cwd; `ls-files --others` output is relative to that cwd
  * while `diff --name-only` output is relative to the repo toplevel, so
  * each resolves against its own base exactly like the reference.
  */
final class GitClient(workDir: String) {

  private val workPath = Paths.get(workDir).toAbsolutePath.normalize

  private def execute(args: Seq[String]): String = {
    val pb = new ProcessBuilder((Seq("git") ++ args): _*)
    pb.directory(workPath.toFile)
    val proc = Spawn.start(pb) // retries transient fork/exec blips, see Spawn
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    if (rc != 0) {
      val msg = err.linesIterator.find(_.toLowerCase.startsWith("fatal:"))
        .getOrElse(err.trim)
      throw new IllegalStateException(s"git error: $msg")
    }
    out.trim
  }

  private def listOutput(args: Seq[String], base: Path): Seq[Path] =
    execute(args).split("\n").toSeq.filter(_.nonEmpty)
      .map(rel => base.resolve(rel).toAbsolutePath.normalize)

  private lazy val gitRoot: Path =
    Paths.get(execute(Seq("rev-parse", "--show-toplevel")))

  /** Files not yet tracked (git.py list_untracked_files). */
  def listUntrackedFiles(): Seq[Path] =
    listOutput(Seq("ls-files", "--others", "--exclude-standard"), workPath)

  /** Tracked files changed vs HEAD, deletions excluded
    * (git.py list_uncommitted_changed_files). */
  def listUncommittedChangedFiles(): Seq[Path] =
    listOutput(Seq("diff", "--name-only", "--diff-filter=d", "HEAD"), gitRoot)

  /** Files changed on commits since the merge-base with `targetBranch`
    * (git.py list_committed_changed_files — the `branch...` triple-dot). */
  def listCommittedChangedFiles(targetBranch: String = "main"): Seq[Path] =
    listOutput(Seq("diff", "--name-only", "--diff-filter=d", s"$targetBranch..."), gitRoot)

  /** The full changed-file set a `git:<branch>` selection matches against
    * (selector.py:214-218: union of all three lists), as normalized
    * absolute-path strings. */
  def changedFiles(targetBranch: String): Set[String] =
    (listUntrackedFiles() ++ listUncommittedChangedFiles() ++
      listCommittedChangedFiles(targetBranch)).map(_.toString).toSet
}
