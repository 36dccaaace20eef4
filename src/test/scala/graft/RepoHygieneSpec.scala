package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree hygiene, enforced mechanically. Raw control bytes
  * (anything below 0x09) inside a `.scala` file make git classify the
  * file as BINARY: no textual diffs, no review, grep warnings — the
  * exact defect r10 found in StreamSchemaDrift and r11 reintroduced in
  * StreamIvm (a literal NUL inside a `concat_ws` separator). The fix
  * is always the backslash-u0000 escape; this spec keeps the defect class
  * dead by scanning every source file on every test run. */
class RepoHygieneSpec extends AnyFunSuite {

  private def scalaFiles(root: String): Seq[Path] = {
    val base = Paths.get(root)
    if (!Files.exists(base)) Seq.empty
    else Files.walk(base).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq
  }

  test("no source file contains raw control bytes below 0x09") {
    val offenders = (scalaFiles("src/main") ++ scalaFiles("src/test"))
      .flatMap { p =>
        val bytes = Files.readAllBytes(p)
        val bad = bytes.indexWhere(b => b >= 0 && b < 0x09)
        if (bad >= 0) Some(s"$p @ byte $bad (0x%02x)".format(bytes(bad)))
        else None
      }
    assert(offenders.isEmpty,
      s"raw control bytes (git-binary trigger) in: ${offenders.mkString(", ")}" +
        " — use the \\u0000 escape instead of a literal byte")
  }

  test("no direct localCheckpoint outside Checkpoints.scala (src/main)") {
    // every lineage cut and memo materialization must ride the
    // Checkpoints.cut seam so the reliable-checkpoint conf governs
    // ALL of them — a raw localCheckpoint is un-recomputable state a
    // preemptible cluster loses with the executor, whether it sits in
    // a fixpoint loop or a one-shot memo pin.
    val offenders = scalaFiles("src/main")
      .filterNot(_.getFileName.toString == "Checkpoints.scala")
      .filter(p => new String(Files.readAllBytes(p), "UTF-8")
        .contains(".localCheckpoint("))
    assert(offenders.isEmpty,
      s"raw localCheckpoint outside Checkpoints.scala: $offenders — " +
        "route through Checkpoints.cut / .cut")
  }
}
