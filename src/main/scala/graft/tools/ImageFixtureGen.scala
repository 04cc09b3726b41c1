package graft.tools

import java.nio.file.{Files, Paths}
import graft.operators.Multimodal

/** One-shot generator for the checked-in image fixtures under
  * src/test/resources/graft/fixtures: real PNG/BMP files with known
  * pixel content, decoded by MultimodalSpec against their goldens.
  * Run once (tools/run.sh graft.tools.ImageFixtureGen) and commit the
  * outputs — the spec then exercises ImageIO against on-disk files,
  * not just in-memory round trips. */
object ImageFixtureGen {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args.headOption.getOrElse(
      "src/test/resources/graft/fixtures"))
    Files.createDirectories(outDir)
    val gradient = Array.tabulate(256)(_.toByte)
    val checker = Array.tabulate(256)(i =>
      (if ((i / 16 + i % 16) % 2 == 0) 0 else 255).toByte)
    val files = Seq(
      "gradient_16x16.png" -> Multimodal.encodeGray(gradient, 16, 16, "png"),
      "gradient_16x16.bmp" -> Multimodal.encodeGray(gradient, 16, 16, "bmp"),
      "checker_16x16.png" -> Multimodal.encodeGray(checker, 16, 16, "png"))
    files.foreach { case (name, bytes) =>
      Files.write(outDir.resolve(name), bytes)
      println(s"wrote $name (${bytes.length} bytes)")
    }
  }
}
