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
    // real RIFF/WAV PCM16 fixture: pcm16Sample over a known string,
    // written through the same javax.sound path packWav uses
    val wavText = "graft wav fixture 0123456789"
    val pcm = wavText.getBytes("UTF-8").zipWithIndex.map {
      case (b, i) => Multimodal.pcm16Sample(b, i)
    }
    val wavBytes = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val raw = new Array[Byte](pcm.length * 2)
      pcm.zipWithIndex.foreach { case (s, i) =>
        raw(2 * i) = (s & 0xff).toByte
        raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, pcm.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val files = Seq(
      "gradient_16x16.png" -> Multimodal.encodeGray(gradient, 16, 16, "png"),
      "gradient_16x16.bmp" -> Multimodal.encodeGray(gradient, 16, 16, "bmp"),
      "checker_16x16.png" -> Multimodal.encodeGray(checker, 16, 16, "png"),
      "ramp_pcm16.wav" -> wavBytes)
    files.foreach { case (name, bytes) =>
      Files.write(outDir.resolve(name), bytes)
      println(s"wrote $name (${bytes.length} bytes)")
    }
  }
}
