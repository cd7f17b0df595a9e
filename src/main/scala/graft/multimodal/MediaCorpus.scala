package graft.multimodal

import java.nio.file.{Files, Paths}

/** Deterministic on-disk media corpus for q_multimodal_decode: one
  * REAL BMP/PNG/WAV file per id (MediaCodec.render), written once per
  * (tag, id-set) and reused — the test-fixture stand-in for the media
  * bucket a production pipeline would read. Generation is a
  * driver-side fixture loop by design (it IS the data source, not the
  * pipeline); the decode pipeline that consumes it is fully
  * distributed (binaryFile scan + mapPartitions).
  */
object MediaCorpus {

  /** Idempotently materialize the corpus for `ids`; returns the dir.
    * A marker file with the id-count guards partial writes. */
  def ensure(ids: Seq[Long], tag: String): String = synchronized {
    val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft_media_$tag")
    val marker = dir.resolve("_COMPLETE")
    if (!(Files.exists(marker) &&
        new String(Files.readAllBytes(marker)) == ids.length.toString)) {
      Files.createDirectories(dir)
      ids.foreach { id =>
        val ext = MediaCodec.kindOf(id)
        Files.write(dir.resolve(s"m$id.$ext"), MediaCodec.render(id))
      }
      Files.write(marker, ids.length.toString.getBytes)
    }
    dir.toString
  }
}
