package graft.multimodal

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic on-disk media corpus for q_multimodal_decode: one
  * REAL BMP/PNG/WAV file per id (MediaCodec.render), written once per
  * (tag, id-set) and reused — the test-fixture stand-in for the media
  * bucket a production pipeline would read. The fixture is written by
  * a DISTRIBUTED job (foreachPartition render loop — the same shape a
  * real backfill writing to object storage would use), and the
  * idempotence marker is keyed on an order-invariant digest of the id
  * SEQUENCE (count + combined xxhash64), not just the count, so a
  * changed id-set with an equal cardinality cannot silently reuse a
  * stale corpus. The decode pipeline that consumes it is fully
  * distributed (binaryFile scan + mapPartitions).
  */
object MediaCorpus {

  /** Idempotently materialize the corpus for the ids in `idsDf`
    * (single LongType column); returns the dir. */
  def ensure(idsDf: DataFrame, tag: String): String = synchronized {
    val idCol = col(idsDf.columns.head)
    // order-invariant id-set digest (bit_xor never overflows ANSI
    // arithmetic): one aggregated row to the driver
    val row = idsDf
      .agg(count(lit(1)).as("n"),
        coalesce(expr(s"bit_xor(xxhash64(${idsDf.columns.head}))"),
          lit(0L)).as("dg"))
      .head()
    val stamp = s"${row.getLong(0)}:${java.lang.Long.toHexString(row.getLong(1))}"
    val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft_media_$tag")
    val marker = dir.resolve("_COMPLETE")
    if (!(Files.exists(marker) &&
        new String(Files.readAllBytes(marker)) == stamp)) {
      Files.createDirectories(dir)
      val dirStr = dir.toString
      // distributed render+write: each partition writes its own ids'
      // files (deterministic content, so concurrent re-runs converge);
      // the marker commits only after the job completes
      idsDf.select(idCol.cast("long").as("id")).foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          val base = Paths.get(dirStr)
          rows.foreach { r =>
            val id = r.getLong(0)
            val ext = MediaCodec.kindOf(id)
            Files.write(base.resolve(s"m$id.$ext"), MediaCodec.render(id))
          }
      }
      Files.write(marker, stamp.getBytes)
    }
    dir.toString
  }
}
