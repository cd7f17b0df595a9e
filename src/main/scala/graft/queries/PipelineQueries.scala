package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.GeoFunctions
import graft.operators.Sessionize
import graft.multimodal.BinaryColumns

/** Geo, sessionization, streaming-rollup and multimodal bindings
  * (SURVEY §2.2 haversine + §2.4 pipeline rows). */
object PipelineQueries {

  /** Haversine distances (reference mlqueries.py:77) from synthetic
    * per-customer coordinates to a fixed landmark, averaged per
    * nation. Distances are rounded to whole meters per row (exact
    * longs) before averaging, so the only cross-engine risk is a trig
    * ulp on a 0.5 m boundary (~1e-10 per row). */
  private val qGeoDistance = BoundQuery("q_geo_distance", (s, d) => {
    val lat = (col("c_custkey") % 180 - 90).cast("double") + lit(0.5)
    val lon = ((col("c_custkey") * 7) % 360 - 180).cast("double") + lit(0.5)
    val km = GeoFunctions.haversineKm(lat, lon, lit(41.9028), lit(12.4964))
    Tables.customer(s, d)
      .withColumn("dist_m", round(km * 1000, 0).cast("long"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(sum(col("dist_m")).as("sm"), count(lit(1)).as("cnt"))
      .select(col("nationkey"),
        (col("sm").cast("double") / col("cnt").cast("double") / lit(1000.0))
          .as("avg_km"))
      .orderBy("nationkey")
  }, Some("""
    WITH pts AS (
      SELECT c_nationkey,
        CAST(round(2 * 6371.0 * atan2(
          sqrt(pow(sin(radians((41.9028) - (CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5)) / 2), 2)
            + cos(radians(CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5)) * cos(radians(41.9028))
              * pow(sin(radians((12.4964) - (CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) + 0.5)) / 2), 2)),
          sqrt(1.0 - (pow(sin(radians((41.9028) - (CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5)) / 2), 2)
            + cos(radians(CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5)) * cos(radians(41.9028))
              * pow(sin(radians((12.4964) - (CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) + 0.5)) / 2), 2)))
        ) * 1000, 0) AS BIGINT) AS dist_m
      FROM customer)
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(sum(dist_m) AS DOUBLE)/CAST(count(*) AS DOUBLE)/1000.0 AS avg_km
    FROM pts GROUP BY 1 ORDER BY 1
  """))

  /** Spatial radius join (GeoJoin.latBandRadiusPairs): customer pairs
    * within 200 km on the synthetic key-derived coordinates — the
    * lat-band blocked form; oracle is the naive all-pairs filter. */
  private val qGeoRadiusJoin = BoundQuery("q_geo_radius_join", (s, d) => {
    val lat = (col("c_custkey") % 180 - 90).cast("double") + lit(0.5)
    val lon = ((col("c_custkey") * 7) % 360 - 180).cast("double") + lit(0.5)
    graft.operators.GeoJoin.latBandRadiusPairs(
      Tables.customer(s, d), col("c_custkey"), lat, lon, radiusKm = 200.0)
      .orderBy("id_a", "id_b")
  }, Some("""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.5 AS lat,
             CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) + 0.5 AS lon
      FROM customer)
    SELECT a.id AS id_a, b.id AS id_b,
      CAST(round(2 * 6371.0 * atan2(
        sqrt(pow(sin(radians((b.lat) - (a.lat)) / 2), 2)
          + cos(radians(a.lat)) * cos(radians(b.lat))
            * pow(sin(radians((b.lon) - (a.lon)) / 2), 2)),
        sqrt(1.0 - (pow(sin(radians((b.lat) - (a.lat)) / 2), 2)
          + cos(radians(a.lat)) * cos(radians(b.lat))
            * pow(sin(radians((b.lon) - (a.lon)) / 2), 2)))
      ) * 1000, 0) AS BIGINT) AS dist_m
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE CAST(round(2 * 6371.0 * atan2(
        sqrt(pow(sin(radians((b.lat) - (a.lat)) / 2), 2)
          + cos(radians(a.lat)) * cos(radians(b.lat))
            * pow(sin(radians((b.lon) - (a.lon)) / 2), 2)),
        sqrt(1.0 - (pow(sin(radians((b.lat) - (a.lat)) / 2), 2)
          + cos(radians(a.lat)) * cos(radians(b.lat))
            * pow(sin(radians((b.lon) - (a.lon)) / 2), 2)))
      ) * 1000, 0) AS BIGINT) <= 200000
    ORDER BY id_a, id_b
  """))

  /** Gap-based sessionization of the events stream (30 min gap). */
  private val qWindowSessions = BoundQuery("q_window_sessions", (s, d) => {
    Sessionize.sessionStats(Tables.events(s, d), col("user_id"), col("ts_ns"),
        gapNanos = 1800000000000L)
      .select(col("key").as("user_id"), col("n_sessions"), col("n_events"),
        col("events_per_session"))
      .orderBy("user_id")
  }, Some("""
    WITH marked AS (
      SELECT user_id,
        CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                  OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)))
    SELECT user_id,
           CAST(sum(is_new) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) AS DOUBLE)/CAST(sum(is_new) AS DOUBLE) AS events_per_session
    FROM marked GROUP BY user_id ORDER BY user_id
  """), headline = true)

  /** Spark's NATIVE session_window, cross-checked against the
    * lag/gap-cumsum formulation (q_window_sessions is the manual
    * twin). Boundary semantics pinned: Spark closes a session when the
    * next event is >= gap after the previous one, and assigns
    * window.start = first event time; the oracle mirrors both on
    * microsecond epochs (the precision session_window actually sees). */
  private val qSessionWindow = BoundQuery("q_session_window", (s, d) => {
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
        col("n"))
      .orderBy("user_id", "session_start_us")
  }, Some("""
    WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events),
    t AS (SELECT user_id, us,
            CASE WHEN lag(us) OVER w IS NULL
                      OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
    s AS (SELECT user_id, us,
            sum(brk) OVER (PARTITION BY user_id ORDER BY us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM t)
    SELECT user_id, CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us
  """))

  /** Hourly event-type rollup — the batch twin of
    * graft.streaming.EventStreams.hourlyCounts (StreamingSpec proves
    * stream==batch on a replay). */
  private val qStreamHourly = BoundQuery("q_stream_hourly", (s, d) => {
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("hour_start", "event_type")
  }, Some("""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_start,
           event_type, CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
  """), headline = true)

  /** Multimodal payload packing: binary column + typed metadata
    * (decode itself is stubbed, see BinaryColumns). */
  private val qMultimodalMeta = BoundQuery("q_multimodal_meta", (s, d) => {
    BinaryColumns.packPayload(Tables.documents(s, d), col("doc_id"), col("text"), "text")
      .select(col("id").as("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.kind").as("kind"),
        col("meta.checksum").as("checksum"))
      .orderBy("doc_id")
  }, Some("""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'text' AS kind, md5(text) AS checksum
    FROM documents ORDER BY doc_id
  """))

  /** Partition-wise stub feature extraction over binary payloads.
    * The decode stage runs as the real per-partition mapPartitions
    * lifecycle, and because the stub decoder is pure arithmetic
    * (BinaryColumns.FakeDecoder), the WHOLE pipeline — pack, decode,
    * schema — is replayed by a full DuckDB oracle; MultimodalSpec
    * additionally pins determinism across partitionings. */
  private val qMultimodalFeatures = BoundQuery("q_multimodal_features", (s, d) => {
    BinaryColumns.extractFeatures(
      BinaryColumns.packPayload(Tables.documents(s, d), col("doc_id"), col("text"), "text"))
      .orderBy("id")
  }, Some("""
    WITH h AS (
      SELECT doc_id,
        (list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, length(text)+1),
            i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
          (a, c) -> (a*31 + c) % 2147483648) * 2654435761) % 2147483648 AS h,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents)
    SELECT doc_id AS id,
      CAST(64 + h % 1857 AS INT) AS width,
      CAST(64 + (h >> 17) % 1017 AS INT) AS height,
      CAST(3 AS INT) AS channels,
      n_bytes
    FROM h ORDER BY id
  """))

  /** REAL media decode on real bytes (round 4, closing the stub
    * decoder gap): a deterministic corpus of GENUINE BMP/PNG/WAV
    * files — spec-compliant headers, CRC'd PNG chunks, Deflater
    * IDAT, PCM frames (multimodal.MediaCodec.render) — is
    * materialized per doc_id, ingested through the binaryFile
    * source, and header-parsed back by magic bytes in the same
    * mapPartitions lifecycle as the stub path
    * (BinaryColumns.decodeMedia). The oracle replays the corpus
    * dimension FORMULAS, so a misread offset or endianness in the
    * parser breaks the round trip; MultimodalSpec additionally
    * decodes hand-written golden bytes so generator and parser
    * cannot share a consistent-but-wrong interpretation. The stub
    * path (q_multimodal_features) stays as the oracle-replayable
    * arithmetic twin. */
  private val qMultimodalDecode = BoundQuery("q_multimodal_decode", (s, d) => {
    // fixture GENERATOR (stands in for the media bucket): a
    // DISTRIBUTED render+write keyed on an id-set digest — no
    // driver-side id collect; the decode pipeline below then reads
    // it back through the binaryFile source
    val ids = Tables.documents(s, d).select(col("doc_id"))
    val tag = java.lang.Integer.toHexString(d.hashCode)
    val dir = graft.multimodal.MediaCorpus.ensure(ids, tag)
    val bin = s.read.format("binaryFile").load(dir + "/m*")
    val packed = bin.select(
      regexp_extract(col("path"), "m(\\d+)\\.", 1).cast("long").as("id"),
      col("content").as("payload"))
    BinaryColumns.decodeMedia(packed).orderBy("id")
  }, Some("""
    SELECT doc_id AS id,
      CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png' ELSE 'wav' END AS format,
      CASE WHEN doc_id % 3 = 0 THEN CAST(16 + (doc_id * 7) % 48 AS INT)
           WHEN doc_id % 3 = 1 THEN CAST(16 + (doc_id * 11) % 48 AS INT)
      END AS width,
      CASE WHEN doc_id % 3 = 0 THEN CAST(16 + (doc_id * 13) % 40 AS INT)
           WHEN doc_id % 3 = 1 THEN CAST(16 + (doc_id * 17) % 40 AS INT)
      END AS height,
      CASE WHEN doc_id % 3 IN (0, 1) THEN 3
           ELSE CAST(1 + doc_id % 2 AS INT) END AS channels,
      CASE WHEN doc_id % 3 = 2 THEN CAST(8000 + (doc_id % 5) * 4000 AS INT)
      END AS sample_rate,
      CASE WHEN doc_id % 3 = 2 THEN
        CAST(((1000 + (doc_id * 37) % 2000) * 1000)
             // (8000 + (doc_id % 5) * 4000) AS BIGINT)
      END AS duration_ms
    FROM documents ORDER BY id
  """))

  /** Per-file manifest of the lineitem scan (sources.Manifest): file
    * basename, row count, key/date/price min-max — the layout-audit
    * table. The oracle names the single physical file the test corpus
    * ships per table; ManifestSpec exercises the real multi-file case
    * (disjoint ascending ranges after a clustered write). */
  private val qManifest = BoundQuery("q_manifest", (s, d) => {
    graft.sources.Manifest.fileStatsOf(Tables.lineitem(s, d),
      Seq("l_orderkey", "l_shipdate", "l_extendedprice"))
      .orderBy("file")
  }, Some("""
    SELECT 'lineitem.parquet' AS file,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(l_orderkey) AS min_l_orderkey,
           max(l_orderkey) AS max_l_orderkey,
           min(l_shipdate) AS min_l_shipdate,
           max(l_shipdate) AS max_l_shipdate,
           min(l_extendedprice) AS min_l_extendedprice,
           max(l_extendedprice) AS max_l_extendedprice
    FROM lineitem
  """))

  val all: Seq[BoundQuery] = Seq(
    qGeoDistance, qGeoRadiusJoin, qWindowSessions, qSessionWindow,
    qStreamHourly, qMultimodalMeta, qMultimodalFeatures,
    qMultimodalDecode, qManifest)
}
