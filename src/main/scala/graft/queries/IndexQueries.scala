package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Ranking, Skyline}

/** SURVEY §2.6 round-3 retrieval/layout/analytics surface:
  * inverted-index construction (the search-engine build step as a
  * relational pipeline), compaction planning (small-file bin
  * assignment from manifest statistics — at 100 TB, layout
  * maintenance is a query), and the skyline operator.
  */
object IndexQueries {

  /** Inverted index over the corpus: token → document frequency,
    * collection frequency, and the first 10 postings (doc ids in
    * ascending order — a truncated, deterministic posting-list
    * sample; real shards would store the full sorted list per token
    * range). One explode + one partial-aggregated shuffle on token;
    * the df >= 5 floor keeps the emitted index to terms a query
    * planner would actually keep in the hot dictionary. Postings are
    * rendered as a comma-joined string so the driver hash sees one
    * scalar per token on both engines. */
  private val qInvertedIndex = BoundQuery("q_inverted_index", (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), w => w =!= "")).as("token"))
    tok.groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("cf"),
        array_join(
          transform(slice(array_sort(collect_set(col("doc_id"))), 1, 10),
            x => x.cast("string")), ",").as("postings"))
      .where(col("df") >= 5)
      .orderBy("token")
  }, Some("""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text,' '), x -> x <> '')) AS token
      FROM documents)
    SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(count(*) AS BIGINT) AS cf,
           array_to_string(list_slice(list_sort(list(DISTINCT doc_id)), 1, 10),
                           ',') AS postings
    FROM tok GROUP BY token HAVING count(DISTINCT doc_id) >= 5
    ORDER BY token
  """))

  /** Compaction plan: assign logical files (here the (source, lang)
    * manifest groups with their byte totals) to ~equal-size output
    * bins by cumulative-size range partitioning — bin = exclusive
    * prefix sum div target, target = ceil(total/8). This is the
    * planning half of a small-file compaction job (the same
    * cumulative-chunking rule AQE uses to coalesce shuffle
    * partitions), expressed relationally so the plan itself is
    * auditable. The running sum is Ranking.globalCumSum — two-phase,
    * never a single-partition window — and the rest is one broadcast
    * of a scalar total. */
  private val qCompactionPlan = BoundQuery("q_compaction_plan", (s, d) => {
    val files = Tables.documents(s, d)
      .groupBy(concat_ws("/", col("source"), col("lang")).as("file"))
      .agg(sum(col("n_chars")).as("bytes"))
    val tot = files.agg(sum(col("bytes")).as("t"))
    val cum = Ranking.globalCumSum(files, col("bytes"), "cum", col("file"))
    cum.crossJoin(broadcast(tot))
      .select(col("file"), col("bytes"),
        expr("(cum - bytes) div ((t + 7) div 8)").as("bin"))
      .orderBy("file")
  }, Some("""
    WITH f AS (SELECT source || '/' || lang AS file,
                      CAST(sum(n_chars) AS BIGINT) AS bytes
               FROM documents GROUP BY 1),
    c AS (SELECT file, bytes,
                 CAST(sum(bytes) OVER (ORDER BY file ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS cum
          FROM f),
    tot AS (SELECT CAST(sum(bytes) AS BIGINT) AS t FROM f)
    SELECT file, bytes, CAST((cum - bytes) // ((t + 7) // 8) AS BIGINT) AS bin
    FROM c, tot ORDER BY file
  """))

  /** Skyline (Pareto frontier) of parts: the size/price tradeoff
    * curve — rows no other part beats on BOTH criteria. SQL engines
    * write this as a quadratic NOT EXISTS (the oracle does exactly
    * that); operators.Skyline runs the two-phase bucketed form whose
    * comparisons are O(n²/B) + a broadcast pass over survivors. */
  private val qSkyline = BoundQuery("q_skyline", (s, d) => {
    Skyline.skyline(
      Tables.part(s, d).select("p_partkey", "p_size", "p_retailprice"),
      Seq((col("p_size"), true), (col("p_retailprice"), false)))
      .orderBy("p_partkey")
  }, Some("""
    SELECT p_partkey, p_size, p_retailprice FROM part s
    WHERE NOT EXISTS (SELECT 1 FROM part t
      WHERE t.p_size >= s.p_size AND t.p_retailprice <= s.p_retailprice
        AND (t.p_size > s.p_size OR t.p_retailprice < s.p_retailprice))
    ORDER BY p_partkey
  """))

  /** Join-cardinality estimation audit: the System-R independence
    * estimate |A⋈B| = n_a·n_b / max(d_a, d_b) next to the true join
    * count for the two workhorse joins — the sanity table a query
    * planner (or anyone debugging a blown-up join) reads first. All
    * inputs are exact integer aggregates; the estimate uses integer
    * division so the audit row is hash-stable. */
  private val qJoinCard = BoundQuery("q_join_card", (s, d) => {
    def card(name: String, a: org.apache.spark.sql.DataFrame,
             ka: org.apache.spark.sql.Column,
             b: org.apache.spark.sql.DataFrame,
             kb: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
      val sa = a.agg(count(lit(1)).as("n_left"), countDistinct(ka).as("d_left"))
      val sb = b.agg(count(lit(1)).as("n_right"), countDistinct(kb).as("d_right"))
      val actual = a.join(b, ka === kb).agg(count(lit(1)).as("actual"))
      sa.crossJoin(sb).crossJoin(actual)
        .select(lit(name).as("join_name"), col("n_left"), col("n_right"),
          expr("(n_left * n_right) div greatest(d_left, d_right)").as("est"),
          col("actual"))
    }
    val li = Tables.lineitem(s, d)
    card("orders_lineitem", Tables.orders(s, d), col("o_orderkey"),
        li, col("l_orderkey"))
      .unionByName(card("part_lineitem", Tables.part(s, d), col("p_partkey"),
        li, col("l_partkey")))
      .orderBy("join_name")
  }, Some("""
    WITH ol AS (
      SELECT 'orders_lineitem' AS join_name,
        (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_left,
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_right,
        (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS d_left,
        (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS d_right,
        (SELECT CAST(count(*) AS BIGINT) FROM orders JOIN lineitem
           ON o_orderkey = l_orderkey) AS actual),
    pl AS (
      SELECT 'part_lineitem' AS join_name,
        (SELECT CAST(count(*) AS BIGINT) FROM part) AS n_left,
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_right,
        (SELECT CAST(count(DISTINCT p_partkey) AS BIGINT) FROM part) AS d_left,
        (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem) AS d_right,
        (SELECT CAST(count(*) AS BIGINT) FROM part JOIN lineitem
           ON p_partkey = l_partkey) AS actual),
    u AS (SELECT * FROM ol UNION ALL SELECT * FROM pl)
    SELECT join_name, n_left, n_right,
           CAST((n_left * n_right) // greatest(d_left, d_right) AS BIGINT) AS est,
           actual
    FROM u ORDER BY join_name
  """))

  val all: Seq[BoundQuery] =
    Seq(qInvertedIndex, qCompactionPlan, qSkyline, qJoinCard)
}
