package graft.queries

/** DuckDB replay of ml.BpeTrainer — oracles for q_bpe_merges and
  * q_bpe_encode. The merge recurrence is deterministic (exact
  * weighted pair counts, (count desc, pair asc) argmax, leftmost
  * non-overlapping application), so each of the `numMerges`
  * iterations unrolls to CTEs:
  *
  *  - pair counts from adjacent token positions, weighted by word
  *    frequency; one-row argmax with the trainer's total-order
  *    tiebreak;
  *  - merge application via run-parity: a position merges iff it
  *    matches (l, r) and sits at an EVEN offset within its maximal
  *    run of consecutive matches — equivalent to the trainer's
  *    left-to-right fold, because consecutive matches only occur for
  *    l == r runs (for l ≠ r a match at i forces t[i+1] = r ≠ l) and
  *    a greedy fold takes every other one; the merged token l||r can
  *    never re-match l within the same iteration (r is non-empty);
  *  - matched r-positions drop, everything else rebuilds in order.
  *
  * Verified bit-exact against BpeTrainer on sf0.01 before wiring. */
private[queries] object DuckBpeSql {

  private def iteration(t: Int): String = s"""
    p$t AS (
      SELECT toks[i] AS l, toks[i+1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, toks, unnest(range(1, len(toks))) AS i FROM t${t - 1})
      GROUP BY 1, 2),
    best$t AS MATERIALIZED (
      SELECT l, r, cnt FROM p$t ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
    e$t AS MATERIALIZED (
      SELECT word, freq, i AS pos, toks[i] AS tok
      FROM (SELECT word, freq, toks, unnest(range(1, len(toks)+1)) AS i
            FROM t${t - 1})),
    m$t AS (
      SELECT word, pos FROM (
        SELECT word, pos, tok,
          lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM e$t)
      WHERE tok = (SELECT l FROM best$t) AND nxt = (SELECT r FROM best$t)),
    k$t AS MATERIALIZED (
      SELECT word, pos FROM (
        SELECT word, pos,
          row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rno
        FROM (SELECT word, pos,
                pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
              FROM m$t))
      WHERE (rno - 1) % 2 = 0),
    t$t AS MATERIALIZED (
      SELECT e.word, e.freq, list(
        CASE WHEN k.pos IS NOT NULL
             THEN (SELECT l FROM best$t) || (SELECT r FROM best$t)
             ELSE e.tok END ORDER BY e.pos) AS toks
      FROM e$t e
      LEFT JOIN k$t k ON k.word = e.word AND k.pos = e.pos
      WHERE NOT EXISTS (SELECT 1 FROM k$t k2
                        WHERE k2.word = e.word AND k2.pos + 1 = e.pos)
      GROUP BY e.word, e.freq)"""

  /** Shared training chain over the documents table's whitespace
    * words; final segmented vocab is CTE `t$numMerges`. */
  private def base(numMerges: Int): String = s"""
    WITH v0 AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest(list_filter(string_split(text,' '), x -> x <> '')) AS word
        FROM documents) GROUP BY word),
    t0 AS MATERIALIZED (
      SELECT word, freq,
        list_transform(range(1, len(word)+1), i -> word[i]) AS toks
      FROM v0),
    ${(1 to numMerges).map(iteration).mkString(",")}"""

  /** Oracle for q_bpe_merges: (rank, left, right, count). */
  def mergesSql(numMerges: Int): String =
    base(numMerges) + "\n    " + (1 to numMerges).map(t =>
      s"""SELECT CAST($t AS BIGINT) AS rank, l AS "left", r AS "right", cnt AS "count" FROM best$t""")
      .mkString("\n    UNION ALL\n    ") + "\n    ORDER BY rank"

  /** Oracle for q_bpe_encode: per-doc word and subword counts under
    * the trained merges. */
  def encodeSql(numMerges: Int): String =
    base(numMerges) + s""",
    docw AS (SELECT doc_id,
               unnest(list_filter(string_split(text,' '), x -> x <> '')) AS word
             FROM documents)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(e.toks)) AS BIGINT) AS n_subwords
    FROM docw JOIN t$numMerges e USING (word)
    GROUP BY doc_id ORDER BY doc_id
  """
}
