package graft.tools

/** Prints the staged shard-replay SQL for a query (JSON, one object)
  * so `tools/shard_replay.py` can execute it against DuckDB — the
  * sf10-volume hash gate for the oracles whose monolithic replays are
  * disk-bound (round-13 verdict item 2: q106, q178). The SQL is
  * generated from [[graft.queries.VectorQueries]]' own constants and
  * helper spellings, so the sharded replay can never drift from the
  * monolithic oracle.
  *
  * Usage: tools/run.sh graft.tools.ShardSqlDump <queryName>
  */
object ShardSqlDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    // each plan lives next to the monolithic oracle whose fragments it
    // shares: vector queries (q106/q178) in VectorQueries, the audio
    // fingerprint (q207) in ScalarQueries, weight refinement (q72) in
    // MatchingQueries
    val stages =
      if (name.startsWith("q207")) graft.queries.ScalarQueries.shardReplayPlan(name)
      else if (name.startsWith("q72")) graft.queries.MatchingQueries.shardReplayPlan(name)
      else graft.queries.VectorQueries.shardReplayPlan(name)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val body = stages
      .map { case (kind, sql) => s"""{"kind": ${q(kind)}, "sql": ${q(sql)}}""" }
      .mkString("[", ", ", "]")
    println(s"""{"name": ${q(name)}, "stages": $body}""")
  }
}
