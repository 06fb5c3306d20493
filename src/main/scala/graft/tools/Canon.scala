package graft.tools

/** Order-insensitive row identity of a DataFrame: (row count, MD5 of
  * sorted Row renderings). Same-JVM comparisons only (Row.toString
  * formatting is stable within one JVM, not across versions). The ONE
  * definition every equality-gating tool shares, so the gate itself
  * can never drift between tools. */
private[tools] object Canon {
  def of(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val rows = df.collect().map(_.toString).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    // the 0x0A separator keeps distinct row SETS from hashing equal
    // when their concatenations coincide (["a", "b c"] vs ["a b", "c"])
    rows.foreach { r => md.update(r.getBytes("UTF-8")); md.update(10.toByte) }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }
}
