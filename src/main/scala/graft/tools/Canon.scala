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
    // hash each row's own fixed-width DIGEST, not its raw bytes: no
    // separator choice can be confused by row content (a 0x0A
    // separator would hash ["a\nb","c"] and ["a","b\nc"] equal), and
    // fixed-width blocks make the multiset encoding unambiguous
    rows.foreach { r =>
      md.update(java.security.MessageDigest.getInstance("MD5")
        .digest(r.getBytes("UTF-8")))
    }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }
}
