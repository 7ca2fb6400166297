package graft

import graft.operators.JdbcUpsert

/** External-database upsert sink: Postgres ON CONFLICT generation
  * matches the reference sink's shape, ANSI MERGE generation is
  * well-formed, and the dialect-free path runs END TO END against
  * embedded Derby — insert, update, idempotent replay — through the
  * key-co-partitioned writer.
  */
class JdbcUpsertSpec extends SparkSpec {

  test("postgres ON CONFLICT statement matches the reference sink shape") {
    val sql = JdbcUpsert.postgresUpsertSql("public.metar_raw",
      Seq("id", "payload"), Seq("id"),
      extraSet = Seq("inserted_at = now()"))
    assert(sql ===
      "INSERT INTO public.metar_raw (id, payload) VALUES (?, ?) " +
        "ON CONFLICT (id) DO UPDATE SET payload = EXCLUDED.payload, " +
        "inserted_at = now()")
    // unsafe identifiers are rejected, not interpolated
    intercept[IllegalArgumentException] {
      JdbcUpsert.postgresUpsertSql("t", Seq("id", "v; DROP TABLE x"),
        Seq("id"))
    }
  }

  test("ansi MERGE statement casts VALUES parameters and covers both branches") {
    val sql = JdbcUpsert.ansiMergeSql("obs",
      Seq("id" -> "BIGINT", "v" -> "BIGINT"), Seq("id"))
    assert(sql ===
      "MERGE INTO obs t USING (VALUES (CAST(? AS BIGINT), " +
        "CAST(? AS BIGINT))) s (id, v) ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET v = s.v " +
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)")
  }

  test("derby end-to-end: insert, update, and replay are effectively exactly-once") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE obs (id BIGINT PRIMARY KEY, v BIGINT, name VARCHAR(32))")

      def readAll(): Seq[(Long, Long, String)] = {
        val rs = conn.createStatement()
          .executeQuery("SELECT id, v, name FROM obs ORDER BY id")
        val out = scala.collection.mutable.Buffer[(Long, Long, String)]()
        while (rs.next()) out += ((rs.getLong(1), rs.getLong(2), rs.getString(3)))
        out.toSeq
      }

      val batch1 = Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 10L, "c"))
        .toDF("id", "v", "name")
      JdbcUpsert.writeGeneric(batch1, url, "obs", Seq("id"))
      assert(readAll() === Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 10L, "c")))

      // second batch updates key 2, inserts key 4
      val batch2 = Seq((2L, 20L, "B"), (4L, 20L, "d")).toDF("id", "v", "name")
      JdbcUpsert.writeGeneric(batch2, url, "obs", Seq("id"))
      assert(readAll() === Seq((1L, 10L, "a"), (2L, 20L, "B"),
        (3L, 10L, "c"), (4L, 20L, "d")))

      // at-least-once replay of the same batch changes nothing (T7)
      JdbcUpsert.writeGeneric(batch2, url, "obs", Seq("id"))
      assert(readAll() === Seq((1L, 10L, "a"), (2L, 20L, "B"),
        (3L, 10L, "c"), (4L, 20L, "d")))
    } finally conn.close()
  }
}
