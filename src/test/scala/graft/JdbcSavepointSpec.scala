package graft

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, DriverManager, SQLException}
import java.util.concurrent.atomic.AtomicInteger

import graft.operators.JdbcUpsert

/** The savepoint release-failure POLICY of the JDBC upsert sink
  * ([[JdbcUpsert.writeGeneric]]): a transient `releaseSavepoint`
  * failure must NOT permanently disable the savepoint optimization
  * (losing it strips the duplicate-key recovery path on
  * transaction-level-abort databases for every later row), while a
  * PERSISTENTLY failing driver must degrade to statement-level
  * rollback after 3 consecutive failures instead of accumulating one
  * live savepoint per inserted row until commit.
  *
  * Driven end-to-end through a `jdbc:graftflaky:` driver that proxies
  * embedded Derby and fails `releaseSavepoint` on a configurable
  * schedule, counting `setSavepoint` calls — the observable that
  * separates the two policies.
  */
object FlakyJdbc {
  val setSavepointCalls = new AtomicInteger(0)
  val releaseCalls = new AtomicInteger(0)

  /** Release calls that throw a GENERIC SQLException: "always", "odd"
    * (every other call — defeats a consecutive-only counter), or a
    * comma-free count string N = fail the first N calls then succeed.
    */
  @volatile var failMode: String = "0"

  def reset(mode: String): Unit = {
    setSavepointCalls.set(0)
    releaseCalls.set(0)
    failMode = mode
  }

  private def shouldFail(n: Int): Boolean =
    failMode == "always" || (failMode == "odd" && n % 2 == 1) ||
      (failMode != "odd" && n <= failMode.toInt)

  private class Handler(real: Connection) extends InvocationHandler {
    override def invoke(proxy: Any, method: Method,
        args: Array[AnyRef]): AnyRef = {
      method.getName match {
        case "setSavepoint" => setSavepointCalls.incrementAndGet()
        case "releaseSavepoint" =>
          if (shouldFail(releaseCalls.incrementAndGet()))
            throw new SQLException("flaky release (simulated)")
        case _ => ()
      }
      try method.invoke(real, args: _*)
      catch { case e: InvocationTargetException => throw e.getCause }
    }
  }

  private class FlakyDriver extends java.sql.Driver {
    private val prefix = "jdbc:graftflaky:"
    override def acceptsURL(url: String): Boolean = url.startsWith(prefix)
    override def connect(url: String,
        info: java.util.Properties): Connection = {
      if (!acceptsURL(url)) return null
      val real = DriverManager.getConnection(
        "jdbc:" + url.stripPrefix(prefix))
      Proxy.newProxyInstance(getClass.getClassLoader,
          Array[Class[_]](classOf[Connection]), new Handler(real))
        .asInstanceOf[Connection]
    }
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def getPropertyInfo(url: String, info: java.util.Properties) =
      Array.empty[java.sql.DriverPropertyInfo]
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException
  }

  def register(): Unit = DriverManager.registerDriver(new FlakyDriver)
}

class JdbcSavepointSpec extends SparkSpec {

  FlakyJdbc.register()

  /** Run `rows` fresh inserts through one partition (one connection,
    * so the per-connection failure counter sequences deterministically)
    * and return how many savepoints were SET.
    */
  private def freshInserts(db: String, mode: String, n: Int): Int = {
    import spark.implicits._
    val url = s"jdbc:graftflaky:derby:memory:$db;create=true"
    val setup = DriverManager.getConnection(url)
    setup.createStatement().execute(
      "CREATE TABLE obs (id BIGINT PRIMARY KEY, v BIGINT)")
    setup.close()
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      FlakyJdbc.reset(mode)
      JdbcUpsert.writeGeneric(
        (1 to n).map(i => (i.toLong, 10L)).toDF("id", "v"),
        url, "obs", Seq("id"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    val check = DriverManager.getConnection(url)
    try {
      val rs = check.createStatement()
        .executeQuery("SELECT count(*) FROM obs")
      rs.next()
      assert(rs.getLong(1) === n.toLong, "every row must still be written")
    } finally check.close()
    FlakyJdbc.setSavepointCalls.get()
  }

  test("one transient release failure keeps savepoints enabled") {
    // release fails once then recovers: all 5 fresh inserts must still
    // run savepoint-protected (disable-on-first-failure would show 1)
    assert(freshInserts("graftsp1", mode = "1", n = 5) === 5)
  }

  test("persistent release failure degrades after 3 consecutive misses") {
    // every release throws: savepoints 1-3 fail consecutively, then the
    // optimization turns off — rows 4-5 insert with no savepoint, and
    // the write still succeeds
    assert(freshInserts("graftsp2", mode = "always", n = 5) === 3)
  }

  test("alternating release failure trips the total cap, not just consecutive") {
    // release fails on every ODD call: the consecutive counter resets on
    // each even success and never reaches 3, but failures still leak one
    // live savepoint each until commit. The TOTAL cap (10) trips at the
    // 19th release (failures at calls 1,3,...,19), so inserts 20-25 run
    // without savepoints — a consecutive-only policy would show 25.
    assert(freshInserts("graftsp3", mode = "odd", n = 25) === 19)
  }
}
