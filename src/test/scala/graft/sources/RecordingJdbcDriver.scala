package graft.sources

import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo}
import java.util.Properties
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** Test-scope JDBC proxy driver for the network-path dress rehearsal
  * (r11/r12 stretch item): the Spark distribution ships no Derby
  * network server or client jars (only 250-byte `ClientDriver` stubs
  * with nothing behind them) and the build allows no added
  * dependencies, so an actual `derbynet` boot is impossible here.
  * What the rehearsal must prove, though, is a property of OUR reader,
  * not of Derby: that the partitioned JDBC scan drives the database
  * exclusively through the client-side `java.sql` surface — one
  * independent connection per partition, each issuing its own
  * range-bounded SELECT — with no reach into same-JVM engine state.
  * This driver proves it by interposition: it accepts
  * `jdbc:graftrehearsal:<real-url-sans-jdbc:>`, forwards to the real
  * driver, and records every connection handed out and every SQL
  * prepared on it. If the scan did anything embedded-specific, the
  * recorded protocol would not be the complete story and the
  * re-read's rows could not match — JdbcSourceSpec asserts both the
  * protocol shape and row equality.
  */
class RecordingJdbcDriver extends Driver {
  import RecordingJdbcDriver._

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(Prefix)

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: not ours → null
    val real = DriverManager.getConnection(
      "jdbc:" + url.stripPrefix(Prefix), info)
    val id = connections.incrementAndGet()
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array[Class[_]](classOf[Connection]),
      (_, m, args) => {
        if (m.getName == "prepareStatement" && args != null &&
            args.nonEmpty && args(0).isInstanceOf[String])
          statements.add(id -> args(0).asInstanceOf[String])
        try m.invoke(real, (if (args == null) Array.empty[AnyRef] else args): _*)
        catch { // unwrap so SQLExceptions surface as themselves
          case e: java.lang.reflect.InvocationTargetException => throw e.getCause
        }
      }).asInstanceOf[Connection]
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException
}

object RecordingJdbcDriver {
  val Prefix = "jdbc:graftrehearsal:"
  /** Connections handed out since [[reset]]. */
  val connections = new AtomicInteger(0)
  /** (connection id, SQL) for every statement prepared since [[reset]]. */
  val statements = new ConcurrentLinkedQueue[(Int, String)]

  def reset(): Unit = { connections.set(0); statements.clear() }

  locally { DriverManager.registerDriver(new RecordingJdbcDriver) }
}
