package graft.sources

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop [[Configuration]] (which is
  * `Writable` but not `Serializable`), so executor-side filesystem
  * opens see the SESSION conf — including any `spark.hadoop.*`
  * settings — instead of a fresh default `Configuration()`. The same
  * write/readFields trick Spark's own (private) helper uses. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
