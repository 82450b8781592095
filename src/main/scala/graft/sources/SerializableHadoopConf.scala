package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration`, so executor-side
  * partition readers open files with the SESSION's filesystem settings
  * (credentials, fs.* impls) rather than a default `new Configuration()` —
  * the reference's static-conf bug (`/root/reference/src/main/scala/com/
  * databricks/JsonChunks.scala:106-108`) loses any non-default FS.
  *
  * Deliberately NOT `org.apache.spark.util.SerializableConfiguration`:
  * that class is public but annotated `@Unstable`/`@DeveloperApi` — a
  * library shipping against multiple Spark patch lines keeps its own
  * 10-line stable twin rather than a dependency on an
  * explicitly-changeable internal.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
