package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration`, so executor-side
  * partition readers open files with the SESSION's filesystem settings
  * (credentials, fs.* impls) rather than a default `new Configuration()` —
  * the reference's static-conf bug (`/root/reference/src/main/scala/com/
  * databricks/JsonChunks.scala:106-108`) loses any non-default FS.
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
