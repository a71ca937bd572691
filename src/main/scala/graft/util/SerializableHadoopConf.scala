package graft.util

import org.apache.hadoop.conf.Configuration

import java.io.{ObjectInputStream, ObjectOutputStream}

/** Java-serializable wrapper for a Hadoop Configuration, so executor-side
  * filesystem access (e.g. [[graft.serde.AvroFileIO]]) sees the SESSION's
  * Hadoop settings (spark.hadoop.* — s3a credentials/endpoints, hdfs
  * overrides) instead of a bare `new Configuration()` built from classpath
  * XML only. Capture `spark.sparkContext.hadoopConfiguration` on the driver,
  * ship the wrapper in the task closure, read `.value` in the task.
  * (Hadoop's Configuration is not Serializable itself; it ships its own
  * write/readFields wire format, used here.)
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
