package sparkgraft;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

import java.io.IOException;

/**
 * RawLocalFileSystem minus the per-file fork: without libhadoop,
 * stock Hadoop applies each created file's/dir's permission by
 * fork+exec of /bin/chmod (RawLocalFileSystem.setPermission ->
 * Shell.execCommand), which serializes every multi-file write on the
 * JVM's process-spawn path - a 256-directory partitioned parquet
 * write spends ~6 s in chmod forks for ~0.5 s of actual writing.
 * Created files keep the process umask defaults, which is exactly
 * what a single-user local filesystem needs; explicit permission
 * management belongs to real clusters (hdfs://, s3a://), which this
 * class never serves - it is registered for the file:// scheme only.
 * Same shape as the widely used no-op-permissions local FS
 * workarounds in other lakehouse projects (e.g. Apache Hudi's
 * BareLocalFileSystem).
 */
public class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  @Override
  public void setPermission(Path p, FsPermission permission)
      throws IOException {
    // no-op: skip the fork+exec chmod; umask already applied by the JVM
  }
}
