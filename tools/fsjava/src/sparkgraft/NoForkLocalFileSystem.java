package sparkgraft;

import java.io.IOException;
import java.net.URI;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.LocalFileSystem;

/**
 * LocalFileSystem over {@link NoForkRawLocalFileSystem}, with
 * checksum siblings disabled: every file create otherwise also
 * creates (and every rename moves, every read verifies) a ".crc"
 * sibling, doubling the per-file metadata operations of multi-file
 * writes. The engine's integrity story does not rest on local .crc
 * files - parquet footers, epoch markers and publish flags are
 * written after their data and validated by the readers - and real
 * schemes (hdfs://, s3a://) are untouched; this class is registered
 * for file:// only by the engine's session factory. Reads of files
 * that still carry a .crc sibling skip verification rather than
 * failing.
 */
public class NoForkLocalFileSystem extends LocalFileSystem {
  public NoForkLocalFileSystem() {
    super(new NoForkRawLocalFileSystem());
  }

  @Override
  public void initialize(URI uri, Configuration conf) throws IOException {
    super.initialize(uri, conf);
    setWriteChecksum(false);
    setVerifyChecksum(false);
  }
}
