package sparkgraft;

import org.apache.hadoop.fs.LocalFileSystem;

/**
 * LocalFileSystem (checksummed - .crc sibling behavior unchanged)
 * over {@link NoForkRawLocalFileSystem}. Registered via
 * spark.hadoop.fs.file.impl by the engine's session factory when the
 * compiled jar is on the driver classpath; a driver-provided session
 * without the jar keeps stock Hadoop behavior.
 */
public class NoForkLocalFileSystem extends LocalFileSystem {
  public NoForkLocalFileSystem() {
    super(new NoForkRawLocalFileSystem());
  }
}
