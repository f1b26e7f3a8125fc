package graft.util;

import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.LinkOption;
import java.nio.file.NoSuchFileException;
import java.nio.file.Paths;
import java.nio.file.attribute.PosixFilePermission;
import java.util.EnumSet;
import java.util.Set;

import org.apache.hadoop.fs.LocalFileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsAction;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * {@link LocalFileSystem} whose permission operations are plain
 * syscalls instead of forked {@code chmod} processes.
 *
 * Without the native hadoop library, {@link RawLocalFileSystem}
 * implements {@code setPermission} by shelling out — and every local
 * file CREATE calls it (the created stream applies the requested
 * permission), so each parquet part file, checksum sidecar, _SUCCESS
 * marker and staged chunk paid a process fork+exec. Those forks are
 * the local twin of the streaming-checkpoint stall documented on
 * {@link NioCheckpointFileManager}; this class closes the same hole
 * for the batch write path (GraphStore snapshots, scratch staging,
 * ingest landings). Wired via {@code spark.hadoop.fs.file.impl} in
 * GraftSession — a cluster deployment keeps its platform default, and
 * a JVM with the native library never had the problem.
 *
 * Behavior-preserving: the same permission bits are applied, by
 * {@link Files#setPosixFilePermissions} instead of {@code /bin/chmod}.
 */
public final class NioLocalFileSystem extends LocalFileSystem {

  public NioLocalFileSystem() {
    super(new NioRawLocalFileSystem());
  }

  /** The raw (non-checksummed) half with NIO permission handling. */
  public static final class NioRawLocalFileSystem extends RawLocalFileSystem {
    private static void add(Set<PosixFilePermission> s, FsAction a,
                            PosixFilePermission r, PosixFilePermission w, PosixFilePermission x) {
      if (a.implies(FsAction.READ)) s.add(r);
      if (a.implies(FsAction.WRITE)) s.add(w);
      if (a.implies(FsAction.EXECUTE)) s.add(x);
    }

    @Override
    public void setPermission(Path p, FsPermission permission) throws IOException {
      Set<PosixFilePermission> s = EnumSet.noneOf(PosixFilePermission.class);
      add(s, permission.getUserAction(), PosixFilePermission.OWNER_READ,
          PosixFilePermission.OWNER_WRITE, PosixFilePermission.OWNER_EXECUTE);
      add(s, permission.getGroupAction(), PosixFilePermission.GROUP_READ,
          PosixFilePermission.GROUP_WRITE, PosixFilePermission.GROUP_EXECUTE);
      add(s, permission.getOtherAction(), PosixFilePermission.OTHERS_READ,
          PosixFilePermission.OTHERS_WRITE, PosixFilePermission.OTHERS_EXECUTE);
      try {
        Files.setPosixFilePermissions(
            Paths.get(p.toUri().getPath()), s);
      } catch (NoSuchFileException e) {
        throw new java.io.FileNotFoundException(p.toString());
      } catch (UnsupportedOperationException e) {
        super.setPermission(p, permission); // non-POSIX store: old path
      }
    }
  }
}
