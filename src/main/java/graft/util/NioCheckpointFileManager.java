package graft.util;

import java.io.BufferedOutputStream;
import java.io.FileNotFoundException;
import java.io.IOException;
import java.io.InputStream;
import java.io.OutputStream;
import java.io.UncheckedIOException;
import java.net.URI;
import java.nio.ByteBuffer;
import java.nio.channels.FileChannel;
import java.nio.file.DirectoryStream;
import java.nio.file.Files;
import java.nio.file.NoSuchFileException;
import java.nio.file.Paths;
import java.nio.file.StandardCopyOption;
import java.nio.file.StandardOpenOption;
import java.nio.file.attribute.BasicFileAttributes;
import java.util.ArrayList;
import java.util.Comparator;
import java.util.List;
import java.util.UUID;
import java.util.stream.Stream;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FSDataInputStream;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.PathFilter;
import org.apache.hadoop.fs.PositionedReadable;
import org.apache.hadoop.fs.Seekable;
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager;

/**
 * Pure-NIO {@link CheckpointFileManager} for LOCAL-FILESYSTEM streaming
 * checkpoints (offset/commit WALs and state-store delta/snapshot files),
 * plugged in via {@code spark.sql.streaming.checkpointFileManagerClass}.
 *
 * Why it exists (optimization guide section 7.3, found by driver thread
 * dumps): without the native hadoop library, every file CREATE on
 * Hadoop's RawLocalFileSystem shells out to {@code chmod} — a process
 * fork+exec per checkpoint file. A stateful micro-batch touches dozens
 * of checkpoint files (per-partition per-store deltas, temp files,
 * WAL entries, plus Spark 4.1's checksum sidecars), so the replay
 * harness paid hundreds of forks per query; under a warmed many-query
 * JVM those forks intermittently stall for seconds (thread dumps show
 * micro-batch threads parked in {@code ProcessImpl.forkAndExec}),
 * which is exactly the nondeterministic 2-4x inflation the bench
 * ledgers recorded on streaming keys. java.nio performs the same
 * creates/renames/reads as direct syscalls — no process launch
 * anywhere, and rename-based atomicity is identical (same-directory
 * {@code ATOMIC_MOVE}).
 *
 * Scope: local paths only (it resolves {@code file:} URIs through
 * java.nio). A cluster deployment checkpointing to HDFS/S3 keeps
 * Spark's default manager by not setting the conf — GraftSession sets
 * it only for the local session it builds.
 */
public final class NioCheckpointFileManager implements CheckpointFileManager {

  private final org.apache.hadoop.fs.Path root;

  public NioCheckpointFileManager(org.apache.hadoop.fs.Path path, Configuration conf) {
    this.root = path;
  }

  private static java.nio.file.Path nio(org.apache.hadoop.fs.Path p) {
    URI u = p.toUri();
    String raw = u.getPath() == null || u.getPath().isEmpty() ? p.toString() : u.getPath();
    return Paths.get(raw);
  }

  /** Rethrows a checked exception without declaring it — the
   * interface is Scala-defined (no checked-exception clauses), but
   * callers genuinely catch IOException subclasses like
   * FileNotFoundException, so wrapping would change semantics. */
  @SuppressWarnings("unchecked")
  private static <T extends Throwable> RuntimeException sneaky(Throwable t) throws T {
    throw (T) t;
  }

  private static org.apache.hadoop.fs.Path qualify(java.nio.file.Path p) {
    return new org.apache.hadoop.fs.Path("file", null, p.toAbsolutePath().toString());
  }

  private static FileStatus status(java.nio.file.Path p, BasicFileAttributes a) {
    return new FileStatus(a.isDirectory() ? 0L : a.size(), a.isDirectory(), 1,
        33554432L, a.lastModifiedTime().toMillis(), qualify(p));
  }

  /** Atomic-rename output stream: write a hidden same-directory temp
   * file, move it onto the target at close. Mirrors Spark's
   * RenameBasedFSDataOutputStream contract, including surfacing a
   * Hadoop FileAlreadyExistsException when the no-overwrite rename
   * loses a race (the metadata-log protocol catches exactly that). */
  private static final class NioAtomicStream extends CancellableFSDataOutputStream {
    private final java.nio.file.Path tmp;
    private final java.nio.file.Path target;
    private final boolean overwrite;
    private volatile boolean terminated = false;

    NioAtomicStream(OutputStream out, java.nio.file.Path tmp,
                    java.nio.file.Path target, boolean overwrite) {
      super(out);
      this.tmp = tmp;
      this.target = target;
      this.overwrite = overwrite;
    }

    @Override
    public synchronized void close() throws IOException {
      if (terminated) return;
      terminated = true;
      super.close();
      try {
        if (overwrite) {
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING);
        } else {
          // rename(2) silently replaces, so a plain ATOMIC_MOVE cannot
          // express first-writer-wins; link(2) fails atomically when the
          // target exists, which is exactly the WAL conflict contract
          // (stronger than the default manager's check-then-rename).
          Files.createLink(target, tmp);
          Files.deleteIfExists(tmp);
        }
      } catch (java.nio.file.FileAlreadyExistsException e) {
        try {
          Files.deleteIfExists(tmp);
        } catch (IOException ignored) {
        }
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            "failed to rename " + tmp + " to existing " + target);
      }
    }

    @Override
    public synchronized void cancel() {
      if (terminated) return;
      terminated = true;
      try {
        super.close();
      } catch (IOException ignored) {
      }
      try {
        Files.deleteIfExists(tmp);
      } catch (IOException ignored) {
      }
    }
  }

  /** Seekable/PositionedReadable adapter over a FileChannel so the
   * returned FSDataInputStream supports the random access the state
   * store and metadata-log readers use. */
  private static final class NioSeekableInputStream extends InputStream
      implements Seekable, PositionedReadable {
    private final FileChannel ch;

    NioSeekableInputStream(FileChannel ch) {
      this.ch = ch;
    }

    @Override
    public int read() throws IOException {
      ByteBuffer b = ByteBuffer.allocate(1);
      int n = ch.read(b);
      return n <= 0 ? -1 : (b.get(0) & 0xff);
    }

    @Override
    public int read(byte[] buf, int off, int len) throws IOException {
      return ch.read(ByteBuffer.wrap(buf, off, len));
    }

    @Override
    public void close() throws IOException {
      ch.close();
    }

    @Override
    public void seek(long pos) throws IOException {
      ch.position(pos);
    }

    @Override
    public long getPos() throws IOException {
      return ch.position();
    }

    @Override
    public boolean seekToNewSource(long targetPos) {
      return false;
    }

    @Override
    public int read(long position, byte[] buf, int off, int len) throws IOException {
      return ch.read(ByteBuffer.wrap(buf, off, len), position);
    }

    @Override
    public void readFully(long position, byte[] buf, int off, int len) throws IOException {
      ByteBuffer b = ByteBuffer.wrap(buf, off, len);
      long pos = position;
      while (b.hasRemaining()) {
        int n = ch.read(b, pos);
        if (n < 0) throw new java.io.EOFException("EOF before reading fully at " + pos);
        pos += n;
      }
    }

    @Override
    public void readFully(long position, byte[] buf) throws IOException {
      readFully(position, buf, 0, buf.length);
    }
  }

  @Override
  public CancellableFSDataOutputStream createAtomic(org.apache.hadoop.fs.Path path,
                                                    boolean overwriteIfPossible) {
    java.nio.file.Path target = nio(path);
    java.nio.file.Path dir = target.getParent();
    java.nio.file.Path tmp =
        dir.resolve("." + target.getFileName() + "." + UUID.randomUUID() + ".tmp");
    try {
      Files.createDirectories(dir);
      OutputStream out = new BufferedOutputStream(
          Files.newOutputStream(tmp, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE),
          1 << 16);
      return new NioAtomicStream(out, tmp, target, overwriteIfPossible);
    } catch (IOException e) {
      throw new UncheckedIOException(e);
    }
  }

  @Override
  public FSDataInputStream open(org.apache.hadoop.fs.Path path) {
    try {
      return new FSDataInputStream(new NioSeekableInputStream(
          FileChannel.open(nio(path), StandardOpenOption.READ)));
    } catch (NoSuchFileException e) {
      throw sneaky(new FileNotFoundException(e.getFile()));
    } catch (IOException e) {
      throw sneaky(e);
    }
  }

  @Override
  public FileStatus[] list(org.apache.hadoop.fs.Path path, PathFilter filter) {
    java.nio.file.Path dir = nio(path);
    List<FileStatus> out = new ArrayList<>();
    try (DirectoryStream<java.nio.file.Path> ds = Files.newDirectoryStream(dir)) {
      for (java.nio.file.Path p : ds) {
        FileStatus st;
        try {
          st = status(p, Files.readAttributes(p, BasicFileAttributes.class));
        } catch (NoSuchFileException gone) {
          continue; // raced with a concurrent delete — mirror FS listing
        }
        if (filter == null || filter.accept(st.getPath())) out.add(st);
      }
    } catch (NoSuchFileException e) {
      throw sneaky(new FileNotFoundException(e.getFile()));
    } catch (IOException e) {
      throw sneaky(e);
    }
    return out.toArray(new FileStatus[0]);
  }

  @Override
  public void mkdirs(org.apache.hadoop.fs.Path path) {
    try {
      Files.createDirectories(nio(path));
    } catch (IOException e) {
      throw sneaky(e);
    }
  }

  @Override
  public boolean exists(org.apache.hadoop.fs.Path path) {
    return Files.exists(nio(path));
  }

  @Override
  public void delete(org.apache.hadoop.fs.Path path) {
    java.nio.file.Path p = nio(path);
    try (Stream<java.nio.file.Path> walk = Files.walk(p)) {
      List<java.nio.file.Path> all = walk.sorted(Comparator.reverseOrder())
          .collect(java.util.stream.Collectors.toList());
      for (java.nio.file.Path q : all) {
        try {
          Files.deleteIfExists(q);
        } catch (IOException ignored) {
        }
      }
    } catch (NoSuchFileException ignored) {
      // deleting a missing path is a no-op, like the default manager
    } catch (IOException e) {
      throw new UncheckedIOException(e);
    }
  }

  @Override
  public boolean isLocal() {
    return true;
  }

  @Override
  public org.apache.hadoop.fs.Path createCheckpointDirectory() {
    java.nio.file.Path p = nio(root);
    try {
      Files.createDirectories(p);
    } catch (IOException e) {
      throw new UncheckedIOException(e);
    }
    return qualify(p);
  }
}
