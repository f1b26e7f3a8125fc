package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.util.NioCheckpointFileManager

/** Contract spec for the pure-NIO checkpoint file manager that backs
  * every streaming checkpoint in local mode (round 15: replaces the
  * Hadoop local FS whose per-file `chmod` process forks stalled
  * micro-batches). The semantics Spark's WAL / state-store protocols
  * rely on are pinned directly:
  *   - createAtomic publishes all-or-nothing via same-dir rename;
  *   - a no-overwrite createAtomic losing a race surfaces Hadoop's
  *     FileAlreadyExistsException (the metadata-log conflict signal);
  *   - cancel leaves no target and no temp litter;
  *   - open supports seek + positioned reads (state-store readers);
  *   - list/exists/delete/mkdirs round-trip and a missing list target
  *     raises FileNotFoundException like the default manager. */
class NioCheckpointFileManagerSpec extends AnyFunSuite {

  private def withMgr(f: (NioCheckpointFileManager, java.nio.file.Path) => Unit): Unit = {
    val dir = Files.createTempDirectory("nio_ckpt_spec_")
    try f(new NioCheckpointFileManager(new Path(dir.toString), new Configuration()), dir)
    finally graft.util.Scratch.deleteRecursively(dir)
  }

  test("createAtomic publishes on close, atomically, with no temp litter") {
    withMgr { (m, dir) =>
      val target = new Path(s"$dir/sub/wal.1")
      val out = m.createAtomic(target, false)
      out.write("hello-wal".getBytes("UTF-8"))
      assert(!m.exists(target), "target must not exist before close")
      out.close()
      assert(m.exists(target))
      val names = Files.list(dir.resolve("sub")).toArray.map(_.toString)
      assert(names.length == 1, s"temp litter: ${names.mkString(",")}")
      val in = m.open(target)
      val buf = new Array[Byte](9)
      in.readFully(0L, buf)
      in.close()
      assert(new String(buf, "UTF-8") == "hello-wal")
    }
  }

  test("no-overwrite close onto an existing file raises Hadoop FileAlreadyExists") {
    withMgr { (m, dir) =>
      val target = new Path(s"$dir/batch.0")
      val a = m.createAtomic(target, false)
      a.write(1); a.close()
      val b = m.createAtomic(target, false)
      b.write(2)
      intercept[org.apache.hadoop.fs.FileAlreadyExistsException] { b.close() }
      // loser's temp must be cleaned up
      assert(Files.list(dir).toArray.length == 1)
      // overwrite=true replaces
      val c = m.createAtomic(target, true)
      c.write(3); c.close()
      val in = m.open(target)
      assert(in.read() == 3)
      in.close()
    }
  }

  test("cancel leaves neither target nor temp") {
    withMgr { (m, dir) =>
      val target = new Path(s"$dir/cancelled")
      val out = m.createAtomic(target, true)
      out.write(42)
      out.cancel()
      assert(!m.exists(target))
      assert(Files.list(dir).toArray.isEmpty)
    }
  }

  test("open supports seek and positioned reads") {
    withMgr { (m, dir) =>
      val target = new Path(s"$dir/data")
      val out = m.createAtomic(target, true)
      out.write((0 until 64).map(_.toByte).toArray)
      out.close()
      val in = m.open(target)
      in.seek(10)
      assert(in.getPos == 10)
      assert(in.read() == 10)
      val buf = new Array[Byte](4)
      in.readFully(60L, buf)
      assert(buf.toSeq == Seq(60, 61, 62, 63).map(_.toByte))
      // stream position is unaffected by positioned reads
      assert(in.read() == 11)
      in.close()
    }
  }

  test("list/mkdirs/delete round-trip; missing list target is FileNotFound") {
    withMgr { (m, dir) =>
      m.mkdirs(new Path(s"$dir/d1/d2"))
      val f = m.createAtomic(new Path(s"$dir/d1/f"), true)
      f.write(9); f.close()
      val ls = m.list(new Path(s"$dir/d1"))
      assert(ls.map(_.getPath.getName).sorted.toSeq == Seq("d2", "f"))
      assert(ls.find(_.getPath.getName == "d2").get.isDirectory)
      assert(ls.find(_.getPath.getName == "f").get.getLen == 1L)
      m.delete(new Path(s"$dir/d1"))
      assert(!m.exists(new Path(s"$dir/d1")))
      m.delete(new Path(s"$dir/d1")) // idempotent
      intercept[java.io.FileNotFoundException] { m.list(new Path(s"$dir/d1")) }
      assert(m.createCheckpointDirectory().toUri.getPath == dir.toAbsolutePath.toString)
    }
  }
}
