package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Probe behind the round-13 marker-swap fix (VectorDB.writeMarkerFile).
  *
  * Measured on this Hadoop local FS (10 s, one writer vs one reader):
  * `fs.rename` onto an existing destination returned false for ALL
  * 1119 swaps — the FileSystem rename contract refuses an existing
  * dest — so every "atomic" marker overwrite actually ran the
  * delete+rename fallback, and the reader caught the absence gap 2873
  * times in 73k reads (~4%) plus 195 torn reads. That fabricated
  * absence is exactly the lease-steal WriterLeaseHammerSpec caught
  * after the r12 fix. The `nio` mode drives the replacement
  * (java.nio ATOMIC_MOVE, rename(2)): absent=0 unreadable=0 expected.
  *
  * Usage: MarkerSwapProbe [secs] [hadoop|nio]
  */
object MarkerSwapProbe {
  def main(args: Array[String]): Unit = {
    val nio = args.length > 1 && args(1) == "nio"
    val dir = java.nio.file.Files.createTempDirectory("markerprobe").toString
    val fs = FileSystem.get(new java.net.URI("file:///"), new Configuration())
    val dest = new Path(s"$dir/_lease")
    val secs = if (args.nonEmpty) args(0).toInt else 10

    // seed
    val out0 = fs.create(dest, true)
    out0.write("seed\n123\n".getBytes("UTF-8")); out0.close()
    // nio mode: the swap replaces data without touching the checksum
    // layer, so the seed's .crc must go (writeMarkerFile does the same)
    if (nio) fs.delete(new Path(dir, "._lease.crc"), false)

    @volatile var stop = false
    @volatile var renameFalse = 0
    @volatile var writes = 0L
    val writer = new Thread(() => {
      var i = 0L
      while (!stop) {
        val bytes = s"id-$i\n${System.currentTimeMillis() + 1000}\n".getBytes("UTF-8")
        if (nio) {
          val tmpN = java.nio.file.Paths.get(dir, s"._lease.tmp-$i")
          java.nio.file.Files.write(tmpN, bytes)
          java.nio.file.Files.move(tmpN, java.nio.file.Paths.get(dir, "_lease"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } else {
          val tmp = new Path(dir, s"._lease.tmp-$i")
          val o = fs.create(tmp, true)
          o.write(bytes)
          o.close()
          if (!fs.rename(tmp, dest)) {
            renameFalse += 1
            fs.delete(dest, false)
            fs.rename(tmp, dest)
          }
        }
        i += 1; writes = i
      }
    })
    @volatile var absent = 0
    @volatile var unreadable = 0
    @volatile var reads = 0L
    val reader = new Thread(() => {
      var i = 0L
      while (!stop) {
        if (!fs.exists(dest)) absent += 1
        else {
          try {
            val in = fs.open(dest)
            val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                      finally in.close()
            val ls = txt.trim.split('\n')
            ls(1).trim.toLong
          } catch { case scala.util.control.NonFatal(_) => unreadable += 1 }
        }
        i += 1; reads = i
      }
    })
    writer.start(); reader.start()
    Thread.sleep(secs * 1000L)
    stop = true
    writer.join(); reader.join()
    println(s"PROBE: writes=$writes reads=$reads renameFalse=$renameFalse " +
      s"absent=$absent unreadable=$unreadable")
  }
}
