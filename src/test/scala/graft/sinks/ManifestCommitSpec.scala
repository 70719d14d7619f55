package graft.sinks

import org.apache.hadoop.fs.Path

import graft.SparkSpec

class ManifestCommitSpec extends SparkSpec {

  private def root(): (Path, org.apache.hadoop.fs.FileSystem) = {
    val p = new Path(
      java.nio.file.Files.createTempDirectory("graft-manifest").toString + "/t")
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  test("commits are monotonically versioned and the latest wins reads") {
    val (r, fs) = root()
    val v1 = ManifestCommit.commit(fs, r, Map("dir.table" -> "_g1-aaaa1111"))
    val v2 = ManifestCommit.commit(fs, r, Map("dir.table" -> "_g2-bbbb2222"))
    assert(v1 === 1L && v2 === 2L)
    val m = ManifestCommit.latest(fs, r).get
    assert(m.version === 2L && m.dirs("table") === "_g2-bbbb2222")
    assert(ManifestCommit.committed(fs, r).map(_.version) === Seq(1L, 2L))
  }

  test("an interleaved writer never clobbers a committed manifest") {
    val (r, fs) = root()
    ManifestCommit.commit(fs, r, Map("dir.table" -> "_g1-aaaa1111"))
    // another writer committed version 2 out from under us
    val taken = new Path(new Path(r, ManifestCommit.CommitDir), f"${2L}%020d")
    val out = fs.create(taken, false)
    out.write("dir.table=_g2-cccc3333\ntxid=racer\n".getBytes("UTF-8"))
    out.close()
    // our commit re-reads latest() inside the call, takes the NEXT slot,
    // and leaves the racer's manifest byte-for-byte intact (the in-call
    // race window itself is closed by the txid read-back after rename —
    // the loser of a true same-slot interleaving throws "lost the race")
    val v = ManifestCommit.commit(fs, r, Map("dir.table" -> "_g3-dddd4444"))
    assert(v === 3L)
    val all = ManifestCommit.committed(fs, r)
    assert(all.map(_.version) === Seq(1L, 2L, 3L))
    assert(all(1).dirs("table") === "_g2-cccc3333", "racer's commit clobbered")
    assert(ManifestCommit.latest(fs, r).get.dirs("table") === "_g3-dddd4444")
  }

  test("vacuum keeps generations any retained manifest references, reclaims the rest") {
    val (r, fs) = root()
    Seq("_g1-aaaa1111", "_g2-bbbb2222", "_g3-cccc3333").foreach { g =>
      fs.mkdirs(new Path(r, g))
      ManifestCommit.commit(fs, r, Map("dir.table" -> g))
    }
    // crashed-commit debris in _commits must also be reclaimed
    val tmp = new Path(new Path(r, ManifestCommit.CommitDir), ".tmp-deadbeef")
    fs.create(tmp, false).close()
    ManifestCommit.vacuum(fs, r, keep = 2)
    assert(!fs.exists(new Path(r, "_g1-aaaa1111")),
      "generation referenced only by a dropped manifest must be reclaimed")
    assert(fs.exists(new Path(r, "_g2-bbbb2222")),
      "the previous manifest's generation must survive (in-flight readers)")
    assert(fs.exists(new Path(r, "_g3-cccc3333")))
    assert(!fs.exists(tmp), "crashed-commit tmp debris must be reclaimed")
    assert(ManifestCommit.committed(fs, r).map(_.version) === Seq(2L, 3L))
  }

  test("non-generation directories are never vacuum candidates") {
    val (r, fs) = root()
    fs.mkdirs(new Path(r, "day=2024-01-01")) // partitioned-table plain dir
    fs.mkdirs(new Path(r, "_g1-aaaa1111"))
    ManifestCommit.commit(fs, r, Map("dir.x" -> "_g1-aaaa1111"))
    (1 to 3).foreach(i =>
      ManifestCommit.commit(fs, r, Map("dir.x" -> "_g1-aaaa1111")))
    ManifestCommit.vacuum(fs, r, keep = 2)
    assert(fs.exists(new Path(r, "day=2024-01-01")),
      "vacuum must only ever touch _g* generation dirs")
    assert(fs.exists(new Path(r, "_g1-aaaa1111")),
      "a generation the retained manifests reference must survive")
  }
}
