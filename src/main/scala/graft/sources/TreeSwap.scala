package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * Marker-gated rename-aside swap of a whole directory TREE — the one
 * state machine behind [[graft.ext.AnnIndexStore]] retrain/compact,
 * [[graft.ext.LexIndexStore]] compact, and [[graft.ext.ClusterStore]]
 * commits (previously four hand-copied variants; the copies drifted
 * once — the stale-marked-tmp rule — which is exactly why this is now
 * shared).
 *
 * [[swap]]: `build` writes the complete successor tree at the tmp path;
 * the root `marker` file witnesses that EVERY sub-write committed
 * (parquet `_SUCCESS` files only mark individual sub-writes); then
 * live→bak, tmp→live, drop bak — never delete-then-rename, so at any
 * instant a complete tree is live or recoverable.
 *
 * [[recover]] repairs any crash point: live present → BOTH stale
 * neighbors drop (a marked-but-unswapped tmp goes stale the moment the
 * live tree is consumed again — promoting it later would roll the
 * artifact back); live missing + MARKED tmp → the commit completed,
 * promote it whole; live missing + bak → restore it. An unmarked tmp is
 * an interrupted build: never promoted.
 */
private[graft] object TreeSwap {

  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  def swap(spark: SparkSession, path: String, tmpSuffix: String,
           bakSuffix: String, marker: String)(build: String => Unit): Unit = {
    val fs = hp(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (tmp, bak) = (path + tmpSuffix, path + bakSuffix)
    fs.delete(hp(tmp), true)
    build(tmp)
    fs.create(hp(s"$tmp/$marker")).close()
    fs.delete(hp(bak), true)
    if (fs.exists(hp(path)))
      require(fs.rename(hp(path), hp(bak)), s"rename $path -> $bak failed")
    require(fs.rename(hp(tmp), hp(path)), s"rename $tmp -> $path failed")
    fs.delete(hp(bak), true)
  }

  def recover(spark: SparkSession, path: String, tmpSuffix: String,
              bakSuffix: String, marker: String): Unit = {
    val fs = hp(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (tmp, bak) = (path + tmpSuffix, path + bakSuffix)
    if (fs.exists(hp(path))) {
      fs.delete(hp(bak), true)
      fs.delete(hp(tmp), true)
    } else if (fs.exists(hp(s"$tmp/$marker"))) {
      require(fs.rename(hp(tmp), hp(path)), s"rename $tmp -> $path failed")
      fs.delete(hp(bak), true)
    } else if (fs.exists(hp(bak))) {
      require(fs.rename(hp(bak), hp(path)), s"rename $bak -> $path failed")
      fs.delete(hp(tmp), true)
    }
  }
}
