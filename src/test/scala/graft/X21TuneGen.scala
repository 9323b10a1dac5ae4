package graft

import org.apache.spark.sql.functions._

import graft.functions.HashedLogReg

/** One-off tuning sweep for the x21 training schedule (VERDICT r8 task
  * #7): accuracy + wall time per (iters, lr, decay) at sf0.1, so the
  * fewer-larger-steps schedule is chosen by measurement, not vibes.
  */
object X21TuneGen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dim = 64
    val feats = HashedLogReg.hashedFeatures(
      HashedLogReg.teacherDocs(Tables.spread(spark, Tables.documents(spark, dir))),
      col("doc_id"), col("y"), col("w"), dim).coalesce(4).cache()
    val n = feats.count()
    val majority = {
      val pos = feats.agg(sum(col("y"))).head().getLong(0)
      math.max(pos, n - pos).toDouble / n
    }
    println(f"n=$n majority=$majority%.4f")
    // JIT warm
    val _warm = HashedLogReg.train(feats, dim, iters = 3, lr = 20.0,
      decay = 0.1)
    locally {
      val t0 = System.nanoTime()
      val (w, b) = HashedLogReg.train(feats, dim, 40, 20.0, 0.1)
      val sec = (System.nanoTime() - t0) / 1e9
      val acc = HashedLogReg.score(feats, w, b)
        .agg(avg(col("correct"))).head().getDouble(0)
      println(f"gd40 acc=$acc%.4f train_sec=$sec%.2f")
    }
    // JIT warm the Newton path too
    HashedLogReg.trainNewton(feats, dim, iters = 2)
    for ((iters, ridge) <- Seq((3, 1e-3), (4, 1e-3), (5, 1e-3),
        (6, 1e-3), (5, 1e-2), (5, 1e-4))) {
      val t0 = System.nanoTime()
      val (w, b) = HashedLogReg.trainNewton(feats, dim, iters, ridge)
      val sec = (System.nanoTime() - t0) / 1e9
      val acc = HashedLogReg.score(feats, w, b)
        .agg(avg(col("correct"))).head().getDouble(0)
      println(f"newton iters=$iters ridge=$ridge%.0e " +
        f"acc=$acc%.4f train_sec=$sec%.2f")
    }
    spark.stop()
  }
}
