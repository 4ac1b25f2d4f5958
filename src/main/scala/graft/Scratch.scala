package graft

/** Profiling scratch main (contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    import graft.operators.Multimodal
    val ids = (0L until 500L).filter(_ % 3 == 0)
    val orig = ids.map(id => id -> Multimodal.dHash64(Multimodal.imagePayload(id)).get).toMap
    val pert = ids.map(id => id -> Multimodal.dHash64(Multimodal.perturbedImagePayload(id)).get).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val planted = ids.map(id => ham(orig(id), pert(id)))
    println(s"[scratch] planted hamming: min=${planted.min} max=${planted.max} " +
      s"mean=${planted.sum.toDouble / planted.size}")
    println(s"[scratch] planted histogram: ${planted.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sortBy(_._1)}")
    val cross = for {
      i <- ids.indices; j <- (i + 1) until ids.size
    } yield ham(orig(ids(i)), orig(ids(j)))
    println(s"[scratch] natural cross pairs: ${cross.size}, min=${cross.min}, " +
      s"<=2: ${cross.count(_ <= 2)}, <=4: ${cross.count(_ <= 4)}, <=6: ${cross.count(_ <= 6)}, <=10: ${cross.count(_ <= 10)}")
  }
}
