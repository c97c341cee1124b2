package graft

/** Shared image fixtures for CodecsSpec and MultimodalSpec: one 4×3
  * constant-color-row raster (channel-pooled row means 20 / 100 / 170)
  * and an ImageIO encode helper, so the two specs cannot drift.
  */
object TestRasters {

  /** Expected per-row pooled means of [[raster]]. */
  val RowMeans: Seq[Float] = Seq(20.0f, 100.0f, 170.0f)

  def raster: java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rows = Seq((10, 20, 30), (100, 100, 100), (255, 0, 255))
    for (y <- 0 until 3; x <- 0 until 4) {
      val (r, g, b) = rows(y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  def encode(fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(raster, fmt, out), s"no $fmt writer in JDK")
    out.toByteArray
  }
}
