package graft.operators

/** Single hand-rolled RIFF/WAVE encoder for every audio test — the
  * byte layout lives in exactly one place so a header fix cannot
  * leave a sibling test encoding a different format. */
object TestWav {
  def wav(rate: Int, bits: Int, channels: Int, frames: Seq[Seq[Int]],
      extraChunk: Boolean = false): Array[Byte] = {
    val bytesPerSample = bits / 8
    val dataLen = frames.length * channels * bytesPerSample
    val extra = if (extraChunk) 8 + 4 else 0
    val bb = java.nio.ByteBuffer.allocate(44 + extra + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + extra + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    if (extraChunk) // LIST chunk a real encoder writes for metadata
      bb.put("LIST".getBytes("US-ASCII")).putInt(4)
        .put("INFO".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * bytesPerSample)
      .putShort((channels * bytesPerSample).toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    frames.foreach(_.foreach { s =>
      if (bits == 16) bb.putShort(s.toShort)
      else bb.put(((s >> 8) + 128).toByte) // 8-bit: unsigned, midpoint 128
    })
    bb.array()
  }

  /** 16-bit mono shorthand. */
  def wav16(rate: Int, samples: Seq[Int]): Array[Byte] =
    wav(rate, 16, 1, samples.map(Seq(_)))
}
