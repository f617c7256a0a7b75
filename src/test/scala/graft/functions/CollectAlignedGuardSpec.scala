package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the serialize-size guard added for ADVICE r17: the byte count is
  * computed in Long space and a >2GB group fails with a NAMED error (the
  * old Int math overflowed negative and died opaquely inside
  * ByteBuffer.allocate). Pure unit tests — no buffer is allocated. */
class CollectAlignedGuardSpec extends AnyFunSuite {

  test("healthy sizes pass through exactly (4 + size * width per column)") {
    assert(CollectAligned.checkedSerializedBytes(0,
      Array(true, false), Seq("a", "b")) == 4)
    assert(CollectAligned.checkedSerializedBytes(10,
      Array(true, false), Seq("a", "b")) == 4 + 10 * 8 + 10 * 4)
    // the largest healthy single-long-column group fits
    val maxRows = (Int.MaxValue - 4) / 8
    assert(CollectAligned.checkedSerializedBytes(maxRows,
      Array(true), Seq("a")) == 4 + maxRows * 8)
  }

  test("a >2GB group fails loudly, naming the columns and row count") {
    // ADVICE's exact scale class: ~53M rows at five long columns would
    // have overflowed 4 + size*40 to a negative Int
    val e = intercept[IllegalStateException] {
      CollectAligned.checkedSerializedBytes(60 * 1000 * 1000,
        Array(true, true, true, true, true),
        Seq("key", "taxon", "ordinal", "mate", "flag"))
    }
    assert(e.getMessage.contains("collect_aligned group exceeds 2GB serialized"))
    assert(e.getMessage.contains("key, taxon, ordinal, mate, flag"))
    assert(e.getMessage.contains("60000000 rows"))
    // the overflow boundary itself: one row past the Int ceiling fails
    val maxRows = (Int.MaxValue - 4) / 8
    intercept[IllegalStateException] {
      CollectAligned.checkedSerializedBytes(maxRows + 1, Array(true), Seq("a"))
    }
  }
}
