package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ReshapeSpec extends AnyFunSuite {

  test("addLeadingDim (R1)") {
    assert(Reshape.addLeadingDim(Array(2L, 2L)).toSeq == Seq(1L, 2L, 2L))
  }

  test("padTo left-pads to 5-D and enforces the max (R2)") {
    assert(Reshape.padTo(Array(2L, 2L)).toSeq == Seq(1L, 1L, 1L, 2L, 2L))
    assert(Reshape.padTo(Array(3L, 4L, 5L), 5).toSeq == Seq(1L, 1L, 3L, 4L, 5L))
    intercept[IllegalArgumentException](Reshape.padTo(Array(1L), 6))
    intercept[IllegalArgumentException](Reshape.padTo(Array(1L, 1L, 1L, 1L, 1L, 2L), 5))
  }

  test("squeeze drops leading singletons, keeps requested tail (R3)") {
    assert(Reshape.squeeze(Array(1L, 1L, 1L, 2L, 2L)).toSeq == Seq(2L, 2L))
    assert(Reshape.squeeze(Array(1L, 1L, 1L)).toSeq == Seq(1L))
    assert(Reshape.squeeze(Array(1L, 1L, 3L, 2L, 2L), Some(3)).toSeq == Seq(3L, 2L, 2L))
    intercept[IllegalArgumentException](Reshape.squeeze(Array(2L, 2L), Some(1)))
  }

  test("validateSlices bounds (R4)") {
    Reshape.validateSlices(0, 10, 10)
    intercept[IllegalArgumentException](Reshape.validateSlices(-1, 5, 10))
    intercept[IllegalArgumentException](Reshape.validateSlices(5, 5, 10))
    intercept[IllegalArgumentException](Reshape.validateSlices(0, 11, 10))
  }
}
