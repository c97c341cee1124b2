package graft

import scala.util.Random

import graft.functions.TopK
import graft.streaming.{Frame, Reassembly, SessionState}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure cores, over seeded random cases: the TopK
  * bounded buffer against a sort-based reference, and the reassembly
  * state transition against its protocol invariants under arbitrary
  * frame orderings (dups, out-of-order, overruns arise by construction).
  */
class PropertySpec extends AnyFunSuite {

  test("TopK.Buf equals take-k of the fully sorted input, for random inputs and k") {
    val rnd = new Random(42)
    (1 to 300).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val xs = List.fill(rnd.nextInt(40))((rnd.nextInt(2000) / 100.0 - 10.0, rnd.nextInt(50).toLong))
      val buf = new TopK.Buf(k)
      xs.foreach { case (s, i) => buf.insert(s, i, i) }
      val got = (0 until buf.size).map(i => (buf.scores(i), buf.ids(i))).toList
      val want = xs.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(got == want, s"k=$k xs=$xs")
    }
  }

  test("processFrames: ack per frame, monotone clamped progress, at most one DONE") {
    val rnd = new Random(7)
    (1 to 300).foreach { _ =>
      // filesize 16 = 4 in-order 4-char frames; seqs 1..6 generate dups,
      // gaps, premature and post-completion frames
      val frames = List.fill(rnd.nextInt(12)) {
        Frame("u", 1 + rnd.nextInt(6), List.fill(4)(('a' + rnd.nextInt(26)).toChar).mkString, 16L)
      }
      val (st, acks, done) = Reassembly.processFrames("u", SessionState(1, 0L, -1L, 0), frames)
      assert(acks.length == frames.length, "exactly one ack per frame")
      assert(acks.count(_.kind == "DONE") <= 1, "DONE at most once")
      assert(st.written <= 16L, "clamp: never write past filesize")
      assert(acks.map(_.chunk.length).sum.toLong == st.written, "ack chunk flow tracks written")
      assert(st.rejected == acks.count(_.kind == "REJECT"))
      assert(st.expected - 1 == acks.count(a => a.kind == "RECEIVED" || a.kind == "DONE"))
      if (done) {
        val after = acks.dropWhile(_.kind != "DONE").drop(1)
        assert(after.forall(_.kind == "REJECT"), s"post-DONE acks: $after")
        assert(acks.find(_.kind == "DONE").get.written == 16L)
      }
    }
  }

  test("processFrames: a complete in-order stream always reassembles exactly") {
    val rnd = new Random(11)
    (1 to 100).foreach { _ =>
      val text = List.fill(16)(('a' + rnd.nextInt(26)).toChar).mkString
      val frames = text.grouped(4).zipWithIndex.map { case (c, i) => Frame("u", i + 1, c, 16L) }.toSeq
      val (_, acks, done) = Reassembly.processFrames("u", SessionState(1, 0L, -1L, 0), frames)
      assert(done)
      assert(acks.last.kind == "DONE")
      assert(acks.sortBy(_.next_seq).map(_.chunk).mkString == text)
    }
  }
}
