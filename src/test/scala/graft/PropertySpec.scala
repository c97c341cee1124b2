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

  test("processFrames: ack per frame, per-generation clamped progress, at most one DONE each") {
    val rnd = new Random(7)
    (1 to 300).foreach { _ =>
      // filesize 16 = 4 in-order 4-char frames; seqs 1..6 generate dups,
      // gaps, premature, post-completion and REOPENING (seq 1) frames
      val frames = List.fill(rnd.nextInt(12)) {
        Frame("u", 1 + rnd.nextInt(6), List.fill(4)(('a' + rnd.nextInt(26)).toChar).mkString, 16L)
      }
      val (st, acks, done) = Reassembly.processFrames("u", SessionState(1, 0L, -1L, 0), frames)
      assert(acks.length == frames.length, "exactly one ack per frame")
      // generation ordinals never decrease, and advance only on reopen
      val gens = acks.map(_.gen)
      assert(gens == gens.sorted, s"generation must be monotone: $acks")
      assert(gens.forall(_ <= st.gen))
      acks.groupBy(_.gen).foreach { case (g, as) =>
        assert(as.count(_.kind == "DONE") <= 1, s"gen $g: DONE at most once")
        val accepted = as.filter(a => a.kind == "RECEIVED" || a.kind == "DONE")
        assert(accepted.map(_.chunk.length).sum <= 16L, s"gen $g: clamp violated")
        as.filter(_.kind == "DONE").foreach(d => assert(d.written == 16L))
        // within one generation everything after its DONE is a REJECT (a
        // seq-1 reopen moves subsequent acks into the NEXT generation)
        assert(as.dropWhile(_.kind != "DONE").drop(1).forall(_.kind == "REJECT"),
          s"gen $g: non-REJECT after its own DONE: $as")
      }
      // final state accounts exactly for the LAST generation's acks
      val lastGen = acks.filter(_.gen == st.gen)
      assert(st.written <= 16L)
      assert(lastGen.map(_.chunk.length).sum.toLong == st.written,
        "ack chunk flow tracks written within the live generation")
      assert(st.rejected == lastGen.count(_.kind == "REJECT"))
      assert(st.expected - 1 == lastGen.count(a => a.kind == "RECEIVED" || a.kind == "DONE"))
      if (done) assert(lastGen.exists(_.kind == "DONE"), "done implies the last generation closed")
    }
  }

  test("processFrames: a completed uuid reopening in the same batch starts gen+1") {
    val fs = Seq(
      Frame("u", 1, "old!", 4), // single-frame generation 0, completes
      Frame("u", 1, "newer ", 12), // same uuid reopens -> generation 1
      Frame("u", 2, "stuff!", 12))
    val (st, acks, done) = Reassembly.processFrames("u", SessionState(1, 0L, -1L, 0), fs)
    assert(acks.map(a => (a.kind, a.gen, a.chunk)) == Seq(
      ("DONE", 0, "old!"), ("RECEIVED", 1, "newer "), ("DONE", 1, "stuff!")), s"acks: $acks")
    assert(done && st.gen == 1 && st.written == 12L)
    // a non-opener trailing frame still rejects (no generation bump)
    val (st2, acks2, _) = Reassembly.processFrames("v",
      SessionState(1, 0L, -1L, 0), Seq(Frame("v", 1, "hell", 4), Frame("v", 3, "oXXX", 4)))
    assert(acks2.map(a => (a.kind, a.gen)) == Seq(("DONE", 0), ("REJECT", 0)))
    assert(st2.gen == 0)
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
