"""Counter example: multi-segment proving end-to-end.

Counterpart of the reference `examples/counter` (BASELINE config 2): run a
loop guest long enough to span several segments, prove each on TPU, fold
through lift/join, finalize a session receipt, and verify.

    python examples/counter.py [--iters 400] [--po2 8] [--fast]

`--fast` uses the small test proof system (quick compiles; not production
soundness).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--po2", type=int, default=8)
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from boundless_tpu.recursion import receipt as rec
    from boundless_tpu.zkvm import guests, prove
    from boundless_tpu.zkvm.executor import Executor

    ps = prove.TEST_PS if args.fast else prove.DEFAULT_PS
    image = guests.loop_guest()
    print(f"executing loop guest: {args.iters} iterations, po2={args.po2}")
    res = Executor(image, guests.words([args.iters]),
                   segment_po2=args.po2).run()
    print(f"  {res.total_cycles} cycles in {len(res.segments)} segments")

    receipts = []
    for seg in res.segments:
        t0 = time.time()
        sr = prove.prove_segment(image, seg, ps=ps)
        receipts.append(rec.lift(sr, ps=ps, pre_mem=seg.pre_mem))
        print(f"  segment {seg.index}: {seg.cycles} cycles proved in "
              f"{time.time()-t0:.2f}s")

    root = receipts[0]
    for r in receipts[1:]:
        root = rec.join(root, r)
    session = rec.SessionReceipt.finalize(root, image.entry)
    assert session.verify(ps=ps)
    print(f"session receipt verified; journal = {session.journal.hex()}")
    assert session.journal == guests.words([args.iters])
    print("counter example OK")


if __name__ == "__main__":
    main()
