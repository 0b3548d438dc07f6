import time, numpy as np
from boundless_tpu.zkvm import guests, witness
from boundless_tpu.zkvm.executor import Executor
PO2 = 17
image = guests.loop_guest()
iters = ((1 << PO2) - 40) // 2
ex = Executor(image, guests.words([iters]), segment_po2=PO2)
seg = ex.run().segments[0]
t0 = time.time(); w = witness.trace_segment_native(image, seg, PO2); print("native witness:", time.time()-t0, "s")
