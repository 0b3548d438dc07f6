"""Keccak coprocessor: circuit, batch receipts, union tree, cluster
stream (reference keccak.rs / union.rs / resolve.rs)."""

import numpy as np
import pytest

from boundless_tpu.air import debug
from boundless_tpu.air import keccak as K
from boundless_tpu.core import field as F
from boundless_tpu.prover import stark
from boundless_tpu.zkvm import coproc, guests
from boundless_tpu.zkvm.executor import (Executor, keccak_f1600,
                                         keccak_perm_digest)

TEST_PS = stark.ProofSystem(queries=2, fri_min_degree=16, commit_expand=2)
rng = np.random.default_rng(9)


def _rand_states(n):
    return [[int(x) for x in rng.integers(0, 1 << 64, size=25,
                                          dtype=np.uint64)]
            for _ in range(n)]


@pytest.mark.slow
def test_witness_matches_reference_and_air():
    states = _rand_states(2)
    data, pub, outs = K.witness(states, 6)
    for st, out in zip(states, outs):
        assert out == [v & ((1 << 64) - 1) for v in keccak_f1600(list(st))]
    ctrl = K.AIR.ctrl_trace(64)
    ok, failures = debug.check_constraints(
        K.AIR, ctrl, F.fp(data), K.PublicValues(states=F.fp(pub["states"])))
    assert ok, failures[:5]


@pytest.mark.slow
def test_tampered_public_state_rejected_at_witness_level():
    states = _rand_states(1)
    data, pub, _ = K.witness(states, 6)
    bad = pub["states"].copy()
    bad[0, 1 + 100] ^= 1  # flip an out limb
    ctrl = K.AIR.ctrl_trace(64)
    ok, _ = debug.check_constraints(
        K.AIR, ctrl, F.fp(data), K.PublicValues(states=F.fp(bad)))
    assert not ok


def test_receipt_digests_match_executor_claims():
    states = _rand_states(3)
    r = coproc.prove_keccak(states, po2=8, dev_mode=True)
    want = [keccak_perm_digest(st, keccak_f1600(list(st)))
            for st in states]
    assert r.digests() == want
    u = coproc.union(r, coproc.prove_keccak(_rand_states(1), po2=8,
                                            dev_mode=True))
    assert len(u.digests()) == 4


@pytest.mark.slow
def test_real_keccak_batch_proof():
    states = _rand_states(2)
    r = coproc.prove_keccak(states, po2=7, ps=TEST_PS)
    assert coproc.verify_keccak(r, TEST_PS)
    # tampered public limb rejected
    import dataclasses

    bad_pub = r.states_pub.copy()
    bad_pub[0, 5] ^= 1
    bad = dataclasses.replace(r, states_pub=bad_pub)
    assert not coproc.verify_keccak(bad, TEST_PS)


def test_cluster_keccak_session_devmode():
    """keccak-ecall guest end-to-end through the coproc stream: exec
    batches the permutations, keccak tasks produce receipts, the union
    tree merges them, resolve checks coverage against the guest's ecall
    claims (dev-mode receipts; real batch proof in the slow test)."""
    import time

    from boundless_tpu.cluster.agent import ClusterContext, run_workers
    from boundless_tpu.cluster.api import ClusterApi
    from boundless_tpu.cluster.hotstore import HotStore
    from boundless_tpu.cluster.storage import SharedFs
    from boundless_tpu.cluster.taskdb import MemoryBackend
    from boundless_tpu.recursion import succinct
    from boundless_tpu.utils import serde
    from boundless_tpu.zkvm import prove

    ctx = ClusterContext(db=MemoryBackend(), hot=HotStore(),
                         store=SharedFs(), ps=prove.TEST_PS,
                         segment_po2=9, coproc_po2=8,
                         succinct=succinct.DevModeSystem(), dev_mode=True)
    api = ClusterApi(ctx)
    api.upload_image("kc", serde.dump_image(guests.keccak_guest()))
    api.upload_input("in0", b"")
    job = api.create_session(dict(img="kc", input="in0"))["uuid"]
    threads, agents = run_workers(
        ctx, {"exec": 1, "prove": 1, "join": 1, "coproc": 1, "aux": 1})
    deadline = time.time() + 90
    st = None
    try:
        while time.time() < deadline:
            st = api.session_status(job)
            if st["status"] in ("SUCCEEDED", "FAILED"):
                break
            time.sleep(0.05)
    finally:
        for a in agents:
            a.stop()
    assert st and st["status"] == "SUCCEEDED", st
    u = ctx.store.get("receipts/coproc", job)
    assert u is not None and len(u.digests()) >= 1
