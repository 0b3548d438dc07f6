"""Succinct coproc lattice: lift_keccak + union claims and programs.

Fast tier: CoprocClaim span semantics and dev-mode receipts. Slow tier:
a REAL keccak batch proof accepted by the lift_keccak program evaluator
(the in-circuit verifier logic, run via vm.evaluate — the same data
trace the RecursionAir prover commits), tamper rejection, and union
program construction/continuity.
"""

import secrets

import numpy as np
import pytest

from boundless_tpu.prover import stark
from boundless_tpu.recursion import claims, coproc_succinct as cs, vm
from boundless_tpu.zkvm import coproc

KEC_PS = stark.ProofSystem(queries=2, fri_min_degree=16, commit_expand=2)


def _states(n):
    return [[secrets.randbits(64) for _ in range(25)] for _ in range(n)]


def _dev_receipt(n, po2=8):
    return coproc.prove_keccak(_states(n), po2=po2, dev_mode=True)


def test_claim_of_batch_matches_receipt_digests():
    r = _dev_receipt(3)
    cid = (1,) * 8
    c = cs.CoprocClaim.of_batch(cid, r.states_pub, r.count)
    # folding the receipt's own digest words reproduces the post chain
    h = claims.ZERO_CHAIN
    for k in range(r.count):
        h = cs.chain_step(h, cs.perm_digest_words(r.states_pub[k, 1:]))
    assert c.post_chain == h and c.pre_chain == claims.ZERO_CHAIN
    assert (c.pre_count, c.post_count) == (0, 3)
    # byte form agrees with KeccakReceipt.digests
    d0 = cs.perm_digest_words(r.states_pub[0, 1:])
    assert r.digests()[0] == b"".join(
        int(w).to_bytes(4, "little") for w in d0)


def test_claim_union_spans_and_rejects_discontinuity():
    r1, r2 = _dev_receipt(2), _dev_receipt(2)
    cid = (7,) * 8
    c1 = cs.CoprocClaim.of_batch(cid, r1.states_pub, r1.count)
    c2 = cs.CoprocClaim.of_batch(cid, r2.states_pub, r2.count,
                                 pre_chain=c1.post_chain, pre_count=2)
    u = c1.union(c2)
    assert u.pre_chain == claims.ZERO_CHAIN
    assert u.post_chain == c2.post_chain
    assert (u.pre_count, u.post_count) == (0, 4)
    with pytest.raises(ValueError):
        c2.union(c1)  # wrong order: chains don't meet
    c3 = cs.CoprocClaim.of_batch((8,) * 8, r2.states_pub, r2.count,
                                 pre_chain=c1.post_chain, pre_count=2)
    with pytest.raises(ValueError):
        c1.union(c3)  # circuit id mismatch


def test_devmode_lattice():
    sys_ = cs.DevModeCoprocSystem()
    l1 = sys_.lift(_dev_receipt(2))
    l2 = sys_.lift(_dev_receipt(1), pre_chain=l1.claim.post_chain,
                   pre_count=l1.claim.post_count)
    u = sys_.union(l1, l2)
    assert sys_.verify(u)
    assert u.claim.post_count == 3
    assert u.claim.digest() == cs.CoprocClaim(
        l1.claim.circuit_id, l1.claim.pre_chain, l2.claim.post_chain,
        0, 3).digest()


@pytest.mark.slow
def test_lift_keccak_program_accepts_real_proof_and_rejects_tamper():
    """The in-circuit keccak verifier + claim derivation, executed by the
    recursion VM evaluator on a REAL KeccakAir proof."""
    po2 = 7
    r = coproc.prove_keccak(_states(2), po2=po2, ps=KEC_PS)
    assert coproc.verify_keccak(r, KEC_PS)
    prog = cs.build_lift_keccak(po2, KEC_PS)

    params = cs.CoprocParams(kec_po2=po2, kec_ps=KEC_PS,
                             rec_po2=19, rec_ps=KEC_PS)
    system = object.__new__(cs.CoprocSystem)  # witness helpers only
    system.params = params
    wit = cs.CoprocSystem.lift_witness(system, r)
    cid = coproc.circuit_id(po2, KEC_PS)
    claim = cs.CoprocClaim.of_batch(cid, r.states_pub, r.count)
    pub_vals = tuple(list(claim.digest()) + [0] * 16)
    data = vm.evaluate_auto(prog, wit, pub_vals)  # raises if unprovable
    assert data.shape[0] == len(prog.rows)
    # claim.circuit_id is the VERIFIED control root
    assert claim.circuit_id == cid
    # tamper: a different digest chain must be unsatisfiable
    bad = tuple([(claim.digest()[0] + 1) % cs.P] + list(claim.digest()[1:])
                ) + tuple([0] * 16)
    with pytest.raises(vm.EvalError):
        vm.evaluate_auto(prog, wit, bad)
    # tamper: flip a public state limb -> proof binding fails
    r2 = coproc.KeccakReceipt(proof=r.proof,
                              states_pub=np.array(r.states_pub),
                              po2=r.po2, count=r.count)
    r2.states_pub[0, 5] = (int(r2.states_pub[0, 5]) + 1) % cs.P
    wit2 = cs.CoprocSystem.lift_witness(system, r2)
    claim2 = cs.CoprocClaim.of_batch(cid, r2.states_pub, r2.count)
    with pytest.raises(vm.EvalError):
        vm.evaluate_auto(prog, wit2,
                         tuple(list(claim2.digest()) + [0] * 16))


@pytest.mark.slow
def test_union_program_builds_join_sized():
    ps = stark.ProofSystem(queries=2, fri_min_degree=16, commit_expand=2)
    prog = cs.build_union(17, ps)
    assert len(prog.rows) < (1 << 17)


def test_cluster_keccak_session_devmode_succinct_plane():
    """Dev-mode cluster e2e with the succinct coproc lattice enabled:
    keccak batches lift with chained spans, the union tree runs the
    succinct union alongside aggregation, and resolve checks the union
    claim's span equals the guest's ecall chain."""
    import time

    from boundless_tpu.cluster.agent import ClusterContext, run_workers
    from boundless_tpu.cluster.api import ClusterApi
    from boundless_tpu.cluster.hotstore import HotStore
    from boundless_tpu.cluster.storage import SharedFs
    from boundless_tpu.cluster.taskdb import MemoryBackend
    from boundless_tpu.recursion import succinct
    from boundless_tpu.utils import serde
    from boundless_tpu.zkvm import guests, prove

    ctx = ClusterContext(db=MemoryBackend(), hot=HotStore(),
                         store=SharedFs(), ps=prove.TEST_PS,
                         segment_po2=9, coproc_po2=8,
                         succinct=succinct.DevModeSystem(), dev_mode=True,
                         coproc_succinct=cs.DevModeCoprocSystem())
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
    us = ctx.store.get("receipts/coproc_succ", job)
    assert us is not None
    assert us.claim.pre_chain == claims.ZERO_CHAIN
    assert us.claim.post_count >= 1
