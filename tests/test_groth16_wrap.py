"""The real Groth16 wrap (BASELINE config 5 at CI params).

Full chain: echo session -> real succinct lift -> finalize ->
identity_p254 shrink -> R1CS wrap circuit -> Groth16 proof over the dev
CRS. The receipt has dev_mode=False and verifies with the PAIRING CHECK
only (no STARK re-verification); tampered journal/claim rejected.
Reference: `blake3_groth16/src/prove.rs:33-120`, `tasks/snark.rs:44-71`,
`verify.rs:63-124`.
"""

import dataclasses

import pytest

from boundless_tpu.prover import stark
from boundless_tpu.recursion import claims, succinct
from boundless_tpu.zkvm import guests, paging, prove
from boundless_tpu.zkvm.executor import Executor

SEG_PO2 = 6
SEG_PS = stark.ProofSystem(queries=2, fri_min_degree=16, commit_expand=2)
REC_PS = stark.ProofSystem(queries=2, fri_min_degree=16, commit_expand=2)
PARAMS = succinct.SuccinctParams(seg_po2=SEG_PO2, seg_ps=SEG_PS,
                                 rec_po2=17, rec_ps=REC_PS)


@pytest.fixture(scope="module")
def wrapped_session():
    from boundless_tpu.groth16 import wrap

    image = guests.echo()
    res = Executor(image, guests.words([1, 7]), segment_po2=SEG_PO2).run()
    assert len(res.segments) == 1
    system = succinct.get_system(PARAMS)
    sr = prove.prove_segment(image, res.segments[0], ps=SEG_PS)
    root = system.lift(sr, pre_mem=res.segments[0].pre_mem)
    assert system.verify(root)
    words = [int.from_bytes(res.journal[i : i + 4], "little")
             for i in range(0, len(res.journal), 4)]
    session = succinct.finalize_session(
        root, words, entry_pc=image.entry,
        image_mem_root=paging.image_root(image))
    receipt = wrap.compress(session, kind="groth16", system=system)
    return receipt, system


@pytest.mark.slow
def test_real_groth16_wrap_verifies_pairing_only(wrapped_session):
    from boundless_tpu.groth16 import wrap

    receipt, system = wrapped_session
    assert receipt.dev_mode is False
    assert receipt.selector == wrap.SELECTOR_GROTH16
    # constant-size seal: 3 group elements + publics + the claim
    assert receipt.inner.proof is not None
    assert wrap.verify(receipt, system=system)
    assert wrap.verify(receipt, expected_image_id=receipt.image_id,
                       system=system)


@pytest.mark.slow
def test_real_groth16_wrap_rejects_tampering(wrapped_session):
    from boundless_tpu.groth16 import wrap

    receipt, system = wrapped_session
    # tampered journal
    bad = dataclasses.replace(receipt,
                              journal=receipt.journal[:-4] + b"\x01\x02\x03\x04")
    assert not wrap.verify(bad, system=system)
    # tampered claim (post_journal) — digest binding breaks
    seal = receipt.inner
    bad_claim = dataclasses.replace(seal.claim,
                                    post_journal=tuple([1] * 8))
    bad2 = dataclasses.replace(
        receipt, inner=dataclasses.replace(seal, claim=bad_claim))
    assert not wrap.verify(bad2, system=system)
    # tampered proof point
    from boundless_tpu.groth16.bn254 import G1

    bad_proof = dataclasses.replace(seal.proof,
                                    a=G1.generator())
    bad3 = dataclasses.replace(
        receipt, inner=dataclasses.replace(seal, proof=bad_proof))
    assert not wrap.verify(bad3, system=system)
    # wrong image id
    assert not wrap.verify(receipt, expected_image_id=[0] * 8,
                           system=system)
