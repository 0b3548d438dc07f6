"""Groth16 production path: MSM prover + zkey-shaped CRS ingestion.

The trapdoor prover (dev) and the MSM prover (production shape —
coset-NTT QAP division + Pippenger over a CRS) must both produce
verifying proofs; the CRS container (groth16/crs.py) must round-trip the
full proving key so a deployment can ingest a ceremony CRS and never
materialize the trapdoor. Reference: `blake3_groth16/src/prove.rs`,
`xtask/src/setup_blake3_groth16.rs`."""

from boundless_tpu.groth16 import crs, qap, r1cs
from boundless_tpu.groth16.protocol import verify as g16_verify


def _toy_system():
    """z = x*y public; plus w*w = w2 for QAP headroom."""
    b = r1cs.Builder(concrete=True)
    z = b.pub_var(15)
    x = b.wit(3)
    y = b.wit(5)
    w = b.wit(7)
    w2 = b.wit(49)
    b.enforce(b.lc(x), b.lc(y), b.lc(z))
    b.enforce(b.lc(w), b.lc(w), b.lc(w2))
    return b.to_sparse(), b.witness()


def test_msm_prover_and_crs_roundtrip(tmp_path):
    sys_, s = _toy_system()
    pk, vk = qap.setup_sparse(sys_)
    proof = qap.prove_sparse(sys_, pk, s, check=True)
    assert g16_verify(vk, proof, s[1 : 1 + sys_.n_pub])

    # zkey-shaped container round-trip
    path = str(tmp_path / "wrap.btzk")
    crs.save_crs(path, pk, vk,
                 crs.CrsMeta(n_rows=len(sys_.rows), n_vars=sys_.n_vars,
                             n_pub=sys_.n_pub))
    pk2, vk2, meta = crs.load_crs(path)
    assert (meta.n_rows, meta.n_vars, meta.n_pub) == (
        len(sys_.rows), sys_.n_vars, sys_.n_pub)
    proof2 = qap.prove_sparse(sys_, pk2, s, check=True)
    assert g16_verify(vk2, proof2, s[1 : 1 + sys_.n_pub])
    # loaded VK verifies the original proof too (same CRS)
    assert g16_verify(vk2, proof, s[1 : 1 + sys_.n_pub])


def test_trapdoor_and_msm_agree_on_validity():
    sys_, s = _toy_system()
    td, vk_td = qap.setup_trapdoor(sys_)
    p_td = qap.prove_with_trapdoor(sys_, td, s, check=True)
    assert g16_verify(vk_td, p_td, s[1 : 1 + sys_.n_pub])
    # tampered public input must fail
    bad = list(s)
    bad[1] = (bad[1] + 1) % qap.R
    assert not g16_verify(vk_td, p_td, bad[1 : 1 + sys_.n_pub])
