"""identity_p254: the Groth16-facing final-shrink proof.

Reference: risc0's `identity_p254` recursion program — the last hop
before the Groth16 wrap re-proves the root claim with a BN254-native
hash so the wrap circuit can verify it with native-field Poseidon
(`blake3_groth16/src/prove.rs:33-62`, SURVEY.md §2.4 / §3.2).

Our version: a recursion-VM program that verifies ONE root recursion
receipt in-circuit (Baby Bear hashing — cheap hash gates) and re-pins
its claim digest / allowed root to its own public values. The OUTER
STARK of this program is proven under the `poseidon254` hash suite
(core/suites.py): its Merkle trees and Fiat-Shamir transcript are
BN254-native Poseidon, so the Groth16 verifier circuit
(groth16/circuit.py) re-derives every hash at ~240 constraints per
permutation instead of emulating Baby Bear Poseidon2.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core import field as F
from ..prover import stark
from . import air as rair
from . import claims, succinct, vm


def build_identity(rec_po2: int, rec_ps: stark.ProofSystem) -> vm.Prog:
    """Verify one recursion receipt; own publics mirror the child's.

    Witness order: one succinct._child_witness stream.
    """
    p = vm.Prog(f"identity-p{rec_po2}q{rec_ps.queries}"
                f"e{rec_ps.commit_expand}")
    pub_w, _ctrl, _cw = succinct._verify_child(p, rec_po2, rec_ps)
    # own claim == child claim (groups 2-5 already pinned to own pubs by
    # _verify_child: allowed-root pass-through + zero spares)
    p.assert_eq(pub_w[0], p.pub(0))
    p.assert_eq(pub_w[1], p.pub(1))
    return p


@dataclasses.dataclass
class P254Receipt:
    """The final-shrink receipt: one RecursionAir STARK under the
    poseidon254 suite, binding (claim digest, allowed root)."""

    proof: stark.SegmentProof
    claim: claims.Claim
    pub_vals: tuple  # 24 canonical scalars (same layout as RecReceipt)
    po2: int


class P254System:
    """Builds/runs identity_p254 for one SuccinctSystem parameterization.

    The outer proof system is the recursion proof system with the hash
    suite swapped to poseidon254; `control_id` is the p254-suite control
    root of the identity program — the value the Groth16 verifying key
    pins (risc0's identity_p254 control id).
    """

    def __init__(self, system: succinct.SuccinctSystem):
        self.system = system
        params = system.params
        self.ps254 = dataclasses.replace(params.rec_ps, hash="poseidon254")
        self.prog = build_identity(params.rec_po2, params.rec_ps)
        # identity is consumed only by the Groth16 wrap (nothing verifies
        # it inside the recursion lattice), so it gets its own po2: the
        # smallest that fits — a smaller outer proof means a smaller wrap
        # circuit (Merkle depth scales with it).
        self.po2 = max(8, (len(self.prog.rows) + 1).bit_length())
        n = 1 << self.po2
        self.prog.finalize(n)
        self.rom = rair.rom_trace(self.prog, n)
        self.control_id = tuple(int(x) for x in np.asarray(
            stark.control_root_of(rair.AIR, self.po2, self.rom,
                                  self.ps254)))
        # jitted once; the p254 hashing inside runs as pure_callback host
        # calls (small one-off proof — CPU backend; tests/conftest force
        # cpu, and the cluster snark task runs the wrap the same way)
        self._prover = stark.make_prover(rair.AIR, self.po2, self.ps254)
        self._verifier = stark.make_verifier(rair.AIR, self.po2,
                                             self.ps254)

    def shrink(self, root: succinct.RecReceipt) -> P254Receipt:
        """Root recursion receipt -> p254 final-shrink receipt."""
        sys_ = self.system
        wit = succinct._child_witness(
            root, sys_._kind_index(root.kind), sys_.allowed_ids,
            sys_.params.rec_ps)
        pub_vals = tuple(root.pub_vals)
        data = rair.data_trace(self.prog, wit, pub_vals)
        proof = self._prover(data, rair.pub_array(pub_vals), self.rom)
        return P254Receipt(proof=proof, claim=root.claim,
                           pub_vals=pub_vals, po2=self.po2)

    def verify(self, r: P254Receipt) -> bool:
        """One p254-suite STARK + claim/pub binding (constant work; no
        inner-receipt re-verification — the identity program did that
        in-circuit)."""
        expected = tuple(list(r.claim.digest())
                         + list(self.system.allowed_root) + [0] * 8)
        if tuple(r.pub_vals) != expected:
            return False
        # p254 digests are raw 254-bit words, NOT Baby Bear Montgomery
        root = jnp.asarray(np.asarray(self.control_id, dtype=np.uint32))
        ok = self._verifier(r.proof, rair.pub_array(r.pub_vals), root)
        return bool(ok)


@functools.lru_cache(maxsize=4)
def get_p254(params: succinct.SuccinctParams) -> P254System:
    return P254System(succinct.get_system(params))
