"""Generic DEEP-ALI STARK prover/verifier over Baby Bear (TPU-native).

This is the TPU replacement for the reference's `ProverServer::prove_segment`
core (CUDA kernels in `risc0-sys`/`risc0-circuit-*-sys`; call-site
`prover/crates/workflow/src/tasks/prove.rs:43-49`, SURVEY.md §2.4 / §3.1).

Protocol shape (risc0-style, self-consistent parameterization):

  trace groups ctrl/data/accum on H_N  →  LDE on coset g*H_{4N}
  (constraint-evaluation grid) with Poseidon2 Merkle commitments over the
  rate-1/commit_expand subdomain g*H_{cN} → constraint mix α (ext) →
  composition Q(x) = Σ_k α^k C_k(T(x), T(gx)) / (x^N - 1) (evaluated on
  the full 4N grid — deg Q ≤ 4N-5), split into 4 polys Q_i of degree < N
  committed as 16 base columns → DEEP point z (ext): open taps T_j(z),
  T_j(z·g_N), Q_i(z^4) → DEEP batch mix β → combined quotient
  combo(x) = Σ_j β^j (P_j(x) - P_j(p_j)) / (x - p_j) on the commit domain
  → FRI low-degree proof (fold 16; default 100 queries at rate 1/2,
  ~100-bit conjectured, hash-work-optimal — see ProofSystem) with Merkle
  openings of every group at the FRI query points.

The entire `prove` (and `verify`) traces into a single XLA program:
transcript, hashing, NTTs, constraint evaluation, FRI — there is no
host↔device ping-pong inside a proof.

Max constraint degree is 5 (composition degree ≤ 4N - 5 < 4N).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import field as F
from ..core import fri, merkle
from ..core import ntt as NTT
from ..core.fri import _np_powers
from ..core.transcript import Transcript
from ..air.dsl import Air, BaseAlg, ExtAlg, Columns

INV_RATE = 4
EXT = 4
CHECK_SPLIT = 4  # composition split factor
CHECK_COLS = CHECK_SPLIT * EXT  # 16 base columns


@dataclasses.dataclass(frozen=True)
class ProofSystem:
    """STARK parameterization.

    `commit_expand` is the *commitment* blowup (domain = commit_expand*N;
    code rate 1/commit_expand). Constraint evaluation always runs on the
    4N grid (the composition polynomial has degree ≤ 4N-5 regardless), but
    Merkle hashing — the TPU prover's dominant cost — scales with the
    commitment domain, so rate 1/2 commits half the rows of rate 1/4.
    Conjectured FRI soundness is ~queries*log2(commit_expand) bits: the
    default (100 queries at rate 1/2) matches the reference's 50 queries
    at rate 1/4 (~100 bits; risc0 `risc0-zkp` defaults, SURVEY.md §2.4)
    while halving prover hash work.
    """

    queries: int = 100
    fri_min_degree: int = 256
    commit_expand: int = 2  # 2 = rate 1/2, 4 = rate 1/4 (reference-shaped)
    # Merkle/Fiat-Shamir hash suite (core/suites.py): "poseidon2" (Baby
    # Bear, default) or "poseidon254" (BN254-native; the Groth16-facing
    # identity_p254 final-shrink proof only)
    hash: str = "poseidon2"

    def suite(self):
        from ..core import suites

        return suites.get(self.hash)


class GroupOpening(NamedTuple):
    rows: jnp.ndarray  # (Q, C)
    paths: jnp.ndarray  # (Q, depth, 8)


class SegmentProof(NamedTuple):
    """All-array pytree (jit-friendly); po2 travels beside it (receipt layer)."""

    ctrl_root: Optional[jnp.ndarray]
    data_root: jnp.ndarray
    accum_root: Optional[jnp.ndarray]
    check_root: jnp.ndarray
    taps_ctrl: Optional[jnp.ndarray]  # (ctrl_cols, 2, 4): taps at z, z*gN
    taps_data: jnp.ndarray  # (data_cols, 2, 4)
    taps_accum: Optional[jnp.ndarray]  # (accum_cols, 2, 4)
    taps_check: jnp.ndarray  # (16, 4): taps at z^4
    open_ctrl: Optional[GroupOpening]
    open_data: GroupOpening
    open_accum: Optional[GroupOpening]
    open_check: GroupOpening
    fri_proof: fri.FriProof


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------


def _lde_commit(trace, commit_expand: int = INV_RATE, suite=None):
    """trace (N, C) on H_N -> (coeffs (N, C), eval4 (4N, C), commit tree).

    eval4 lives on the 4N constraint-evaluation grid; the Merkle tree
    commits the commit-domain subset (g*H_{cN} ⊂ g*H_{4N} at stride
    4/c, identical points — so one size-4N NTT serves both).
    """
    coeffs = NTT.interpolate(trace)
    evals = NTT.coset_evaluate(coeffs, expand=INV_RATE)
    step = INV_RATE // commit_expand
    cevals = evals if step == 1 else evals[::step]
    tree = (merkle.commit(cevals) if suite is None
            else suite.commit(cevals))
    return coeffs, evals, tree


# Constraint values: base arrays ((M,) pointwise / (4,)-ext at DEEP) or
# ExtVal-wrapped ext arrays ((M,4) pointwise). At the DEEP point every value
# is already an ext (4,) array, wrapped or not.


class ExtVal:
    """Marker wrapper for extension-field constraint values."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v


class VecVal:
    """A (..., G) base-field array carrying G independent constraints.

    The combiner assigns G consecutive α powers to the trailing axis —
    keeps the traced graph O(1) in G for uniform constraint families
    (bool checks, per-register transitions, ...).
    """

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v


def combine_constraints(cons, alpha, at_deep: bool, keep=None):
    """Σ_k α^k ⊙ C_k -> (..., 4).

    cons items: base array, ExtVal (ext array), or VecVal ((..., G) base
    array consuming G α-powers). At the DEEP point base/VecVal values are
    already ext: base -> (4,), VecVal -> (G, 4).

    `keep` (prover domain-split): optional bool list aligned with cons —
    only the flagged items enter the sum, but α-power offsets are always
    assigned over the FULL list, so per-bucket partial sums add up to
    exactly the single-pass combination (the verifier's α assignment).

    Pointwise (prover) evaluation batches every base-field constraint
    column into one (M, K) @ (K, 4) MXU product (`core/bbmm.py`) — the
    α-combine is the prover's hottest non-hash loop. ExtVal constraints
    (few) stay on the VPU; results are bit-identical either way.
    """
    # Assign α-power offsets.
    sizes = []
    for c in cons:
        if isinstance(c, VecVal):
            sizes.append(c.v.shape[-2] if at_deep else c.v.shape[-1])
        else:
            sizes.append(1)
    total = sum(sizes)
    apows = NTT.ext_powers(alpha, total)  # (total, 4)

    if not at_deep:
        return _combine_pointwise(cons, sizes, apows, keep)

    acc = None
    k = 0
    for i, (c, g) in enumerate(zip(cons, sizes)):
        if keep is not None and not keep[i]:
            k += g
            continue
        if isinstance(c, VecVal):
            term = F.sum_mod(F.ext_mul(apows[k : k + g], c.v), axis=0)
        else:
            if isinstance(c, ExtVal):
                c = c.v
            term = F.ext_mul(jnp.broadcast_to(apows[k], c.shape), c)
        acc = term if acc is None else F.ext_add(acc, term)
        k += g
    return acc


def _combine_pointwise(cons, sizes, apows, keep=None):
    """Pointwise α-combine: one MXU weighted sum over all base columns."""
    from ..core import bbmm

    base_cols = []  # (M,) or (M, G) base-field arrays, in α order
    base_weights = []  # matching (G, 4) weight blocks
    acc = None
    k = 0
    for i, (c, g) in enumerate(zip(cons, sizes)):
        if keep is not None and not keep[i]:
            k += g
            continue
        if isinstance(c, VecVal):
            base_cols.append(c.v)
            base_weights.append(apows[k : k + g])
        elif isinstance(c, ExtVal):
            term = F.ext_mul(jnp.broadcast_to(apows[k], c.v.shape), c.v)
            acc = term if acc is None else F.ext_add(acc, term)
        else:
            base_cols.append(c[:, None])
            base_weights.append(apows[k : k + 1])
        k += g
    if base_cols:
        values = jnp.concatenate(base_cols, axis=1)  # (M, K)
        weights = jnp.concatenate(base_weights, axis=0)  # (K, 4)
        # bb_weighted_sum folds in one R^-1 (Montgomery-product semantics),
        # identical to per-term F.mul — same as the ExtVal path above.
        term = bbmm.bb_weighted_sum(values, weights)
        acc = term if acc is None else F.ext_add(acc, term)
    return acc


# Domain-split threshold: below this row count a single 4N-grid
# constraint pass keeps the traced graph small (tests/dryrun compile
# fast); at or above it, low-degree constraint families are evaluated on
# the N / 2N subgrids (docs/ROOFLINE.md — constraint eval is the top
# prover cost and 75% of lanes are degree <= 2). The split is REQUIRED
# at production size: the round-5 A/B matrix showed the unsplit 4N pass
# exceeds v5e HBM at po2 17 / q100 (XLA OOM, 25.1 G needed vs 15.75 G).
# BT_SPLIT_MIN_ROWS overrides for small-scale experiments only.
SPLIT_MIN_ROWS = int(os.environ.get("BT_SPLIT_MIN_ROWS", "4096"))


def _item_degrees(air, pub):
    """Per-constraint-item max degree bounds (cached; None if the AIR
    doesn't support the symbolic degree algebra). Also caches the
    item class list air._zclass (trans vs point; see Air.constraints)."""
    if "_item_degrees" not in air.__dict__:
        try:
            from ..air.dsl import constraint_degrees

            air.__dict__["_item_degrees"] = [
                int(np.max(np.atleast_1d(d)))
                for d in constraint_degrees(air, pub)]
            air.__dict__["_zclass_cache"] = list(
                getattr(air, "_zclass", [])) or None
        except Exception:  # noqa: BLE001 — algebra unsupported: no split
            air.__dict__["_item_degrees"] = None
            air.__dict__["_zclass_cache"] = None
    return air.__dict__["_item_degrees"], air.__dict__["_zclass_cache"]


def _cons_plan(air, pub, po2: int):
    """Evaluation plan for the composition polynomial.

    Returns (zk, [(expand, [(keep_mask, is_point), ...]), ...]): each
    grid evaluates the constraint list once; each (keep, is_point) job
    combines a subset and divides by Z_H (trans class: ctrl-gated
    families that vanish on the blinded zk tail) or Z_H / P_Z (point
    class: families that hold on REAL rows only). Grid choice per item:
    the composition term's degree d(N-1) - N (+ Z for point class) must
    fit below expand*N. Below SPLIT_MIN_ROWS everything runs on the 4N
    grid (small traced graphs for CI-size proofs)."""
    n = 1 << po2
    zk = air.zk_rows(po2) if hasattr(air, "zk_rows") else 0
    degs, zclass = _item_degrees(air, pub)
    if degs is None:
        if zk:
            raise ValueError(
                "blinded AIR requires DegreeAlg/zclass support")
        return 0, [(INV_RATE, [(None, False)])]
    if zk and zclass is None:
        raise ValueError("blinded AIR did not report constraint classes")
    if not zk:
        zclass = [True] * len(degs)  # all trans-class (divide by Z_H)

    split = n >= SPLIT_MIN_ROWS

    def expand_of(d: int, is_point: bool) -> int:
        if not split:
            return INV_RATE
        qdeg = d * (n - 1) - n + (zk if is_point else 0)
        for e in (1, 2):
            if qdeg < e * n:
                return e
        return INV_RATE

    groups = {}
    for i, (d, trans) in enumerate(zip(degs, zclass)):
        key = (expand_of(d, not trans), not trans)
        groups.setdefault(key, [False] * len(degs))[i] = True
    plan = {}
    for (e, is_point), mask in sorted(groups.items(), reverse=True):
        plan.setdefault(e, []).append(
            (None if len(groups) == 1 else mask, is_point))
    return zk, sorted(plan.items(), reverse=True)


@functools.lru_cache(maxsize=None)
def _commit_xs(n: int, expand: int) -> np.ndarray:
    """Host table of commit-domain points g*H_{expand*N} (Montgomery)."""
    m = expand * n
    w = F.ROU_FWD[m.bit_length() - 1]
    xs = _np_powers(w, m) * F.GENERATOR % F.P
    return (xs * (1 << 32) % F.P).astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _domain_tables(n: int, expand: int = INV_RATE):
    """Host tables for the coset g*H_{expand*N}: x (Mont), 1/Z(x) (Mont)."""
    big = expand * n
    w = F.ROU_FWD[big.bit_length() - 1]
    xs = _np_powers(w, big) * F.GENERATOR % F.P
    # Z(x) = x^N - 1 = g^N * w^{iN} - 1; w^N has order `expand` -> cycle.
    gn = pow(F.GENERATOR, n, F.P)
    wn = pow(int(w), n, F.P)
    zvals = []
    for i in range(expand):
        zvals.append((gn * pow(wn, i, F.P) - 1) % F.P)
    zinv = [pow(v, F.P - 2, F.P) for v in zvals]
    inv_z = np.tile(np.array(zinv, dtype=np.int64), big // expand)
    to_mont = lambda a: (a * (1 << 32) % F.P).astype(np.uint32)
    return to_mont(xs), to_mont(inv_z)


def _zk_root_ints(n: int, zk: int) -> list:
    """The zk-region trace-domain points w_N^j, j = n-zk..n-1 (canonical
    ints). P_Z(x) = prod (x - w^j) is the vanishing poly of the blinded
    tail rows; point-class constraints divide by Z_H / P_Z."""
    wn = F.ROU_FWD[n.bit_length() - 1]
    return [pow(wn, j, F.P) for j in range(n - zk, n)]


@functools.lru_cache(maxsize=None)
def _point_tables(n: int, expand: int, zk: int) -> np.ndarray:
    """P_Z(x) / Z_H(x) on g*H_{expand*N} (Montgomery uint32)."""
    big = expand * n
    w = F.ROU_FWD[big.bit_length() - 1]
    xs = _np_powers(w, big) * F.GENERATOR % F.P  # canonical int64
    _, inv_z = _domain_tables(n, expand)
    pz = np.ones(big, dtype=np.int64)
    for r in _zk_root_ints(n, zk):
        pz = pz * ((xs - r) % F.P) % F.P
    inv_z_can = (inv_z.astype(np.int64) * pow(1 << 32, F.P - 2, F.P)) % F.P
    vals = pz * inv_z_can % F.P
    return (vals * (1 << 32) % F.P).astype(np.uint32)


def _ext_basis(c: int):
    """The extension basis element X^c as an ext constant."""
    z = np.zeros(4, dtype=np.int64)
    z[c] = 1
    return F.ext(z)


def _recombine_check_taps(taps_check):
    """(16,4) base-component taps -> Q_i(z^4) ext values (4,4)."""
    qs = []
    for i in range(CHECK_SPLIT):
        acc = None
        for c in range(EXT):
            term = F.ext_mul(taps_check[i * EXT + c], _ext_basis(c))
            acc = term if acc is None else F.ext_add(acc, term)
        qs.append(acc)
    return jnp.stack(qs)


def _weighted_col_sum(evals, weights, chunk: int = 8):
    """Σ_j weights[j] ⊙ evals[:, j] -> (M, 4).

    evals (M, C) base, weights (C, 4) ext. Chunked to bound memory.
    """
    m, c = evals.shape
    acc = jnp.zeros((m, EXT), dtype=jnp.uint32)
    for c0 in range(0, c, chunk):
        c1 = min(c0 + chunk, c)
        terms = F.mul(evals[:, c0:c1, None], weights[None, c0:c1, :])
        acc = F.ext_add(acc, F.sum_mod(terms, axis=1))
    return acc


def _beta_powers(beta, count: int):
    """β^0..β^{count-1}, shape (count, 4)."""
    return NTT.ext_powers(beta, count)


class _TapGeometry(NamedTuple):
    """Static description of which columns open at which DEEP points."""

    group_cols: tuple  # (ctrl, data, accum) column counts


def _deep_points(z, n: int):
    """The three DEEP opening points: z, z*g_N, z^4."""
    g_n = jnp.uint32(F.mont(F.ROU_FWD[n.bit_length() - 1]))
    zg = F.ext_scale(z, g_n)
    z4 = F.ext_pow_const(z, 4)
    return z, zg, z4


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------


def pub_digest_of(pub):
    """Canonical binding digest of a public-values pytree."""
    from ..core import poseidon2 as P2

    leaves = jax.tree_util.tree_leaves(pub)
    if not leaves:
        return jnp.zeros((8,), dtype=jnp.uint32)
    flat = jnp.concatenate([jnp.ravel(x).astype(jnp.uint32) for x in leaves])
    return P2.hash_elems(flat)


def prove(air: Air, data_trace, pub, po2: int,
          ps: ProofSystem = ProofSystem(), ctrl_trace=None) -> SegmentProof:
    """Prove one segment. Fully jittable for fixed (air, po2, ps).

    `pub`: public-values pytree (Montgomery uint32 arrays), visible to the
    AIR's constraints and bound into the transcript via its hash.
    `ctrl_trace`: required iff `air.ctrl_dynamic` (e.g. the rv32im image
    table — per-program data passed as an argument so one compiled prover
    serves every program).
    """
    n = 1 << po2
    assert data_trace.shape == (n, air.data_cols)

    suite = ps.suite()
    tr = suite.transcript()
    tr.mix_pub(pub)

    # --- commit ctrl (circuit-static) and data ---
    has_ctrl = air.ctrl_cols > 0
    has_accum = air.accum_cols > 0
    if has_ctrl and ctrl_trace is None:
        assert not getattr(air, "ctrl_dynamic", False), \
            "this AIR requires a ctrl_trace argument"
        ctrl_trace = air.ctrl_trace(n)
    if has_ctrl:
        ctrl_coeffs, ctrl_evals, ctrl_tree = _lde_commit(
            ctrl_trace, ps.commit_expand, suite)
        tr.mix_digest(ctrl_tree.root)
    data_coeffs, data_evals, data_tree = _lde_commit(
        data_trace, ps.commit_expand, suite)
    tr.mix_digest(data_tree.root)

    # --- phase 2: mix challenges + accumulators ---
    globals_ = (jnp.stack([tr.sample_ext() for _ in range(air.globals_count)])
                if air.globals_count else jnp.zeros((0, EXT), jnp.uint32))
    if has_accum:
        accum_trace = air.accum_trace(ctrl_trace, data_trace, globals_)
        accum_coeffs, accum_evals, accum_tree = _lde_commit(
            accum_trace, ps.commit_expand, suite)
        tr.mix_digest(accum_tree.root)

    alpha = tr.sample_ext()

    # --- composition polynomial over the big domain ---
    def col_view(evals, shiftrows):
        if evals is None:
            return None
        return jnp.roll(evals, -shiftrows, axis=0) if shiftrows else evals

    from ..air import pallas_eval

    zk, plan = _cons_plan(air, pub, po2)

    def _job_table(expand: int, is_point: bool):
        if is_point:
            return jnp.asarray(_point_tables(n, expand, zk))
        return jnp.asarray(_domain_tables(n, expand)[1])

    if (pallas_eval.enabled() and getattr(air, "pallas_cons_ok", False)
            and has_ctrl and has_accum):
        # Fused VMEM constraint kernel + MXU α-combine (same field values;
        # docs/ROOFLINE.md for the HBM-materialisation analysis). The
        # kernel always evaluates on the 4N grid; blinding classes are
        # two masked α-combines over the same kernel output.
        jobs = [(keep, is_point) for e, js in plan for keep, is_point in js]
        combs = pallas_eval.combined_eval(
            air, ctrl_evals, data_evals, accum_evals, globals_, pub, alpha,
            class_masks=[k for k, _ in jobs])
        q_evals = None
        for comb, (_, is_point) in zip(combs, jobs):
            term = F.mul(comb, _job_table(INV_RATE, is_point)[:, None])
            q_evals = term if q_evals is None else F.ext_add(q_evals, term)
        q_coeffs = NTT.coset_interpolate(q_evals, expand=1)  # (4N, 4)
    else:

        def eval_grid(expand: int, jobs):
            """Q-part coefficients from the g*H_{expand*N} subgrid.

            One constraints() trace per grid; each job α-combines its
            item subset and divides by its class divisor. Composition
            terms of degree < expand*N are determined exactly by the
            stride-(4/expand) subgrid of the 4N evaluations — 75% of
            the rv32im lanes are degree <= 2 (air/dsl.py DegreeAlg);
            the summed part coefficients are bit-identical to a
            single-pass 4N evaluation.
            """
            step = INV_RATE // expand
            sub = lambda ev: ev if (ev is None or step == 1) else ev[::step]
            now = Columns(
                ctrl=_ColAccessor(sub(ctrl_evals) if has_ctrl else None),
                data=_ColAccessor(sub(data_evals)),
                accum=_ColAccessor(sub(accum_evals) if has_accum else None),
            )
            nxt = Columns(
                ctrl=_ColAccessor(col_view(
                    sub(ctrl_evals) if has_ctrl else None, expand)),
                data=_ColAccessor(col_view(sub(data_evals), expand)),
                accum=_ColAccessor(col_view(
                    sub(accum_evals) if has_accum else None, expand)),
            )
            cons = air.constraints(BaseAlg(), now, nxt, globals_, pub)
            q_ev = None
            for keep, is_point in jobs:
                comb = combine_constraints(cons, alpha, at_deep=False,
                                           keep=keep)
                term = F.mul(comb, _job_table(expand, is_point)[:, None])
                q_ev = term if q_ev is None else F.ext_add(q_ev, term)
            return NTT.coset_interpolate(q_ev, expand=1)  # (expand*N, 4)

        q_coeffs = None
        for expand, jobs in plan:
            c_e = eval_grid(expand, jobs)
            if q_coeffs is None and expand == INV_RATE:
                q_coeffs = c_e
            elif q_coeffs is None:
                pad = jnp.zeros((INV_RATE * n - c_e.shape[0], EXT),
                                dtype=jnp.uint32)
                q_coeffs = jnp.concatenate([c_e, pad], axis=0)
            else:
                q_coeffs = q_coeffs.at[: c_e.shape[0]].set(
                    F.add(q_coeffs[: c_e.shape[0]], c_e))
    # Split Q(x) = Σ_i x^i Q_i(x^4); commit the 16 base component columns.
    check_coeffs = jnp.concatenate(
        [q_coeffs[i::CHECK_SPLIT] for i in range(CHECK_SPLIT)], axis=1
    )  # (N, 16): col i*4+c = component c of Q_i
    check_evals = NTT.coset_evaluate(check_coeffs, expand=ps.commit_expand)
    check_tree = suite.commit(check_evals)
    tr.mix_digest(check_tree.root)

    # --- DEEP taps ---
    z = tr.sample_ext()
    z_, zg, z4 = _deep_points(z, n)

    def taps_of(coeffs):
        at_z = NTT.eval_poly_ext(coeffs, z_)  # (C, 4)
        at_zg = NTT.eval_poly_ext(coeffs, zg)
        return jnp.stack([at_z, at_zg], axis=1)  # (C, 2, 4)

    taps_ctrl = taps_of(ctrl_coeffs) if has_ctrl else None
    taps_data = taps_of(data_coeffs)
    taps_accum = taps_of(accum_coeffs) if has_accum else None
    taps_check = NTT.eval_poly_ext(check_coeffs, z4)  # (16, 4)

    all_taps = [t for t in (taps_ctrl, taps_data, taps_accum) if t is not None]
    tr.mix_elems(jnp.concatenate(
        [t.reshape(-1) for t in all_taps] + [taps_check.reshape(-1)]))

    # --- DEEP combination (on the commit domain) ---
    beta = tr.sample_ext()
    group_cevals = [t.matrix for t, present in (
        (ctrl_tree if has_ctrl else None, has_ctrl),
        (data_tree, True),
        (accum_tree if has_accum else None, has_accum)) if present]
    trace_cevals = jnp.concatenate(group_cevals, axis=1)  # (cN, Ct)
    trace_taps = jnp.concatenate(all_taps, axis=0)  # (Ct, 2, 4)
    combo = _deep_combo_evals(trace_cevals, trace_taps, check_evals,
                              taps_check, beta, z_, zg, z4, n,
                              ps.commit_expand)

    # --- FRI ---
    fri_proof, indices = fri.prove(tr, combo, queries=ps.queries,
                                   min_degree=ps.fri_min_degree,
                                   inv_rate=ps.commit_expand, suite=suite)

    def open_group(tree):
        rows, paths = merkle.open_rows(tree, indices)
        return GroupOpening(rows, paths)

    return SegmentProof(
        ctrl_root=ctrl_tree.root if has_ctrl else None,
        data_root=data_tree.root,
        accum_root=accum_tree.root if has_accum else None,
        check_root=check_tree.root,
        taps_ctrl=taps_ctrl,
        taps_data=taps_data,
        taps_accum=taps_accum,
        taps_check=taps_check,
        open_ctrl=open_group(ctrl_tree) if has_ctrl else None,
        open_data=open_group(data_tree),
        open_accum=open_group(accum_tree) if has_accum else None,
        open_check=open_group(check_tree),
        fri_proof=fri_proof,
    )


class _ColAccessor:
    """cols[i] -> (M,) base array (pointwise) — see also _TapAccessor."""

    def __init__(self, evals):
        self._evals = evals

    def __getitem__(self, i):
        return self._evals[:, i]

    def block(self, idx):
        """Stacked columns: idx is a slice or index list -> (M, G)."""
        if isinstance(idx, slice):
            return self._evals[:, idx]
        return self._evals[:, jnp.asarray(idx)]


class _TapAccessor:
    """cols[i] -> (4,) ext tap value (DEEP evaluation)."""

    def __init__(self, taps, offset_idx):
        self._taps = taps
        self._o = offset_idx

    def __getitem__(self, i):
        return self._taps[i, self._o]

    def block(self, idx):
        """Stacked taps -> (G, 4)."""
        if isinstance(idx, slice):
            return self._taps[idx, self._o]
        return self._taps[jnp.asarray(idx), self._o]


def _deep_combo_evals(trace_evals, trace_taps, check_evals, taps_check,
                      beta, z, zg, z4, n: int, commit_expand: int):
    """combo(x) = Σ_p (Σ_{j∈p} β^j P_j(x) - Σ_{j∈p} β^j v_j) / (x - p).

    All inputs live on the commit domain g*H_{commit_expand*N}.
    """
    from ..core import bbmm

    big = commit_expand * n
    ct = trace_evals.shape[1]
    total = 2 * ct + CHECK_COLS
    betas = _beta_powers(beta, total)
    w_z = betas[:ct]
    w_zg = betas[ct : 2 * ct]
    w_check = betas[2 * ct :]

    xs = jnp.asarray(_commit_xs(n, commit_expand))  # (cN,) base

    # One batched inversion for all three DEEP denominators (the Fermat
    # ladder contributes O(1) graph ops this way).
    points = jnp.stack([z, zg, z4])  # (3, 4)
    dens = F.ext_sub(F.ext_from_base(xs)[None, :, :],
                     jnp.broadcast_to(points[:, None, :], (3, big, EXT)))
    inv_dens = F.ext_inv(dens)  # (3, 4N, 4)

    # The z- and zg-weighted sums read the same (cN, Ct) eval matrix:
    # fuse them into a single MXU weighted sum with an 8-wide weight
    # block (core/bbmm.py) so the limb decomposition happens once.
    s_both = bbmm.bb_weighted_sum(
        trace_evals, jnp.concatenate([w_z, w_zg], axis=1))  # (cN, 8)
    sums = (s_both[:, :EXT], s_both[:, EXT:],
            bbmm.bb_weighted_sum(check_evals, w_check))

    combo = jnp.zeros((big, EXT), dtype=jnp.uint32)
    for i, (weights, taps, s) in enumerate((
        (w_z, trace_taps[:, 0], sums[0]),
        (w_zg, trace_taps[:, 1], sums[1]),
        (w_check, taps_check, sums[2]),
    )):
        cp = F.sum_mod(F.ext_mul(weights, taps), axis=0)  # (4,)
        num = F.ext_sub(s, jnp.broadcast_to(cp, s.shape))
        combo = F.ext_add(combo, F.ext_mul(num, inv_dens[i]))
    return combo


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------


def verify(air: Air, proof: SegmentProof, pub, po2: int,
           control_root=None, ps: ProofSystem = ProofSystem()):
    """Verify a SegmentProof. Returns a scalar bool array.

    `control_root`: the circuit's known ctrl-group Merkle root ("control
    ID"); required iff the AIR has ctrl columns.
    """
    n = 1 << po2
    big = ps.commit_expand * n  # commit/FRI domain size
    has_ctrl = air.ctrl_cols > 0
    has_accum = air.accum_cols > 0

    suite = ps.suite()
    tr = suite.transcript()
    tr.mix_pub(pub)
    if has_ctrl:
        assert control_root is not None
        tr.mix_digest(control_root)
    tr.mix_digest(proof.data_root)
    globals_ = (jnp.stack([tr.sample_ext() for _ in range(air.globals_count)])
                if air.globals_count else jnp.zeros((0, EXT), jnp.uint32))
    if has_accum:
        tr.mix_digest(proof.accum_root)
    alpha = tr.sample_ext()
    tr.mix_digest(proof.check_root)
    z = tr.sample_ext()
    z_, zg, z4 = _deep_points(z, n)

    all_taps = [t for t in (proof.taps_ctrl, proof.taps_data,
                            proof.taps_accum) if t is not None]
    tr.mix_elems(jnp.concatenate(
        [t.reshape(-1) for t in all_taps] + [proof.taps_check.reshape(-1)]))
    beta = tr.sample_ext()

    # --- ALI check at z ---
    now = Columns(
        ctrl=_TapAccessor(proof.taps_ctrl, 0) if has_ctrl else None,
        data=_TapAccessor(proof.taps_data, 0),
        accum=_TapAccessor(proof.taps_accum, 0) if has_accum else None,
    )
    nxt = Columns(
        ctrl=_TapAccessor(proof.taps_ctrl, 1) if has_ctrl else None,
        data=_TapAccessor(proof.taps_data, 1),
        accum=_TapAccessor(proof.taps_accum, 1) if has_accum else None,
    )
    cons = air.constraints(ExtAlg(), now, nxt, globals_, pub)
    zk = air.zk_rows(po2) if hasattr(air, "zk_rows") else 0
    if zk:
        # Blinded AIR: Z_H * Q == A_trans + A_point * P_Z (point-class
        # families hold on real rows only — see _cons_plan / the prover).
        zc = getattr(air, "_zclass", None)
        assert zc is not None and len(zc) == len(cons)
        comb_t = combine_constraints(cons, alpha, at_deep=True, keep=zc)
        comb_p = combine_constraints(cons, alpha, at_deep=True,
                                     keep=[not t for t in zc])
        pz = F.ext_ones(())
        for r in _zk_root_ints(n, zk):
            pz = F.ext_mul(pz, F.ext_sub(
                z_, F.ext_from_base(jnp.asarray(F.mont(r), jnp.uint32))))
        combined = F.ext_add(comb_t, F.ext_mul(comb_p, pz))
    else:
        combined = combine_constraints(cons, alpha, at_deep=True)
    z_pow_n = F.ext_pow_const(z_, n)
    zz = F.ext_sub(z_pow_n, F.ext_ones(()))  # Z(z) = z^N - 1
    qs = _recombine_check_taps(proof.taps_check)  # (4, 4)
    zpows = NTT.ext_powers(z_, CHECK_SPLIT)  # (4, 4)
    q_at_z = F.sum_mod(F.ext_mul(zpows, qs), axis=0)
    ok = jnp.all(F.sub(combined, F.ext_mul(zz, q_at_z)) == 0)

    # --- FRI + query checks ---
    fri_ok, indices, round0 = fri.verify(tr, proof.fri_proof, big,
                                         queries=ps.queries,
                                         min_degree=ps.fri_min_degree,
                                         inv_rate=ps.commit_expand,
                                         suite=suite)
    ok = ok & fri_ok

    roots_openings = [(proof.check_root, proof.open_check)]
    if has_ctrl:
        roots_openings.append((control_root, proof.open_ctrl))
    roots_openings.append((proof.data_root, proof.open_data))
    if has_accum:
        roots_openings.append((proof.accum_root, proof.open_accum))
    for root, opening in roots_openings:
        ok = ok & jnp.all(suite.verify_rows(root, indices, opening.rows,
                                            opening.paths))

    # Recompute combo at the query points from the opened rows
    # (order must match the prover: ctrl, data, accum).
    parts = []
    if has_ctrl:
        parts.append(proof.open_ctrl.rows)
    parts.append(proof.open_data.rows)
    if has_accum:
        parts.append(proof.open_accum.rows)
    trace_rows = jnp.concatenate(parts, axis=1)  # (Q, Ct)
    trace_taps = jnp.concatenate(all_taps, axis=0)

    ct = trace_rows.shape[1]
    betas = _beta_powers(beta, 2 * ct + CHECK_COLS)
    x_at = jnp.asarray(_commit_xs(n, ps.commit_expand))[indices]  # (Q,)

    points = jnp.stack([z_, zg, z4])
    dens = F.ext_sub(F.ext_from_base(x_at)[None, :, :],
                     jnp.broadcast_to(points[:, None, :],
                                      (3, ps.queries, EXT)))
    inv_dens = F.ext_inv(dens)
    expected = jnp.zeros((ps.queries, EXT), dtype=jnp.uint32)
    for i, (weights, rows, taps) in enumerate((
        (betas[:ct], trace_rows, trace_taps[:, 0]),
        (betas[ct : 2 * ct], trace_rows, trace_taps[:, 1]),
        (betas[2 * ct :], proof.open_check.rows, proof.taps_check),
    )):
        s = _weighted_col_sum(rows, weights)  # (Q, 4)
        cp = F.sum_mod(F.ext_mul(weights, taps), axis=0)
        num = F.ext_sub(s, jnp.broadcast_to(cp, s.shape))
        expected = F.ext_add(expected, F.ext_mul(num, inv_dens[i]))
    ok = ok & jnp.all(F.sub(expected, round0) == 0)
    return ok


# ---------------------------------------------------------------------------
# Jitted entry points
# ---------------------------------------------------------------------------
# On this stack each *distinct eager op* costs ~0.5 s of XLA compile, so the
# only viable execution mode is whole-proof jit: one XLA program per
# (air, po2) pair, persistently cached on disk across processes.


def make_prover(air: Air, po2: int, ps: ProofSystem = ProofSystem(),
                donate: bool = False, fit_memory: bool = False):
    """Returns a jitted prover.

    Static-ctrl AIRs: fn(data_trace, pub) -> SegmentProof.
    ctrl_dynamic AIRs: fn(data_trace, pub, ctrl_trace) -> SegmentProof.

    `donate=True` donates the data-trace buffer to the computation
    (callers must pass a fresh trace per proof — the recursion lattice
    does). `fit_memory=True` trades schedule overlap for peak HBM
    (disables the latency-hiding scheduler): the rec_po2-20 rate-1/4
    recursion prover compiles 101 MB past v5e HBM with the default
    schedule (round-5 pipeline measurement), and overlap buffers are
    exactly the kind of slack this reclaims.
    """
    donate_args = (0,) if donate else ()
    options = ({"xla_tpu_enable_latency_hiding_scheduler": "false"}
               if fit_memory else None)

    def _jit(fn):
        return jax.jit(fn, donate_argnums=donate_args,
                       compiler_options=options)

    if getattr(air, "ctrl_dynamic", False):

        @_jit
        def _prove_dyn(data_trace, pub, ctrl_trace):
            return prove(air, data_trace, pub, po2, ps, ctrl_trace)

        return _prove_dyn

    @_jit
    def _prove(data_trace, pub):
        return prove(air, data_trace, pub, po2, ps)

    return _prove


def make_verifier(air: Air, po2: int, ps: ProofSystem = ProofSystem()):
    """Returns jitted fn(proof, pub[, control_root]) -> bool."""
    if air.ctrl_cols > 0:

        @jax.jit
        def _verify(proof, pub, control_root):
            return verify(air, proof, pub, po2, control_root, ps)

        return _verify

    @jax.jit
    def _verify_nc(proof, pub):
        return verify(air, proof, pub, po2, None, ps)

    return _verify_nc


def control_root_of(air: Air, po2: int, ctrl_trace=None,
                    ps: ProofSystem = ProofSystem()):
    """The circuit's control ID: Merkle root of the ctrl group commitment.

    For ctrl_dynamic AIRs (rv32im) this is the program's image_id. Depends
    on ps.commit_expand (the commitment domain is part of the identity).
    """
    n = 1 << po2

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def _root(ct, expand, hashname):
        from ..core import suites

        return _lde_commit(ct, expand, suites.get(hashname))[2].root

    if ctrl_trace is None:
        ctrl_trace = air.ctrl_trace(n)
    return _root(ctrl_trace, ps.commit_expand, ps.hash)
