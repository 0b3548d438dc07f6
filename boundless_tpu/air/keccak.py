"""keccak-f[1600] coprocessor AIR — the batch permutation circuit.

TPU-native replacement for the reference's keccak coprocessor circuit
(`risc0-circuit-keccak-sys`, SURVEY.md §2.4; proved by
`ProverServer::prove_keccak` at
`prover/crates/workflow/src/tasks/keccak.rs:71-84`): one segment proves
a BATCH of independent keccak-f[1600] permutations, 24 rows per
permutation (one round per row), fully bit-decomposed:

  * `a` (1600 bool cols) — the state at the top of the round; lane
    (x, y) bit z lives at column 64*(5*y + x) + z.
  * `c1`/`c2` (320 + 320) — theta column-parity helpers:
    c1[x,z] = a[x,0,z] (+) a[x,1,z] (+) a[x,2,z] and
    C[x,z] = c2 = c1 (+) a[x,3,z] (+) a[x,4,z] (each an XOR3, deg 3).
  * `b` (1600) — the post-theta/rho/pi state:
    b[pi(x,y), rot z] = a[x,y,z] (+) C[x-1,z] (+) C[x+1,z-1] (deg 3).
  * round transition (chi + iota): a'[x,y,z] =
    b[x,y,z] (+) (1 - b[x+1,y,z]) * b[x+2,y,z] (+) RC — an XOR3 of
    degrees (1,2,ctrl), total 4; gated by not-perm-end: 5 (the budget).
  * `in_limbs`/`out_limbs` (100 + 100) — the permutation's input and
    output states as 16-bit limbs, carried constant across the
    permutation's 24 rows, bound to `a` bits at the first row and to
    the chi/iota output expression at the last.
  * a LogUp port family (5 ports/row) binds every limb pair to the
    PUBLIC state table: entry seq = 100*perm + slot, value =
    (limb[2*slot], limb[2*slot+1]) — same publics pattern as the
    rv32im io/paging ports, so the verifier (and the keccak-lift
    recursion program) folds the public side itself.

The ctrl group (round one-hots, permutation index ramp, boundary
flags) is STATIC per po2 — the control root is the keccak circuit's
identity (no per-program table).

Batch capacity: floor(N / 24) permutations per segment.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import field as F
from ..core import ntt as NTT
from . import dsl
from ..prover.stark import ExtVal, VecVal

ROUNDS = 24
LANES = 25
LANE_BITS = 64
STATE_BITS = LANES * LANE_BITS  # 1600
LIMBS = 100  # 16-bit limbs per state
ENTRIES = LIMBS  # public entries per permutation (2 limbs each)
PORTS = 5  # LogUp ports per row (5 * 24 >= 100 entries)
TAG_STATE = 8  # publics tag (disjoint from rv32im TAG space)

RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
ROTATION = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _abit(x: int, y: int, z: int) -> int:
    return LANE_BITS * (5 * y + x) + z


class _Alloc:
    def __init__(self):
        self.n = 0

    def get(self, count=1):
        start = self.n
        self.n += count
        return start if count == 1 else slice(start, start + count)


class DataCols:
    def __init__(self):
        a = _Alloc()
        self.a = a.get(STATE_BITS)
        self.c1 = a.get(320)
        self.c2 = a.get(320)
        self.b = a.get(STATE_BITS)
        self.in_limbs = a.get(LIMBS)
        self.out_limbs = a.get(LIMBS)
        self.pad = a.get(4048 - a.n)
        self.total = a.n


class CtrlCols:
    def __init__(self):
        a = _Alloc()
        self.is_first = a.get()
        self.not_last = a.get()
        self.rr = a.get(ROUNDS)  # round one-hot within the permutation
        self.perm = a.get()  # permutation index ramp (0..K-1)
        self.active = a.get()  # row belongs to a full permutation
        self.pad = a.get(32 - a.n)
        self.total = a.n


class AccumCols:
    def __init__(self):
        self.inv = [4 * i for i in range(PORTS)]
        self.running = 4 * PORTS
        self.total = 4 * PORTS + 4  # 24


DC = DataCols()
CC = CtrlCols()
AC = AccumCols()


def max_perms(po2: int) -> int:
    return (1 << po2) // ROUNDS


@dataclasses.dataclass
class PublicValues:
    """states: (KMAX, 1 + 2*LIMBS) — [mask, in limb0..99, out limb0..99]
    per permutation slot (canonical 16-bit limb values, Montgomery)."""

    states: jnp.ndarray


jax.tree_util.register_dataclass(PublicValues, data_fields=["states"],
                                 meta_fields=[])


def public_logup_sum(pub: PublicValues, gamma, delta):
    """Public side of the state-binding port: for each perm k and entry
    slot s < 100: mask / (gamma - (TAG + d*(100k+s) + d2*lo + d3*hi))."""
    dpows = NTT.ext_powers(delta, 4)
    kmax = pub.states.shape[0]
    mask = pub.states[:, 0]
    limbs = pub.states[:, 1:].reshape(kmax, ENTRIES, 2)
    seq = F.fp(np.arange(ENTRIES))[None, :]
    kbase = F.fp(np.arange(kmax) * ENTRIES)[:, None]
    seq_full = F.add(jnp.broadcast_to(kbase, (kmax, ENTRIES)),
                     jnp.broadcast_to(seq, (kmax, ENTRIES)))
    acc = F.ext_from_base(
        jnp.full((kmax, ENTRIES), F.mont(TAG_STATE), jnp.uint32))
    acc = F.ext_add(acc, F.ext_scale(
        jnp.broadcast_to(dpows[1], acc.shape), seq_full))
    acc = F.ext_add(acc, F.ext_scale(
        jnp.broadcast_to(dpows[2], acc.shape), limbs[..., 0]))
    acc = F.ext_add(acc, F.ext_scale(
        jnp.broadcast_to(dpows[3], acc.shape), limbs[..., 1]))
    den = F.ext_sub(jnp.broadcast_to(gamma, acc.shape), acc)
    terms = F.ext_scale(F.ext_inv(den), mask[:, None])
    return F.sum_mod(F.sum_mod(terms, axis=1), axis=0)


class _Rows:
    def __init__(self, cols: dsl.Columns):
        self._cols = cols

    def data(self, i):
        return self._cols.data[i]

    def ctrl(self, i):
        return self._cols.ctrl[i]

    def datab(self, idx):
        return self._cols.data.block(idx)

    def ctrlb(self, idx):
        return self._cols.ctrl.block(idx)


def _xor2(alg, x, y):
    # x + y - 2xy
    two_xy = alg.mul(x, y)
    two_xy = alg.add(two_xy, two_xy)
    return alg.sub(alg.add(x, y), two_xy)


class KeccakAir(dsl.Air):
    name = "keccak"
    ctrl_cols = CC.total
    data_cols = DC.total
    accum_cols = AC.total
    globals_count = 2  # gamma, delta
    max_degree = 5
    ctrl_dynamic = False  # static batch layout: ctrl root == circuit id

    def ctrl_trace(self, n: int):
        ct = np.zeros((n, CC.total), dtype=np.int64)
        ct[0, CC.is_first] = 1
        ct[: n - 1, CC.not_last] = 1
        k = n // ROUNDS
        for t in range(k * ROUNDS):
            ct[t, CC.rr.start + (t % ROUNDS)] = 1
            ct[t, CC.perm] = t // ROUNDS
            ct[t, CC.active] = 1
        return F.fp(ct)

    def accum_trace(self, ctrl, data, globals_):
        gamma, delta = globals_[0], globals_[1]
        dpows = NTT.ext_powers(delta, 4)
        n = data.shape[0]
        alg = dsl.BaseAlg()
        rows = _Rows(dsl.Columns(_Acc(ctrl), _Acc(data), None))
        packs, sels = _ports(alg, rows, gamma, dpows)
        out = jnp.zeros((n, AC.total), dtype=jnp.uint32)
        stacked = jnp.stack([jnp.broadcast_to(p, (n, 4)) for p in packs])
        invs = F.ext_inv(stacked)
        total = jnp.zeros((n, 4), dtype=jnp.uint32)
        for j in range(PORTS):
            inv = F.ext_scale(invs[j], sels[j])
            out = out.at[:, AC.inv[j] : AC.inv[j] + 4].set(inv)
            total = F.ext_add(total, inv)
        running = jax.lax.associative_scan(F.ext_add, total, axis=0)
        out = out.at[:, AC.running : AC.running + 4].set(running)
        return out

    def constraints(self, alg, now, nxt, globals_, pub: PublicValues):
        gamma, delta = globals_[0], globals_[1]
        dpows = alg.ext_powers(delta, 4)
        d = _Rows(now)
        nx = _Rows(nxt)
        c = []
        m, add, sub = alg.mul, alg.add, alg.sub
        one = alg.one()
        gm, ga, gs = alg.gmul, alg.gadd, alg.gsub
        B = alg.B

        active = d.ctrl(CC.active)
        not_last = d.ctrl(CC.not_last)
        rr = [d.ctrl(CC.rr.start + i) for i in range(ROUNDS)]
        rr_blk = d.ctrlb(CC.rr)
        not_perm_end = sub(active, rr[ROUNDS - 1])

        def gxor3_(A, Bq, Cq):
            ab = gm(A, Bq)
            ac = gm(A, Cq)
            bc = gm(Bq, Cq)
            pair = ga(ga(ab, ac), bc)
            tri = gm(ab, Cq)
            lin = ga(ga(A, Bq), Cq)
            four_tri = ga(ga(tri, tri), ga(tri, tri))
            return ga(gs(lin, ga(pair, pair)), four_tri)

        def gxor2(A, Bq):
            ab = gm(A, Bq)
            return gs(ga(A, Bq), ga(ab, ab))

        # ---- booleans (grouped) ----
        bool_cols = (list(range(DC.a.start, DC.a.stop))
                     + list(range(DC.c1.start, DC.c1.stop))
                     + list(range(DC.c2.start, DC.c2.stop))
                     + list(range(DC.b.start, DC.b.stop)))
        bools = d.datab(bool_cols)
        ones_g = alg.gconst(np.ones(len(bool_cols), dtype=np.int64))
        c.append(VecVal(gm(bools, gs(bools, ones_g))))

        T = _index_tables()
        # ---- theta helpers: c1 = XOR3(a row0..2), C = XOR3(c1, a3, a4)
        c.append(VecVal(gs(d.datab(T["c1"]),
                           gxor3_(d.datab(T["a_y0"]), d.datab(T["a_y1"]),
                                  d.datab(T["a_y2"])))))
        c.append(VecVal(gs(d.datab(T["c2"]),
                           gxor3_(d.datab(T["c1"]), d.datab(T["a_y3"]),
                                  d.datab(T["a_y4"])))))
        # ---- b = rho/pi(a ^ D): b[target] = XOR3(a, C[x-1,z], C[x+1,z-1])
        c.append(VecVal(gs(d.datab(T["b_tgt"]),
                           gxor3_(d.datab(T["a_all"]),
                                  d.datab(T["c_xm1"]),
                                  d.datab(T["c_xp1"])))))
        # ---- chi (+ iota on lane (0,0)) transition, gated in-perm ----
        # GROUPED over all 1600 state bits (round-5 compile-latency fix:
        # the per-bit scalar form traced ~13k ops and pushed the XLA
        # compile of this 4048-col AIR past 40 minutes; the grouped form
        # is ~15 ops with bit-identical values — iota rides an all-bits
        # xor against a vector that is zero outside lane (0,0), and
        # xor2(e, 0) == e exactly).
        rc_grp = [alg.gweighted(rr_blk, T["rc_bits"][:, z])
                  for z in range(LANE_BITS)]
        idx0, idx1, idx2 = [], [], []
        for x in range(5):
            for y in range(5):
                for z in range(LANE_BITS):
                    idx0.append(DC.b.start + _abit(x, y, z))
                    idx1.append(DC.b.start + _abit((x + 1) % 5, y, z))
                    idx2.append(DC.b.start + _abit((x + 2) % 5, y, z))
        # NOTE: idx order is (x, y, z) loop order; the output slot is
        # _abit(x, y, z) = 64*(5y+x)+z, so scatter back via a table
        order = [0] * STATE_BITS
        pos = 0
        for x in range(5):
            for y in range(5):
                for z in range(LANE_BITS):
                    order[_abit(x, y, z)] = pos
                    pos += 1
        B0 = d.datab([idx0[order[j]] for j in range(STATE_BITS)])
        B1 = d.datab([idx1[order[j]] for j in range(STATE_BITS)])
        B2 = d.datab([idx2[order[j]] for j in range(STATE_BITS)])
        ones1600 = alg.gconst(np.ones(STATE_BITS, dtype=np.int64))
        Q = gm(gs(ones1600, B1), B2)
        E = gxor2(B0, Q)
        zero_s = alg.zero()
        rc_vec = alg.stack(
            [rc_grp[j] if j < LANE_BITS else zero_s
             for j in range(STATE_BITS)])  # lane (0,0) = bits 0..63
        E = gxor2(E, rc_vec)
        e_grp = E
        c.append(VecVal(gm(B(not_perm_end),
                           gs(nx.datab(slice(DC.a.start, DC.a.stop)),
                              e_grp))))

        # ---- limb carry + boundary binding ----
        in_l = d.datab(DC.in_limbs)
        out_l = d.datab(DC.out_limbs)
        c.append(VecVal(gm(B(not_perm_end), gs(nx.datab(DC.in_limbs),
                                               in_l))))
        c.append(VecVal(gm(B(not_perm_end), gs(nx.datab(DC.out_limbs),
                                               out_l))))
        W16 = np.array([1 << i for i in range(16)], dtype=np.int64)
        in_binds = []
        out_binds = []
        for lane in range(LANES):
            for s_ in range(4):
                idx = [DC.a.start + LANE_BITS * lane + 16 * s_ + i
                       for i in range(16)]
                in_binds.append(alg.gweighted(d.datab(idx), W16))
                # grouped 16-bit slice of the chi output (same values as
                # the former per-bit constant-multiply chain)
                sl = alg.gslice(e_grp, LANE_BITS * lane + 16 * s_,
                                LANE_BITS * lane + 16 * s_ + 16)
                out_binds.append(alg.gweighted(sl, W16))
        c.append(VecVal(gm(B(rr[0]), gs(in_l, alg.stack(in_binds)))))
        # at the last round, e_full IS the permutation output (iota of
        # round 23 rides rc_grp through the rr one-hot)
        c.append(VecVal(gm(B(rr[ROUNDS - 1]),
                           gs(out_l, alg.stack(out_binds)))))

        # ---- LogUp ports ----
        packs, sels = _ports(alg, d, gamma, dpows)
        for j in range(PORTS):
            inv = alg.read_ext(now.accum, AC.inv[j])
            c.append(ExtVal(alg.esub(alg.emul(inv, packs[j]),
                                     alg.lift(sels[j]))))
        R_now = alg.read_ext(now.accum, AC.running)
        R_nxt = alg.read_ext(nxt.accum, AC.running)

        def total_of(acc_accessor):
            acc = None
            for j in range(PORTS):
                iv = alg.read_ext(acc_accessor, AC.inv[j])
                acc = iv if acc is None else alg.eadd(acc, iv)
            return acc

        is_first = d.ctrl(CC.is_first)
        is_last = sub(one, not_last)
        c.append(ExtVal(alg.escale(
            alg.esub(alg.esub(R_nxt, R_now), total_of(nxt.accum)),
            not_last)))
        c.append(ExtVal(alg.escale(
            alg.esub(R_now, total_of(now.accum)), is_first)))
        s_pub = (_public_sum_prog(alg, pub, gamma, delta)
                 if getattr(alg, "is_prog", False)
                 else public_logup_sum(pub, gamma, delta))
        c.append(ExtVal(alg.escale(
            alg.esub(R_now, alg.bc(s_pub, R_now)), is_last)))
        return c


@functools.lru_cache(maxsize=1)
def _index_tables():
    """Static column-index tables for the grouped constraint families."""
    c1 = []
    a_y = [[] for _ in range(5)]
    for x in range(5):
        for z in range(LANE_BITS):
            c1.append(DC.c1.start + LANE_BITS * x + z)
            for y in range(5):
                a_y[y].append(DC.a.start + _abit(x, y, z))
    c2 = [DC.c2.start + (i - DC.c1.start) for i in c1]
    b_tgt, a_all, c_xm1, c_xp1 = [], [], [], []
    b_all, b_x1, b_x2 = [], [], []
    for x in range(5):
        for y in range(5):
            for z in range(LANE_BITS):
                bx, by = y, (2 * x + 3 * y) % 5
                b_tgt.append(DC.b.start
                             + _abit(bx, by, (z + ROTATION[x][y])
                                     % LANE_BITS))
                a_all.append(DC.a.start + _abit(x, y, z))
                c_xm1.append(DC.c2.start + LANE_BITS * ((x - 1) % 5) + z)
                c_xp1.append(DC.c2.start + LANE_BITS * ((x + 1) % 5)
                             + ((z - 1) % LANE_BITS))
    for y in range(5):
        for x_ in range(5):
            pass
    # chi source order mirrors the a-bit layout: index = _abit(x, y, z)
    b_all = [0] * STATE_BITS
    b_x1 = [0] * STATE_BITS
    b_x2 = [0] * STATE_BITS
    for x in range(5):
        for y in range(5):
            for z in range(LANE_BITS):
                i = _abit(x, y, z)
                b_all[i] = DC.b.start + _abit(x, y, z)
                b_x1[i] = DC.b.start + _abit((x + 1) % 5, y, z)
                b_x2[i] = DC.b.start + _abit((x + 2) % 5, y, z)
    rc_bits = np.zeros((ROUNDS, LANE_BITS), dtype=np.int64)
    for r_ in range(ROUNDS):
        for z in range(LANE_BITS):
            rc_bits[r_, z] = (RC[r_] >> z) & 1
    return dict(c1=c1, c2=c2, a_y0=a_y[0], a_y1=a_y[1], a_y2=a_y[2],
                a_y3=a_y[3], a_y4=a_y[4], b_tgt=b_tgt, a_all=a_all,
                c_xm1=c_xm1, c_xp1=c_xp1, b_all=b_all, b_x1=b_x1,
                b_x2=b_x2, rc_bits=rc_bits)


class _Acc:
    """Column accessor over a raw (N, C) array."""

    def __init__(self, arr):
        self._a = arr

    def __getitem__(self, i):
        return self._a[:, i]

    def block(self, idx):
        if isinstance(idx, slice):
            return self._a[:, idx]
        return self._a[:, jnp.asarray(idx)]


def _ports(alg, d, gamma, dpows):
    """5 state-binding LogUp ports: port j at round rr emits entry
    seq = 100*perm + 5*rr + j with value (limb[2s], limb[2s+1]) where
    s = 5*rr + j, for s < 100 (selector = sum of the active rr flags)."""
    m, add = alg.mul, alg.add
    perm = d.ctrl(CC.perm)
    rr = [d.ctrl(CC.rr.start + i) for i in range(ROUNDS)]
    limbs = [d.data((DC.in_limbs.start + i) if i < LIMBS
                    else (DC.out_limbs.start + i - LIMBS))
             for i in range(2 * LIMBS)]
    packs = []
    sels = []
    for j in range(PORTS):
        # slot index / values as one-hot mixes over rr
        slot = None
        lo = None
        hi = None
        sel = None
        for r_ in range(ROUNDS):
            s_ = PORTS * r_ + j
            if s_ >= ENTRIES:
                break
            term = m(rr[r_], alg.const(s_))
            slot = term if slot is None else add(slot, term)
            lo_t = m(rr[r_], limbs[2 * s_])
            hi_t = m(rr[r_], limbs[2 * s_ + 1])
            lo = lo_t if lo is None else add(lo, lo_t)
            hi = hi_t if hi is None else add(hi, hi_t)
            sel = rr[r_] if sel is None else add(sel, rr[r_])
        seq = add(m(perm, alg.const(ENTRIES)), slot)
        comps = alg.stack([seq, lo, hi])
        base = alg.esub(gamma, alg.ext_const([TAG_STATE, 0, 0, 0]))
        acc = alg.gweighted_ext(comps, dpows[1:4])
        packs.append(alg.esub(alg.bc(base, acc), acc))
        sels.append(m(d.ctrl(CC.active), sel))
    return packs, sels


def _public_sum_prog(alg, pub, gamma, delta):
    """Wire-algebra public sum (the keccak-lift program's side)."""
    p = alg.p
    dpows = alg.ext_powers(delta, 4)
    total = None
    for k, row in enumerate(pub.states):
        mask = row[0]
        for s_ in range(ENTRIES):
            lo, hi = row[1 + 2 * s_], row[2 + 2 * s_]
            acc = p.addc(
                p.add(p.mul(dpows[1], p.const(ENTRIES * k + s_)),
                      p.add(p.mul(dpows[2], lo), p.mul(dpows[3], hi))),
                (TAG_STATE, 0, 0, 0))
            t = p.mul(mask, p.inv(p.sub(gamma, acc)))
            total = t if total is None else p.add(total, t)
    return total


AIR = KeccakAir()


# ---------------------------------------------------------------------------
# Witness generation (host, numpy)
# ---------------------------------------------------------------------------


def keccak_f1600(lanes):
    """Reference permutation on 25 u64 lanes (row-major y*5+x)."""
    A = [[lanes[5 * y + x] for y in range(5)] for x in range(5)]
    M = (1 << 64) - 1
    for rnd in range(ROUNDS):
        C = [A[x][0] ^ A[x][1] ^ A[x][2] ^ A[x][3] ^ A[x][4]
             for x in range(5)]
        D = [C[(x - 1) % 5] ^ (((C[(x + 1) % 5] << 1)
                               | (C[(x + 1) % 5] >> 63)) & M)
             for x in range(5)]
        A = [[A[x][y] ^ D[x] for y in range(5)] for x in range(5)]
        Bm = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                r = ROTATION[x][y]
                Bm[y][(2 * x + 3 * y) % 5] = (
                    (A[x][y] << r | A[x][y] >> (64 - r)) & M)
        for x in range(5):
            for y in range(5):
                A[x][y] = Bm[x][y] ^ ((~Bm[(x + 1) % 5][y] & M)
                                      & Bm[(x + 2) % 5][y])
        A[0][0] ^= RC[rnd]
    return [A[x][y] for y in range(5) for x in range(5)]


def witness(states, po2: int):
    """states: list of 25-lane u64 lists (one per permutation).

    Returns (data (N, DC.total) int64, pub dict with 'states' table,
    out_states list)."""
    n = 1 << po2
    kmax = n // ROUNDS
    assert len(states) <= kmax, "too many permutations for this po2"
    # the batch layout is static (ctrl is the circuit id), so unused
    # permutation slots run the zero state (a legal permutation)
    states = list(states) + [[0] * LANES
                             for _ in range(kmax - len(states))]
    data = np.zeros((n, DC.total), dtype=np.int64)
    pub = np.zeros((kmax, 1 + 2 * LIMBS), dtype=np.int64)
    M = (1 << 64) - 1
    outs = []
    for k, lanes in enumerate(states):
        lanes = [int(v) & M for v in lanes]
        in_limbs = [((lanes[L] >> (16 * s_)) & 0xFFFF)
                    for L in range(LANES) for s_ in range(4)]
        A = [[lanes[5 * y + x] for y in range(5)] for x in range(5)]
        for rnd in range(ROUNDS):
            row = data[ROUNDS * k + rnd]
            for x in range(5):
                for y in range(5):
                    for z in range(LANE_BITS):
                        row[DC.a.start + _abit(x, y, z)] = (A[x][y] >> z) & 1
            C = [A[x][0] ^ A[x][1] ^ A[x][2] ^ A[x][3] ^ A[x][4]
                 for x in range(5)]
            t1 = [A[x][0] ^ A[x][1] ^ A[x][2] for x in range(5)]
            for x in range(5):
                for z in range(LANE_BITS):
                    row[DC.c1.start + LANE_BITS * x + z] = (t1[x] >> z) & 1
                    row[DC.c2.start + LANE_BITS * x + z] = (C[x] >> z) & 1
            D = [C[(x - 1) % 5] ^ (((C[(x + 1) % 5] << 1)
                                   | (C[(x + 1) % 5] >> 63)) & M)
                 for x in range(5)]
            At = [[A[x][y] ^ D[x] for y in range(5)] for x in range(5)]
            Bm = [[0] * 5 for _ in range(5)]
            for x in range(5):
                for y in range(5):
                    r_ = ROTATION[x][y]
                    Bm[y][(2 * x + 3 * y) % 5] = (
                        (At[x][y] << r_ | At[x][y] >> (64 - r_)) & M)
            for x in range(5):
                for y in range(5):
                    for z in range(LANE_BITS):
                        row[DC.b.start + _abit(x, y, z)] = (Bm[x][y] >> z) & 1
            for x in range(5):
                for y in range(5):
                    A[x][y] = Bm[x][y] ^ ((~Bm[(x + 1) % 5][y] & M)
                                          & Bm[(x + 2) % 5][y])
            A[0][0] ^= RC[rnd]
        out_lanes = [A[x][y] for y in range(5) for x in range(5)]
        outs.append(out_lanes)
        out_limbs = [((out_lanes[L] >> (16 * s_)) & 0xFFFF)
                     for L in range(LANES) for s_ in range(4)]
        for rnd in range(ROUNDS):
            row = data[ROUNDS * k + rnd]
            row[DC.in_limbs.start : DC.in_limbs.stop] = in_limbs
            row[DC.out_limbs.start : DC.out_limbs.stop] = out_limbs
        pub[k, 0] = 1
        pub[k, 1 : 1 + LIMBS] = in_limbs
        pub[k, 1 + LIMBS :] = out_limbs
    return data, dict(states=pub), outs
