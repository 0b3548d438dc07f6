"""Proof-of-Verifiable-Work (PoVW): work-log accounting + reward minting.

Re-design of `crates/povw` (LogUpdaterService, MintCalculatorProver —
reference `src/lib.rs:5-17`, `mint_calculator.rs:679`) and the epoch/stake
semantics of `crates/rewards`/`crates/zkc`: provers accumulate verified
work (proved cycles) into per-epoch work logs; mint rewards are computed
pro-rata per epoch.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List


@dataclasses.dataclass
class WorkLogEntry:
    prover: str
    epoch: int
    cycles: int
    claim_digest: bytes


class WorkLog:
    """Append-only per-prover work log (reference log-updater guest role:
    here host-validated against session receipts)."""

    def __init__(self, epoch_seconds: float = 60.0, clock=time.time):
        self.entries: List[WorkLogEntry] = []
        self.epoch_seconds = epoch_seconds
        self.clock = clock
        self._seen: set = set()

    def current_epoch(self) -> int:
        return int(self.clock() // self.epoch_seconds)

    def record(self, prover: str, cycles: int, claim_digest: bytes):
        if claim_digest in self._seen:
            raise ValueError("work already recorded for this claim")
        self._seen.add(claim_digest)
        self.entries.append(WorkLogEntry(prover, self.current_epoch(),
                                         cycles, claim_digest))

    def epoch_totals(self, epoch: int) -> Dict[str, int]:
        out: Dict[str, int] = {}
        for e in self.entries:
            if e.epoch == epoch:
                out[e.prover] = out.get(e.prover, 0) + e.cycles
        return out


class MintCalculator:
    """Pro-rata epoch rewards (reference PovwMint/mint-calculator)."""

    def __init__(self, log: WorkLog, epoch_reward: int = 1_000_000):
        self.log = log
        self.epoch_reward = epoch_reward
        self.minted: Dict[int, Dict[str, int]] = {}

    def mint_for_epoch(self, epoch: int) -> Dict[str, int]:
        if epoch in self.minted:
            raise ValueError("epoch already minted")
        if epoch >= self.log.current_epoch():
            raise ValueError("epoch not yet closed")
        totals = self.log.epoch_totals(epoch)
        total = sum(totals.values())
        rewards = ({} if total == 0 else
                   {p: self.epoch_reward * c // total
                    for p, c in totals.items()})
        self.minted[epoch] = rewards
        return rewards


@dataclasses.dataclass
class VersionRegistry:
    """Min-version gating (reference contracts/src/VersionRegistry.sol +
    broker version_check service)."""

    min_version: tuple = (0, 1, 0)

    def check(self, version: tuple) -> bool:
        return tuple(version) >= tuple(self.min_version)
