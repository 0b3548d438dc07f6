"""Off-chain order stream: pub/sub order feed with signature auth.

Re-design of `crates/order-stream` (REST + WebSocket broadcast,
`src/lib.rs:523-539`; signature-authenticated connections): an in-process
broker-facing feed with subscriber callbacks; the HTTP layer can wrap it
the same way cluster/api.py wraps ClusterApi.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, List

from .types import ProofRequest, verify_signature


class OrderStream:
    def __init__(self):
        self._subs: List[Callable] = []
        self._orders: list = []
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self.heartbeats: dict = {}  # address -> last heartbeat ts

    def submit(self, request: ProofRequest, signature: bytes):
        # ECDSA recovery against the request's client address — same
        # auth model as the reference order-stream's signature checks
        # (`crates/order-stream/src/lib.rs` ECDSA-authenticated submit).
        if not verify_signature(request, signature):
            raise PermissionError("bad order signature")
        with self._cond:
            self._orders.append((request, signature))
            subs = list(self._subs)
            self._cond.notify_all()
        for cb in subs:
            cb(request, signature)

    def wait_orders(self, index: int, timeout: float = 10.0):
        """Orders after `index`, blocking up to `timeout` for new ones
        (the WS push loop's wake-up; reference broadcast channel)."""
        with self._cond:
            if len(self._orders) <= index:
                self._cond.wait(timeout)
            return self._orders[index:]

    def subscribe(self, callback: Callable):
        with self._lock:
            self._subs.append(callback)

    def orders_since(self, index: int):
        with self._lock:
            return self._orders[index:]

    def heartbeat(self, address: str):
        self.heartbeats[address] = time.time()
