"""PoVW work-log / mint, version registry, telemetry tests."""

import time

import pytest

from boundless_tpu.market.povw import (MintCalculator, VersionRegistry,
                                       WorkLog)


def test_worklog_and_prorata_mint():
    t = [0.0]
    log = WorkLog(epoch_seconds=10.0, clock=lambda: t[0])
    log.record("p1", 3_000_000, b"c1")
    log.record("p2", 1_000_000, b"c2")
    with pytest.raises(ValueError):
        log.record("p1", 1, b"c1")  # double-count rejected
    t[0] = 15.0  # epoch 0 closed
    mc = MintCalculator(log, epoch_reward=1000)
    rewards = mc.mint_for_epoch(0)
    assert rewards == {"p1": 750, "p2": 250}
    with pytest.raises(ValueError):
        mc.mint_for_epoch(0)  # double mint
    with pytest.raises(ValueError):
        mc.mint_for_epoch(1)  # epoch open


def test_empty_epoch_mint():
    t = [100.0]
    log = WorkLog(epoch_seconds=10.0, clock=lambda: t[0])
    mc = MintCalculator(log)
    assert mc.mint_for_epoch(3) == {}


def test_version_registry():
    vr = VersionRegistry(min_version=(1, 2, 0))
    assert vr.check((1, 2, 0))
    assert vr.check((2, 0, 0))
    assert not vr.check((1, 1, 9))


def test_broker_telemetry_snapshots():
    from boundless_tpu.market.broker.telemetry import Telemetry

    class FakeBroker:
        address = "p1"
        orders = {}

    class FakeStream:
        def __init__(self):
            self.beats = []

        def heartbeat(self, addr):
            self.beats.append(addr)

    stream = FakeStream()
    tel = Telemetry(FakeBroker(), stream, interval=0.01)
    tel.start()
    deadline = time.time() + 2
    while time.time() < deadline and len(tel.snapshots) < 3:
        time.sleep(0.01)
    tel.stop()
    assert len(tel.snapshots) >= 3
    assert stream.beats and stream.beats[0] == "p1"
    assert tel.snapshots[0]["total"] == 0
