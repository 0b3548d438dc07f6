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


def test_emission_schedule_decay_and_split():
    from boundless_tpu.market.povw import EmissionSchedule

    s = EmissionSchedule(initial_epoch_emission=1_000_000,
                         decay_num=999, decay_den=1000, povw_bps=7500)
    assert s.emissions_for_epoch(0) == 1_000_000
    assert s.emissions_for_epoch(1) == 999_000
    assert s.emissions_for_epoch(2) == 998_001
    assert s.povw_emissions(0) == 750_000
    assert s.staking_emissions(0) == 250_000
    assert (s.povw_emissions(5) + s.staking_emissions(5)
            == s.emissions_for_epoch(5))


def test_staking_ledger_delegation_and_rewards():
    from boundless_tpu.market.povw import EmissionSchedule, StakingLedger

    led = StakingLedger()
    led.stake("alice", 300)
    led.stake("bob", 100)
    led.delegate_rewards("bob", "carol")
    led.delegate_votes("alice", "bob")
    led.snapshot_epoch(1)
    # vote power folds onto delegates
    assert led.vote_powers(1) == {"bob": 400}
    # staking rewards pro-rata, paid to rewards delegates
    r = led.staking_rewards(1, 1000)
    assert r == {"alice": 750, "carol": 250}
    # withdrawing stake has no power in later snapshots
    led.initiate_unstake("alice")
    led.snapshot_epoch(2)
    assert led.staking_rewards(2, 1000) == {"carol": 1000}
    assert led.complete_unstake("alice") == 300


def test_povw_rewards_stake_cap():
    from boundless_tpu.market.povw import (EmissionSchedule, PovwRewards,
                                           StakingLedger, WorkLog)

    t = [0.0]
    log = WorkLog(epoch_seconds=10.0, clock=lambda: t[0])
    led = StakingLedger()
    led.stake("p1", 1_000_000)  # heavily staked: uncapped
    led.stake("p2", 100)        # barely staked: capped
    led.snapshot_epoch(0)
    log.record("p1", 600, b"c1")
    log.record("p2", 400, b"c2")
    t[0] = 15.0  # epoch 0 closed
    pr = PovwRewards(log, led,
                     EmissionSchedule(initial_epoch_emission=1_000_000,
                                      povw_bps=10_000))
    out = pr.compute_epoch(0)
    assert out["p1"].proportional_rewards == 600_000
    assert not out["p1"].is_capped
    assert out["p2"].proportional_rewards == 400_000
    assert out["p2"].is_capped and out["p2"].capped_rewards == 100
    # double mint rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pr.compute_epoch(0)


def test_worklog_receipt_backed_cycles():
    """Work entries backed by session receipts: the credited cycles come
    from the VERIFIED claim's segments counter, not caller input; a
    tampered counter changes the claim digest and verification fails
    (reference log-updater guest role, crates/povw/src/lib.rs:5-17)."""
    import dataclasses

    from boundless_tpu.recursion import claims, succinct
    from boundless_tpu.zkvm import guests, paging, prove
    from boundless_tpu.zkvm.executor import Executor

    sys_ = succinct.DevModeSystem()
    image = guests.loop_guest()
    po2 = 10
    res = Executor(image, guests.words([300]), segment_po2=po2).run()
    pre = {t: claims.ZERO_CHAIN for t in claims.CHAIN_TAGS}
    recs = []
    for seg in res.segments:
        sr = prove.dev_receipt(image, seg, ps=prove.TEST_PS)
        recs.append(sys_.lift(sr, dict(pre), pre_mem=seg.pre_mem,
                              seg_index=seg.index))
        pre = {4: recs[-1].claim.post_journal,
               5: recs[-1].claim.post_input,
               6: recs[-1].claim.post_assumptions,
               8: recs[-1].claim.post_coproc}
    cur = recs[0]
    for r in recs[1:]:
        cur = sys_.join(cur, r)
    words = [int.from_bytes(res.journal[i : i + 4], "little")
             for i in range(0, len(res.journal), 4)]
    session = succinct.finalize_session(
        cur, words, entry_pc=image.entry,
        image_mem_root=paging.image_root(image))

    t = [0.0]
    log = WorkLog(epoch_seconds=10.0, clock=lambda: t[0])
    credited = log.record_receipt("p1", session, sys_, seg_po2=po2)
    assert credited == len(res.segments) << po2
    # double-count by claim digest rejected
    with pytest.raises(ValueError):
        log.record_receipt("p1", session, sys_, seg_po2=po2)
    # forged segments counter -> claim digest changes -> verify fails
    forged_claim = dataclasses.replace(cur.claim,
                                       post_segments=cur.claim.post_segments
                                       + 100)
    forged_root = dataclasses.replace(cur, claim=forged_claim)
    forged = dataclasses.replace(session, root=forged_root)
    with pytest.raises(ValueError):
        log.record_receipt("p2", forged, sys_, seg_po2=po2)
