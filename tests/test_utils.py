"""Config watcher, service runner, executor-service registry tests."""

import json
import os
import tempfile
import threading
import time

import pytest

from boundless_tpu.cluster.executor_service import default_registry
from boundless_tpu.utils.config import BrokerToml, ConfigWatcher
from boundless_tpu.utils.service_runner import (Criticality, ServiceRunner,
                                                retry)
from boundless_tpu.zkvm import guests


def test_config_roundtrip_and_hot_reload():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "broker.json")
        BrokerToml(min_mcycle_price=5, peak_prove_khz=250.0).save(path)
        w = ConfigWatcher(path, poll=0.02)
        assert w.config.min_mcycle_price == 5
        seen = []
        w.subscribe(lambda c: seen.append(c.peak_prove_khz))
        w.start()
        try:
            time.sleep(0.05)
            cfg = BrokerToml.load(path)
            cfg.peak_prove_khz = 999.0
            cfg.save(path)
            os.utime(path)
            deadline = time.time() + 2
            while time.time() < deadline and not seen:
                time.sleep(0.02)
            assert seen and seen[-1] == 999.0
            assert w.config.peak_prove_khz == 999.0
        finally:
            w.stop()


def test_service_runner_restart_and_critical():
    r = ServiceRunner()
    calls = []

    def flaky(cancel):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("boom")
        cancel.wait(5)

    r.spawn("flaky", flaky, Criticality.CRITICAL_FAST_RETRY)
    deadline = time.time() + 2
    while time.time() < deadline and len(calls) < 3:
        time.sleep(0.01)
    assert len(calls) >= 3

    def fatal(cancel):
        raise RuntimeError("fatal")

    r.spawn("fatal", fatal, Criticality.CRITICAL)
    deadline = time.time() + 2
    while time.time() < deadline and not r.cancel.is_set():
        time.sleep(0.01)
    assert r.cancel.is_set()  # critical crash cancels the group
    r.shutdown(drain_timeout=1)


def test_retry_helper():
    attempts = []

    def sometimes():
        attempts.append(1)
        if len(attempts) < 3:
            raise ValueError("nope")
        return 42

    assert retry(sometimes, attempts=5, delay=0.001) == 42
    with pytest.raises(ValueError):
        retry(lambda: (_ for _ in ()).throw(ValueError("always")),
              attempts=2, delay=0.001)


def test_executor_service_registry():
    import pickle

    reg = default_registry()
    assert reg.names() == ["rv32im"]
    backend = reg.get("rv32im")
    res = backend.execute(pickle.dumps(guests.echo()),
                          guests.words([1, 99]), 1 << 20)
    assert res.exit_code == 0
    assert res.journal == guests.words([99])
    with pytest.raises(KeyError):
        reg.get("sp1")
