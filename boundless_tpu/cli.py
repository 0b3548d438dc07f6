"""boundless-tpu CLI.

Re-design of the reference `boundless` binary (`crates/boundless-cli`):
requestor commands (submit/status/get-proof/verify-proof), prover commands
(execute/benchmark/generate-config), and cluster commands (serve/status) —
`python -m boundless_tpu.cli <group> <cmd>`.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time


def _load_image(path_or_name):
    from .zkvm import guests

    builtin = dict(echo=guests.echo, loop=guests.loop_guest,
                   identity=guests.identity, muldiv=guests.muldiv,
                   memtest=guests.memtest)
    if path_or_name in builtin:
        return builtin[path_or_name]()
    if path_or_name.endswith(".s") or path_or_name.endswith(".asm"):
        with open(path_or_name) as f:
            return guests.build(f.read())
    with open(path_or_name, "rb") as f:
        return pickle.load(f)


def cmd_prover_execute(args):
    """Execute-only preflight (reference prover execute)."""
    from .zkvm.executor import Executor

    image = _load_image(args.image)
    input_bytes = bytes.fromhex(args.input) if args.input else b""
    res = Executor(image, input_bytes, segment_po2=args.po2).run()
    print(json.dumps(dict(
        total_cycles=res.total_cycles, segments=len(res.segments),
        exit_code=res.exit_code, journal=res.journal.hex(),
        image_id=res.image_id.hex())))


def cmd_prover_benchmark(args):
    """Effective proving speed (reference benchmark.rs:212-214)."""
    os.environ["BENCH_PO2"] = str(args.po2)
    import bench

    bench.main()


def cmd_prover_generate_config(args):
    """Config wizard (reference generate_config.rs): sizes segment po2 and
    peak_prove_khz from a quick measurement."""
    import jax

    devices = jax.devices()
    mem_gb = 16  # v5e HBM per chip
    po2 = min(20, max(14, 17 + (mem_gb // 16)))
    print(json.dumps(dict(
        devices=[str(d) for d in devices],
        segment_po2=po2,
        peak_prove_khz=args.khz or 100.0,
        max_concurrent_proofs=len(devices),
        note="run `prover benchmark` and set peak_prove_khz = 0.75 * effective_khz",
    )))


def cmd_prover_audit_degrees(args):
    """Constraint-degree audit of the rv32im AIR (air/degree.py).

    The dev gate for any AIR change: fails if any constraint exceeds the
    declared max_degree or the hard composition-split budget.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from .air import degree as DA
    from .air import rv32im as R
    from .core import field as F

    rng = np.random.default_rng(0)

    def rf(shape):
        import jax.numpy as jnp

        return jnp.asarray(rng.integers(0, F.P, size=shape, dtype=np.uint32))

    pub = R.PublicValues(
        pre_pc=rf(()), post_pc=rf(()), pre_regs=rf((64,)),
        post_regs=rf((64,)), halted=rf(()), pre_seqs=rf((4,)),
        post_seqs=rf((4,)), io=rf((R.IO_MAX, 5)),
        cpio=rf((R.CP_IO, 4)),
        mem=rf((R.MEM_PAGES, R.MEM_PAGE_ELEMS)))
    for air in (R.Rv32imAir(), R.Rv32imAir(False)):
        degs = DA.assert_degrees(air, pub, po2=args.po2)
        n = 1 << args.po2
        worst = max(d.degree for d in degs)
        print(json.dumps(dict(
            air=air.name, constraints=len(degs), po2=args.po2,
            worst_degree=worst, worst_mult=round(worst / (n - 1), 3),
            declared=air.max_degree, budget=DA.degree_budget(args.po2),
            ok=True)))


def cmd_prover_bootstrap_verifier(args):
    """Generate the on-chain verifier artifacts (xtask bootstrap role:
    reference `xtask/src/bootstrap_blake3_groth16.rs:43-46` regenerating
    contracts/src/blake3-groth16/*.sol).

    Builds the wrap circuit for the given recursion params, derives a
    DETERMINISTIC dev CRS (--seed; a production deployment substitutes
    the ceremony CRS via BT_GROTH16_CRS — same artifact shape), and
    writes Groth16Verifier.sol with the verifying key + allowed-set
    control root baked in. Runs on CPU; the wrap-circuit build is the
    slow part (minutes at CI scale)."""
    import json
    import os
    import random

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/bt_jax_cache")
    from .core import field as _field

    _field.enable_u64()
    from .core import poseidon_bn254 as P254
    from .groth16 import evm, qap, r1cs
    from .groth16 import circuit as C
    from .prover import stark
    from .recursion import air as rair
    from .recursion import identity, succinct

    ps = stark.ProofSystem(queries=args.queries, fri_min_degree=16,
                           commit_expand=2)
    params = succinct.SuccinctParams(seg_po2=args.seg_po2, seg_ps=ps,
                                     rec_po2=args.rec_po2, rec_ps=ps)
    system = succinct.get_system(params)
    p254 = identity.get_p254(params)
    bld = r1cs.Builder(concrete=False)
    C.build_verifier(bld, rair.AIR, p254.po2, p254.ps254,
                     p254.control_id, proof=None, pub_vals=None)
    sys_ = bld.to_sparse()
    rng = random.Random(args.seed)
    _td, vk = qap.setup_trapdoor(sys_, rng=lambda n: rng.randrange(1, n))
    root_felt = P254.pack_bb([int(x) for x in system.allowed_root])
    src = evm.generate_verifier(vk, allowed_root_felt=int(root_felt))
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "Groth16Verifier.sol")
    with open(path, "w") as f:
        f.write(src)
    meta = dict(seg_po2=args.seg_po2, rec_po2=args.rec_po2,
                queries=args.queries, seed=args.seed,
                n_rows=len(sys_.rows), n_vars=sys_.n_vars,
                control_root_felt=str(int(root_felt)),
                allowed_root=[int(x) for x in system.allowed_root])
    with open(os.path.join(args.out, "bootstrap.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(dict(wrote=path, **meta)))


def cmd_cluster_serve(args):
    """Run an in-process cluster (API + workers) — reference compose.yml."""
    from .cluster.agent import ClusterContext, run_workers
    from .cluster.api import ClusterApi, make_http_server
    from .cluster.hotstore import HotStore
    from .cluster.storage import SharedFs
    from .cluster.taskdb import MemoryBackend
    from .prover import stark
    from .zkvm import prove

    cfg = {}
    if args.config:
        with open(args.config) as f:
            cfg = json.load(f)
    pools = cfg.get("workers", {"exec": args.exec_workers,
                                "prove": args.prove_workers,
                                "join": 1, "aux": 1, "snark": 1})
    ps_cfg = cfg.get("proof_system", {})
    ps = stark.ProofSystem(
        queries=int(ps_cfg.get("queries", 100)),
        fri_min_degree=int(ps_cfg.get("fri_min_degree", 256)),
        commit_expand=int(ps_cfg.get("commit_expand", 2)))
    # Succinct recursion is the default serving mode (constant-size
    # receipts; reference clusters always lift+join, prove.rs:68-95).
    mode = cfg.get("succinct", getattr(args, "succinct", "real"))
    system, dev_mode = None, False
    if mode == "real":
        from .recursion import succinct as S

        rec_cfg = cfg.get("recursion", {})
        rec_ps = stark.ProofSystem(
            queries=int(rec_cfg.get("queries", ps.queries)),
            fri_min_degree=int(rec_cfg.get("fri_min_degree",
                                           ps.fri_min_degree)),
            commit_expand=int(rec_cfg.get("commit_expand",
                                          ps.commit_expand)))
        system = S.get_system(S.SuccinctParams(
            seg_po2=int(cfg.get("segment_po2", args.po2)), seg_ps=ps,
            rec_po2=int(rec_cfg.get("rec_po2", 16)), rec_ps=rec_ps))
    elif mode == "dev":
        from .recursion import succinct as S

        system, dev_mode = S.DevModeSystem(), True
    dp_addr = cfg.get("dataplane") or getattr(args, "dataplane", None)
    if dp_addr:  # shared multi-host substrate (cluster/dataplane.py)
        from .cluster.dataplane import connect as dp_connect

        host_, _, port_ = str(dp_addr).rpartition(":")
        db_, hot_ = dp_connect((host_ or "127.0.0.1", int(port_)))
    else:
        db_ = MemoryBackend()
        hot_ = HotStore(float(cfg.get("hot_store_ttl_secs", 28800)))
    ctx = ClusterContext(
        db=db_,
        hot=hot_,
        store=SharedFs(cfg.get("storage_root") or args.storage),
        ps=ps,
        segment_po2=int(cfg.get("segment_po2", args.po2)),
        succinct=system, dev_mode=dev_mode)
    api = ClusterApi(ctx)
    port = int(cfg.get("api", {}).get("port", args.port))
    host = cfg.get("api", {}).get("host", getattr(args, "host", "127.0.0.1"))
    token = (getattr(args, "token", None)
             or cfg.get("api", {}).get("token")
             or os.environ.get("BT_CLUSTER_TOKEN"))
    server, thread = make_http_server(api, host=host, port=port, token=token)
    thread.start()
    run_workers(ctx, pools)
    print(f"cluster API on http://127.0.0.1:{server.server_address[1]} "
          f"(storage: {ctx.store.root}, pools: {pools})")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        server.shutdown()


def cmd_cluster_worker(args):
    """Attach a worker to a remote cluster API over HTTP."""
    from .cluster.remote import worker_main

    argv = ["--api-url", args.api_url, "--stream", args.stream]
    if args.worker_id:
        argv += ["--worker-id", args.worker_id]
    if getattr(args, "token", None):
        argv += ["--token", args.token]
    if args.idle_timeout is not None:
        argv += ["--idle-timeout", str(args.idle_timeout)]
    worker_main(argv)


def cmd_requestor_submit(args):
    """One-shot requestor flow against a local market + broker
    (reference `boundless requestor submit` / submit-file,
    `crates/boundless-cli/src/commands/requestor/mod.rs:62`): build the
    request with the layered builder, submit on-chain, let a dev-mode
    broker price/lock/prove/fulfill, print (journal, seal)."""
    import hashlib

    from .cluster.storage import SharedFs
    from .market.broker.pipeline import Broker, BrokerConfig
    from .market.chain import MarketChain
    from .market.client import Client, LocalStorageProvider
    from .market.crypto import Wallet
    from .zkvm import guests
    from .zkvm.executor import Executor

    class DevProver:
        def preflight(self, image, input_data):
            return Executor(image, input_data).run().total_cycles

        def prove(self, image, input_data):
            res = Executor(image, input_data).run()
            seal = {"dev_mode": True, "journal": res.journal,
                    "image_id": res.image_id.hex()}
            return (res.journal, seal,
                    hashlib.sha256(res.journal).digest())

    def verifier(fill, req):
        return (fill.seal.get("dev_mode")
                and fill.seal["journal"] == fill.journal
                and fill.seal["image_id"] == req.requirements.image_id)

    image = _load_image(args.image)
    payload = [int(x) for x in args.input.split(",")] if args.input else []
    chain = MarketChain(verifier)
    wallet = Wallet.from_seed((args.key or "requestor").encode())
    chain.create_account(wallet.address, funds=10**9)
    chain.create_account("prover-node", funds=10**7)
    chain.deposit_collateral("prover-node", 10**6)
    provider = LocalStorageProvider(SharedFs())
    client = Client(chain, wallet, storage_provider=provider)
    broker = Broker(chain, DevProver(), "prover-node",
                    BrokerConfig(min_mcycle_price=0), storage=provider)
    broker.start()
    try:
        req = client.build_request(image, guests.words(payload))
        print(f"request {req.id.encoded()}: auction "
              f"{req.offer.min_price}..{req.offer.max_price} wei")
        rid = client.submit_onchain(req)
        journal, seal = client.wait_for_fulfillment(
            rid, timeout=args.timeout)
        print(f"status: {chain.request_status(rid)}")
        print(f"journal: {journal.hex()}")
        print(f"seal: dev_mode={seal.get('dev_mode')} "
              f"image_id={seal.get('image_id')}")
    finally:
        broker.stop()


def cmd_rewards_emissions(args):
    """Per-epoch ZKC emission split (reference `boundless rewards`
    commands, `crates/boundless-cli/src/commands/rewards/mod.rs:78`;
    IZKC.getEmissionsForEpoch)."""
    from .market.povw import EmissionSchedule

    sched = EmissionSchedule()
    for ep in range(args.epoch, args.epoch + args.count):
        total = sched.emissions_for_epoch(ep)
        print(json.dumps(dict(epoch=ep, total=total,
                              povw=sched.povw_emissions(ep),
                              staking=sched.staking_emissions(ep))))


def cmd_rewards_mint(args):
    """Compute per-prover PoVW mints for an epoch from a work-log JSON
    file ([{prover, cycles, claim_digest}, ...] — the role of the
    reference mint-calculator guest over a posted work log)."""
    import hashlib

    from .market.povw import MintCalculator, WorkLog

    with open(args.log) as f:
        entries = json.load(f)
    # entries land in the epoch named in the file (default 0); the log's
    # clock sits one epoch past the largest so every epoch is closed
    max_ep = max((int(e.get("epoch", 0)) for e in entries), default=0)
    log = WorkLog(epoch_seconds=1.0, clock=lambda: max_ep + 1)
    for e in entries:
        log.clock = lambda ep=int(e.get("epoch", 0)): ep
        log.record(e["prover"], int(e["cycles"]),
                   bytes.fromhex(e.get("claim_digest") or
                                 hashlib.sha256(json.dumps(
                                     e, sort_keys=True).encode()
                                                ).hexdigest()))
        log.clock = lambda: max_ep + 1
    mints = MintCalculator(log, epoch_reward=args.epoch_reward
                           ).mint_for_epoch(args.epoch)
    print(json.dumps(mints, indent=2, sort_keys=True))


def main(argv=None):
    p = argparse.ArgumentParser(prog="boundless-tpu")
    sub = p.add_subparsers(dest="group", required=True)

    prover = sub.add_parser("prover").add_subparsers(dest="cmd", required=True)
    ex = prover.add_parser("execute")
    ex.add_argument("image")
    ex.add_argument("--input", default="")
    ex.add_argument("--po2", type=int, default=14)
    ex.set_defaults(fn=cmd_prover_execute)
    bm = prover.add_parser("benchmark")
    bm.add_argument("--po2", type=int, default=14)
    bm.set_defaults(fn=cmd_prover_benchmark)
    gc = prover.add_parser("generate-config")
    gc.add_argument("--khz", type=float, default=None)
    gc.set_defaults(fn=cmd_prover_generate_config)
    ad = prover.add_parser("audit-degrees")
    ad.add_argument("--po2", type=int, default=5)
    ad.set_defaults(fn=cmd_prover_audit_degrees)
    bv = prover.add_parser("bootstrap-verifier")
    bv.add_argument("--out", default="contracts")
    bv.add_argument("--seg-po2", type=int, default=6)
    bv.add_argument("--rec-po2", type=int, default=17)
    bv.add_argument("--queries", type=int, default=2)
    bv.add_argument("--seed", type=int, default=0)
    bv.set_defaults(fn=cmd_prover_bootstrap_verifier)

    cluster = sub.add_parser("cluster").add_subparsers(dest="cmd",
                                                       required=True)
    sv = cluster.add_parser("serve")
    sv.add_argument("--port", type=int, default=8081)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--token", default=None,
                    help="bearer token for /workers/* (required when "
                         "--host is non-loopback; default $BT_CLUSTER_TOKEN)")
    sv.add_argument("--po2", type=int, default=14)
    sv.add_argument("--exec-workers", type=int, default=2)
    sv.add_argument("--prove-workers", type=int, default=1)
    sv.add_argument("--storage", default=None)
    sv.add_argument("--config", default=None,
                    help="deploy descriptor (deploy/cluster.json)")
    sv.add_argument("--dataplane", default=None,
                    help="host:port of a shared data-plane server "
                         "(cluster dataplane); N hosts share one job")
    sv.add_argument("--succinct", choices=("real", "dev", "off"),
                    default="real",
                    help="recursion mode (default: real succinct receipts)")
    sv.set_defaults(fn=cmd_cluster_serve)

    wk = cluster.add_parser(
        "worker", help="HTTP-attached worker process (zero shared memory)")
    wk.add_argument("--api-url", required=True)
    wk.add_argument("--stream", required=True,
                    help="comma-separated subset of "
                         "exec,prove,join,coproc,snark,aux")
    wk.add_argument("--worker-id", default="")
    wk.add_argument("--token", default=None)
    wk.add_argument("--idle-timeout", type=float, default=None)
    wk.set_defaults(fn=cmd_cluster_worker)

    dp = cluster.add_parser(
        "dataplane", help="standalone taskdb/hot-store server (the "
                          "Redis/Valkey role; N hosts share one job)")
    dp.add_argument("--host", default="127.0.0.1")
    dp.add_argument("--port", type=int, default=7350)
    dp.add_argument("--sqlite", default=None,
                    help="durable sqlite path (default: memory backend)")
    dp.set_defaults(fn=lambda a: __import__(
        "boundless_tpu.cluster.dataplane", fromlist=["main"]).main(
            ["--host", a.host, "--port", str(a.port)]
            + (["--sqlite", a.sqlite] if a.sqlite else [])))

    requestor = sub.add_parser("requestor").add_subparsers(dest="cmd",
                                                           required=True)
    sb = requestor.add_parser("submit")
    sb.add_argument("--image", default="echo",
                    help="guest name (echo/loop/...) or image path")
    sb.add_argument("--input", default="3,11,22,33",
                    help="comma-separated input words")
    sb.add_argument("--key", default=None, help="requestor key seed")
    sb.add_argument("--timeout", type=float, default=600.0)
    sb.set_defaults(fn=cmd_requestor_submit)

    rewards = sub.add_parser("rewards").add_subparsers(dest="cmd",
                                                       required=True)
    em = rewards.add_parser("emissions")
    em.add_argument("--epoch", type=int, default=0)
    em.add_argument("--count", type=int, default=1)
    em.set_defaults(fn=cmd_rewards_emissions)
    mi = rewards.add_parser("mint")
    mi.add_argument("--log", required=True, help="work-log JSON file")
    mi.add_argument("--epoch", type=int, default=0)
    mi.add_argument("--epoch-reward", type=int, default=1_000_000)
    mi.set_defaults(fn=cmd_rewards_mint)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
