"""CLI — `python -m eigen_zeth_tpu <subcommand>`.

Mirror of the reference's command surface (src/main.rs:14-17,
src/cli.rs:13-19): subcommands Run | ChainInfo | Config | Init.
ChainInfo and Config are unimplemented stubs in the reference
(src/commands/chain_info.rs:8-10, src/commands/config.rs:8-10) and raise
the same way here.  Init writes the L2 genesis state (the reference runs
reth's init_genesis, src/commands/init.rs:32-58; here: genesis record +
fresh rollup KV).  Run wires the whole node: rollup DB, sequencer,
operator workers, eigenrpc server, signal handling
(src/commands/run.rs:156-300).
"""

from __future__ import annotations

import argparse
import json
import logging
import signal
import sys
import threading

from .protocol import kv, rpc
from .protocol.prover_service import BatchProver
from .sequencer.chain import Sequencer, TxFilterConfig
from .settlement.interface import init_settlement_provider
from .settlement.worker import WorkerConfig
from .utils.config import global_env

log = logging.getLogger("ezt.cli")

GENESIS_KEY = b"GENESIS"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="eigen-zeth-tpu")
    sub = p.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="launch the node (operator + sequencer + rpc)")
    run.add_argument("--database", choices=["memory", "file", "native"], default="memory")
    run.add_argument("--db-path", default="tmp/zeth.db")
    run.add_argument("--settlement", choices=["mock", "custom", "ethereum"], default="mock")
    run.add_argument("--settlement-conf", default=None,
                     help="TOML path for the ethereum settlement config")
    run.add_argument("--tx-filter-conf", default=None,
                     help="TOML path for the tx filter (custom_node_config.toml)")
    run.add_argument("--worker-conf", default=None,
                     help="TOML path for worker intervals (settlement.toml)")
    run.add_argument("--rpc-host", default="127.0.0.1")
    run.add_argument("--rpc-port", type=int, default=8546)
    run.add_argument("--auto-mine-interval", type=float, default=2.0,
                     help="dev auto-mine cadence (reth --dev.block-time)")
    run.add_argument("--aggregator-addr", default="0x" + "00" * 20)
    # --- reth arg-surface analogs (src/commands/reth.rs) -----------------
    run.add_argument("--datadir", default=None,
                     help="alias of --db-path (reth --datadir)")
    run.add_argument("--chain-id", type=int, default=None,
                     help="L2 chain id (reth --chain)")
    run.add_argument("--instance", type=int, default=1,
                     help="node instance number; offsets the RPC port by "
                          "instance-1 (reth --instance port arithmetic)")
    run.add_argument("--metrics", default=None, metavar="HOST:PORT",
                     help="serve prometheus metrics on a separate socket "
                          "(reth --metrics); /metrics is always on the "
                          "RPC port too")
    run.add_argument("--coinbase", default=None,
                     help="block fee recipient (reth --builder suggested "
                          "fee recipient)")
    run.add_argument("--block-gas-limit", type=int, default=None,
                     help="block gas cap (reth --builder.gaslimit)")
    run.add_argument("--txpool-max-size", type=int, default=10_000,
                     help="pending-pool cap (reth --txpool.* args)")
    run.add_argument("--verify-signatures", action="store_true",
                     help="require valid secp256k1 signatures (revm "
                          "sender recovery; off for dev tooling)")
    run.add_argument("--dev-fund", action="store_true",
                     help="auto-fund accounts on first touch (reth --dev "
                          "prefunded-accounts analog); the node path "
                          "defaults to real balance enforcement")
    run.add_argument("--no-prover", action="store_true",
                     help="start without proving workers (sequencer+rpc only)")
    run.add_argument("--prover-addr", default=None,
                     help="gRPC address of an external prover process "
                          "(the reference's PROVER_ADDR topology); "
                          "default: in-process TPU prover")
    run.add_argument("--final-wrap", choices=["stark", "mimc", "linear"],
                     default="stark",
                     help="final Groth16 circuit: 'stark' verifies the "
                          "wrap-profile attestation STARKs IN-CIRCUIT "
                          "(sound; FinalProof alone implies batch "
                          "validity); 'mimc'/'linear' wrap only the "
                          "aggregated digest (fast dev profiles)")
    run.add_argument("--crs-dir", default=None,
                     help="Groth16 CRS artifact directory (persisted "
                          "pk.npz + pinned vk.json per circuit shape; "
                          "default artifacts/crs — models/crs.py)")

    prover = sub.add_parser(
        "prover", help="standalone gRPC prover server (the prover-network side)"
    )
    prover.add_argument("--host", default="127.0.0.1")
    prover.add_argument("--port", type=int, default=50061)
    prover.add_argument("--l2-addr", default=None,
                        help="L2 JSON-RPC url for the chain executor "
                             "(default: ZETH_L2_ADDR)")
    prover.add_argument("--stark-profile", choices=["production", "test"],
                        default="production",
                        help="test = tiny STARK params for CI/CPU")
    prover.add_argument("--no-jit", action="store_true")
    prover.add_argument("--final-wrap", choices=["stark", "mimc", "linear"],
                        default="stark",
                        help="final Groth16 circuit (see `run --final-wrap`)")

    init = sub.add_parser("init", help="initialize the L2 genesis / rollup DB")
    init.add_argument("--database", choices=["memory", "file", "native"], default="file")
    init.add_argument("--db-path", default="tmp/zeth.db")
    init.add_argument("--chain-id", type=int, default=None)

    sub.add_parser("chain-info", help="unimplemented (parity with the reference stub)")
    sub.add_parser("config", help="unimplemented (parity with the reference stub)")
    return p


def cmd_init(args) -> int:
    env = global_env()
    db = kv.open_db(args.database, args.db_path)
    chain_id = args.chain_id if args.chain_id is not None else env.chain_id
    genesis = {
        "chain_id": chain_id,
        "program_name": env.program_name,
        "curve_type": env.curve_type,
    }
    db.put(GENESIS_KEY, json.dumps(genesis).encode())
    db.put_u64(kv.KEY_LAST_SEQUENCE_FINALITY_BLOCK_NUMBER, 0)
    print(f"initialized genesis for chain {chain_id} in {args.database} db")
    return 0


def cmd_run(args, wait: bool = True) -> int:
    from .operator import Operator  # deferred: pulls in jax

    env = global_env()
    if getattr(args, "datadir", None):
        args.db_path = args.datadir
    if getattr(args, "instance", 1) and args.instance > 1:
        args.rpc_port += args.instance - 1
    db = kv.open_db(args.database, args.db_path)
    tx_filter = (
        TxFilterConfig.from_conf_path(args.tx_filter_conf)
        if args.tx_filter_conf
        else TxFilterConfig()
    )
    worker_config = (
        WorkerConfig.from_conf_path(args.worker_conf)
        if args.worker_conf
        else WorkerConfig()
    )
    from .sequencer.chain import BLOCK_GAS_LIMIT

    sequencer = Sequencer(
        tx_filter=tx_filter,
        chain_id=getattr(args, "chain_id", None) or env.chain_id,
        verify_signatures=getattr(args, "verify_signatures", False),
        block_gas_limit=getattr(args, "block_gas_limit", None) or BLOCK_GAS_LIMIT,
        coinbase=getattr(args, "coinbase", None),
        txpool_max_size=getattr(args, "txpool_max_size", None) or 10_000,
        auto_fund=getattr(args, "dev_fund", False),
    )

    settlement_kwargs = {}
    if args.settlement == "ethereum":
        settlement_kwargs["config"] = args.settlement_conf
    if args.settlement == "custom":
        settlement_kwargs["bridge_service_addr"] = env.bridge_service_addr
    settlement = init_settlement_provider(args.settlement, **settlement_kwargs)

    stop = threading.Event()
    server = rpc.EigenRpcServer(db, sequencer, host=args.rpc_host, port=args.rpc_port)
    server.start()
    log.info("eigenrpc listening on %s:%d", args.rpc_host, server.port)

    metrics_server = None
    if getattr(args, "metrics", None):
        mhost, _, mport = args.metrics.rpartition(":")
        metrics_server = rpc.MetricsServer(mhost or "127.0.0.1", int(mport)).start()
        log.info("metrics listening on %s:%d", mhost or "127.0.0.1", metrics_server.port)

    # auto-mine is the PoC dev mode (reference README.md:13-18); interval
    # <= 0 disables it so an external CL driver (sequencer/cl_driver.py,
    # lighthouse's role) produces blocks through the engine API instead
    if args.auto_mine_interval > 0:
        sequencer.start_auto_mine(stop, args.auto_mine_interval)

    operator = None
    if not args.no_prover:
        if getattr(args, "prover_addr", None):
            # two-process topology: proving happens in an external prover
            # process at PROVER_ADDR (the reference's deployment shape)
            from .protocol.grpc_shim import RemoteBatchProver

            prover = RemoteBatchProver(args.prover_addr)
        else:
            from .protocol.prover_service import ChainExecutor

            prover = BatchProver(
                executor=ChainExecutor(sequencer),
                wrap=getattr(args, "final_wrap", "stark"),
                crs_dir=getattr(args, "crs_dir", None),
            )
            # pin the settlement verifier to the persisted VK when one
            # exists for this deployment shape: the prover regenerating
            # its CRS can then no longer move what verification accepts
            # (VERDICT r4 item 4; the reference's on-chain verifier is a
            # fixed contract, contracts/EigenZkVM.json)
            if (
                getattr(args, "final_wrap", "stark") == "stark"
                and hasattr(settlement, "vk")
                and getattr(settlement, "vk", None) is None
            ):
                pinned = prover.pinned_vk(args.aggregator_addr)
                if pinned is not None:
                    settlement.vk = pinned
                    log.info("settlement verifier pinned to persisted VK")
        operator = Operator(
            db=db,
            chain=sequencer,
            settlement=settlement,
            prover=prover,
            worker_config=worker_config,
            aggregator_addr=args.aggregator_addr,
        )
        operator.run()

    def shutdown(*_):
        log.info("stopping")
        stop.set()
        if operator:
            operator.stop()
        if metrics_server:
            metrics_server.stop()
        server.stop()

    if wait:  # pragma: no cover - interactive path
        signal.signal(signal.SIGINT, shutdown)
        signal.signal(signal.SIGTERM, shutdown)
        stop.wait()
        shutdown()
    else:
        # test path: caller drives shutdown through the returned handles
        return {"db": db, "sequencer": sequencer, "server": server,
                "operator": operator, "stop": stop, "shutdown": shutdown}
    return 0


def cmd_prover(args, wait: bool = True):
    """Standalone prover-network process: serves ProverService over gRPC,
    executing the L2 chain it is pointed at (the reference's external
    eigen-prover role, scripts/launch-pos-eigen-zeth-node.sh:52-61)."""
    from .models import stark
    from .protocol.grpc_shim import ProverServiceServer
    from .protocol.prover_service import ChainExecutor
    from .settlement.ethereum import JsonRpcClient

    env = global_env()
    l2_addr = args.l2_addr or env.l2_addr
    executor = ChainExecutor(JsonRpcClient(l2_addr))
    # test profile: tiny chunks, digest aggregation; default profile:
    # BatchProver's production defaults (4096-row chunks, fold recursion)
    test_profile = args.stark_profile == "test"
    params = (
        stark.StarkParams(blowup=4, num_queries=2, terminal_size=16)
        if test_profile
        else None
    )
    # test profile implies eager: XLA CPU compiles of the EC graphs are
    # prohibitively slow for CI-scale proving
    use_jit = not (args.no_jit or test_profile)
    wrap = "linear" if test_profile else getattr(args, "final_wrap", "stark")
    prover = BatchProver(
        executor=executor, stark_params=params, use_jit=use_jit, wrap=wrap,
        chunk_trace_rows=16 if test_profile else None,
        recursion=False if test_profile else None,
    )
    server = ProverServiceServer(prover, host=args.host, port=args.port).start()
    log.info("prover service listening on %s:%d (l2=%s)", args.host, server.port, l2_addr)
    if wait:  # pragma: no cover - interactive path
        stop = threading.Event()

        def shutdown(*_):
            stop.set()

        signal.signal(signal.SIGINT, shutdown)
        signal.signal(signal.SIGTERM, shutdown)
        stop.wait()
        server.stop()
        return 0
    return server


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    if args.command == "run":
        return cmd_run(args)
    if args.command == "prover":
        return cmd_prover(args)
    if args.command == "init":
        return cmd_init(args)
    if args.command in ("chain-info", "config"):
        # parity with the reference's unimplemented!() stubs
        raise NotImplementedError(f"{args.command} is not implemented")
    return 1
