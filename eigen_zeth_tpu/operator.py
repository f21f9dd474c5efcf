"""Operator — constructs the prover pipeline + settlement provider and
supervises the worker set.

Mirror of src/operator.rs:21-118: build ProverChannel (here: the
in-process ProverPipeline over the TPU BatchProver), init the settlement
provider, start the L2 watcher, spawn the verify/proof/rollup workers
with a shared stop signal, and fan the stop out on shutdown.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Optional

from .protocol.kv import Database
from .protocol.prover_service import BatchProver
from .protocol.state_machine import ProverPipeline
from .settlement.interface import Settlement, init_settlement_provider
from .settlement.worker import L2Watcher, Settler, WorkerConfig
from .utils.config import global_env


@dataclass
class Operator:
    db: Database
    chain: object  # JSON-RPC client (or mock) for the L2
    settlement: Settlement
    prover: Optional[BatchProver] = None
    worker_config: WorkerConfig = field(default_factory=WorkerConfig)
    aggregator_addr: str = ""

    def __post_init__(self):
        env = global_env()
        if self.prover is None:
            # default node path: proofs bind the REAL sequenced chain
            from .protocol.prover_service import ChainExecutor

            self.prover = BatchProver(executor=ChainExecutor(self.chain))
        self.pipeline = ProverPipeline(
            self.db, self.prover, aggregator_addr=self.aggregator_addr
        )
        self.settler = Settler(
            db=self.db,
            pipeline=self.pipeline,
            settlement=self.settlement,
            chain=self.chain,
            chain_id=env.chain_id,
            config=self.worker_config,
        )
        self.watcher = L2Watcher(
            self.db, self.chain, interval=self.worker_config.watcher_interval
        )
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []

    def run(self) -> None:
        """Start all workers (operator.rs:55-104)."""
        self._threads.append(self.watcher.start(self._stop))
        self._threads.extend(self.settler.start_all(self._stop))

    def stop(self, timeout: float = 10.0) -> None:
        """Stop fan-out (operator.rs:107-116)."""
        self._stop.set()
        for t in self._threads:
            t.join(timeout)

    @property
    def stopped(self) -> bool:
        return self._stop.is_set()
