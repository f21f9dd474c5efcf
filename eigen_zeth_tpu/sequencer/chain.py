"""In-process L2 chain: mempool, tx filter, payload builder, auto-miner.

Reference mapping (src/custom_reth/mod.rs):
  * TxFilterConfig (mod.rs:220-250, configs/custom_node_config.toml):
    bridge contract address + bridgeAsset 4-byte selector, loaded from
    the `tx_filter_config` TOML table
  * the payload builder's bridge filter (mod.rs:499-547): txs to other
    addresses pass; txs to the bridge contract pass only if they are NOT
    bridgeAsset calls, except the FIRST bridgeAsset call per block
  * fee-ordered selection under a block gas cap (mod.rs:490-495,564-676)
  * execution + header assembly (mod.rs:687-788): here a value-transfer
    ledger with keccak tx/state roots — hermetic but structurally the
    same commit chain

Blocks serve the same JSON shapes the workers/RPC consume (eth_* dicts).
"""

from __future__ import annotations

import threading
import time
import tomllib
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ..ops import keccak
from ..utils import rlp

BLOCK_GAS_LIMIT = 30_000_000


@dataclass
class TxFilterConfig:
    """Reference: custom_reth/mod.rs:220-250."""

    bridge_contract_address: str = ""
    bridge_asset_selector: str = ""

    @classmethod
    def from_conf_path(cls, path: str) -> "TxFilterConfig":
        with open(path, "rb") as f:
            conf = tomllib.load(f)
        t = conf.get("tx_filter_config", conf)
        return cls(
            bridge_contract_address=t.get("bridge_contract_address", ""),
            bridge_asset_selector=t.get("bridge_asset_selector", ""),
        )


def _tx_gas_price(tx: dict) -> int:
    v = tx.get("gasPrice", "0x0")
    return int(v, 16) if isinstance(v, str) else int(v)


def _tx_gas(tx: dict) -> int:
    v = tx.get("gas", "0x5208")
    return int(v, 16) if isinstance(v, str) else int(v)


class Mempool:
    """Fee-ordered pool (the best_transactions iterator analog)."""

    def __init__(self):
        self._txs: List[dict] = []
        self._lock = threading.Lock()

    def add(self, tx: dict) -> str:
        with self._lock:
            self._txs.append(dict(tx))
        return tx_hash(tx)

    def best_transactions(self) -> List[dict]:
        with self._lock:
            return sorted(self._txs, key=_tx_gas_price, reverse=True)

    def remove(self, txs: List[dict]) -> None:
        hashes = {tx_hash(t) for t in txs}
        with self._lock:
            self._txs = [t for t in self._txs if tx_hash(t) not in hashes]

    def __len__(self):
        with self._lock:
            return len(self._txs)


def tx_hash(tx: dict) -> str:
    enc = rlp.encode(
        [
            str(tx.get("nonce", "0x0")).encode(),
            str(tx.get("from", "")).encode(),
            str(tx.get("to", "")).encode(),
            str(tx.get("value", "0x0")).encode(),
            str(tx.get("input", "0x")).encode(),
        ]
    )
    return "0x" + keccak.keccak256_host(enc).hex()


def make_bridge_filter(cfg: TxFilterConfig):
    """Per-block closure with the reference's first-bridge-asset-only
    semantics (custom_reth/mod.rs:499-547)."""
    state = {"seen": False}

    def allow(tx: dict) -> bool:
        to = tx.get("to")
        if to is None:
            return True  # creation txs always pass (mod.rs:512-515)
        if not cfg.bridge_contract_address or to.lower() != cfg.bridge_contract_address.lower():
            return True
        data = tx.get("input", "0x")
        selector = data[:10].lower() if data.startswith("0x") else "0x" + data[:8].lower()
        if selector != cfg.bridge_asset_selector.lower():
            return True
        if state["seen"]:
            return False
        state["seen"] = True
        return True

    return allow


class Ledger:
    """Minimal execution model: account balances + nonces; a tx moves
    value and bumps the sender nonce.  State root = keccak over the
    sorted account snapshot (the expensive trie of mod.rs:714, reduced
    to a flat commitment)."""

    def __init__(self):
        self.balances: Dict[str, int] = {}
        self.nonces: Dict[str, int] = {}

    def execute(self, tx: dict) -> bool:
        sender = (tx.get("from") or "0x0").lower()
        to = (tx.get("to") or "").lower()
        value = tx.get("value", "0x0")
        value = int(value, 16) if isinstance(value, str) else int(value)
        # dev-net semantics: accounts are auto-funded on first touch
        self.balances.setdefault(sender, 10**24)
        if self.balances[sender] < value:
            return False
        self.balances[sender] -= value
        if to:
            self.balances[to] = self.balances.get(to, 0) + value
        self.nonces[sender] = self.nonces.get(sender, 0) + 1
        return True

    def state_root(self) -> bytes:
        acc = b"".join(
            addr.encode() + self.balances[addr].to_bytes(32, "big")
            + self.nonces.get(addr, 0).to_bytes(8, "big")
            for addr in sorted(self.balances)
        )
        return keccak.keccak256_host(acc)


class Sequencer:
    """Block producer + chain store; serves the chain-client interface the
    workers/RPC consume (block_number / get_block_by_number / add tx)."""

    def __init__(
        self,
        tx_filter: Optional[TxFilterConfig] = None,
        chain_id: int = 12345,
        verify_signatures: bool = False,
    ):
        self.pool = Mempool()
        self.ledger = Ledger()
        self.filter_cfg = tx_filter or TxFilterConfig()
        self.chain_id = chain_id
        # revm-style sender recovery (custom_reth/mod.rs:604-640 executes
        # recovered txs); opt-in because dev tooling submits unsigned txs
        self.verify_signatures = verify_signatures
        self._lock = threading.Lock()
        genesis_root = self.ledger.state_root()
        self._blocks: List[dict] = [
            {
                "number": "0x0",
                "hash": "0x" + keccak.keccak256_host(b"ezt-genesis").hex(),
                "parentHash": "0x" + "00" * 32,
                "stateRoot": "0x" + genesis_root.hex(),
                "transactionsRoot": "0x" + keccak.keccak256_host(b"").hex(),
                "timestamp": "0x0",
                "gasUsed": "0x0",
                "transactions": [],
            }
        ]

    # -- chain-client surface -------------------------------------------------

    def block_number(self) -> int:
        with self._lock:
            return len(self._blocks) - 1

    def get_block_by_number(self, number, full_txs: bool = False):
        n = int(number, 16) if isinstance(number, str) else int(number)
        with self._lock:
            if 0 <= n < len(self._blocks):
                return dict(self._blocks[n])
        return None

    def send_raw_transaction(self, tx: dict) -> str:
        return self.pool.add(tx)

    # -- block building (the custom_payload_builder analog) ------------------

    def build_block(self, timestamp: Optional[int] = None) -> dict:
        allow = make_bridge_filter(self.filter_cfg)
        included: List[dict] = []
        rejected: List[dict] = []  # permanently invalid: evict (mark_invalid analog)
        gas_used = 0
        for tx in self.pool.best_transactions():
            if _tx_gas(tx) > BLOCK_GAS_LIMIT:
                rejected.append(tx)  # can never fit any block
                continue
            if gas_used + _tx_gas(tx) > BLOCK_GAS_LIMIT:
                continue  # skip over-budget tx, keep scanning (mod.rs:575-592)
            if not allow(tx):
                # bridge-filtered: deferred, not evicted — the per-block
                # first-bridge-asset window reopens next block
                continue
            exec_tx = tx
            if self.verify_signatures:
                from ..utils import ethtx

                sender = ethtx.recover_sender(tx, self.chain_id)
                if sender is None or (
                    tx.get("from") and tx["from"].lower() != sender
                ):
                    rejected.append(tx)  # bad/forged signature: evict
                    continue
                exec_tx = dict(tx, **{"from": sender})
            if not self.ledger.execute(exec_tx):
                # execution failure: drop from the pool like reth's
                # best_txs.mark_invalid (mod.rs:604-640 error path) —
                # otherwise a failing tx is re-scanned every block forever
                rejected.append(tx)
                continue
            included.append(tx)
            gas_used += _tx_gas(tx)
        self.pool.remove(included + rejected)

        with self._lock:
            parent = self._blocks[-1]
            n = len(self._blocks)
            tx_root = keccak.keccak256_host(
                b"".join(bytes.fromhex(tx_hash(t)[2:]) for t in included)
            )
            header_preimage = (
                bytes.fromhex(parent["hash"][2:])
                + tx_root
                + self.ledger.state_root()
                + n.to_bytes(8, "big")
            )
            block = {
                "number": hex(n),
                "hash": "0x" + keccak.keccak256_host(header_preimage).hex(),
                "parentHash": parent["hash"],
                "stateRoot": "0x" + self.ledger.state_root().hex(),
                "transactionsRoot": "0x" + tx_root.hex(),
                "timestamp": hex(timestamp if timestamp is not None else int(time.time())),
                "gasUsed": hex(gas_used),
                "transactions": included,
            }
            self._blocks.append(block)
            return block

    # -- auto-mine loop (the reference PoC's --auto-mine, README.md:13-18) ---

    def start_auto_mine(self, stop: threading.Event, interval: float = 2.0) -> threading.Thread:
        def loop():
            while not stop.is_set():
                if len(self.pool):
                    self.build_block()
                stop.wait(interval)

        t = threading.Thread(target=loop, daemon=True)
        t.start()
        return t
