"""Transaction call-tracing: the EVM records a geth-callTracer-shaped
tree per tx and eigenrpc_traceTransaction serves it.  The reference
STUBS that method (custom_reth/eigen.rs:70-74 — always Err); this
framework implements it, so the test asserts real semantics."""

import pytest

from eigen_zeth_tpu.protocol import kv, rpc
from eigen_zeth_tpu.sequencer.chain import Sequencer, tx_hash

SENDER = "0x" + "11" * 20

COUNTER_RUNTIME = bytes(
    [0x60, 0x00, 0x54, 0x60, 0x01, 0x01, 0x60, 0x00, 0x55,
     0x60, 0x00, 0x54, 0x60, 0x00, 0x52, 0x60, 0x20, 0x60, 0x00, 0xF3]
)
REVERTER_RUNTIME = bytes([0x60, 0x00, 0x60, 0x00, 0xFD])


def _init(runtime: bytes) -> bytes:
    return bytes(
        [0x60, len(runtime), 0x60, 0x0C, 0x60, 0x00, 0x39,
         0x60, len(runtime), 0x60, 0x00, 0xF3]
    ) + runtime


def _call_runtime(target: str, op: int) -> bytes:
    """runtime that CALLs (0xF1, 5 zero args) or DELEGATECALLs (0xF4,
    4 zero args) `target` with 0xffff gas, then STOPs."""
    n_zeros = 5 if op == 0xF1 else 4
    return (
        bytes([0x60, 0x00] * n_zeros)
        + bytes([0x73]) + bytes.fromhex(target[2:])
        + bytes([0x61, 0xFF, 0xFF, op, 0x00])
    )


def _mk():
    seq = Sequencer()
    server = rpc.EigenRpcServer(kv.MemDb(), seq)
    return seq, server


def _send(seq, nonce, to, input_hex="0x", value="0x0"):
    tx = {"nonce": hex(nonce), "gasPrice": "0x1", "gas": hex(5_000_000),
          "from": SENDER, "to": to, "value": value, "input": input_hex}
    seq.send_raw_transaction(tx)
    seq.build_block(timestamp=1_700_000_000 + nonce)
    return tx_hash(tx)


def _deploy(seq, runtime, nonce):
    txh = _send(seq, nonce, None, "0x" + _init(runtime).hex())
    return seq.get_transaction_receipt(txh)["contractAddress"], txh


def test_trace_transfer_and_create():
    seq, server = _mk()
    txh = _send(seq, 0, "0x" + "22" * 20, value="0x5")
    t = server.dispatch("eigenrpc_traceTransaction", [txh])
    assert t["type"] == "CALL" and t["from"] == SENDER
    assert t["to"] == "0x" + "22" * 20 and t["value"] == "0x5"
    assert t["calls"] == [] and "error" not in t

    addr, txh2 = _deploy(seq, COUNTER_RUNTIME, 1)
    t2 = server.dispatch("eigenrpc_traceTransaction", [txh2])
    assert t2["type"] == "CREATE" and t2["to"] == addr
    assert t2["output"] == "0x" + COUNTER_RUNTIME.hex()


def test_trace_nested_call_and_revert():
    seq, server = _mk()
    counter, _ = _deploy(seq, COUNTER_RUNTIME, 0)
    reverter, _ = _deploy(seq, REVERTER_RUNTIME, 1)
    caller_ok, _ = _deploy(seq, _call_runtime(counter, 0xF1), 2)
    caller_rev, _ = _deploy(seq, _call_runtime(reverter, 0xF1), 3)

    # nested successful CALL shows up as a child frame
    txh = _send(seq, 4, caller_ok)
    t = server.dispatch("eigenrpc_traceTransaction", [txh])
    assert len(t["calls"]) == 1
    child = t["calls"][0]
    assert child["type"] == "CALL" and child["to"] == counter
    assert "error" not in child and int(child["gasUsed"], 16) > 0

    # reverting sub-call: child carries the error, parent tx still mines
    txh2 = _send(seq, 5, caller_rev)
    t2 = server.dispatch("eigenrpc_traceTransaction", [txh2])
    assert t2["calls"][0]["error"] == "execution reverted"
    assert "error" not in t2
    assert seq.get_transaction_receipt(txh2)["status"] == "0x1"


def test_trace_delegatecall():
    seq, server = _mk()
    counter, _ = _deploy(seq, COUNTER_RUNTIME, 0)
    proxy, _ = _deploy(seq, _call_runtime(counter, 0xF4), 1)
    txh = _send(seq, 2, proxy)
    t = server.dispatch("eigenrpc_traceTransaction", [txh])
    assert t["calls"][0]["type"] == "DELEGATECALL"
    assert t["calls"][0]["to"] == counter
    # DELEGATECALL runs the code in the PROXY's storage context
    assert seq.ledger.state.get(proxy).storage.get(0) == 1
    assert seq.ledger.state.get(counter).storage.get(0) is None


def test_trace_unknown_hash_errors():
    _, server = _mk()
    with pytest.raises(ValueError):
        server.dispatch("eigenrpc_traceTransaction", ["0xdead"])
