"""EVM execution layer: contract deployment, storage, calls, reverts,
signature-verified inclusion, and the Merkle-Patricia state root
(reference analog: the revm execute/commit loop in
src/custom_reth/mod.rs:564-676 + the state root at mod.rs:714)."""

from eigen_zeth_tpu.sequencer import chain as chain_m
from eigen_zeth_tpu.sequencer.evm import EVM, BlockCtx, WorldState
from eigen_zeth_tpu.utils import ethtx, mpt

SENDER = "0x" + "11" * 20

# runtime: counter += 1; return counter   (20 bytes)
COUNTER_RUNTIME = bytes(
    [0x60, 0x00, 0x54,  # PUSH1 0 SLOAD
     0x60, 0x01, 0x01,  # PUSH1 1 ADD
     0x60, 0x00, 0x55,  # PUSH1 0 SSTORE
     0x60, 0x00, 0x54,  # PUSH1 0 SLOAD
     0x60, 0x00, 0x52,  # PUSH1 0 MSTORE
     0x60, 0x20, 0x60, 0x00, 0xF3]  # PUSH1 32 PUSH1 0 RETURN
)
COUNTER_INIT = bytes(
    [0x60, len(COUNTER_RUNTIME), 0x60, 0x0C, 0x60, 0x00, 0x39,  # CODECOPY
     0x60, len(COUNTER_RUNTIME), 0x60, 0x00, 0xF3]  # RETURN runtime
) + COUNTER_RUNTIME

REVERTER = bytes([0x60, 0x00, 0x60, 0x00, 0xFD])  # REVERT(0, 0)


def _evm():
    state = WorldState()
    return EVM(state, BlockCtx(number=1, timestamp=1000)), state


def test_deploy_and_call_counter():
    evm, state = _evm()
    r = evm.execute_tx({"to": None, "input": "0x" + COUNTER_INIT.hex(),
                        "gas": hex(5_000_000)}, SENDER)
    assert r["status"] == 1
    addr = r["contractAddress"]
    assert state.get(addr).code == COUNTER_RUNTIME
    for want in (1, 2, 3):
        r = evm.execute_tx({"to": addr, "gas": hex(5_000_000)}, SENDER)
        assert r["status"] == 1
        assert state.get(addr).storage.get(0) == want
    # nonce advanced once per tx
    assert state.get(SENDER).nonce == 4


def test_create_address_is_ethereum_rule():
    from eigen_zeth_tpu.ops import keccak
    from eigen_zeth_tpu.utils import rlp

    evm, state = _evm()
    r = evm.execute_tx({"to": None, "input": "0x" + COUNTER_INIT.hex(),
                        "gas": hex(5_000_000)}, SENDER)
    want = "0x" + keccak.keccak256_host(
        rlp.encode([bytes.fromhex(SENDER[2:]), rlp.encode_int(0)])
    )[12:].hex()
    assert r["contractAddress"] == want


def test_value_transfer_and_revert_rollback():
    evm, state = _evm()
    bob = "0x" + "22" * 20
    r = evm.execute_tx({"to": bob, "value": hex(1234)}, SENDER)
    assert r["status"] == 1
    assert state.get(bob).balance == 1234  # recipients are NOT auto-funded

    # deploy a reverter; calling it with value must roll the value back
    init = bytes([0x60, len(REVERTER), 0x60, 0x0C, 0x60, 0x00, 0x39,
                  0x60, len(REVERTER), 0x60, 0x00, 0xF3]) + REVERTER
    r = evm.execute_tx({"to": None, "input": "0x" + init.hex(),
                        "gas": hex(5_000_000)}, SENDER)
    rev = r["contractAddress"]
    bal_before = state.get(SENDER).balance
    r = evm.execute_tx({"to": rev, "value": hex(777), "gas": hex(100_000)},
                       SENDER)
    assert r["status"] == 0
    assert state.get(rev).balance == 0  # value rolled back
    assert state.get(SENDER).balance == bal_before  # gasPrice 0


def test_cross_contract_call():
    evm, state = _evm()
    r = evm.execute_tx({"to": None, "input": "0x" + COUNTER_INIT.hex(),
                        "gas": hex(5_000_000)}, SENDER)
    counter = r["contractAddress"]
    # caller: CALL(counter) then SSTORE slot0 <- returned value
    caller_rt = bytes(
        [0x60, 0x20, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00,  # sizes
         0x73] + list(bytes.fromhex(counter[2:]))  # PUSH20 addr
        + [0x61, 0xFF, 0xFF,  # PUSH2 gas
           0xF1,  # CALL
           0x50,  # POP success flag
           0x60, 0x00, 0x51,  # MLOAD ret
           0x60, 0x00, 0x55,  # SSTORE slot0
           0x00]
    )
    init = bytes([0x60, len(caller_rt), 0x60, 0x0C, 0x60, 0x00, 0x39,
                  0x60, len(caller_rt), 0x60, 0x00, 0xF3]) + caller_rt
    r = evm.execute_tx({"to": None, "input": "0x" + init.hex(),
                        "gas": hex(5_000_000)}, SENDER)
    caller = r["contractAddress"]
    r = evm.execute_tx({"to": caller, "gas": hex(5_000_000)}, SENDER)
    assert r["status"] == 1
    assert state.get(counter).storage.get(0) == 1  # counter incremented
    assert state.get(caller).storage.get(0) == 1  # returned value stored


def test_state_root_is_mpt_and_binds_storage():
    evm, state = _evm()
    r0 = state.state_root()
    evm.execute_tx({"to": None, "input": "0x" + COUNTER_INIT.hex(),
                    "gas": hex(5_000_000)}, SENDER)
    r1 = state.state_root()
    assert r0 != r1 != mpt.EMPTY_ROOT
    addr = [a for a in state.accounts if state.accounts[a].code][0]
    evm.execute_tx({"to": addr, "gas": hex(5_000_000)}, SENDER)
    assert state.state_root() != r1  # storage write moved the root


def test_sequencer_blocks_execute_contracts_and_serve_receipts():
    seq = chain_m.Sequencer()
    txh = seq.send_raw_transaction(
        {"to": None, "input": "0x" + COUNTER_INIT.hex(), "gas": hex(5_000_000),
         "gasPrice": "0x1", "from": SENDER}
    )
    blk = seq.build_block(timestamp=1)
    assert len(blk["transactions"]) == 1
    rcpt = seq.get_transaction_receipt(txh)
    assert rcpt["status"] == "0x1"
    addr = rcpt["contractAddress"]
    assert seq.ledger.state.get(addr).code == COUNTER_RUNTIME
    # call it in the next block; the state root must change
    seq.send_raw_transaction({"to": addr, "gas": hex(5_000_000),
                              "gasPrice": "0x1", "from": SENDER})
    blk2 = seq.build_block(timestamp=2)
    assert blk2["stateRoot"] != blk["stateRoot"]
    assert seq.ledger.state.get(addr).storage.get(0) == 1


def test_sequencer_verifies_signatures_when_strict():
    priv = 0xA1B2C3
    from eigen_zeth_tpu.utils.secp256k1 import priv_to_address

    sender = priv_to_address(priv)
    seq = chain_m.Sequencer(verify_signatures=True)
    tx = {"nonce": "0x0", "gasPrice": "0x0", "gas": hex(100_000),
          "to": "0x" + "33" * 20, "value": "0x5", "input": "0x"}
    signed = ethtx.sign_legacy_tx(tx, seq.chain_id, priv)
    seq.send_raw_transaction(signed)
    blk = seq.build_block(timestamp=3)
    assert len(blk["transactions"]) == 1
    assert seq.ledger.state.get(sender).nonce == 1
    # forged sender field on a valid signature: evicted, not included
    forged = dict(signed, **{"from": "0x" + "44" * 20})
    seq.send_raw_transaction(forged)
    blk2 = seq.build_block(timestamp=4)
    assert len(blk2["transactions"]) == 0
    assert len(seq.pool) == 0  # evicted


def test_ecrecover_precompile():
    from eigen_zeth_tpu.ops import keccak
    from eigen_zeth_tpu.utils.secp256k1 import priv_to_address, sign

    evm, state = _evm()
    priv = 0xDEADBEEF
    digest = keccak.keccak256_host(b"message")
    v, r, s = sign(digest, priv)
    data = (digest + (v + 27).to_bytes(32, "big") + r.to_bytes(32, "big")
            + s.to_bytes(32, "big"))
    out, _ = evm._call(SENDER, "0x" + "00" * 19 + "01", 0, data, 100_000, 0)
    assert out[-20:].hex() == priv_to_address(priv)[2:]
    # garbage signature -> empty return
    bad = digest + (29).to_bytes(32, "big") + r.to_bytes(32, "big") + s.to_bytes(32, "big")
    out, _ = evm._call(SENDER, "0x" + "00" * 19 + "01", 0, bad, 100_000, 0)
    assert out == b""
    # identity precompile
    out, _ = evm._call(SENDER, "0x" + "00" * 19 + "04", 0, b"xyz", 100_000, 0)
    assert out == b"xyz"


def test_create2_address_rule():
    from eigen_zeth_tpu.ops import keccak

    evm, state = _evm()
    init = bytes([0x60, len(COUNTER_RUNTIME), 0x60, 0x0C, 0x60, 0x00, 0x39,
                  0x60, len(COUNTER_RUNTIME), 0x60, 0x00, 0xF3]) + COUNTER_RUNTIME
    addr, _ = evm._create(SENDER, 0, init, 1_000_000, depth=1, salt=0x42)
    want = "0x" + keccak.keccak256_host(
        b"\xff" + bytes.fromhex(SENDER[2:]) + (0x42).to_bytes(32, "big")
        + keccak.keccak256_host(init)
    )[12:].hex()
    assert addr == want
    assert state.get(addr).code == COUNTER_RUNTIME
