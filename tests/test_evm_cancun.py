"""Cancun-era EVM opcodes (TLOAD/TSTORE, MCOPY, BLOBHASH/BLOBBASEFEE)
and inner-CREATE revert rollback (value/nonce/storage of a reverting
init frame must not persist).  Reference analog: revm's Cancun spec in
the payload builder (custom_reth/mod.rs:564-676)."""

from eigen_zeth_tpu.sequencer.evm import EVM, BlockCtx, WorldState

SENDER = "0x" + "11" * 20


def _evm():
    state = WorldState()
    return EVM(state, BlockCtx(number=1, timestamp=1000)), state


def _init(runtime: bytes) -> bytes:
    return bytes(
        [0x60, len(runtime), 0x60, 0x0C, 0x60, 0x00, 0x39,
         0x60, len(runtime), 0x60, 0x00, 0xF3]
    ) + runtime


def _deploy(evm, runtime: bytes, value: int = 0) -> str:
    r = evm.execute_tx({"to": None, "input": "0x" + _init(runtime).hex(),
                        "gas": hex(5_000_000), "value": hex(value)}, SENDER)
    assert r["status"] == 1
    return r["contractAddress"]


def test_inner_create_revert_rolls_back_value_and_nonce():
    # factory: CODECOPY a 5-byte always-revert init to mem, CREATE with
    # value 5, SSTORE the result address to slot 0
    factory_rt = bytes(
        [0x60, 0x05, 0x60, 0x12, 0x60, 0x00, 0x39,   # CODECOPY(0, 0x12, 5)
         0x60, 0x05, 0x60, 0x00, 0x60, 0x05, 0xF0,   # CREATE(v=5, 0, 5)
         0x60, 0x00, 0x55, 0x00,                     # SSTORE slot0; STOP
         0x60, 0x00, 0x60, 0x00, 0xFD]               # the init: REVERT(0,0)
    )
    evm, state = _evm()
    factory = _deploy(evm, factory_rt, value=5)
    assert state.get(factory).balance == 5
    nonce_before = state.get(factory).nonce
    r = evm.execute_tx({"to": factory, "gas": hex(5_000_000)}, SENDER)
    assert r["status"] == 1  # the factory itself succeeds
    # the reverting CREATE left nothing behind
    assert state.get(factory).balance == 5          # value transfer rolled back
    assert state.get(factory).nonce == nonce_before  # nonce bump rolled back
    assert state.get(factory).storage.get(0) in (None, 0)  # CREATE pushed 0


def test_tstore_tload_roundtrip_and_tx_isolation():
    # TSTORE(1, 42); return TLOAD(1)
    rt = bytes(
        [0x60, 0x2A, 0x60, 0x01, 0x5D,               # TSTORE k=1 v=42
         0x60, 0x01, 0x5C, 0x60, 0x00, 0x52,         # MSTORE(0, TLOAD(1))
         0x60, 0x20, 0x60, 0x00, 0xF3]
    )
    evm, state = _evm()
    addr = _deploy(evm, rt)
    assert int.from_bytes(evm.call_view({"to": addr}), "big") == 42
    # transient storage does NOT persist across transactions
    rt_probe = bytes(
        [0x60, 0x01, 0x5C, 0x60, 0x00, 0x52, 0x60, 0x20, 0x60, 0x00, 0xF3]
    )
    probe = _deploy(evm, rt_probe)
    evm.execute_tx({"to": addr, "gas": hex(5_000_000)}, SENDER)  # TSTOREs 42
    assert int.from_bytes(evm.call_view({"to": addr[:2] + addr[2:]}), "big") == 42
    assert int.from_bytes(evm.call_view({"to": probe}), "big") == 0


def test_tstore_reverted_frame_is_rolled_back():
    # child (via DELEGATECALL, so it writes the PARENT's transient
    # slots): TSTORE(1, 42) then REVERT
    child_rt = bytes(
        [0x60, 0x2A, 0x60, 0x01, 0x5D, 0x60, 0x00, 0x60, 0x00, 0xFD]
    )
    evm, state = _evm()
    child = _deploy(evm, child_rt)
    parent_rt = (
        bytes([0x60, 0x00] * 4)
        + bytes([0x73]) + bytes.fromhex(child[2:])
        + bytes([0x61, 0xFF, 0xFF, 0xF4])             # DELEGATECALL
        + bytes([0x60, 0x01, 0x5C, 0x60, 0x00, 0x52,  # MSTORE(0, TLOAD(1))
                 0x60, 0x20, 0x60, 0x00, 0xF3])
    )
    parent = _deploy(evm, parent_rt)
    # the child's TSTORE into the parent's context reverted with it
    assert int.from_bytes(evm.call_view({"to": parent}), "big") == 0


def test_mcopy():
    word = bytes(range(32))
    rt = (
        bytes([0x7F]) + word + bytes([0x60, 0x00, 0x52])  # MSTORE(0, word)
        + bytes([0x60, 0x20, 0x60, 0x00, 0x60, 0x20, 0x5E])  # MCOPY(32,0,32)
        + bytes([0x60, 0x20, 0x60, 0x20, 0xF3])           # RETURN(32, 32)
    )
    evm, _ = _evm()
    addr = _deploy(evm, rt)
    assert evm.call_view({"to": addr}) == word


def test_blob_opcodes():
    # return [BLOBHASH(0), BLOBBASEFEE] — no blobs on this L2: [0, 1]
    rt = bytes(
        [0x60, 0x00, 0x49, 0x60, 0x00, 0x52,
         0x4A, 0x60, 0x20, 0x52,
         0x60, 0x40, 0x60, 0x00, 0xF3]
    )
    evm, _ = _evm()
    addr = _deploy(evm, rt)
    out = evm.call_view({"to": addr})
    assert int.from_bytes(out[:32], "big") == 0
    assert int.from_bytes(out[32:], "big") == 1
