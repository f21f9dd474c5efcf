"""EIP-6780 SELFDESTRUCT, real BLOCKHASH, and EIP-4844 blob-transaction
execution (round-5 consensus-gap closure; reference analog: revm's
Cancun spec inside the payload builder, custom_reth/mod.rs:604-640)."""

from eigen_zeth_tpu.sequencer import chain as chain_m
from eigen_zeth_tpu.sequencer.evm import (
    EVM,
    GAS_PER_BLOB,
    MAX_BLOB_GAS_PER_BLOCK,
    TARGET_BLOB_GAS_PER_BLOCK,
    BlockCtx,
    WorldState,
    blob_base_fee,
)

SENDER = "0x" + "11" * 20
BENEF = "0x" + "22" * 20


def _evm(**ctx_kw):
    state = WorldState()
    return EVM(state, BlockCtx(number=1, timestamp=1000, **ctx_kw)), state


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


# PUSH20 benef; SELFDESTRUCT
SD_RUNTIME = bytes([0x73]) + bytes.fromhex(BENEF[2:]) + bytes([0xFF])


def test_eip6780_pre_existing_contract_survives_selfdestruct():
    evm, state = _evm()
    addr = _deploy(evm, SD_RUNTIME, value=7)  # tx 1: create
    r = evm.execute_tx({"to": addr, "gas": hex(200_000)}, SENDER)  # tx 2
    assert r["status"] == 1
    # balance swept to the beneficiary, but the account is NOT deleted
    assert state.get(BENEF).balance == 7
    assert state.get(addr).balance == 0
    assert state.get(addr).code == SD_RUNTIME  # EIP-6780: code stays


def test_eip6780_same_tx_creation_is_deleted():
    # factory runtime: CODECOPY trailing init (len I) to mem, CREATE with
    # value 5, then STOP.  The created contract's init immediately
    # selfdestructs to BENEF via its constructor returning SD runtime?
    # Simpler: init code that selfdestructs DURING initialization.
    sd_init = bytes([0x73]) + bytes.fromhex(BENEF[2:]) + bytes([0xFF])
    factory_rt = bytes(
        [0x60, len(sd_init), 0x60, 0x0F, 0x60, 0x00, 0x39,   # CODECOPY
         0x60, len(sd_init), 0x60, 0x00, 0x60, 0x05, 0xF0,   # CREATE v=5
         0x00]                                               # STOP
    ) + sd_init
    evm, state = _evm()
    factory = _deploy(evm, factory_rt, value=5)
    r = evm.execute_tx({"to": factory, "gas": hex(1_000_000)}, SENDER)
    assert r["status"] == 1
    # the created-and-destroyed account must be GONE (created same tx)
    created = [
        a for a in state.accounts
        if a not in (factory, SENDER.lower(), BENEF.lower())
        and "0x" + "00" * 20 != a
    ]
    for a in created:
        acc = state.accounts[a]
        assert acc.balance == 0 and not acc.code and acc.nonce == 0, a
    assert state.get(BENEF).balance == 5  # sweep still happened


def test_blockhash_last_256_lookup():
    hashes = {5: 0xABCDEF, 100: 0x123456}
    evm, state = _evm(block_hash_fn=lambda bn: hashes.get(bn, 0))
    evm.ctx.number = 105
    # runtime: BLOCKHASH(CALLDATALOAD(0)) -> return
    rt = bytes([0x60, 0x00, 0x35, 0x40, 0x60, 0x00, 0x52,
                0x60, 0x20, 0x60, 0x00, 0xF3])
    addr = _deploy(evm, rt)

    def bh(n: int) -> int:
        out = evm.call_view({"to": addr, "from": SENDER,
                             "input": "0x" + n.to_bytes(32, "big").hex()})
        return int.from_bytes(out, "big")

    assert bh(100) == 0x123456
    assert bh(5) == 0xABCDEF  # 105-5=100 <= 256: in range
    assert bh(104) == 0  # parent exists in fn? hashes has no 104 -> 0


def test_blockhash_range_rules():
    evm, state = _evm(block_hash_fn=lambda bn: 0x42)
    evm.ctx.number = 300
    rt = bytes([0x60, 0x00, 0x35, 0x40, 0x60, 0x00, 0x52,
                0x60, 0x20, 0x60, 0x00, 0xF3])
    addr = _deploy(evm, rt)

    def bh(n: int) -> int:
        out = evm.call_view({"to": addr, "from": SENDER,
                             "input": "0x" + n.to_bytes(32, "big").hex()})
        return int.from_bytes(out, "big")

    assert bh(299) == 0x42  # parent
    assert bh(44) == 0x42  # number-256
    assert bh(43) == 0  # older than 256
    assert bh(300) == 0  # self
    assert bh(301) == 0  # future


def _vh(i: int) -> str:
    return "0x01" + ("00" * 30) + bytes([i]).hex()


def test_blob_tx_charges_and_serves_blobhash():
    evm, state = _evm(blob_basefee=3)
    # runtime: return BLOBHASH(CALLDATALOAD(0))
    rt = bytes([0x60, 0x00, 0x35, 0x49, 0x60, 0x00, 0x52,
                0x60, 0x20, 0x60, 0x00, 0xF3])
    addr = _deploy(evm, rt)
    bal0 = state.get(SENDER).balance
    r = evm.execute_tx(
        {"to": addr, "gas": hex(200_000), "maxFeePerGas": "0x0",
         "maxFeePerBlobGas": hex(3),
         "blobVersionedHashes": [_vh(9), _vh(10)]},
        SENDER,
    )
    assert r["status"] == 1
    assert r["blobGasUsed"] == 2 * GAS_PER_BLOB
    assert r["blobGasPrice"] == 3
    # blob fee burned: balance dropped by exactly blob_gas * blob_basefee
    # (execution gas price is 0 here)
    assert bal0 - state.get(SENDER).balance == 2 * GAS_PER_BLOB * 3


def test_blob_tx_validity_rules():
    evm, state = _evm(blob_basefee=5)
    addr = _deploy(evm, bytes([0x00]))
    # fee cap below blob base fee
    r = evm.execute_tx(
        {"to": addr, "gas": hex(100_000), "maxFeePerGas": "0x0",
         "maxFeePerBlobGas": hex(4), "blobVersionedHashes": [_vh(1)]},
        SENDER,
    )
    assert r["status"] == 0 and r["error"] == "blob-fee-cap-below-basefee"
    # wrong version byte
    bad = "0x02" + "00" * 31
    r = evm.execute_tx(
        {"to": addr, "gas": hex(100_000), "maxFeePerGas": "0x0",
         "maxFeePerBlobGas": hex(5), "blobVersionedHashes": [bad]},
        SENDER,
    )
    assert r["status"] == 0 and r["error"] == "blob-hash-version"
    # blob txs cannot create
    r = evm.execute_tx(
        {"to": None, "input": "0x00", "gas": hex(100_000),
         "maxFeePerGas": "0x0", "maxFeePerBlobGas": hex(5),
         "blobVersionedHashes": [_vh(1)]},
        SENDER,
    )
    assert r["status"] == 0 and r["error"] == "blob-tx-create"


def test_blob_base_fee_curve():
    assert blob_base_fee(0) == 1
    assert blob_base_fee(TARGET_BLOB_GAS_PER_BLOCK) >= 1
    # monotone increasing, exponential-ish
    a = blob_base_fee(10 * TARGET_BLOB_GAS_PER_BLOCK)
    b = blob_base_fee(20 * TARGET_BLOB_GAS_PER_BLOCK)
    assert b > a > 1


def test_chain_blob_accounting_and_excess_update():
    seq = chain_m.Sequencer()
    seq.send_raw_transaction(
        {"to": "0x" + "33" * 20, "gas": hex(100_000), "gasPrice": "0x1",
         "from": SENDER, "maxFeePerBlobGas": hex(10),
         "blobVersionedHashes": [_vh(1), _vh(2), _vh(3), _vh(4)]}
    )
    blk = seq.build_block(timestamp=1)
    assert int(blk["blobGasUsed"], 16) == 4 * GAS_PER_BLOB
    assert int(blk["excessBlobGas"], 16) == 0  # genesis had none
    # next block: excess = max(0, 0 + 4*G - TARGET(3*G)) = 1*G
    blk2 = seq.build_block(timestamp=2)
    assert int(blk2["excessBlobGas"], 16) == 4 * GAS_PER_BLOB - TARGET_BLOB_GAS_PER_BLOCK


def test_chain_blob_block_cap():
    seq = chain_m.Sequencer()
    # 7 single-blob txs: only 6 blobs fit a block (MAX = 6 blobs)
    for i in range(7):
        seq.send_raw_transaction(
            {"to": "0x" + "33" * 20, "gas": hex(100_000), "gasPrice": "0x1",
             "from": SENDER, "nonce": hex(i), "maxFeePerBlobGas": hex(10),
             "blobVersionedHashes": [_vh(i + 1)]}
        )
    blk = seq.build_block(timestamp=1)
    assert int(blk["blobGasUsed"], 16) == MAX_BLOB_GAS_PER_BLOCK
    blk2 = seq.build_block(timestamp=2)
    assert int(blk2["blobGasUsed"], 16) == GAS_PER_BLOB  # the deferred one


def test_decode_raw_blob_tx():
    from eigen_zeth_tpu.ops.keccak import keccak256_host
    from eigen_zeth_tpu.utils import ethtx, rlp, secp256k1

    priv = 0xA1B2C3
    chain_id = 12345
    enc = rlp.encode_int
    payload = [
        enc(chain_id), enc(0), enc(1), enc(100),
        enc(50_000), bytes.fromhex("22" * 20), enc(5), b"",
        [], enc(7),
        [bytes.fromhex("01" + "00" * 31)],
    ]
    sighash = keccak256_host(b"\x03" + rlp.encode(payload))
    yp, r, s = secp256k1.sign(sighash, priv)
    raw = b"\x03" + rlp.encode(payload + [enc(yp), enc(r), enc(s)])
    tx = ethtx.decode_raw_tx(raw)
    assert tx["type"] == "0x3"
    assert tx["maxFeePerBlobGas"] == hex(7)
    assert tx["blobVersionedHashes"] == ["0x01" + "00" * 31]
    assert tx["to"] == "0x" + "22" * 20
    assert int(tx["maxFeePerGas"], 16) == 100
    # recovered sender matches the key
    assert tx["from"] == secp256k1.priv_to_address(priv)
