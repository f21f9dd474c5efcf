"""Two-process interop: node and prover as separate OS processes over gRPC.

The reference's deployment topology runs the node next to an external
prover network wired by PROVER_ADDR
(scripts/launch-pos-eigen-zeth-node.sh:52-61; client at
src/prover/provider.rs:564-706).  This test launches BOTH sides as real
subprocesses — `eigen-zeth-tpu prover` and `eigen-zeth-tpu run
--prover-addr` — and drives a tx through sequencing, remote proving over
the wire, and settlement, then checks the ProverStatus telemetry block.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def rpc(port, method, params, timeout=5):
    payload = json.dumps(
        {"jsonrpc": "2.0", "id": 1, "method": method, "params": params}
    ).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}",
        data=payload,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def wait_port(port, timeout=30):
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=1)
            s.close()
            return True
        except OSError:
            time.sleep(0.3)
    return False


TX = {
    "nonce": "0x0", "gasPrice": "0x2", "gas": "0x5208", "from": "0x" + "11" * 20,
    "to": "0x" + "22" * 20, "value": "0x5", "input": "0x",
    "chainId": "0x3039", "v": "0x1b", "r": "0x2", "s": "0x3",
}


def _spawn(args, logfile):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [sys.executable, "-m", "eigen_zeth_tpu"] + args,
        env=env,
        stdout=logfile,
        stderr=subprocess.STDOUT,
        cwd=REPO,
    )


def test_two_process_prove_over_grpc(tmp_path):
    rpc_port, prover_port = free_port(), free_port()
    worker_conf = tmp_path / "worker.toml"
    worker_conf.write_text(
        "[settlement_worker_config]\n"
        "proof_interval = 0.2\nverify_interval = 0.2\n"
        "rollup_interval = 0.2\nwatcher_interval = 0.2\n"
    )
    prover_log = open(tmp_path / "prover.log", "w")
    node_log = open(tmp_path / "node.log", "w")
    prover_p = _spawn(
        ["prover", "--port", str(prover_port),
         "--l2-addr", f"http://127.0.0.1:{rpc_port}",
         "--stark-profile", "test", "--no-jit"],
        prover_log,
    )
    node_p = _spawn(
        ["run", "--database", "memory", "--settlement", "mock",
         "--rpc-port", str(rpc_port), "--auto-mine-interval", "0.3",
         "--worker-conf", str(worker_conf), "--dev-fund",
         "--prover-addr", f"http://127.0.0.1:{prover_port}"],
        node_log,
    )
    try:
        assert wait_port(prover_port, 60), "prover process did not bind"
        assert wait_port(rpc_port, 60), "node process did not bind"

        out = rpc(rpc_port, "eth_sendTransaction", [TX])
        assert "result" in out, out

        # poll for the remotely-generated proof (crosses the gRPC wire)
        proof = None
        deadline = time.time() + 120
        while time.time() < deadline:
            got = rpc(rpc_port, "eigenrpc_getBatchProof", [1])["result"]
            if got and got.get("proof"):
                proof = got
                break
            time.sleep(0.5)
        assert proof is not None, "no proof served within 120s"
        assert json.loads(proof["proof"])["protocol"] == "groth16"
        assert proof["postStateRoot"].startswith("0x")

        # telemetry: GetStatus over the same wire reports a live health
        # block (prover.proto:161-190) with real process values
        from eigen_zeth_tpu.protocol.grpc_shim import RemoteBatchProver

        remote = RemoteBatchProver(f"127.0.0.1:{prover_port}")
        try:
            status = remote.get_status()
            ps = status.prover_status
            assert ps.prover_name == "ezt-tpu-prover"
            assert ps.number_of_cores >= 1
            assert ps.total_memory > 0
            assert ps.last_computed_request_id != ""  # it proved something
            assert ps.version_server.startswith("eigen-zeth-tpu")
        finally:
            remote.close()
    finally:
        for p in (node_p, prover_p):
            p.send_signal(signal.SIGTERM)
        for p in (node_p, prover_p):
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        prover_log.close()
        node_log.close()
