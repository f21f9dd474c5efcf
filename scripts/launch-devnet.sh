#!/usr/bin/env bash
# Three-process devnet: bridge service + gRPC prover + node — the
# reference's full local topology (scripts/launch-pos-eigen-zeth-node.sh
# runs zeth as EL next to an external eigen-prover at PROVER_ADDR and a
# bridge service at BRIDGE_SERVICE_ADDR, src/config/env.rs:21,30-31).
#
# Process 1: the bridge HTTP service (settlement/bridge_mock.py) — the
#            custom settlement's REST backend (/sequence-batches,
#            /verify-batches, exit roots ...).
# Process 2: `eigen-zeth-tpu prover` serving
#            prover.v1.ProverService/ProverStream against the node's L2 RPC.
# Process 3: `eigen-zeth-tpu run --settlement custom --prover-addr ...` —
#            the node, settling through process 1 and proving through
#            process 2.
set -euo pipefail
cd "$(dirname "$0")/.."

RPC_PORT=${RPC_PORT:-8546}
PROVER_PORT=${PROVER_PORT:-50061}
BRIDGE_PORT=${BRIDGE_PORT:-8001}
STARK_PROFILE=${STARK_PROFILE:-production}

python -m eigen_zeth_tpu.settlement.bridge_mock --port "$BRIDGE_PORT" &
BRIDGE_PID=$!

python -m eigen_zeth_tpu prover \
  --port "$PROVER_PORT" \
  --l2-addr "http://127.0.0.1:${RPC_PORT}" \
  --stark-profile "$STARK_PROFILE" &
PROVER_PID=$!
trap 'kill $PROVER_PID $BRIDGE_PID 2>/dev/null || true' EXIT

# give both services a moment to bind
sleep 2

BRIDGE_SERVICE_ADDR="http://127.0.0.1:${BRIDGE_PORT}" \
python -m eigen_zeth_tpu run \
  --dev-fund \
  --database memory \
  --settlement custom \
  --rpc-port "$RPC_PORT" \
  --prover-addr "http://127.0.0.1:${PROVER_PORT}" \
  "$@"
