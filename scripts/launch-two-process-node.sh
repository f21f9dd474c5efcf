#!/usr/bin/env bash
# Two-process topology: node + external gRPC prover, wired by PROVER_ADDR —
# the reference's deployment shape (scripts/launch-pos-eigen-zeth-node.sh:52-61
# runs zeth as EL next to an external eigen-prover at PROVER_ADDR).
#
# Process 1: `eigen-zeth-tpu prover` serves prover.v1.ProverService/ProverStream
#            and executes the L2 chain it is pointed at.
# Process 2: `eigen-zeth-tpu run --prover-addr ...` runs the node, driving the
#            4-phase proving state machine over the gRPC stream.
set -euo pipefail
cd "$(dirname "$0")/.."

RPC_PORT=${RPC_PORT:-8546}
PROVER_PORT=${PROVER_PORT:-50061}
STARK_PROFILE=${STARK_PROFILE:-production}

python -m eigen_zeth_tpu prover \
  --port "$PROVER_PORT" \
  --l2-addr "http://127.0.0.1:${RPC_PORT}" \
  --stark-profile "$STARK_PROFILE" &
PROVER_PID=$!
trap 'kill $PROVER_PID 2>/dev/null || true' EXIT

# give the prover a moment to bind
sleep 2

python -m eigen_zeth_tpu run \
  --dev-fund \
  --database memory \
  --settlement mock \
  --rpc-port "$RPC_PORT" \
  --prover-addr "http://127.0.0.1:${PROVER_PORT}" \
  "$@"
